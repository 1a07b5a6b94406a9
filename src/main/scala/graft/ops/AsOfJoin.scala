package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the LATEST right
  * row with the same key and `right.ts <= left.ts` — the classic operator
  * Spark's join zoo lacks (attribution, slowly-changing-dimension lookup,
  * last-quote-before-trade).
  *
  * Implementation is the union-sort technique, NOT a range join: tag both
  * sides, union them (schema aligned by name, null-filled), shuffle ONCE by
  * key, sort each partition by (ts, side) with right-before-left on ties
  * (so `<=` is inclusive), and carry the right values forward with a
  * running `last(ignoreNulls)` window. Cost is one exchange + one sort over
  * |L| + |R| rows — a naive `join(key) && r.ts <= l.ts` range join
  * materializes O(|L| x matches) pairs before its rank filter, which
  * explodes at scale.
  *
  * Contract: `right` must be unique per (key, ts) (pre-aggregate if not);
  * right value columns come back prefixed `__r_` plus `__r_ts` (the matched
  * timestamp), null when no right row precedes the left row.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame =
    asofImpl(left, right, key, ts, forward = false)

  /** FORWARD as-of: for each left row, the EARLIEST right row with the
    * same key and `right.ts >= left.ts` — time-to-next-event analysis
    * (next purchase after an error, next deploy after an alert, SLA
    * clocks). Same union-sort economics as [[asof]] — one exchange + one
    * sort over |L| + |R| rows — just scanning time in the other
    * direction: the carry window runs over the DESCENDING timestamp
    * order, so `last(ignoreNulls)` holds the nearest FUTURE right row
    * when each left row is reached; right-before-left on ts ties keeps
    * `>=` inclusive. Same uniqueness contract and `__r_` output
    * convention (null when no right row follows). */
  def asofForward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame =
    asofImpl(left, right, key, ts, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
                       ts: String, forward: Boolean): DataFrame = {
    val rVals = right.columns.filterNot(c => c == key || c == ts).toSeq
    val r = right.select(
      (Seq(col(key), col(ts)) ++ rVals.map(c => col(c).as(s"__r_$c"))
        :+ col(ts).as("__r_ts")): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(if (forward) col(ts).desc else col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rVals.map(c => s"__r_$c") :+ "__r_ts").foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
