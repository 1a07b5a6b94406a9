package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The resolution write-path (SURVEY.md §2.9). The reference mutates the
  * search table in place (`df_search.at[idx, "sku"] = new_sku`,
  * /root/reference/main.py:539) and appends kept/replaced rows to an Excel
  * sink one at a time (main.py:521-553). The Spark idiom for point updates is
  * a decisions table joined back:
  *
  *   decisions(row_id, action, new_val)   action in {confirm, skip, keep, replace}
  *
  * `replace` swaps the value (R1), `keep`/`replace` rows flow to the sink
  * (R2), `confirm`/`skip` only advance. One join + one append write replaces
  * the reference's per-row read-modify-append loop.
  */
object Resolve {

  /** W2/P3 (main.py:584-592): stamp a deterministic 1-based row id. The
    * reference relies on pandas' implicit positional index; Spark requires an
    * explicit order. A global row_number is a single-partition sort at scale —
    * fine for probe-sized tables (the search side, which every caller
    * already bounds to broadcastable size via Guards), DELIBERATELY so:
    * W2's 1-based display index is a total order by definition. Do NOT
    * copy this onto a corpus-sized table — the scale-safe replacement is
    * [[graft.ops.Partitioning.contiguousIds]] (per-partition counts + one
    * tiny offset broadcast, no single-partition funnel). */
  def withRowId(df: DataFrame, orderCols: String*): DataFrame =
    df.withColumn("row_id",
      row_number().over(Window.orderBy(orderCols.map(col): _*)))

  /** R1: apply decisions; rows without a decision default to `skip`. */
  def applyDecisions(search: DataFrame, decisions: DataFrame, valueCol: String): DataFrame =
    search.join(decisions, Seq("row_id"), "left")
      .withColumn("resolved_val",
        when(col("action") === "replace", col("new_val")).otherwise(col(valueCol)))
      .withColumn("action", coalesce(col("action"), lit("skip")))
      .drop("new_val")

  /** R2: the subset that the sink receives. */
  def sinkRows(resolved: DataFrame): DataFrame =
    resolved.filter(col("action").isin("keep", "replace"))

  /** S3/S4: one append write for the whole batch (vs per-row xlsx overlay
    * appends in the reference, main.py:530-535). */
  def writeSink(resolved: DataFrame, path: String): Unit =
    sinkRows(resolved).write.mode("append").parquet(path)

  /** R3: dual config-gated sinks. The reference's settings declare two
    * independent output gates — `out_1` "Output DataFrame1" (the search
    * side) and `out_2` "Output DataFrame2" (the data side) — persisted via
    * the GUI/config (/root/reference/main.py:331-336, 663-670) but never
    * consumed by its write loop; the port implements what the flags
    * declare. Each gate independently enables its sink: out1 appends the
    * kept/replaced resolved search rows to `path1`, out2 appends the
    * data-side rows chosen by `replace` decisions (join on the resolved
    * value) to `path2`. Both off = no write at all. */
  def writeSinks(resolved: DataFrame, data: DataFrame, valueCol: String,
                 out1: Boolean, out2: Boolean,
                 path1: String, path2: String): Unit = {
    if (out1) writeSink(resolved, path1)
    if (out2) {
      val chosen = resolved.filter(col("action") === "replace")
        .select(col("resolved_val")).distinct()
      data.join(chosen, data(valueCol) === col("resolved_val"), "left_semi")
        .write.mode("append").parquet(path2)
    }
  }

  /** CDC changelog materialization — last-writer-wins MERGE of a
    * full-row-image change log (op ∈ I/U/D, ordered by `seqCols` within
    * each key) onto a base snapshot: keys untouched by the log keep
    * their base row; keys whose LATEST log entry is an upsert take that
    * entry's values; keys whose latest entry is a delete vanish. The
    * batch twin of applying a replication/Debezium-style feed — distinct
    * from [[applyDecisions]] (keyed human decisions, no ordering) and
    * from scd2History (which keeps every version; this keeps the END
    * state).
    *
    * Shape at scale: the log first folds to ONE row per key — an
    * aggregate arg-max (max of struct(seqCols..., op, values...)), NO
    * window, map-side partials absorb hot keys — then ONE full-outer
    * join against the base on the key decides survivor vs delete. The
    * log fold shuffles pre-reduced rows; nothing rescans either input.
    * `seqCols` must totally order each key's entries (ties would let
    * either entry win — feed a log sequence number as the last column);
    * null seq values are rejected by the struct MIN/MAX null-drop only
    * if the FIRST seq col is null, so enforce non-null upstream. */
  def applyChangelog(base: DataFrame, log: DataFrame, keyCol: String,
                     seqCols: Seq[String], opCol: String,
                     valueCols: Seq[String]): DataFrame = {
    require(seqCols.nonEmpty, "applyChangelog needs ordering columns")
    require(valueCols.nonEmpty, "applyChangelog needs value columns")
    val packed = struct(
      seqCols.map(col) ++ ((opCol +: valueCols).map(col)): _*)
    val latest = log.groupBy(col(keyCol))
      .agg(max(packed).as("__last"))
      .select(col(keyCol),
        col(s"__last.$opCol").as("__op"),
        struct(valueCols.map(c => col(s"__last.$c").as(c)): _*).as("__lv"))
    val b = base.select(col(keyCol),
      struct(valueCols.map(col): _*).as("__bv"))
    b.join(latest, Seq(keyCol), "full_outer")
      // op null (no log entry) keeps the base row; 'D' drops; I/U upsert
      .filter(coalesce(col("__op") =!= "D", lit(true)))
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("__op").isNotNull, col(s"__lv.$c"))
          .otherwise(col(s"__bv.$c")).as(c)): _*)
  }

  /** Incremental view maintenance of grouped COUNTs under the same
    * changelog [[applyChangelog]] materializes: maintained counts =
    * base counts + per-group deltas, where each touched key contributes
    * −1 to its PRE-state group (its base row's group, if it had one)
    * and +1 to its POST-state group (the latest log entry's group,
    * unless that entry is a delete). The IVM promise — the refreshed
    * aggregate never rescans the base beyond the touched keys' lookups.
    *
    * Shape at scale: the log folds to one row per touched key (the
    * applyChangelog arg-max, partial_max map-side), joins the BASE KEYS
    * only (key-partitioned equi-join — in a real serving store this is
    * the point lookup), and the ±1s fold to group-sized deltas. The
    * base counts fold once; nothing row-scale shuffles twice. The law
    * (maintained == recount of the materialized state) is q208's
    * hash-proven channel. */
  def ivmCounts(base: DataFrame, log: DataFrame, keyCol: String,
                seqCols: Seq[String], opCol: String,
                groupCol: String): DataFrame = {
    require(seqCols.nonEmpty, "ivmCounts needs ordering columns")
    val packed = struct(seqCols.map(col) ++ Seq(col(opCol), col(groupCol)): _*)
    val latest = log.groupBy(col(keyCol))
      .agg(max(packed).as("__last"))
      .select(col(keyCol), col(s"__last.$opCol").as("__op"),
        col(s"__last.$groupCol").as("__new_g"))
    val pre = base.select(col(keyCol), col(groupCol).as("__old_g"))
      .join(latest, Seq(keyCol), "right")
    val deltas = pre.select(explode(array(
        struct(col("__old_g").as("g"),
          when(col("__old_g").isNotNull, -1L).otherwise(0L).as("d")),
        struct(col("__new_g").as("g"),
          when(col("__op") =!= "D", 1L).otherwise(0L).as("d")))).as("x"))
      .select(col("x.g").as(groupCol), col("x.d").as("__d"))
      .filter(col("__d") =!= 0L)
      .groupBy(col(groupCol)).agg(sum("__d").as("__delta"))
    val baseCounts = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n0"))
    baseCounts.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("__n0"), lit(0L)) + coalesce(col("__delta"), lit(0L)))
          .as("n"))
      .filter(col("n") =!= 0L)
  }
}
