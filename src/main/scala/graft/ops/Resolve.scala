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
}
