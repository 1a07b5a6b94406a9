package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Resolve

/** The resolution write-path (SURVEY §2.9 R1-R3, §2.1 S3-S4): decisions
  * join, coalesce update, sink filter, append-mode write. */
class ResolveSpec extends SparkTestBase {
  import spark.implicits._

  private def search = Resolve.withRowId(
    Seq("alpha", "beta", "gamma", "delta").toDF("sku"), "sku")

  // row ids follow withRowId's alphabetical order: alpha=1 beta=2 delta=3 gamma=4
  private def decisions = Seq(
    (1, "keep", null.asInstanceOf[String]),     // alpha: keep as-is
    (2, "replace", "beta-2"),                   // beta: point update
    (3, "skip", null.asInstanceOf[String])      // delta: advance only
    // gamma: no decision -> defaults to skip
  ).toDF("row_id", "action", "new_val")

  test("applyDecisions: replace swaps the value, others keep it, default is skip") {
    val resolved = Resolve.applyDecisions(search, decisions, "sku")
      .orderBy("row_id")
      .select("row_id", "sku", "resolved_val", "action")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(resolved.toSeq === Seq(
      (1, "alpha", "alpha", "keep"),
      (2, "beta", "beta-2", "replace"),
      (3, "delta", "delta", "skip"),
      (4, "gamma", "gamma", "skip")))
  }

  test("sinkRows keeps only keep/replace; writeSink appends batches") {
    val resolved = Resolve.applyDecisions(search, decisions, "sku")
    assert(Resolve.sinkRows(resolved).count() === 2) // alpha + beta only

    val out = Files.createTempDirectory("graft-sink").toString + "/out"
    Resolve.writeSink(resolved, out)
    Resolve.writeSink(resolved, out) // append-mode: second batch adds rows
    val sunk = spark.read.parquet(out)
    assert(sunk.count() === 4)
    assert(sunk.filter(col("action") === "skip").count() === 0)
  }
}
