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

  test("writeSinks: out_1/out_2 gates write and skip independently (R3)") {
    val resolved = Resolve.applyDecisions(search, decisions, "sku")
    val data = Seq((10L, "beta-2"), (11L, "other")).toDF("data_id", "match_val")

    def run(out1: Boolean, out2: Boolean): (Boolean, Boolean, Long, Long) = {
      val dir = Files.createTempDirectory("graft-dual").toString
      val (p1, p2) = (dir + "/out1", dir + "/out2")
      Resolve.writeSinks(resolved, data, "match_val", out1, out2, p1, p2)
      val e1 = Files.exists(java.nio.file.Paths.get(p1))
      val e2 = Files.exists(java.nio.file.Paths.get(p2))
      (e1, e2,
        if (e1) spark.read.parquet(p1).count() else 0L,
        if (e2) spark.read.parquet(p2).count() else 0L)
    }

    assert(run(out1 = true, out2 = false) === ((true, false, 2L, 0L)))
    assert(run(out1 = false, out2 = true) === ((false, true, 0L, 1L))) // only beta-2 row
    assert(run(out1 = true, out2 = true) === ((true, true, 2L, 1L)))
    assert(run(out1 = false, out2 = false) === ((false, false, 0L, 0L)))
  }
}
