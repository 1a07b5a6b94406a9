package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Events, Retrieval, TextAnalysis}
import graft.ops.Materialize

/** The shared materialization point returns IDENTICAL results in every
  * mode — only the storage/durability trade changes (VERDICT r9 #1). */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  private val modes: Seq[(String, Map[String, String])] = {
    lazy val snapDir = Files.createTempDirectory("graft-mat-spec").toString
    Seq(
      "executor-local" -> Map(Materialize.ModeKey -> "executor-local"),
      "replicated" -> Map(Materialize.ModeKey -> "replicated"),
      "snapshot" -> Map(Materialize.ModeKey -> "snapshot",
        Materialize.SnapshotDirKey -> snapDir))
  }

  /** Run `build` under each mode's conf and assert all three result sets
    * are identical (the stream==batch style of pin). */
  private def pinAcrossModes(build: => org.apache.spark.sql.DataFrame): Unit = {
    val results = modes.map { case (name, conf) =>
      name -> withSQLConf(conf.toSeq: _*)(sortedRows(build))
    }
    val (refName, ref) = results.head
    results.tail.foreach { case (name, rows) =>
      assert(rows === ref, s"mode '$name' diverged from '$refName'")
    }
  }

  test("helper round-trips rows and schema in all three modes") {
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, null, -2.0))
      .toDF("id", "s", "x")
    modes.foreach { case (name, conf) =>
      withSQLConf(conf.toSeq: _*) {
        val out = Materialize.stable(df, name)
        // names/types/order exact in every mode; nullability may WIDEN
        // under snapshot (file-source semantics, documented in the helper)
        assert(out.schema.map(f => (f.name, f.dataType)) ===
          df.schema.map(f => (f.name, f.dataType)), s"schema changed under $name")
        if (name != "snapshot") assert(out.schema === df.schema)
        assert(sortedRows(out) === sortedRows(df), s"rows changed under $name")
      }
    }
  }

  test("unknown mode and snapshot-without-dir fail loudly") {
    val df = Seq(1).toDF("x")
    withSQLConf(Materialize.ModeKey -> "bogus") {
      val e = intercept[IllegalArgumentException] { Materialize.stable(df) }
      assert(e.getMessage.contains("bogus"))
    }
    withSQLConf(Materialize.ModeKey -> "snapshot") {
      spark.conf.unset(Materialize.SnapshotDirKey)
      val e = intercept[IllegalArgumentException] { Materialize.stable(df) }
      assert(e.getMessage.contains(Materialize.SnapshotDirKey))
    }
  }

  test("bm25 (scoreTerms) identical across modes") {
    val docs = Seq(
      (1L, "spark query engine"), (2L, "query window query"),
      (3L, "window plans"), (4L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    pinAcrossModes(
      Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "query", "window"))
        .orderBy("doc_id"))
  }

  test("dsirWeights + bigramLogProb identical across modes") {
    val raw = Seq((1L, "the cat sat"), (2L, "stock market crash"),
      (3L, "the cat ran"), (4L, "cat cat cat")).toDF("doc_id", "text")
    val target = Seq((10L, "the cat sat on the mat")).toDF("doc_id", "text")
    pinAcrossModes(
      TextAnalysis.dsirWeights(raw, target, "doc_id", "text", buckets = 64)
        .orderBy("doc_id"))
    pinAcrossModes(
      TextAnalysis.bigramLogProb(raw, "doc_id", "text").orderBy("doc_id"))
  }

  test("temperatureMix + funnel identical across modes") {
    val docs = (1L to 200L).map(i => (i, if (i % 10 == 0) "rare" else "common"))
      .toDF("doc_id", "source")
    pinAcrossModes(
      TextAnalysis.temperatureMix(docs, "source", "doc_id", 0.5, 100, "m")
        .orderBy("doc_id"))
    val ev = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "buy", 30L),
      ("u2", "view", 10L), ("u2", "click", 5L),
      ("u3", "view", 40L)).toDF("user_id", "event_type", "ts_ms")
    pinAcrossModes(Events.funnel(ev, Seq("view", "click", "buy")))
  }

  test("loop-round release keeps persistent-RDD count bounded (VERDICT r10 #5)") {
    // A 5-round stable/release loop must hold ~2 rounds of blocks, never
    // one per round — iterative operators (pageRank, kCore, BPE) follow
    // exactly this discipline, so the bound here pins theirs too.
    withSQLConf(Materialize.ModeKey -> "executor-local") {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      var state = Materialize.stable(
        (1L to 100L).toDF("v"), "loop-r0")
      for (i <- 1 to 5) {
        val next = Materialize.stable(
          state.withColumn("v", col("v") + 1), s"loop-r$i")
        Materialize.release(state)
        state = next
        val live = spark.sparkContext.getPersistentRDDs.size
        assert(live <= 2,
          s"round $i left $live persistent RDDs — release is not draining")
      }
      assert(state.agg(sum("v")).head.getLong(0) === (6L to 105L).sum)
      Materialize.release(state)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    }
    // and the operators themselves: a 6-iteration pageRank leaves no
    // persistent blocks beyond its returned final round
    withSQLConf(Materialize.ModeKey -> "executor-local") {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
      val pr = graft.ext.Graph.pageRank(edges, iters = 6)
      assert(pr.count() === 4L)
      val live = spark.sparkContext.getPersistentRDDs.size
      assert(live <= 2,
        s"pageRank(iters=6) left $live persistent RDDs — loop hygiene broken")
      Materialize.release(pr)
    }
  }

  test("graph loops (kCore, triangleCounts) and the rate grid identical across modes") {
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)) ++
      (10L to 14L).map(i => (i, i + 1))).toDF("src", "dst")
    pinAcrossModes(graft.ext.Graph.kCore(edges, k = 2).orderBy("node"))
    pinAcrossModes(
      graft.ext.Graph.triangleCounts(edges).orderBy("node"))
    val ev = Seq(("a", 0L), ("a", 3600000L * 3), ("b", 3600000L))
      .toDF("event_type", "ts_ms")
    pinAcrossModes(
      Events.rateSeriesFilled(ev).orderBy("event_type", "bucket"))
  }
}
