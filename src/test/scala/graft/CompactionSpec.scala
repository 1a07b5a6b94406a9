package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Compaction

/** Pins the PHYSICAL claims of the small-file compactor that the q163
  * data-identity oracle cannot see: byte-derived output counts, the
  * shuffle-free shape of the coalesce path, and the disjoint per-file
  * ranges of the clustered path. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  private def fixture(): (String, String) = {
    val base = Files.createTempDirectory("graft-compact").toString
    val frag = s"$base/frag"
    // 200 rows scattered over 40 files — the streaming-sink pathology
    (0L until 200L).map(i => (i, s"doc-$i-${"x" * (i % 17).toInt}"))
      .toDF("doc_id", "text")
      .repartition(40)
      .write.parquet(frag)
    (base, frag)
  }

  test("plan: output count is ceil(totalBytes / targetBytes) over the real listing") {
    val (_, frag) = fixture()
    assert(parquetFiles(frag).length === 40)
    val total = parquetFiles(frag).map(_.length()).sum
    val p = Compaction.plan(spark, frag, targetBytes = total / 3)
    assert(p.nInputFiles === 40)
    assert(p.totalBytes === total)
    // ceil(total / (total/3)) = 4 when total is not divisible by 3 parts
    assert(p.nOutputFiles === ((total + total / 3 - 1) / (total / 3)).toInt)
    val one = Compaction.plan(spark, frag, targetBytes = Long.MaxValue / 2)
    assert(one.nOutputFiles === 1)
  }

  test("coalesce path: no shuffle, planned file count, data identity") {
    val (base, frag) = fixture()
    val p = Compaction.compact(spark, frag, s"$base/out", targetBytes = 1L << 40)
    assert(p.nOutputFiles === 1)
    assert(parquetFiles(s"$base/out").length === 1)
    // the operator's whole point at scale: the rewrite plans ZERO exchanges
    val shape = spark.read.parquet(frag).coalesce(p.nOutputFiles)
      .queryExecution.executedPlan.toString
    assert(shape.contains("Coalesce"), shape)
    assert(!shape.contains("Exchange"), s"coalesce path must not shuffle:\n$shape")
    val got = spark.read.parquet(s"$base/out")
      .agg(count(lit(1)), sum("doc_id"), sum(length(col("text")))).head()
    val want = spark.read.parquet(frag)
      .agg(count(lit(1)), sum("doc_id"), sum(length(col("text")))).head()
    assert(got === want)
  }

  test("clustered path: files cover disjoint doc_id ranges, data identity") {
    val (base, frag) = fixture()
    val total = parquetFiles(frag).map(_.length()).sum
    val p = Compaction.compact(spark, frag, s"$base/out", targetBytes = total / 4,
      clusterCol = Some("doc_id"))
    assert(p.nOutputFiles >= 2, s"fixture must yield a multi-file layout: $p")
    val outFiles = parquetFiles(s"$base/out")
    assert(outFiles.length <= p.nOutputFiles) // range split may leave empties
    assert(outFiles.length >= 2)
    val ranges = outFiles.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }
    val got = spark.read.parquet(s"$base/out").select("doc_id", "text")
      .as[(Long, String)].collect().toSet
    val want = spark.read.parquet(frag).select("doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(got === want)
  }

  test("plan refuses an empty or non-parquet directory") {
    val empty = Files.createTempDirectory("graft-compact-empty").toString
    intercept[IllegalArgumentException] {
      Compaction.plan(spark, empty, targetBytes = 1024)
    }
  }
}
