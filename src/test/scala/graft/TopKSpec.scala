package graft

import org.apache.spark.sql.functions._
import graft.ops.TopK

/** The k-bounded fold family: plain top-k, the duplicate-collapsing
  * variant (round 15 — the prescreened-JW dedup lives INSIDE the fold,
  * not in a shuffle), and the bottom-k KMV sampler. */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("groupedTopKDistinct == groupedTopK on duplicate-free input") {
    val rows = (1L to 200L).map(i => ("g" + (i % 3), (i % 37).toDouble, i))
      .toDF("grp", "s", "id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "rnk", "id", "score").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(canon(TopK.groupedTopKDistinct(rows, Seq("grp"), col("s"),
        col("id"), 5)) ===
      canon(TopK.groupedTopK(rows, Seq("grp"), col("s"), col("id"), 5)))
  }

  test("groupedTopKDistinct: structural duplicates collapse inside the fold") {
    // every (s, id) appears 3x (the collision-multiplicity shape the
    // prescreened JW candidate stream produces); the output must be the
    // top-k of the DISTINCT pair set — no pair twice, ranks contiguous
    val base = (1L to 50L).map(i => ("g", i.toDouble, i))
    val rows = (base ++ base ++ base).toDF("grp", "s", "id")
      .repartition(7) // duplicates land in different partitions too
    val got = TopK.groupedTopKDistinct(rows, Seq("grp"), col("s"),
        col("id"), 10)
      .select("rnk", "id", "score").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.map(_._2).distinct.length === 10, s"duplicate ids ranked: ${got.toSeq}")
    assert(got.map(_._1).toSeq === (1 to 10), s"ranks not contiguous: ${got.toSeq}")
    // scores 50 down to 41 (top-10 of 1..50, DESC)
    assert(got.map(_._3).toSeq === (50 to 41 by -1).map(_.toDouble))
  }

  test("groupedTopKDistinct: ties on score keep smallest ids, duplicates still dead") {
    val rows = Seq(("g", 1.0, 7L), ("g", 1.0, 7L), ("g", 1.0, 3L),
      ("g", 1.0, 9L), ("g", 1.0, 3L)).toDF("grp", "s", "id")
    val got = TopK.groupedTopKDistinct(rows, Seq("grp"), col("s"),
        col("id"), 2)
      .select("rnk", "id").collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((1, 3L), (2, 7L)))
  }
}
