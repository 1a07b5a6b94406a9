package graft

import org.apache.spark.sql.functions._
import graft.ops.TopK

/** The k-bounded fold family: plain top-k, the duplicate-collapsing
  * variant (round 15 — the prescreened-JW dedup lives INSIDE the fold,
  * not in a shuffle), and the bottom-k KMV sampler. */
class TopKSpec extends SparkTestBase {
  import spark.implicits._
  import org.scalacheck.Gen

  /** Seeded property loop (the DistanceSpec idiom — scalatestplus
    * bridge is not in the offline cache). Fewer reps than the scalar
    * kernels: each rep runs Spark jobs. */
  private def forAll[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(4242L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

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

  test("property: groupedTopKDistinct == brute-force top-k of the DISTINCT pair set") {
    val rowsGen = for {
      n <- Gen.choose(1, 80)
      k <- Gen.choose(1, 7)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.choose(0, 9).map(_.toDouble) // narrow range forces ties
        id <- Gen.choose(1L, 25L)             // and exact duplicates
        dup <- Gen.choose(1, 3)               // structural multiplicity
      } yield List.fill(dup)((g, s, id))).map(_.flatten)
    } yield (rows, k)
    forAll(rowsGen) { case (rows, k) =>
      val got = TopK.groupedTopKDistinct(
          rows.toDF("grp", "s", "id").repartition(5),
          Seq("grp"), col("s"), col("id"), k)
        .select("grp", "rnk", "id", "score").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = rows.distinct.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).distinct
          .sortBy { case (s, id) => (-s, id) }.take(k).zipWithIndex
          .map { case ((s, id), i) => (g, i + 1, id, s) }
      }.toSet
      assert(got === want, s"k=$k rows=$rows")
    }
  }

  test("property: BottomKAgg merge law — sample(union) == merge(per-shard samples)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.choose(1, 9)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 1000L), Gen.choose(0L, 50L)))
    } yield (rows, k)
    forAll(gen) { case (rows, k) =>
      import graft.ext.Sketches
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key * 1000 + i, v, (i % 4).toLong) }
        .toDF("id", "v", "shard")
      def canon(s: org.apache.spark.sql.DataFrame) =
        s.select(explode(expr("transform(sample, x -> concat(x.h, ':', x.v))"))
          .as("e")).as[String].collect().toSeq
      val direct = Sketches.kmvSketch(df.withColumn("g", lit(1)), Seq("g"),
        col("id"), col("v"), k = math.max(16, k * 8))
      val merged = Sketches.kmvMergeAgg(
        Sketches.kmvSketch(df, Seq("shard"), col("id"), col("v"),
          k = math.max(16, k * 8)),
        Nil, k = math.max(16, k * 8))
      assert(canon(direct) === canon(merged))
    }
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
