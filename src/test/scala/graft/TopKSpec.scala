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

  test("property: kmvMergeAgg refold == flatten+sort+slice collect reference (VERDICT r15 #2)") {
    // the k-bounded BottomKAgg refold must be VALUE-identical to the
    // old collect_list(sample) -> flatten -> sort -> slice formulation
    // (the merge law is exactly why), keyed and total — only the merge
    // STATE changed (≤ k per partial buffer vs O(#sketches·k) on one
    // reducer)
    import graft.ext.Sketches
    val gen = for {
      n <- Gen.choose(1, 60)
      k <- Gen.oneOf(16, 20, 32)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 1000L), Gen.choose(0L, 50L)))
    } yield (rows, k)
    forAll(gen, n = 8) { case (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key * 1000 + i, v, (i % 5).toLong, i % 2) }
        .toDF("id", "v", "shard", "parity")
      val shards = Sketches.kmvSketch(df, Seq("parity", "shard"),
        col("id"), col("v"), k = k)
      def reference(keys: Seq[String]) = {
        val g = if (keys.isEmpty) shards.groupBy() else shards.groupBy(keys.map(col): _*)
        g.agg(slice(array_sort(flatten(collect_list(col("sample")))), 1, k)
          .as("sample"), sum("n").as("n"))
      }
      def canon(s: org.apache.spark.sql.DataFrame, keys: Seq[String]) =
        s.select((keys.map(col) :+ col("n") :+
            expr("array_join(transform(sample, x -> concat(x.h, ':', x.v)), ',')")
              .as("sm")): _*)
          .collect().map(_.toSeq.map(String.valueOf)).toSet
      // keyed merge (shards fold away, parity survives) and total merge
      Seq(Seq("parity"), Nil).foreach { keys =>
        assert(canon(Sketches.kmvMergeAgg(shards, keys, k), keys) ===
          canon(reference(keys), keys), s"keys=$keys k=$k")
      }
    }
  }

  test("TopKDistinctAgg: boundary duplicates at a FULL buffer (VERDICT r15 #3 spec-pin)") {
    val agg = new TopK.TopKDistinctAgg(3)
    def sid(s: Double, id: Long) = TopK.ScoredId(s, id)
    val full = Seq(sid(9, 1), sid(7, 2), sid(5, 3))
      .foldLeft(agg.zero)(agg.reduce)
    assert(full.map(x => (x.s, x.id)) === Seq((9.0, 1L), (7.0, 2L), (5.0, 3L)))
    // duplicate of the k-th (boundary) element: not lt(last) -> rejected,
    // buffer unchanged — the element is already present exactly once
    assert(agg.reduce(full, sid(5, 3)) === full)
    // duplicate of an interior element: admitted by the lt(last) gate,
    // then the O(log k) membership probe drops it — buffer unchanged
    assert(agg.reduce(full, sid(7, 2)) === full)
    // a NEW element tying the boundary SCORE with a larger id orders
    // after the boundary row -> rejected (ties keep smallest ids)...
    assert(agg.reduce(full, sid(5, 9)) === full)
    // ...and with a smaller id orders before it -> evicts the old k-th
    assert(agg.reduce(full, sid(5, 0)).map(x => (x.s, x.id)) ===
      Seq((9.0, 1L), (7.0, 2L), (5.0, 0L)))
    // merge with overlapping buffers dedupes before the take(k)
    assert(agg.merge(full, full) === full)
    assert(agg.merge(full, Seq(sid(8, 7))).map(x => (x.s, x.id)) ===
      Seq((9.0, 1L), (8.0, 7L), (7.0, 2L)))
  }

  test("WTopKAgg property: any reduce/merge split order == sort-take-m reference") {
    import org.scalacheck.Gen
    // low-cardinality priorities force boundary ties; ids unique
    val rowGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 9).map(_.toDouble),
      Gen.choose(1L, 50L), Gen.choose(1L, 9L)))
    val agg = new TopK.WTopKAgg(5)
    forAll(rowGen, n = 20) { triples =>
      val rows = triples.zipWithIndex.map { case ((p, v, w), i) =>
        TopK.WRow(p, i.toLong, v, w) }
      val want = rows.sortBy(x => (-x.p, x.id)).take(5)
      val cut = (rows.hashCode.abs % (rows.size max 1)) max 1
      val got = rows.grouped(cut).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(got) === want, s"split=$cut")
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
