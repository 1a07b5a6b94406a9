package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scale-safe GROUPED top-k: the per-group twin of TakeOrderedAndProject.
  *
  * The idiomatic `row_number().over(Window.partitionBy(g).orderBy(s))`
  * funnels EVERY row of a group through one reducer before any can be
  * discarded — a hot group (one query term matching billions of docs, one
  * domain holding half the corpus) becomes a single-partition sort. This
  * operator instead aggregates with a k-BOUNDED buffer: partial (map-side)
  * aggregation reduces every partition's contribution to at most k rows
  * per group BEFORE the exchange, so the shuffle carries ≤ k × partitions
  * rows per group and no reducer ever sorts a group's full row set — the
  * same per-partition-heap economics [[graft.ext.SimSearch.knnBrute]] uses,
  * packaged as a reusable aggregate.
  *
  * Determinism: order is (score DESC, id ASC). Round floating scores
  * upstream (the house rank-stability rule) so engine ulps cannot reorder
  * the boundary.
  */
object TopK {

  /** One scored row: `s` the (already-rounded) score, `id` the tiebreak. */
  case class ScoredId(s: Double, id: Long)

  private val ord: Ordering[ScoredId] =
    Ordering.by((x: ScoredId) => (-x.s, x.id))

  /** Aggregator with a k-bounded sorted buffer. Buffers stay tiny (≤ k),
    * so inserts are cheap and the encoded state is k rows at most — in
    * the partial phase, in the shuffle, and in the final merge. Accepted
    * rows BINARY-insert into the sorted buffer (O(log k) probe + O(k)
    * copy, vs re-sorting the whole buffer per insert — invisible at k=5,
    * measurable at k=1000); a row not beating the current k-th is
    * rejected in O(1). */
  class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    def zero: Seq[ScoredId] = Vector.empty
    private def insertSorted(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
      // lowest index where a orders before b(i) — binary search keeps the
      // buffer sorted without a re-sort; equal elements land after their
      // twins (stable, though (s, id) pairs only tie on exact duplicates)
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(a, b(mid))) hi = mid else lo = mid + 1
      }
      b.patch(lo, Seq(a), 0)
    }
    def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      if (b.size < k) insertSorted(b, a)
      else if (ord.lt(a, b.last)) insertSorted(b.init, a)
      else b
    def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
      (x ++ y).sorted(ord).take(k)
    def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
    def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
  }

  /** One sampled row for the KMV quantile sketch: `h` the pinned row
    * hash (the sampling priority), `v` the long-quantized metric. */
  case class HashedVal(h: Long, v: Long)

  private val hvOrd: Ordering[HashedVal] =
    Ordering.by((x: HashedVal) => (x.h, x.v))

  /** Bottom-k-by-hash buffer — [[TopKAgg]]'s economics (k-bounded
    * partial state, map-side fold before any exchange) with MIN-(h, v)
    * order: the k rows with the smallest pinned hashes form a uniform
    * row sample, which is what makes the sketch EXACTLY mergeable
    * (min-k of a union == min-k of min-k's — no arrival-order state,
    * unlike KLL/t-digest compaction). */
  class BottomKAgg(k: Int) extends Aggregator[HashedVal, Seq[HashedVal], Seq[HashedVal]] {
    require(k >= 1, s"bottom-k needs k >= 1, got $k")
    def zero: Seq[HashedVal] = Vector.empty
    private def insertSorted(b: Seq[HashedVal], a: HashedVal): Seq[HashedVal] = {
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (hvOrd.lt(a, b(mid))) hi = mid else lo = mid + 1
      }
      b.patch(lo, Seq(a), 0)
    }
    def reduce(b: Seq[HashedVal], a: HashedVal): Seq[HashedVal] =
      if (b.size < k) insertSorted(b, a)
      else if (hvOrd.lt(a, b.last)) insertSorted(b.init, a)
      else b
    def merge(x: Seq[HashedVal], y: Seq[HashedVal]): Seq[HashedVal] =
      (x ++ y).sorted(hvOrd).take(k)
    def finish(r: Seq[HashedVal]): Seq[HashedVal] = r
    def bufferEncoder: Encoder[Seq[HashedVal]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
    def outputEncoder: Encoder[Seq[HashedVal]] = bufferEncoder
  }

  /** [[TopKAgg]] with SET semantics on exact (score, id) duplicates: an
    * element already in the buffer is skipped (O(log k) membership probe
    * off the same binary search), and partial-buffer merges dedupe. Use
    * when the input stream carries structural duplicates of identical
    * scored rows (e.g. a candidate pair colliding on several join keys)
    * — the duplicates die inside the k-bounded fold, so no dedup
    * SHUFFLE ever materializes the candidate stream (round 15: this
    * replaced the prescreened-JW array-payload dedup filter, which
    * dragged each posting row's full gram set through the collision
    * join). Output == top-k of the DISTINCT (score, id) set, exactly. */
  class TopKDistinctAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    def zero: Seq[ScoredId] = Vector.empty
    // insertion point; a duplicate sits immediately before it
    private def lowerBound(b: Seq[ScoredId], a: ScoredId): Int = {
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(a, b(mid))) hi = mid else lo = mid + 1
      }
      lo
    }
    private def insertDistinct(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
      val lo = lowerBound(b, a)
      if (lo > 0 && b(lo - 1) == a) b else b.patch(lo, Seq(a), 0)
    }
    def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      if (b.size < k) insertDistinct(b, a)
      else if (ord.lt(a, b.last)) insertDistinct(b, a).take(k)
      else b
    def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
      (x ++ y).distinct.sorted(ord).take(k)
    def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
    def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
  }

  /** One weighted-sample row for the priority-sampling sketch
    * ([[graft.ext.Sketches.wkmvSketch]]): `p` the deterministic
    * priority w/u (DESC order), `id` the tiebreak, `v` the metric,
    * `w` the row's weight — the payload rides INSIDE the k-bounded
    * buffer so no data-sized rejoin is ever needed. */
  case class WRow(p: Double, id: Long, v: Long, w: Long)

  // TOTAL order: (v, w) break the (p, id) tie so that even a
  // contract-violating duplicate id (ids are documented row-unique,
  // like kmvSketch's rowKey) cannot make buffer contents depend on
  // arrival order — the same hazard class the unique-id contract
  // exists for, closed structurally where it is free to close.
  private val wOrd: Ordering[WRow] =
    Ordering.by((x: WRow) => (-x.p, x.id, x.v, x.w))

  /** [[TopKAgg]]'s k-bounded economics for [[WRow]]s: keep the m
    * HIGHEST-priority rows, (p DESC, id ASC). Same exact merge law as
    * the bottom-k sampler (top-m of a union == top-m of top-m's), same
    * map-side partial fold, buffer ≤ m everywhere. */
  class WTopKAgg(m: Int) extends Aggregator[WRow, Seq[WRow], Seq[WRow]] {
    require(m >= 1, s"top-m needs m >= 1, got $m")
    def zero: Seq[WRow] = Vector.empty
    private def insertSorted(b: Seq[WRow], a: WRow): Seq[WRow] = {
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (wOrd.lt(a, b(mid))) hi = mid else lo = mid + 1
      }
      b.patch(lo, Seq(a), 0)
    }
    def reduce(b: Seq[WRow], a: WRow): Seq[WRow] =
      if (b.size < m) insertSorted(b, a)
      else if (wOrd.lt(a, b.last)) insertSorted(b.init, a)
      else b
    def merge(x: Seq[WRow], y: Seq[WRow]): Seq[WRow] =
      (x ++ y).sorted(wOrd).take(m)
    def finish(r: Seq[WRow]): Seq[WRow] = r
    def bufferEncoder: Encoder[Seq[WRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WRow]]()
    def outputEncoder: Encoder[Seq[WRow]] = bufferEncoder
  }

  /** [[groupedTopK]] with duplicate-collapsing [[TopKDistinctAgg]]. */
  def groupedTopKDistinct(df: DataFrame, groupCols: Seq[String], score: Column,
                          id: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new TopKDistinctAgg(k))
    df.filter(score.isNotNull && id.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(score.cast("double"), id.cast("long")).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__p", "__r")): _*)
      .select(groupCols.map(col) :+ (col("__p") + 1).cast("int").as("rnk") :+
        col("__r.id").as("id") :+ col("__r.s").as("score"): _*)
  }

  /** Bottom-k (h, v) pairs per group as one sorted array column `sample`
    * (ascending (h, v)) beside the group's total row count `n`. Null
    * hash/value rows are excluded loudly rather than decoded as zeros. */
  def groupedBottomK(df: DataFrame, groupCols: Seq[String], hash: Column,
                     value: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new BottomKAgg(k))
    df.filter(hash.isNotNull && value.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(hash.cast("long"), value.cast("long")).as("sample"),
        count(lit(1)).as("n"))
  }

  /** Top `k` rows per group: returns (groupCols*, rnk, id, score) with
    * rnk 1-based in (score DESC, id ASC) order. `score` must be rounded
    * upstream; `id` is the Long tiebreak/payload key (join the original
    * row back by id + group downstream if more columns are needed).
    * Null-score/null-id rows are excluded — a null cannot rank, and
    * decoding one into the aggregator's primitive fields would corrupt
    * silently instead of loudly. */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], score: Column,
                  id: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new TopKAgg(k))
    df.filter(score.isNotNull && id.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(score.cast("double"), id.cast("long")).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__p", "__r")): _*)
      .select(groupCols.map(col) :+ (col("__p") + 1).cast("int").as("rnk") :+
        col("__r.id").as("id") :+ col("__r.s").as("score"): _*)
  }
}
