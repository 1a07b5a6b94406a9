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
