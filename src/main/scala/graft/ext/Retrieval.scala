package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval-infrastructure operators: BM25 relevance scoring and inverted
  * index (postings) materialization — the indexing/search half of a
  * training-data pipeline (contamination lookups, quality-by-query audits,
  * nearest-query corpus slicing).
  *
  * Both operators share the tf/df shape of the TF-IDF family (q50): one
  * partial-agg shuffle for tf, one for df/postings, never a doc×term
  * product. All floating scores round to 6 decimals and aggregate as
  * DECIMAL so sums are order-independent and the DuckDB oracle reproduces
  * every score bit-for-bit.
  */
object Retrieval {

  /** The shared Okapi scoring expression: +1-smoothed idf × the k1/b
    * saturation term, rounded to 6 decimals and cast DECIMAL(20,6) so the
    * downstream per-document sum is order-independent and engine-portable.
    * Expects columns tf, df, dl, n_docs, avgdl in scope. */
  private def contribCol(k1: Double, b: Double): Column =
    round(
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
        col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
      6).cast(DecimalType(20, 6))

  /** Per-(doc, term) contributions from the shared bucketed-count table
    * `agg` = (idCol, term, cnt), where `term` is NULL for the bucket
    * counting a document's NON-query tokens (so `dl` = Σ cnt over all
    * buckets, and the null bucket keeps zero-token docs in n_docs/avgdl).
    *
    * The single-tokenize guarantee lives here: the bucketed-count table
    * is MATERIALIZED once (eager local checkpoint — the plan up to it is
    * a single linear chain with exactly one tokenize), and all four
    * downstream branches (dl, tf, df, corpus stats) read the
    * materialized rows. ReuseExchange cannot do this declaratively:
    * per-branch predicate pushdown and column pruning make each branch's
    * exchange canonically different (measured round 7: the scan+tokenize
    * ran 4x). The table is compact at any corpus scale — one row per
    * (doc, query-term hit) plus at most one per doc. Storage/durability
    * rides the shared [[graft.ops.Materialize]] knob: executor-local
    * blocks by default (right for a re-runnable scoring pass), replicated
    * persist or managed parquet snapshots for long fault-domain jobs
    * (`spark.graft.materialize.mode`). */
  private def scoreTerms(agg: DataFrame, idCol: String,
                         k1: Double, b: Double, hintDf: Boolean): DataFrame = {
    val mat = graft.ops.Materialize.stable(agg, "bm25-terms")
    val dl = mat.groupBy(col(idCol)).agg(sum("cnt").as("dl"))
    val tf = mat.filter(col("term").isNotNull)
      .select(col(idCol), col("term"), col("cnt").as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    tf.join(if (hintDf) broadcast(df_) else df_, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", contribCol(k1, b))
  }

  /** Okapi BM25 (Robertson et al., TREC-3; the Lucene-style +1 smoothed
    * idf: ln(1 + (N - df + 0.5)/(df + 0.5))) of every document against a
    * LITERAL query-term set.
    *
    * Per-term contributions are rounded to 6 decimals and summed as
    * DECIMAL(20,6) — float addition is non-associative, so a double sum's
    * value would depend on aggregation order across partitions; the
    * decimal sum is exact and engine-portable.
    *
    * Shape at scale: each document tokenizes ONCE; tokens bucket into
    * (doc, query-term) counts plus one (doc, NULL) bucket for everything
    * else, so the single tf shuffle carries query-term hits + one row per
    * doc per partition (the doc-length channel) — and every downstream
    * branch (dl, tf, df, stats) reuses that one exchange. df is
    * |query|-bounded and broadcast; the corpus-stats side is 1 row.
    *
    * Returns (idCol, score DECIMAL) for every document containing at
    * least one query term. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    val agg = docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol),
        when(col("__tok").isin(queryTerms: _*), col("__tok")).as("term"))
      .agg(count(col("__tok")).as("cnt"))
    scoreTerms(agg, idCol, k1, b, hintDf = true)
      .groupBy(col(idCol))
      .agg(sum("__contrib").as("score"))
  }

  /** BM25 of every document against a query TABLE — the batch-retrieval
    * form a real audit runs (thousands of contamination lookups or
    * quality-by-query probes in one pass, vs [[bm25]]'s single literal
    * term set).
    *
    * `queries` is (query_id, term), one row per query term; duplicate
    * (query_id, term) rows are collapsed so a sloppy query table cannot
    * double-count a term. Scoring is per (query_id, doc): each document's
    * per-term contribution (identical arithmetic to [[bm25]]) fans out to
    * every query containing that term via one equi-join on term, then sums
    * per query — a term shared by many queries is scored ONCE per document
    * and reused.
    *
    * Shape at scale: each document tokenizes ONCE; the token stream
    * LEFT-joins the distinct-term table UNHINTED (the tf-idf/vocab-join
    * house rule — a thousand-query term table is broadcast-sized and AQE
    * will pick that at runtime, but nothing melts if it isn't), bucketing
    * non-query tokens under a NULL term so the one tf exchange also
    * carries the doc-length channel and every downstream branch reuses
    * it. Top-k per query belongs DOWNSTREAM (partition the rank window by
    * query_id, or groupedTopK). */
  def bm25Queries(docs: DataFrame, idCol: String, textCol: String,
                  queries: DataFrame,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = queries.select(col("query_id"), col("term")).distinct()
    val agg = docs
      .select(col(idCol), explode_outer(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .join(q.select(col("term").as("__qt")).distinct(),
        col("__tok") === col("__qt"), "left")
      .groupBy(col(idCol), col("__qt").as("term"))
      .agg(count(col("__tok")).as("cnt"))
    scoreTerms(agg, idCol, k1, b, hintDf = false)
      .join(q, "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("__contrib").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009): fuse
    * any number of top-k rankings of the same id space into one list by
    * summing 1/(c + rank) per id — the standard glue between lexical
    * (BM25) and vector (kNN) retrieval in hybrid search, using only RANKS,
    * so incomparable score scales never need calibration.
    *
    * Each input is a (idCol, rankCol) table. Contributions round to 6
    * decimals and sum as DECIMAL — order-free, engine-portable (the house
    * float-sum rule). Returns (idCol, rrf_score DECIMAL, n_lists).
    *
    * Shape at scale: a unionByName of k-bounded rank tables + ONE groupBy
    * — the inputs are top-k results (thousands of rows), so this is
    * id-sized work regardless of corpus scale; rank the fused output with
    * orderBy+limit downstream, as everywhere else. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 1, s"rrf constant must be >= 1, got $c")
    rankings.map(r =>
      r.select(col(idCol),
        round(lit(1.0) / (lit(c) + col(rankCol)), 6)
          .cast(DecimalType(10, 6)).as("__rrf")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("__rrf").as("rrf_score"), count(lit(1)).as("n_lists"))
  }

  /** Inverted index: one row per term — document frequency, collection
    * frequency, and the doc_id-sorted postings list (as a comma-joined
    * string plus its md5, the repo's engine-portable array convention).
    * `minDf` drops the hapax tail (at web scale most of the vocabulary),
    * keeping the materialized index dense.
    *
    * Shape at scale: tf's (doc, term) partial-agg shuffle, then ONE
    * groupBy(term) building df/cf/postings together. Postings lists are
    * per-term rows — the natural storage layout for a distributed index;
    * a skew-hot stopword term's row grows with its df unbounded, which is
    * what `maxDf` (minDf's sibling, mirroring Dedup.contamination's
    * maxTrainDf) cuts: when set, a df-only pre-pass drops hot terms
    * BEFORE any postings list is materialized, so no reducer ever
    * assembles a corpus-sized row. The pre-pass costs one extra
    * df-sized aggregation over the tf table (no new scan — tf is one
    * exchange, reused by both consumers); neither cap set keeps the
    * original two-shuffle plan.
    *
    * `maxDfFrac` is the RELATIVE form of the same cap ("drop terms in
    * more than half the corpus"), resolved IN-PLAN against a 1-row
    * broadcast doc count (the maxTrainDfFrac shape, Dedup.contamination)
    * — zero driver-side actions at query-construction time, and the same
    * rule means the same thing at every scale. The cutoff is
    * floor(n_docs · frac), matching integer division of an absolute
    * count. Pass at most one of maxDf / maxDfFrac. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L, maxDf: Option[Long] = None,
                    maxDfFrac: Option[Double] = None): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDf.isEmpty || maxDfFrac.isEmpty,
      "pass at most one of maxDf / maxDfFrac")
    maxDf.foreach(m => require(m >= minDf, s"maxDf $m must be >= minDf $minDf"))
    maxDfFrac.foreach(f => require(f > 0 && f <= 1,
      s"maxDfFrac must be in (0, 1], got $f"))
    // with a df ceiling the tf stream feeds TWO branches (df pre-pass +
    // semi-joined postings side) — the r16 multi-consumer lens flags it,
    // but materializing was MEASURED A WASH (q91 sf1 3.04 → 3.20s,
    // sf0.1 flat; VERDICT r16 #5 sweep): the branch recompute is one
    // tokenize map-pass while the checkpoint writes the corpus-row-sized
    // tf stream, and the groupBy(term) shuffles dominate either way.
    // Left lazy deliberately — the sweep rule is measure-then-decide,
    // not materialize-everything.
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // df-only pre-pass: count postings per term WITHOUT collecting
    // them, keep survivors via a semi join on term (unhinted — the
    // surviving vocabulary is usually broadcast-sized, AQE decides).
    val kept = (maxDf, maxDfFrac) match {
      case (None, None) => tf
      case (Some(m), _) =>
        val ok = tf.groupBy("term").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= m).select("term")
        tf.join(ok, Seq("term"), "left_semi")
      case (_, Some(frac)) =>
        val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
        val ok = tf.groupBy("term").agg(count(lit(1)).as("__df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("__df") <= floor(col("__n_docs") * frac))
          .select("term")
        tf.join(ok, Seq("term"), "left_semi")
    }
    kept.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        array_join(transform(array_sort(collect_list(col(idCol))),
          _.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        md5(col("postings")).as("postings_md5"))
  }

  /** MERGEABLE index segment over a document batch: per term — df, cf,
    * and the (doc, tf)-struct postings array sorted by doc — the raw form
    * [[invertedIndex]] summarizes into an md5. Build one segment per
    * ingest batch/day/shard and combine with [[mergeSegments]]: the
    * build-once/maintain-incrementally economics of the persisted IVF
    * index and the HLL register tables, applied to lexical retrieval
    * (Lucene's segment model, re-expressed relationally). Segments'
    * doc-id spaces must be DISJOINT (a re-ingested doc is the caller's
    * upstream dedup problem — [[graft.streaming.StreamOps.dedupScreenStream]]
    * is the gate).
    *
    * Shape at scale: identical to [[invertedIndex]] — tf partial-agg
    * shuffle + one groupBy(term); per-term rows grow with df, so apply
    * the same maxDf discipline before materializing hot terms. */
  def indexSegment(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        array_sort(collect_list(struct(col("doc"), col("tf")))).as("postings"))

  /** Merge index segments: df/cf ADD, postings arrays concatenate and
    * re-sort — over disjoint doc spaces, merge(segment(A), segment(B)) ==
    * segment(A ++ B) EXACTLY (spec-pinned; q102's oracle REBUILDS from
    * scratch and hash-matches the merge). One groupBy(term) over
    * segment-term rows; per-term state is the term's total df — the same
    * bounded-by-maxDf-discipline row the one-shot index builds. */
  def mergeSegments(segs: Seq[DataFrame]): DataFrame = {
    require(segs.nonEmpty, "mergeSegments needs at least one segment")
    segs.reduce(_ unionByName _)
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        array_sort(flatten(collect_list(col("postings")))).as("postings"))
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel 2010) between
    * two top-`depth` rankings per query, at persistence p = 1/2:
    * RBO = Σ_{d=1..depth} (1−p)·p^(d−1) · |A_d ∩ B_d| / d, i.e. each
    * depth's prefix-overlap fraction weighted 2^−d — the standard
    * "how much do two rankers agree, top-weighted" number for comparing
    * scoring functions (identical rankings score 1 − 2^−depth; the
    * truncated tail mass is the documented remainder).
    *
    * Exactness: p = 1/2 makes every weight dyadic, so a term is ONE
    * double division of exact integers (overlap / (d·2^d), both ≤ 2^63
    * and the product exact in double for depth ≤ 50), rounded to 6 dp,
    * then summed as DECIMAL — order-free and engine-identical (the PSI
    * rounded-term rule). Shape at scale: the rankings join on
    * (query, id) — each side is ≤ depth rows per query, so the join,
    * the d-explode (≤ depth fan-out), and the (query, d) fold are all
    * ranking-sized, never corpus-sized. Queries whose rankings share NO
    * documents emit no row (overlap 0 everywhere) — outer-join a query
    * list downstream if silence must be visible. Both inputs must rank
    * 1..depth with a deterministic tiebreak (the groupedTopK contract);
    * `rankCol` values beyond `depth` are filtered here. */
  def rboTruncated(a: DataFrame, b: DataFrame, queryCol: String,
                   idCol: String, rankCol: String, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 50,
      s"rboTruncated needs 1 <= depth <= 50, got $depth")
    val joined = a.select(col(queryCol), col(idCol), col(rankCol).as("__ra"))
      .join(b.select(col(queryCol), col(idCol), col(rankCol).as("__rb")),
        Seq(queryCol, idCol))
      .withColumn("__m", greatest(col("__ra"), col("__rb")).cast("int"))
      .filter(col("__m") <= depth)
      .withColumn("__d", explode(sequence(col("__m"), lit(depth))))
    joined.groupBy(col(queryCol), col("__d"))
      .agg(count(lit(1)).as("__ov"))
      .withColumn("__term", TextAnalysis.round6Portable(
        col("__ov").cast("double") /
          (col("__d").cast("double") * pow(lit(2.0), col("__d").cast("double")))))
      .groupBy(col(queryCol))
      .agg(sum(col("__term").cast("decimal(24,6)")).cast("double").as("rbo"),
        coalesce(max(when(col("__d") === depth, col("__ov"))), lit(0L))
          .as(s"overlap_$depth"))
  }

  /** Graded ranking-quality metrics — nDCG@k and MRR@k, the numbers a
    * retrieval eval harness reports next to [[SimSearch.recallAtK]]'s
    * set recall. `ranked` is any ranking (query_id, rnk 1-based,
    * doc_id); `gains` holds integer relevance grades (query_id, doc_id,
    * gain ≥ 0) — docs absent from `gains` count as gain 0.
    *
    * DCG = Σ gain_i/log2(i+1) over the top k; IDCG re-ranks the QUERY'S
    * OWN gains descending (ties by doc_id) — so nDCG = 1 means "the
    * ranking ordered the graded docs perfectly", independent of scale.
    * MRR = 1/(first rank with gain > 0), 0 when none surfaces.
    * Portability: each DCG term rounds at 6 dp then sums as DECIMAL
    * (the PSI/entropy ln rule — log2 is the one non-exact op); the
    * final nDCG is ONE division, MRR one reciprocal, both 6-dp. Shape:
    * metrics are ranking-sized (≤ k rows per query per side); the IDCG
    * window partitions per query over the graded docs. A query with
    * zero graded docs reports null ndcg (0/0), not 1. */
  def rankMetrics(ranked: DataFrame, gains: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"rankMetrics needs k >= 1, got $k")
    val ln2 = 0.6931471805599453
    def dcgTerm(g: Column, pos: Column): Column =
      TextAnalysis.round6Portable(
        g.cast("double") / (log(pos.cast("double") + 1.0) / ln2))
        .cast(DecimalType(24, 6))
    val topK = ranked.filter(col("rnk") <= k)
      .join(gains, Seq("query_id", "doc_id"), "left")
      .withColumn("__g", coalesce(col("gain"), lit(0L)))
    val dcg = topK
      .groupBy("query_id")
      .agg(sum(dcgTerm(col("__g"), col("rnk"))).cast("double").as("dcg"),
        min(when(col("__g") > 0, col("rnk"))).as("__first"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("gain").desc, col("doc_id"))
    val idcg = gains.filter(col("gain") > 0)
      .withColumn("__i", row_number().over(iw))
      .filter(col("__i") <= k)
      .groupBy("query_id")
      .agg(sum(dcgTerm(col("gain"), col("__i"))).cast("double").as("idcg"),
        count(lit(1)).as("n_rel"))
    dcg.join(idcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        TextAnalysis.round6Portable(col("dcg")).as("dcg"),
        TextAnalysis.round6Portable(col("idcg")).as("idcg"),
        when(col("idcg") > 0.0, TextAnalysis.round6Portable(
          col("dcg") / col("idcg"))).as("ndcg"),
        coalesce(TextAnalysis.round6Portable(
          lit(1.0) / col("__first")), lit(0.0)).as("mrr"))
  }
}
