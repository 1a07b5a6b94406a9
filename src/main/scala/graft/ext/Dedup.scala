package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Guards

/** Deduplication family for training-data pipelines:
  *
  *   - exact:       hash-groupBy on the dedup key (one shuffle, partial aggs)
  *   - MinHash+LSH: shingle -> minhash signature -> banded bucket join ->
  *                  exact-Jaccard verification of candidates only
  *   - SimHash:     64-bit-ish (60-bit) weighted bit-vote signature
  *   - n-gram Jaccard: exact set similarity via shingle equi-join (blocked)
  *
  * Scale shape: every pairwise step is an EQUI-join (band bucket, shingle,
  * block key) — never a cross join — so Catalyst plans shuffled hash /
  * sort-merge joins that scale horizontally. The signature computations are
  * map-side (groupBy with partial aggregation on the doc key).
  *
  * All hashes are the portable md5-based [[TextAnalysis.h60]] so the DuckDB
  * oracle reproduces results bit-for-bit.
  */
object Dedup {

  /** Exact dedup: representative (min id) + multiplicity per key. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  // ---- MinHash + LSH ----

  /** Banding constants live with the codegen kernel
    * ([[graft.functions.TextKernels.Minhash]] — the single source of
    * truth); re-exported here for the oracle-SQL generator and the
    * aggregation formulation. P = 2^31 - 1; all arithmetic < 2^62. */
  val P: Long = graft.functions.TextKernels.Minhash.P
  val minhashCoeffs: Seq[(Long, Long)] = graft.functions.TextKernels.Minhash.coeffs
  val bands: Int = graft.functions.TextKernels.Minhash.bands
  val rowsPerBand: Int = graft.functions.TextKernels.Minhash.rowsPerBand

  /** (doc_id, sh): distinct k-token shingles per document. Dedup happens
    * per-row INSIDE the shingle kernel ([[graft.functions.TextKernels]]) —
    * shingle sets live inside their document row, so a cross-partition
    * `distinct()` (full shuffle of every shingle) would buy nothing, and the
    * fused codegen expression beats the interpreted HOF chain ~50x. */
  def shingled(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    // spread BEFORE the shingle kernel (round 18, opt guide §2.5/§6): a
    // small doc table is one scan split, so the fused tokenize+shingle
    // explode — the expensive part — ran on one core (q120's three
    // passes measured 2.7s/1 task each). No-op on multi-split inputs.
    graft.ops.Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      explode(graft.functions.TextExprs.distinctShingles(col(textCol), k)).as("sh"))

  /** Wide minhash signatures: (doc_id, sig_0 .. sig_15). All 16 permutation
    * minima are computed as parallel `min` aggregates in ONE groupBy(doc_id)
    * — map-side partial aggregation shrinks each task to |docs| rows before
    * the only shuffle. (An earlier shape exploded a 16-row coefficient table
    * per shingle and shuffled (doc, i) pairs — 16x the shuffle volume.) */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("hm") + lit(b)) % P).as(s"sig_$i")
    }
    sh.withColumn("hm", TextAnalysis.h60(col("sh")) % P)
      .groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band, band_key): md5 over the band's sigs in signature-index
    * order. Band j holds signatures {j, j+bands, j+2·bands, ...} (i % bands
    * == j), matching the oracle's GROUP BY i % bands with ORDER BY i. */
  def bandKeys(sigsWide: DataFrame): DataFrame = {
    val bandStructs = (0 until bands).map { j =>
      val sigCols = (0 until rowsPerBand).map(r => col(s"sig_${j + bands * r}").cast("string"))
      struct(lit(j).as("band"), md5(concat_ws(",", sigCols: _*)).as("band_key"))
    }
    sigsWide.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_key").as("band_key"))
  }

  /** (doc_id, band, band_key) straight from text in ONE map-only pass —
    * the codegen'd [[graft.functions.TextExprs.minhashBandKeys]] kernel
    * fuses shingle enumeration, hm hashing, the 16 signature minima, and
    * the per-band md5 inside each document's row, so the LSH keying
    * stage moves NOTHING (the aggregation formulation
    * [[minhashSignatures]]+[[bandKeys]] pays a doc-keyed shuffle; the
    * equivalence is property-tested). Sub-k-token docs yield no rows,
    * matching the aggregation form. */
  def bandKeysDirect(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(graft.functions.TextExprs.minhashBandKeys(col(textCol), k))
        .as(Seq("band", "band_key")))

  /** Candidate pairs: same band bucket, doc_a < doc_b, distinct.
    *
    * Buckets larger than `maxBucket` are skipped — the skew guard for the
    * self-join: a degenerate bucket of B docs (boilerplate/empty-text
    * swarms at corpus scale) would emit B^2/2 pairs on one shuffle
    * partition. Everything in such a bucket shares a full signature band,
    * i.e. is a near-certain duplicate cluster — handle those with exact
    * dedup ON the band key rather than pairwise scoring. No test-data
    * bucket approaches the default cap, so results are unchanged at
    * harness scale (and the oracle applies the same cap). */
  /** Drop band buckets larger than `maxBucket` — the self/cross-join skew
    * guard (see [[candidatePairs]]). */
  private def capBuckets(bandKeyDf: DataFrame, maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")
    bandKeyDf.withColumn("bucket_n", count(lit(1)).over(w))
      .filter(col("bucket_n") <= maxBucket)
  }

  /** The self-join's two branches would each re-run the whole signature
    * pipeline (Catalyst has no cross-branch common-subexpression reuse),
    * so the capped band-key table — SIGNATURE-sized: bands x |docs| rows,
    * never corpus-text-sized, safe to persist at any scale — is cached for
    * the join. The handle goes to `onCache` for explicit release (the topK
    * pattern); harnesses that construct queries fresh per run can
    * `spark.catalog.clearCache()` between runs instead. */
  def candidatePairs(bandKeyDf: DataFrame, maxBucket: Int = 1000,
                     onCache: DataFrame => Unit = _ => ()): DataFrame = {
    val capped = capBuckets(bandKeyDf, maxBucket).persist()
    onCache(capped)
    val a = capped.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
    val b = capped.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard over shingle sets, computed ONLY for the given pairs via
    * shingle equi-joins (never materializes the cross product). */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairs.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** Per-SOURCE minhash signatures by MERGING the per-doc signatures —
    * the minhash-as-mergeable-sketch law (Broder 1997): min over a UNION
    * of sets equals the min of the per-set minima, so a source's
    * signature folds from its documents' signatures without ever
    * rebuilding the union shingle set. That is what makes the signature
    * a sketch a 100 TB pipeline can maintain incrementally: per-shard /
    * per-day doc signatures merge by 16 MIN aggregates (one partial-agg
    * shuffle on the source key, |sources|·16 longs of state), and the
    * oracle proves the law by recomputing each source's signature
    * DIRECTLY from its union of distinct shingles — the two paths must
    * agree bit-for-bit. */
  def sourceSignatures(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String): DataFrame = {
    val docSigs = minhashSignatures(
      shingled(docs, idCol, textCol))
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")), "doc_id")
    val aggs = minhashCoeffs.indices.map(i => min(s"sig_$i").as(s"sig_$i"))
    docSigs.groupBy("source").agg(aggs.head, aggs.tail: _*)
  }

  /** Source-to-source similarity from merged signatures + exact truth:
    * for every source pair, the signature-agreement estimate of corpus
    * Jaccard (fraction of the 16 seeds whose merged minima coincide —
    * the classic minhash estimator, resolution 1/16) next to the EXACT
    * shingle-union Jaccard computed by equi-joining the distinct
    * (source, shingle) sets. The pairing is a crossJoin of the
    * |sources|-row signature table against itself — sources are a
    * BOUNDED dimension (like k-means centroids), so the product is
    * metadata-sized no matter the corpus; the corpus-sized work (shingle
    * join, signature fold) is all equi-keyed. Output per pair:
    * (src_a, src_b, n_seed_eq, est_jaccard, jaccard) — the drift audit
    * that says which sources overlap before any doc-level dedup runs. */
  def sourceSimilarity(docs: DataFrame, idCol: String, textCol: String,
                       srcCol: String): DataFrame = {
    val sigs = sourceSignatures(docs, idCol, textCol, srcCol)
    val a = sigs.toDF(sigs.columns.map(c => if (c == "source") "src_a" else s"a_$c"): _*)
    val b = sigs.toDF(sigs.columns.map(c => if (c == "source") "src_b" else s"b_$c"): _*)
    val nEq = minhashCoeffs.indices
      .map(i => when(col(s"a_sig_$i") === col(s"b_sig_$i"), 1).otherwise(0))
      .reduce(_ + _)
    val est = a.crossJoin(broadcast(b)).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), nEq.cast("long").as("n_seed_eq"))
    // (source, shingle) distinct sets feed sizes + both sides of the
    // intersection join — materialize once so the corpus shingle pass
    // and the distinct shuffle run in ONE job (round 16)
    val srcSh = graft.ops.Materialize.stable(
      shingled(docs, idCol, textCol)
        .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")), "doc_id")
        .select("source", "sh").distinct(),
      "source-shingles")
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = srcSh.select(col("source").as("src_a"), col("sh"))
      .join(srcSh.select(col("source").as("src_b"), col("sh")), "sh")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_inter"))
    est.join(inter, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("n_inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_seed_eq"),
        TextAnalysis.round6Portable(col("n_seed_eq").cast("double") /
          minhashCoeffs.size).as("est_jaccard"),
        TextAnalysis.round6Portable(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidate pairs with verified
    * Jaccard >= minJaccard. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 minJaccard: Double = 0.5,
                 onCache: DataFrame => Unit = _ => ()): DataFrame = {
    // verifyJaccard consumes the shingle stream three times (sizes +
    // both pair sides) — one materialized pass instead of three
    // (round 16; storage = one shingle-stream copy on executor-local
    // blocks, vs re-running the tokenize/shingle kernel per branch,
    // which the isolated bench measured as the dominant cost)
    val sh = graft.ops.Materialize.stable(
      shingled(docs, idCol, textCol), "lsh-shingles")
    val pairs = candidatePairs(bandKeysDirect(docs, idCol, textCol), onCache = onCache)
    verifyJaccard(pairs, sh).filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-corpus (INCREMENTAL) MinHash near-dup: (new doc, corpus doc)
    * pairs with verified Jaccard >= minJaccard — the operation a rolling
    * pipeline runs per batch: dedup TODAY'S crawl against the standing
    * corpus WITHOUT ever self-joining the corpus (that regime is
    * [[minhashLsh]] on the corpus itself). Both sides run the same
    * signature/band kernel; candidates come from an equi-join of the new
    * batch's band keys against the corpus's — never new × corpus — with
    * the bucket skew cap applied per side; exact-Jaccard verification
    * touches candidate pairs only. Incremental cost ∝ new-batch shingles +
    * collided buckets, independent of the corpus's internal similarity.
    * Output: (doc_a = new id, doc_b = corpus id, jaccard). */
  def minhashLshAgainst(newDocs: DataFrame, corpus: DataFrame, idCol: String,
                        textCol: String, minJaccard: Double = 0.5,
                        maxBucket: Int = 1000): DataFrame = {
    // each side's shingle stream feeds its size table + a pair-side
    // join — materialize each once (round 16)
    val shN = graft.ops.Materialize.stable(
      shingled(newDocs, idCol, textCol), "lsh-against-new")
    val shC = graft.ops.Materialize.stable(
      shingled(corpus, idCol, textCol), "lsh-against-corpus")
    val bkN = capBuckets(bandKeysDirect(newDocs, idCol, textCol), maxBucket)
    val bkC = capBuckets(bandKeysDirect(corpus, idCol, textCol), maxBucket)
    val cand = bkN.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      .join(bkC.select(col("doc_id").as("doc_b"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select("doc_a", "doc_b").distinct()
    val inter = cand
      .join(shN.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(shC.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    cand.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(shN.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
        .withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(shC.groupBy("doc_id").agg(count(lit(1)).as("n_b"))
        .withColumnRenamed("doc_id", "doc_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----

  /** 60-bit simhash: per bit, a weighted vote over token occurrences (weight
    * = term frequency); bit set iff the vote is positive.
    *
    * ZERO shuffle: the whole signature is one codegen'd kernel call per
    * document ([[graft.functions.TextExprs.simhash60]] — tokenize, h60,
    * 60 ±1 vote counters, sign readout in a single pass). The lineage of
    * cheaper shapes: a 60-row bit-index explode (60x rows through a
    * (doc, i) shuffle), then 60 parallel vote sums in one groupBy(doc_id)
    * (token stream stays local, 60 partial sums per doc per partition
    * shuffle) — this one moves NOTHING; summing ±1 per token OCCURRENCE
    * is algebraically identical to the tf-weighted vote (Σ_tok tf·bit ==
    * Σ_occurrence bit). Docs with no tokens produce no row (the kernel
    * returns null; the aggregation forms dropped them the same way). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.TextExprs.simhash60(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** Near-dup pairs by simhash hamming distance, found WITHOUT a cross
    * join: the 60-bit signature splits into `maxHamming + 1` bands
    * (pigeonhole: hamming <= maxHamming forces at least one identical
    * band), candidates come from a band equi-join, and the exact
    * `bit_count(xor)` check runs only on candidates. Standard Manku/Jain/
    * Sarma near-duplicate detection shape; every join is an equi-join, so
    * the plan scales horizontally. */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3,
                     onCache: DataFrame => Unit = _ => ()): DataFrame = {
    val nBands = maxHamming + 1
    val bandW = 60 / nBands
    val mask = (1L << bandW) - 1
    val sig = simhash(docs, idCol, textCol)
    // Persisted for the same reason as candidatePairs: both self-join
    // branches would otherwise recompute the full simhash pipeline (two
    // groupBys over every token). Signature-sized: nBands rows per doc.
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until nBands).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * bandW).bitwiseAND(lit(mask)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band"), col("b.band_val"))
      .persist()
    onCache(banded)
    val cand = banded
      .select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"), col("band"), col("band_val"))
      .join(banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
        col("band"), col("band_val")), Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
    cand
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---- cluster formation: pairs -> connected components ----

  /** Duplicate-pair sets become actionable only as CLUSTERS: "which rows do
    * I drop" needs one representative per connected component (keep min id,
    * SURVEY.md §7.5). Input: undirected duplicate pairs (`aCol`, `bCol`).
    * Output: one row per node that appears in any pair —
    * (doc_id, cluster_rep) with cluster_rep = min id of the component.
    *
    * Distributed min-label propagation with path compression (the
    * alternating-join shape of Kiveris et al.'s MapReduce connected
    * components, without GraphX):
    *
    *   rep(v) := v
    *   repeat:  rep(v) := min over {rep(v)} ∪ {rep(u) : (v,u) ∈ E}   (spread)
    *            rep(v) := rep(rep(v))                                 (hop)
    *
    * Each round is two equi-joins + one groupBy — all shuffle-partitionable,
    * no broadcast of anything proportional to the corpus. The compression
    * hop gives O(log n) rounds on long paths instead of O(diameter); near-dup
    * graphs (small dense clusters) typically converge in 2-3 rounds.
    *
    * Lineage is truncated (eagerly checkpointed) after candidate generation
    * and per round — without that, round k's plan would re-run the upstream
    * pair generation (LSH pipelines) k times. By default this is
    * `localCheckpoint` (executor-local blocks — fast, but lost with an
    * executor); pass `checkpointDir` to make every truncation a MANAGED
    * reliable snapshot: each round writes parquet under that directory
    * (HDFS/object store on a real cluster) and deletes the previous round's
    * file once the new one is readable, so a long run holds at most two
    * label snapshots plus the edge set — unlike `df.checkpoint()`, which
    * both globally mutates the SparkContext checkpoint dir and leaks one
    * snapshot per round (the ContextCleaner only removes checkpoint files
    * under `spark.cleaner.referenceTracking.cleanCheckpoints=true`, default
    * off). The FINAL round's file backs the returned DataFrame and stays on
    * disk; the caller owns deleting the directory once done with the
    * result. Give each concurrent run its own directory. Local single-JVM
    * results are identical either way.
    *
    * Job economics (this loop used to be HALF the dedup-chain cost, more
    * than the three LSH channels it consumes). A loop with data-dependent
    * termination pays at least one ACTION per round, and on both local mode
    * and a busy cluster the per-job constant (scheduling, snapshot write)
    * dominates label-sized work — so the design minimizes ROUNDS and packs
    * each round into ONE job:
    *
    *   - a graph whose symmetric edge set fits the `maxDriverEdges` cap
    *     (known exactly from a free observed metric on the edge snapshot)
    *     skips the loop entirely: exact min-id union-find on the driver,
    *     the same runtime demotion AQE applies to exchanges. Driver state
    *     is bounded by the cap, never the corpus;
    *
    *   - the convergence probe — the exact decimal sum of reps, which
    *     strictly decreases until fixpoint — rides the truncation action as
    *     an `observe` metric, so no round pays a second pass over the
    *     labels;
    *   - symmetrization explodes each pair into both directions in a
    *     single pass (no self-referencing union, hence no temporary edge
    *     cache);
    *   - each round applies the compression hop `hopsPerRound` times
    *     (pointer doubling: rep -> rep(rep) squares the compression each
    *     application), so a path of length L converges in
    *     ~log2(L)/hopsPerRound rounds instead of ~log2(L). The extra hops
    *     are label-sized self-joins INSIDE the round's one job — far
    *     cheaper than the rounds they replace. Intermediates are cached
    *     across their self-join's two branches and released as soon as the
    *     round's snapshot is readable.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 50,
                          checkpointDir: Option[String] = None,
                          hopsPerRound: Int = 1,
                          maxBroadcastNodes: Long = Guards.MaxBroadcastRows,
                          maxDriverEdges: Long = Guards.MaxBroadcastRows): DataFrame = {
    require(hopsPerRound >= 1, s"hopsPerRound must be >= 1, got $hopsPerRound")
    val spark = pairs.sparkSession
    def write(df: DataFrame, name: String): DataFrame = {
      val path = s"${checkpointDir.get}/$name"
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    def delete(name: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(s"${checkpointDir.get}/$name")
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    var labelStep = 0
    // localCheckpoint TRUNCATES LINEAGE BUT NOT STATS: the LogicalRDD it
    // produces carries the origin plan's estimated sizeInBytes forward.
    // Under an iterative self-join that estimate SQUARES per hop, so after
    // r rounds of h hops the optimizer is multiplying 2^(64·2^(h·r))-scale
    // BigInts — planning time explodes doubly-exponentially (observed: the
    // driver wedged for minutes inside BigInteger.multiply by round ~4).
    // Rebuilding over the checkpointed RDD resets the estimate each round;
    // the price is one Row<->InternalRow conversion over the label rows
    // (two longs — linear, partition-parallel, noise next to the joins).
    // The parquet mode needs none of this: file-backed reads carry honest
    // file-size stats.
    //
    // The reset has a second effect the join hints below repair: the
    // rebuilt LogicalRDD reports the DEFAULT (huge) sizeInBytes, so
    // stats-driven broadcast selection is off the table for the label
    // side and every per-round join would degrade to a shuffle join even
    // on a 1000-node graph (measured 1.6x the whole call). The node
    // count — exact and free, observed on the init snapshot — restores
    // the choice without stats: labels are explicitly broadcast below
    // maxBroadcastNodes, unhinted (scale-safe shuffle join) above.
    def resetStats(ck: DataFrame): DataFrame =
      spark.createDataFrame(ck.rdd, ck.schema)
    // Truncate lineage AND return the convergence metrics from the same
    // action: rep sum and node count are collected as observed metrics
    // during the snapshot's materialization (localCheckpoint and
    // parquet-write actions both report observed metrics), so no round
    // pays a second pass over the labels. Sum is null for an empty label
    // set.
    def truncate(df: DataFrame): (DataFrame, java.math.BigDecimal, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val observed = df.observe(obs,
        sum(col("rep").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
        count(lit(1)).as("n"))
      val out = checkpointDir match {
        case None => resetStats(observed.localCheckpoint())
        case Some(_) =>
          val o = write(observed, s"graft-cc-labels-$labelStep")
          if (labelStep > 0) delete(s"graft-cc-labels-${labelStep - 1}")
          o
      }
      labelStep += 1
      (out, obs.get("s").asInstanceOf[java.math.BigDecimal],
        obs.get("n").asInstanceOf[Long])
    }
    // Symmetrize in ONE pass over the pair pipeline: each edge explodes
    // into both directions, so the plan never references the (expensive)
    // upstream pair generation twice and needs no temporary persist.
    // The edge set is joined EVERY round, so it gets its own snapshot,
    // deleted only after the loop (the rolling label delete must not
    // touch it).
    val symPlan = pairs
      .select(explode(array(
        struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
        struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    val edgeObs = org.apache.spark.sql.Observation()
    val symObserved = symPlan.observe(edgeObs, count(lit(1)).as("n"))
    val sym =
      if (checkpointDir.isDefined) write(symObserved, "graft-cc-edges")
      else resetStats(symObserved.localCheckpoint())
    val nEdges = edgeObs.get("n").asInstanceOf[Long]

    // Runtime strategy switch, same spirit as AQE demoting an exchange:
    // the symmetric edge count is known exactly (and free — it rode the
    // snapshot action), so a graph that provably fits in driver memory
    // skips the iterative loop entirely and runs exact union-find locally.
    // Driver state is bounded by the explicit cap, never by corpus size;
    // above the cap the distributed loop below is the plan. Results are
    // identical: both compute rep = min node id per component over the
    // nodes appearing in any pair.
    if (nEdges <= maxDriverEdges) {
      val parent = new java.util.HashMap[Long, java.lang.Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r).longValue != r) r = parent.get(r).longValue
        var c = x // path compression
        while (parent.get(c).longValue != r) {
          val nx = parent.get(c).longValue; parent.put(c, r); c = nx
        }
        r
      }
      val rows = sym.toLocalIterator()
      while (rows.hasNext) {
        val row = rows.next()
        val a = row.getLong(0)
        val b = row.getLong(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a)
        val rb = find(b)
        // union by MIN id keeps the invariant rep == min of component
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val out = new Array[(Long, Long)](parent.size())
      var i = 0
      val it = parent.keySet().iterator()
      while (it.hasNext) { val n = it.next(); out(i) = (n, find(n)); i += 1 }
      if (checkpointDir.isDefined) delete("graft-cc-edges")
      import spark.implicits._
      return spark.createDataset(out.toIndexedSeq)
        .toDF("doc_id", "cluster_rep")
    }

    // Initialization already performs the first spread — rep(v) = min over
    // {v} ∪ N(v) is one groupBy over the symmetric edges — so star-shaped
    // near-dup clusters start fully converged and the loop only confirms.
    var (labels, prevSum, nNodes) = truncate(sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("node"), least(col("src"), col("mn")).as("rep")))
    var done = prevSum == null
    var iter = 0
    // The node set is invariant across rounds (every step preserves one
    // row per node), so ONE observed count decides every round's join
    // strategy: broadcast the label-sized build side of both per-round
    // joins when the whole label table is provably small, leave the join
    // unhinted (shuffle join — the correct plan for a billion-node graph)
    // otherwise.
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (nNodes <= maxBroadcastNodes) broadcast(df) else df
    // hop: rep(v) -> rep(rep(v)); every rep value is itself a node, so the
    // inner self-join preserves all rows.
    def hop(df: DataFrame): DataFrame = df
      .join(maybeBroadcast(df.select(col("node").as("rep"), col("rep").as("rep2"))), "rep")
      .select(col("node"), col("rep2").as("rep"))
    while (!done && iter < maxIter) {
      // spread: min rep over self and neighbors. Every intermediate below
      // is cached because its hop self-join reads it twice (Catalyst has
      // no cross-branch reuse); all are materialized inside the round's
      // one snapshot job and released as soon as that snapshot is readable.
      val nbrRep = sym.join(maybeBroadcast(labels.select(col("node").as("dst"), col("rep"))), "dst")
        .select(col("src").as("node"), col("rep"))
      var cur = labels.unionByName(nbrRep).groupBy("node").agg(min("rep").as("rep"))
        .persist()
      val cached = scala.collection.mutable.ListBuffer(cur)
      for (_ <- 2 to hopsPerRound) {
        cur = hop(cur).persist()
        cached += cur
      }
      val (compressed, s, _) = truncate(hop(cur))
      cached.foreach(_.unpersist(blocking = false))
      done = s.compareTo(prevSum) == 0
      prevSum = s
      labels = compressed
      iter += 1
    }
    // The returned labels read their own final snapshot; the edges are no
    // longer referenced by anything downstream.
    if (checkpointDir.isDefined) delete("graft-cc-edges")
    labels.select(col("node").as("doc_id"), col("rep").as("cluster_rep"))
  }

  // ---- cross-corpus contamination check ----

  /** Benchmark-contamination detection: for every document of `test`, the
    * fraction of its distinct k-token shingles that appear ANYWHERE in
    * `train` — the standard n-gram-overlap screen run before training to
    * keep eval sets out of the corpus (and after, to audit a mixture).
    *
    * Shape: both sides shingle map-only (codegen kernel), the train side
    * collapses to DISTINCT shingles (one groupBy with partial aggs — at
    * 100 TB this is the big but shuffle-partitionable step), and the
    * overlap is a shingle equi-join counted per test doc. No pairwise
    * doc × doc work anywhere: cost scales with |shingles|, not
    * |test| × |train|.
    *
    * `maxTrainDf` is the hot-shingle (stop-shingle) guard: a shingle
    * appearing in MORE than that many distinct train documents is dropped
    * from the train side before the overlap join. Two birds: boilerplate
    * n-grams (headers, licenses, navigation chrome) stop counting as
    * contamination, and the join loses exactly its skewed keys — a
    * boilerplate shingle in millions of train docs otherwise fans every
    * matching test shingle out against a single hot join key. Costs one
    * aggregate over the train shingles, which replaces (not adds to) the
    * `distinct()` the unguarded path needs anyway.
    *
    * An ABSOLUTE cap's meaning shifts with corpus scale (df <= 5 means
    * "boilerplate" at 10^3 train docs and "practically unique" at 10^9),
    * and genuinely contaminated content duplicated across many train
    * shards — the strongest contamination signal — is itself high-df.
    * `maxTrainDfFrac` expresses the cap as a FRACTION of the train corpus
    * (cap = ceil(frac · |train|), folded into the plan as a 1-row
    * broadcast, no eager count), which keeps "boilerplate" meaning
    * boilerplate as the corpus grows. Pass at most one of the two; run
    * once more unguarded when auditing heavily-duplicated true
    * contamination.
    */
  def contamination(test: DataFrame, train: DataFrame, idCol: String,
                    textCol: String, k: Int = 3,
                    maxTrainDf: Option[Long] = None,
                    maxTrainDfFrac: Option[Double] = None): DataFrame =
    contaminationBatch(test.withColumn("__bench", lit(0)), train, "__bench",
      idCol, textCol, k, maxTrainDf, maxTrainDfFrac)
      .drop("__bench")

  /** The BATCH form of [[contamination]]: screen MANY benchmarks against
    * the train corpus in ONE pass — `test` carries a `benchCol` tag and
    * every aggregate groups by (benchmark, doc). The expensive side (the
    * train-shingle DISTINCT/df table) is built ONCE and shared by every
    * benchmark, where per-benchmark calls would rebuild it N times —
    * the same one-pass economics as [[Retrieval.bm25Queries]] vs per-query
    * scoring. All scale properties of the single-benchmark form carry
    * over unchanged (shingle equi-join, no pairwise doc work, the
    * maxTrainDf/maxTrainDfFrac stop-shingle guard). */
  def contaminationBatch(test: DataFrame, train: DataFrame, benchCol: String,
                         idCol: String, textCol: String, k: Int = 3,
                         maxTrainDf: Option[Long] = None,
                         maxTrainDfFrac: Option[Double] = None): DataFrame = {
    require(maxTrainDf.isEmpty || maxTrainDfFrac.isEmpty,
      "pass at most one of maxTrainDf / maxTrainDfFrac")
    maxTrainDfFrac.foreach(f => require(f > 0 && f <= 1,
      s"maxTrainDfFrac must be in (0, 1], got $f"))
    // the test-side shingle stream feeds totals AND the train-overlap
    // join — one materialized pass (round 16)
    val testSh = graft.ops.Materialize.stable(
      test.select(col(benchCol).as("__bench"), col(idCol).as("doc_id"),
        explode(graft.functions.TextExprs.distinctShingles(col(textCol), k))
          .as("sh")),
      "contamination-test-shingles")
    val trainSh0 = shingled(train, idCol, textCol, k)
    // shingled() emits per-doc DISTINCT shingles, so count(*) per shingle
    // IS its train document frequency.
    val trainSh = (maxTrainDf, maxTrainDfFrac) match {
      case (Some(cap), _) => trainSh0.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("sh")
      case (_, Some(frac)) =>
        val nTrain = train.agg(count(lit(1)).as("__n_train"))
        trainSh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nTrain))
          .filter(col("df") <= ceil(col("__n_train") * frac))
          .select("sh")
      case _ => trainSh0.select("sh").distinct()
    }
    val totals = testSh.groupBy("__bench", "doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = testSh.join(trainSh, "sh")
      .groupBy("__bench", "doc_id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("__bench", "doc_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .select(col("__bench").as(benchCol), col("doc_id"), col("n_shingles"),
        col("n_hit"),
        round(col("n_hit").cast("double") / col("n_shingles"), 6).as("contamination"))
  }

  // ---- line/segment-level corpus dedup (C4-style) ----

  /** Line-level dedup as the public C4 pipeline does it (Raffel et al. 2020
    * §2.2, "Exploring the Limits of Transfer Learning…": discard every line
    * that occurs more than once in the corpus): count each segment
    * corpus-wide and delete ALL occurrences of any segment appearing
    * `minCount`+ times, then reassemble each document from its kept
    * segments in original order.
    *
    * `segs` is the segmentation expression (`array<string>`, document
    * order): `split(text, "\n")` for real corpora;
    * [[TextAnalysis.segmentsFixed]] for single-line corpora.
    *
    * Returns (doc_id, n_seg, n_kept, kept_text) — one row per doc that had
    * at least one segment; callers left-join from the corpus if they need
    * segment-less docs too.
    *
    * Scale shape: posexplode is map-only; the frequency table is ONE
    * groupBy on the 60-bit segment hash with map-side partials (shuffle
    * rows ∝ distinct segments, ~16 bytes each — the string itself never
    * shuffles for counting); membership is a shuffled equi-join on the
    * hash with NO broadcast hint, because the segment vocabulary at web
    * scale is 10^9+ rows (AQE may still downgrade when it measures small);
    * reassembly is one groupBy(doc_id). A hot segment ("&nbsp;", cookie
    * banners) is exactly the high-count row this removes, and its
    * frequency row is 1 row post-aggregation — no join skew. Hash
    * collisions (60-bit) conflate segment counts at ~n²/2⁶¹ odds; the
    * oracle applies the identical hash so parity is exact. */
  def lineDedup(docs: DataFrame, idCol: String, segs: org.apache.spark.sql.Column,
                minCount: Long = 2): DataFrame = {
    require(minCount >= 2, s"minCount < 2 would delete every segment, got $minCount")
    val seg = docs
      .select(col(idCol).as("doc_id"), posexplode(segs).as(Seq("pos", "seg")))
      .withColumn("h", TextAnalysis.h60(col("seg")))
    val freq = seg.groupBy("h").agg(count(lit(1)).as("seg_n"))
    val keep = col("seg_n") < minCount
    seg.join(freq, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls the `when` leaves on deleted
        // segments, so one pass builds the filtered, order-restored text
        array_join(transform(
          array_sort(collect_list(when(keep, struct(col("pos"), col("seg"))))),
          s => s.getField("seg")), " ").as("kept_text"))
  }

  // ---- priority-aware survivor selection ----

  /** Priority-aware dedup survivor selection: given near-dup CLUSTERS
    * (from [[connectedComponents]]: (idCol, cluster_rep)) and a per-doc
    * priority (quality score, length, recency, source rank), keep the
    * HIGHEST-priority member of each cluster — min id on ties — instead of
    * the arbitrary min-id representative. "Keep the best copy" is what
    * production pipelines actually run; min-id is only the default when no
    * priority exists. Float priorities must be rounded upstream (the
    * rank-stability rule) so ties are engine-portable.
    *
    * Returns (idCol, cluster_rep, priCol, keep) for every clustered doc.
    * One equi-join on id + one groupBy(cluster) argmax via min(struct) —
    * id-sized work, map-side partials, no window over the corpus. The
    * sign flip for the lexicographic (max priority, min id) order lands
    * on the PRIORITY (numeric by contract, loudly checked), never the id
    * — so string/date/any-orderable ids work as-is. */
  def keepBest(clusters: DataFrame, priority: DataFrame, idCol: String,
               priCol: String): DataFrame = {
    val priType = priority.schema(priCol).dataType
    require(priType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"keepBest priority column '$priCol' must be numeric (got $priType); " +
        "rank non-numeric priorities upstream")
    val scored = clusters.join(priority.select(col(idCol), col(priCol)), idCol)
    val best = scored.groupBy("cluster_rep")
      .agg(min(struct((-col(priCol)).as("np"), col(idCol).as("i"))).as("__b"))
      .select(col("cluster_rep"), col("__b.i").as("__keep_id"))
    scored.join(best, "cluster_rep")
      .select(col(idCol), col("cluster_rep"), col(priCol),
        (col(idCol) === col("__keep_id")).as("keep"))
  }

  // ---- exact-substring duplicated spans (ExactSubstr-style) ----

  /** Duplicated-SPAN detection, the distributed re-expression of the
    * suffix-array ExactSubstr pass of Lee et al. 2021 ("Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499): find
    * documents containing a long token span that also occurs elsewhere in
    * the corpus (boilerplate, license blocks, syndicated paragraphs —
    * duplication MinHash misses when the rest of the doc differs).
    *
    * Detection: a k-token window whose md5 occurs >= 2 times corpus-wide
    * (any doc, any position — same-doc self-repetition counts, as in the
    * original) is `duplicated`; a run of r CONSECUTIVE duplicated window
    * starts within a doc witnesses a duplicated span of r + k - 1 tokens.
    * Runs are found per doc with the gaps-and-islands pattern
    * (pos - row_number() is constant within a consecutive run). This
    * over-approximates true ExactSubstr — consecutive windows may match
    * DIFFERENT remote locations — which is the standard trade accepted by
    * distributed reimplementations; raise `k` to tighten.
    *
    * Returns (idCol, n_dup_windows, max_span_tokens) for docs whose
    * longest span reaches `minSpan` tokens — the drop/scrub candidates.
    *
    * Scale shape: the window stream is token-linear, keyed by md5 (128-bit
    * — collision-negligible where a 60-bit key at 100 TB is not, and the
    * shuffle carries a 32-char key instead of a k-token string). One
    * frequency groupBy with map-side partials, one unhinted equi-join of
    * the stream to the duplicated-key subset (vocabulary rule), then
    * per-doc windows PARTITIONED by doc — state bounded by doc length,
    * never corpus size. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, minSpan: Int = 5): DataFrame = {
    require(k >= 2, s"duplicatedSpans needs window size k >= 2, got $k")
    require(minSpan >= k, s"minSpan ($minSpan) must be >= k ($k)")
    // wordShingles is the codegen'd kernel (one pass, no intermediate
    // arrays) — this stream is evaluated twice (frequency pass + join
    // pass), so interpreted HOF lambdas here would double their cost
    val win = docs
      .select(col(idCol),
        posexplode(graft.functions.TextExprs.wordShingles(col(textCol), k))
          .as(Seq("pos", "w")))
      .select(col(idCol), col("pos"), md5(col("w")).as("wh"))
    val dup = win.groupBy("wh").agg(count(lit(1)).as("__wn"))
      .filter(col("__wn") >= 2).select("wh")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    win.join(dup, "wh")
      .withColumn("__isl", col("pos") - row_number().over(ord))
      .groupBy(col(idCol), col("__isl")).agg(count(lit(1)).as("__run"))
      .groupBy(col(idCol))
      .agg(sum("__run").as("n_dup_windows"),
        (max("__run") + (k - 1)).as("max_span_tokens"))
      .filter(col("max_span_tokens") >= minSpan)
  }

  // ---- blocked exact n-gram Jaccard ----

  /** Pairwise exact Jaccard restricted to pairs sharing `blockCol` (e.g.
    * source); the pair generation itself goes through the shingle equi-join,
    * so only pairs with at least one common shingle are scored. */
  /** EXHAUSTIVE exact similarity self-join at Jaccard >= minJaccard via
    * PREFIX FILTERING (Bayardo/Ma/Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW 2007; length filter per Xiao et al., WWW
    * 2008): sort each document's shingles by a GLOBAL (df, shingle)
    * order and join only on each side's first n − ⌈t·n⌉ + 1 shingles.
    * Complete by the prefix pigeonhole: J ≥ t forces an overlap
    * ≥ ⌈t·max(na,nb)⌉, and the globally-smallest shared shingle must sit
    * inside BOTH prefixes — so unlike the banded channels (probabilistic
    * recall) this is exact ground truth, which is what makes it the
    * recall REFERENCE for auditing them (q126). The size filter
    * (ratio ≤ 1/t, forced by I ≤ min and I ≥ t·max) prunes before the
    * distinct.
    *
    * Shape at scale: one shingle-df groupBy (vocab-sized, partials), a
    * per-doc rank window (bounded by document length), and a candidate
    * equi-join that touches PREFIX rows only — the rarest ~(1−t) of each
    * doc's shingles, so hot boilerplate shingles (high df, ranked LAST)
    * never generate candidates unless a doc is nearly all boilerplate.
    * That is the algorithmic answer to the blocked variant's trade: no
    * block key to miss cross-block pairs, no unfiltered hot-shingle
    * blow-up. Exact verification touches candidate pairs only. Still
    * inherently quadratic in TRUE near-dup density — a corpus that IS
    * mostly one near-dup cluster yields cluster² pairs because the
    * answer itself is that large. */
  def allPairsExact(docs: DataFrame, idCol: String, textCol: String,
                    minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard < 1.0,
      s"allPairsExact needs 0 < minJaccard < 1, got $minJaccard")
    // the shingle stream feeds FIVE plan branches (df table, sizes,
    // both prefix sides, the verify joins) — materialize it once so
    // the corpus tokenize/shingle chain runs in ONE job, not per
    // branch (round 16; the q66/q94/q95 one-gram-stream discipline)
    val sh = graft.ops.Materialize.stable(
      shingled(docs, idCol, textCol), "allpairs-shingles")
    val dfTbl = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("__df", "sh")
    val prefix = sh.join(dfTbl, "sh")
      .withColumn("__rnk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("__rnk") <=
        col("__n") - ceil(lit(minJaccard) * col("__n")) + lit(1))
      .select("doc_id", "sh", "__n")
    val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"),
        col("__n").as("__na"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh"),
        col("__n").as("__nb")), "sh")
      .filter(col("doc_a") < col("doc_b") &&
        col("__na") * lit(minJaccard) <= col("__nb") &&
        col("__nb") * lit(minJaccard) <= col("__na"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cand, sh)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact asymmetric CONTAINMENT pairs: every ordered pair (a, b),
    * a ≠ b, with C(a,b) = |S(a) ∩ S(b)| / |S(a)| ≥ minContainment over
    * distinct k-shingles — the quote/sub-document detector. A short doc
    * pasted into a long one scores near-1 containment while its Jaccard
    * (which [[allPairsExact]] thresholds) stays low — the dedup gap
    * symmetric measures cannot see.
    *
    * Same prefix-filter economics as [[allPairsExact]] but ASYMMETRIC:
    * only the a-side is prefix-reduced (its first
    * n_a − ceil(t·n_a) + 2 shingles in the global (df, shingle) order),
    * joined against the FULL b-side stream — pigeonhole: if a and b
    * share none of a's first n_a − m + 1 shingles (m = fewest
    * intersecting shingles that pass t), the intersection is < m. The
    * "+2" (one more than the tight bound) absorbs the ±1-ulp slack of
    * the double product t·n_a, so the candidate set provably covers
    * every qualifying pair and the final EXACT filter does the rest —
    * the oracle checks against an unfiltered all-pairs ground truth.
    * Size gate: C ≥ t forces n_b ≥ t·n_a. The b side is the raw shingle
    * stream (one row per (doc, shingle)) — no window, no product; the
    * a-prefix join is rarity-ordered so hot shingles rarely appear in
    * prefixes. Emits (doc_a, doc_b, n_a, n_b, n_inter, containment). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       minContainment: Double): DataFrame = {
    require(minContainment > 0.0 && minContainment < 1.0,
      s"containmentPairs needs 0 < minContainment < 1, got $minContainment")
    // SIX consumers (df table, sizes, prefix-a, full-b, two verify
    // joins) — one materialized shingle pass instead of six scans
    val sh = graft.ops.Materialize.stable(
      shingled(docs, idCol, textCol), "containment-shingles")
    val dfTbl = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("__df", "sh")
    val prefixA = sh.join(dfTbl, "sh")
      .withColumn("__rnk", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("__rnk") <=
        col("__n") - ceil(lit(minContainment) * col("__n")) + lit(2))
      .select(col("doc_id").as("doc_a"), col("sh"), col("__n").as("__na"))
    val fullB = sh.join(sizes, "doc_id")
      .select(col("doc_id").as("doc_b"), col("sh"), col("__n").as("__nb"))
    val cand = prefixA.join(fullB, "sh")
      .filter(col("doc_a") =!= col("doc_b") &&
        col("__nb").cast("double") >= lit(minContainment) * col("__na"))
      .select("doc_a", "doc_b").distinct()
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("__n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("__n").as("n_b")), "doc_b")
      .filter(col("n_inter").cast("double") / col("n_a") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        TextAnalysis.round6Portable(
          col("n_inter").cast("double") / col("n_a")).as("containment"))
  }

  /** Cross-corpus (INCREMENTAL) [[allPairsExact]]: every (new doc,
    * corpus doc) pair at true Jaccard >= minJaccard — the exact ground
    * truth for a per-batch dedup screen, the operation
    * [[minhashLshAgainst]] approximates. Same prefix-filtering
    * completeness argument (the global (df, shingle) order is derived
    * over BOTH sides together — a single total order is what the
    * pigeonhole needs; rarity ordering is the performance half), same
    * size-ratio filter, but candidates come only from a new-side prefix
    * meeting a corpus-side prefix — never new × corpus. Ids must be
    * unique ACROSS both inputs (they key the shared shingle table).
    * Output: (doc_a = new id, doc_b = corpus id, jaccard). */
  def allPairsExactAgainst(newDocs: DataFrame, corpus: DataFrame,
                           idCol: String, textCol: String,
                           minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard < 1.0,
      s"allPairsExactAgainst needs 0 < minJaccard < 1, got $minJaccard")
    // both sides' shingle streams feed the shared df/size tables, their
    // own prefixes, and the verify joins — materialize each once
    val shN = graft.ops.Materialize.stable(
      shingled(newDocs, idCol, textCol), "allpairs-against-new")
    val shC = graft.ops.Materialize.stable(
      shingled(corpus, idCol, textCol), "allpairs-against-corpus")
    val shAll = shN.unionByName(shC)
    val dfTbl = shAll.groupBy("sh").agg(count(lit(1)).as("__df"))
    val sizes = shAll.groupBy("doc_id").agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("__df", "sh")
    def prefix(sh: DataFrame): DataFrame =
      sh.join(dfTbl, "sh")
        .withColumn("__rnk", row_number().over(w))
        .join(sizes, "doc_id")
        .filter(col("__rnk") <=
          col("__n") - ceil(lit(minJaccard) * col("__n")) + lit(1))
        .select("doc_id", "sh", "__n")
    val cand = prefix(shN).select(col("doc_id").as("doc_a"), col("sh"),
        col("__n").as("__na"))
      .join(prefix(shC).select(col("doc_id").as("doc_b"), col("sh"),
        col("__n").as("__nb")), "sh")
      .filter(col("__na") * lit(minJaccard) <= col("__nb") &&
        col("__nb") * lit(minJaccard) <= col("__na"))
      .select("doc_a", "doc_b").distinct()
    verifyJaccard(cand, shAll)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  def ngramJaccardBlocked(docs: DataFrame, idCol: String, textCol: String,
                          blockCol: String, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      explode(graft.functions.TextExprs.distinctShingles(col(textCol), 3)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("blk"), col("sh"))
      .join(sh.select(col("doc_id").as("doc_b"), col("blk"), col("sh")), Seq("blk", "sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- per-document n-gram novelty ----

  /** Per-document NOVELTY profile: of a document's distinct k-token
    * shingles, how many also appear in at least one OTHER document —
    * the intra-corpus complement of [[contamination]] (which screens
    * against an external benchmark) and the per-document aggregate view
    * of [[duplicatedSpans]] (which localizes the repeated spans). High
    * `shared_frac` flags boilerplate-dominated documents that pairwise
    * near-dup thresholds miss because no SINGLE partner is similar
    * enough; low means genuinely novel text worth keeping.
    *
    * Shape at scale: shingles stream map-only through the compiled
    * kernel, keyed by md5 (32-char shuffle key, never the shingle text);
    * the document-frequency table collapses under partial aggregation
    * (hot boilerplate shingles become ONE row) and joins back UNHINTED —
    * the shingle vocabulary at web scale is 10^9+ rows, the tf-idf
    * vocabulary rule. Documents with fewer than k tokens have no
    * shingles and drop out. */
  def noveltyScore(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame =
    noveltyScoreWith(docs, noveltyState(docs, idCol, textCol, k),
      idCol, textCol, k)

  private def noveltyShingleStream(docs: DataFrame, idCol: String,
                                   textCol: String, k: Int): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.TextExprs.distinctShingles(col(textCol), k)).as("__sh"))
      .withColumn("__h", md5(col("__sh"))).drop("__sh")

  /** The PERSISTED state behind [[noveltyScore]]: the shingle
    * document-frequency table (shingle_md5, df). Mergeable by summing —
    * each batch/day contributes its own state and
    * [[noveltyMergeState]](day1 ++ day2) == state(day1 ∪ day2) exactly
    * (distinctShingles emits each (doc, shingle) once, so counts ADD
    * across disjoint batches — the incremental-MinHash/index-segment
    * maintenance pattern, q56/q102, applied to novelty). A growing
    * corpus maintains novelty at BATCH cost: one state per increment,
    * one vocab-sized merge, never a corpus re-shingle. */
  def noveltyState(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame =
    noveltyShingleStream(docs, idCol, textCol, k)
      .groupBy(col("__h").as("shingle_md5"))
      .agg(count(lit(1)).as("df"))

  /** Merge per-batch novelty states: counters add (exact, not a sketch).
    * Precondition: batches are DISJOINT document sets — a document
    * shingled into two states would double-count itself. */
  def noveltyMergeState(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state to merge")
    states.reduce(_ unionByName _)
      .groupBy("shingle_md5").agg(sum("df").as("df"))
  }

  /** [[noveltyScore]] against an explicit (typically merged) df state.
    * The scored documents must be CONTAINED in the state (score a new
    * day by merging its own state in first — that keeps the df >= 2
    * shared test meaning "some OTHER document has it" for every scored
    * doc, exactly the rebuild semantics). Unhinted state join per the
    * shingle-vocabulary rule. */
  def noveltyScoreWith(docs: DataFrame, state: DataFrame, idCol: String,
                       textCol: String, k: Int = 3): DataFrame =
    noveltyShingleStream(docs, idCol, textCol, k)
      .join(state.select(col("shingle_md5").as("__h"), col("df").as("__df")), "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))

  // ---- content-defined chunking ----

  /** Content-defined chunks of the token stream (the CDC idea behind
    * LBFS/rsync-style storage dedup — Muthitacharoen/Chen/Mazières, SOSP
    * 2001 §3.1 — at token granularity): cut BEFORE every token position p
    * whose k-token gram hashes to 0 mod `modulus`. Because each cut
    * depends only on the k tokens at the cut, inserting or deleting text
    * early in a document shifts only the chunks it touches — every later
    * chunk re-aligns byte-identically, which is exactly what fixed-width
    * segmentation ([[graft.ext.TextAnalysis.segmentsFixed]]) cannot do
    * (one insertion re-phases every later window). Expected chunk length
    * ≈ `modulus` tokens. Returns (idCol, chunk_pos, chunk).
    *
    * Shape at scale: ENTIRELY map-only — tokenize, gram hashing, cut
    * selection and chunk assembly fuse into the compiled
    * [[graft.functions.CdcChunksExpr]] kernel, one pass per document row
    * with zero shuffle (which is also what lets the STREAMING ingest
    * screen reuse the identical chunking — see
    * [[graft.streaming.StreamOps.cdcHitsStream]]). Two slower
    * formulations preceded it and survive as the spec's reference
    * implementations: nested higher-order lambdas paid the expression
    * interpreter ~15x, and the relational form (kernel-hashed gram
    * stream → per-doc cut collect → join + slice) paid a shuffle and a
    * join for the same answer. Documents shorter than k+1 tokens yield a
    * single whole-document chunk; empty docs yield none. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3, modulus: Int = 8): DataFrame = {
    require(k >= 1, s"gram width must be >= 1, got $k")
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    docs.select(col(idCol), posexplode(
        graft.functions.TextExprs.cdcChunks(col(textCol), k, modulus))
      .as(Seq("chunk_pos", "chunk")))
  }

  /** Per-document duplicated-content profile over [[cdcChunks]]: how many
    * of a document's chunks also occur (verbatim) in at least one OTHER
    * document. The variable-boundary complement of [[lineDedup]] (needs
    * newlines) and [[duplicatedSpans]] (fixed k-windows, span-local):
    * CDC boundaries re-align after edits, so a shifted copy of a
    * paragraph still collides chunk-for-chunk.
    *
    * Shape at scale: chunking is map-only; chunks key by md5 (32-char
    * shuffle key, never chunk text); the chunk document-frequency table
    * collapses under partial aggregation and joins back UNHINTED (the
    * shingle-vocabulary rule). */
  def cdcDupProfile(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, modulus: Int = 8): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, k, modulus)
      .select(col(idCol), md5(col("chunk")).as("__h"))
    val df_ = ch.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
    ch.join(df_, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_chunks"), 6))
  }

  /** CDC-boundary boilerplate REMOVAL — the transform behind
    * [[cdcDupProfile]]'s report (and the variable-boundary sibling of
    * [[lineDedup]]): drop every chunk whose text occurs in at least
    * `minDocs` DISTINCT documents, keep the rest in document order, and
    * reassemble. Because CDC boundaries re-align across shifted copies, a
    * license block or cookie banner is cut from EVERY carrier even when
    * each document embeds it at a different offset — where line-level
    * dedup needs newline structure and fixed windows re-phase. The
    * criterion is cross-document (distinct-doc count), so a chunk a
    * single document repeats internally survives — that is
    * [[duplicatedSpans]]' signal, not boilerplate.
    *
    * Shape at scale: [[cdcChunks]]' kernel-hashed chunking; the chunk
    * document-frequency table collapses under partial aggregation
    * (md5-keyed) and joins back UNHINTED; ONE groupBy(doc) rebuilds the
    * filtered text in order (collect_list drops the `when`-nulled dup
    * chunks — the lineDedup reassembly shape). Returns (idCol, n_chunks,
    * n_kept, kept_text); a fully-boilerplate document keeps an empty
    * string, preserving corpus cardinality for downstream audits. */
  def cdcDedupText(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, modulus: Int = 8, minDocs: Long = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would delete every chunk, got $minDocs")
    val ch = cdcChunks(docs, idCol, textCol, k, modulus)
      .withColumn("__h", md5(col("chunk")))
    val df_ = ch.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
    val keep = col("__df") < minDocs
    ch.join(df_, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(keep, struct(col("chunk_pos"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("kept_text"))
  }

  /** Lincoln–Petersen capture–recapture estimate of the TRUE duplicate-
    * pair population from two independent detectors: if method A finds
    * n_a pairs, method B finds n_b, and they agree on n_both, then
    * N̂ = n_a·n_b / n_both — the classic mark-recapture argument, here
    * answering "how many near-dup pairs does the corpus actually hold
    * beyond what either screen caught". The honesty meter for any
    * single-method dedup recall claim; read it beside q126's LSH recall
    * audit (which needs brute-force ground truth this estimator avoids).
    * Three counts and one division; the pair join is candidate-sized. */
  def captureRecapture(pairsA: DataFrame, pairsB: DataFrame): DataFrame = {
    val a = pairsA.select("doc_a", "doc_b")
    val b = pairsB.select("doc_a", "doc_b")
    a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
      .crossJoin(a.join(b, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_both")))
      .select(col("n_a"), col("n_b"), col("n_both"),
        when(col("n_both") > 0, TextAnalysis.round6Portable(
          col("n_a").cast("double") * col("n_b") / col("n_both")))
          .as("est_total"))
  }

  /** Weighted (multiset) Jaccard rescore of candidate pairs:
    * J_w = Σ_t min(c_a(t), c_b(t)) / Σ_t max(c_a(t), c_b(t)) over token
    * COUNTS — the set form (q21/q23) calls a doc and its self-
    * concatenation identical; the multiset form is what near-dup
    * scoring over templated/repetitive text should use. Identity
    * Σmax = tot_a + tot_b − Σmin turns the union into two broadcast-free
    * lookups plus ONE inner join on (pair, token) over the SHARED
    * tokens — absent tokens are never materialized. Exact integers to
    * the final division. Pairs with no shared token score 0. */
  def weightedJaccard(docs: DataFrame, idCol: String, textCol: String,
                      pairs: DataFrame): DataFrame = {
    val cnt = graft.ops.Materialize.stable(
      docs.select(col(idCol).as("__id"),
          explode(TextAnalysis.tokens(col(textCol))).as("t"))
        .groupBy("__id", "t").agg(count(lit(1)).as("c")),
      "wjac-counts")
    val tot = cnt.groupBy("__id").agg(sum("c").as("tot"))
    val shared = pairs
      .join(cnt.select(col("__id").as("doc_a"), col("t"), col("c").as("ca")),
        "doc_a")
      .join(cnt.select(col("__id").as("doc_b"), col("t"), col("c").as("cb")),
        Seq("doc_b", "t"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(least(col("ca"), col("cb"))).as("sum_min"))
    pairs.select("doc_a", "doc_b")
      .join(shared, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("sum_min"))
      .join(tot.select(col("__id").as("doc_a"), col("tot").as("tot_a")), "doc_a")
      .join(tot.select(col("__id").as("doc_b"), col("tot").as("tot_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("sum_min"),
        col("tot_a"), col("tot_b"),
        TextAnalysis.round6Portable(col("sum_min").cast("double") /
          (col("tot_a") + col("tot_b") - col("sum_min"))).as("wjac"))
  }
}
