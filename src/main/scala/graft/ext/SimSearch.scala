package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  *   - cosine/dot via native codegen'd Catalyst expressions
  *     ([[graft.functions.CosineSimilarity]]): ONE fused primitive loop per
  *     pair inside whole-stage codegen. The earlier `aggregate`+`zip_with`
  *     higher-order formulation was numerically identical but ran on the
  *     interpreted path (a closure call per element) — 5-10x slower on a
  *     pairwise scan;
  *   - brute-force top-k: broadcast probes x streamed corpus, two-phase
  *     top-k (per-partition heap, then exact final rank) so no full sort and
  *     no single-partition bottleneck at scale;
  *   - IVF-style partitioned search: centroid per coarse cell (here: the
  *     `label` column; at 100 TB, a k-means assignment produced upstream),
  *     probes search only their nearest cell — the scan shrinks by the cell
  *     count while recall depends on cell quality.
  */
object SimSearch {

  /** Elementwise-double dot product (codegen'd; same left-to-right double
    * accumulation as DuckDB `list_inner_product` over `DOUBLE[]`). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (dot + both norms in one loop). */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.cosine(a, b)

  case class Scored(probe_id: Long, vec_id: Long, cos: Double)

  /** Dimension of `colName` from the corpus' first row — the one driver-side
    * probe the LSH paths need (plane count is a plan-time constant). Loud,
    * actionable errors replace the bare NoSuchElementException/NPE an empty
    * or null-leading corpus used to throw. */
  def embeddingDim(corpus: DataFrame, colName: String = "embedding"): Int = {
    val rows = corpus.select(size(col(colName))).limit(1).collect()
    require(rows.nonEmpty,
      s"cannot derive embedding dimension: corpus has no rows")
    require(!rows(0).isNullAt(0),
      s"cannot derive embedding dimension: first '$colName' value is null")
    rows(0).getInt(0)
  }

  /** A caller-supplied dim is validated against the data (DotProduct
    * truncates to min(array lengths), so a wrong dim would silently bucket
    * differently from an oracle deriving planes from the true width). The
    * probe is one limit(1) scan; an empty corpus with an explicit dim is
    * allowed (nothing to mis-bucket). */
  private def resolveDim(corpus: DataFrame, dim: Option[Int]): Int = dim match {
    case None => embeddingDim(corpus)
    case Some(d) =>
      val rows = corpus.select(size(col("embedding"))).limit(1).collect()
      if (rows.nonEmpty && !rows(0).isNullAt(0))
        require(d == rows(0).getInt(0),
          s"supplied dim=$d != corpus embedding dimension ${rows(0).getInt(0)}")
      d
  }

  /** Brute-force cosine top-k per probe.
    *
    * Phase 1 (distributed): score all pairs (broadcast nested-loop: probes
    * broadcast, corpus streamed — no shuffle), keep a per-partition top-k per
    * probe with a local fold. Phase 2 (tiny): exact rank over the <=
    * k x partitions survivors. Identical result to a global window rank with
    * tiebreak (cos desc, vec_id asc), but the full scored set is never
    * shuffled or sorted.
    */
  /** The kNN probe side is broadcast; a corpus-sized probe set must go
    * through [[nearDupPairsBlocked]] (all-pairs regime) instead. Bounded
    * decision scan — see [[graft.ops.Guards]]. */
  private def guardProbes(probes: DataFrame, maxProbeRows: Long): DataFrame =
    graft.ops.Guards.requireBroadcastable(probes, "kNN probe side",
      "nearDupPairsBlocked (embedding self-join regime) or batch the probes",
      maxProbeRows)

  def knnBrute(probes: DataFrame, corpus: DataFrame, k: Int,
               maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val scored = graft.ops.Partitioning.spread(corpus)
      .crossJoin(broadcast(guardProbes(probes, maxProbeRows)))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("p_embedding"), col("embedding")).as("cos"))
      .as[Scored]

    val partial: Dataset[Scored] = scored.mapPartitions { it =>
      val best = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[Scored]]
      // min-heap per probe: worst survivor on top (order: lower cos first,
      // then higher vec_id first, so the heap evicts exactly the element the
      // final (cos desc, vec_id asc) rank would drop)
      val ord = Ordering.by[Scored, (Double, Long)](s => (-s.cos, s.vec_id))
      it.foreach { s =>
        val q = best.getOrElseUpdate(s.probe_id,
          scala.collection.mutable.PriorityQueue.empty[Scored](ord))
        if (q.size < k) q.enqueue(s)
        else if (ord.lt(s, q.head)) { q.dequeue(); q.enqueue(s) }
      }
      best.valuesIterator.flatMap(_.iterator)
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
    partial.toDF()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Per-cell centroids: element-wise mean, rounded to 6 dp so engine
    * summation-order drift cannot leak into downstream comparisons. */
  def centroids(corpus: DataFrame, cellCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => round(x.getField("m"), 6)).as("centroid"))

  /** IVF search: assign each probe to its `nprobe` nearest centroids (cos
    * desc, cell asc tiebreak), then brute-force ONLY within those cells.
    *
    * `nprobe` is the standard IVF recall knob: a probe sitting near a cell
    * boundary has true neighbors in the adjacent cell, and nprobe=1 misses
    * them by construction. Searching the top-p cells multiplies the scanned
    * fraction by p (still cells/p-fold below brute force) and recovers the
    * boundary losses — each corpus row lives in exactly one cell, so the
    * union of searched cells never scores a pair twice and needs no dedup. */
  def knnIvf(probes: DataFrame, corpus: DataFrame, cellCol: String, k: Int,
             nprobe: Int = 1,
             maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame =
    knnIvfWith(probes, corpus.withColumnRenamed(cellCol, "cell"),
      centroids(corpus, cellCol), k, nprobe, maxProbeRows)

  /** [[knnIvf]] against PRECOMPUTED centroids — the search half of a
    * persisted index ([[writeIvfIndex]]/[[readIvfIndex]]): centroids are
    * derived once at build time and reused by every query, instead of
    * re-aggregated per search. `corpus` must already carry a `cell`
    * column aligned with `cents` (cell, centroid). */
  def knnIvfWith(probes: DataFrame, corpus: DataFrame, cents: DataFrame,
                 k: Int, nprobe: Int = 1,
                 maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    require(nprobe >= 1, s"knnIvf needs nprobe >= 1, got $nprobe")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("ccos"), col("cell"))
    val assigned = guardProbes(probes, maxProbeRows).crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("p_embedding"), col("centroid")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= nprobe)
      .select(col("probe_id"), col("p_embedding"), col("cell"))

    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
    corpus
      .join(broadcast(assigned), "cell")
      .withColumn("cos", cosine(col("p_embedding"), col("embedding")))
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("cell"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Lloyd k-means over the embedding column — the upstream operator that
    * PRODUCES the coarse cells [[knnIvf]] searches (a real corpus has no
    * pre-clustered column). Deterministic and engine-portable by
    * construction, so an unrolled SQL oracle reproduces it exactly:
    *
    *   - seeding: the k corpus rows ranked smallest by the portable
    *     (h60("km" + id), id) hash order — no RNG; seed cell c (0-based
    *     rank) starts as that row's embedding;
    *   - assignment: cell = argmax cosine(embedding, centroid), smallest
    *     cell on ties — via [[assignCells]], which picks between the fused
    *     LITERAL-centroid map (k <= maxLiteralK, zero exchanges) and the
    *     broadcast-centroid join argmax (large k) by centroid count. There
    *     is never an n × k shuffle: the classic crossJoin-then-window
    *     assignment would exchange every (row, centroid) pair; the literal
    *     shape exchanges nothing and the join shape exchanges n
    *     partial-aggregated rows;
    *   - update: element-wise mean per cell in one posexplode groupBy
    *     (map-side partials), each coordinate ROUNDED to 6 dp so engine
    *     summation-order drift cannot leak into the next round's argmax;
    *     the k × dim result is collected to the driver — bounded by k·dim
    *     like every k-means implementation, independent of corpus size.
    *
    * Per round: one map-only pass + one aggregation pass over the corpus
    * (`iters` rounds, then one final map-only assignment) — persist the
    * corpus upstream when it comes from cold storage. Cells that lose all
    * members disappear without re-seeding, keeping cell ids stable.
    */
  /** At or below this k, assignment fuses the centroids into ONE literal
    * expression (zero-shuffle map); above it, the fused expression tree —
    * O(k·dim) literals — would blow past whole-stage codegen's 64KB method
    * limit (interpreted fallback, ballooning plan construction), so the
    * argmax moves to a broadcast-centroid join (see [[kmeansAssign]]). */
  val maxLiteralCentroids = 128

  /** One assignment pass: per corpus row, the (cell, cos) of its nearest
    * centroid — cos desc, SMALLEST cell on ties, the same rank order the
    * SQL oracle spells out. Two result-identical physical strategies:
    *
    *   - literal (k <= maxLiteralK): max of k struct(cos vs LITERAL
    *     centroid, -cell) — lexicographic, fused into whole-stage codegen,
    *     MAP-ONLY (zero exchanges);
    *   - join (k > maxLiteralK): the centroids become a k-row BROADCAST
    *     table, the argmax a max(struct(cos, -cell)) groupBy over the
    *     broadcast nested-loop product. Partial (map-side) aggregation
    *     collapses each row's k candidates before the exchange, so the one
    *     shuffle carries n rows — never the n × k product — and the plan
    *     survives the k ~ 10^4-10^5 coarse cells a real 100 TB IVF wants.
    *
    * Both compute the identical double cosine against identical rounded
    * centroid values, so the chosen cells are bit-equal (pinned by
    * ExtSpec). */
  private def assignCells(corpus: DataFrame, cents: Seq[(Int, Array[Double])],
                          idCol: String, embCol: String, maxLiteralK: Int): DataFrame =
    if (cents.size <= maxLiteralK) {
      val scored = cents.map { case (c, arr) =>
        struct(cosine(col(embCol), typedlit(arr.toSeq)).as("cos"),
          lit(-c).as("negc"))
      }
      val best = if (scored.size == 1) scored.head else greatest(scored: _*)
      corpus.select(col(idCol), col(embCol), best.as("__best"))
        .select(col(idCol), col(embCol),
          (col("__best.negc") * -1).as("cell"), col("__best.cos").as("cos"))
    } else {
      val spark = corpus.sparkSession
      import spark.implicits._
      val centDf = cents.map { case (c, a) => (c, a.toSeq) }.toDF("__cell", "__centroid")
      corpus.select(col(idCol), col(embCol))
        .crossJoin(broadcast(centDf))
        .groupBy(col(idCol), col(embCol))
        .agg(max(struct(cosine(col(embCol), col("__centroid")).as("cos"),
          (-col("__cell")).as("negc"))).as("__best"))
        .select(col(idCol), col(embCol),
          (col("__best.negc") * -1).as("cell"), col("__best.cos").as("cos"))
    }

  /** INCREMENTAL cell assignment: assign a NEW batch of vectors to FIXED
    * existing centroids (a (cell, centroid) table from [[centroids]] or a
    * persisted index) without re-running k-means — the embedding-side twin
    * of [[Dedup.minhashLshAgainst]]'s new-vs-seen ingest economics: per-
    * batch cost tracks the batch, the index is never rebuilt.
    *
    * Fully in-plan (the centroid table never collects to the driver):
    * broadcast join + map-side-partial max(struct) argmax — the same plan
    * shape as the large-k assignment path, so it survives the
    * 10^4-10^5-cell regime; the one shuffle carries batch rows, never the
    * batch × cells product. Ties break to the smallest cell (the house
    * rank order); cosine rounds to 6 for engine portability. */
  def assignNew(newDocs: DataFrame, cents: DataFrame,
                idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    newDocs.select(col(idCol), col(embCol))
      .crossJoin(broadcast(cents.select(col("cell").as("__cell"),
        col("centroid").as("__centroid"))))
      .groupBy(col(idCol), col(embCol))
      .agg(max(struct(cosine(col(embCol), col("__centroid")).as("cos"),
        (-col("__cell")).as("negc"))).as("__best"))
      .select(col(idCol), (col("__best.negc") * -1).as("cell"),
        round(col("__best.cos"), 6).as("cosine"))

  /** Materialize a (cell, centroid) table (from [[centroids]] or
    * [[readIvfIndex]]) as driver values — the standard bounded k-means
    * driver state (cells × dims doubles), for the literal assignment
    * paths. */
  def collectCentroids(cents: DataFrame): Seq[(Int, Array[Double])] =
    cents.select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq

  /** MAP-ONLY cell assignment against driver-held centroids: the
    * per-row/streaming form of [[assignNew]] — the centroids fuse into one
    * codegen'd literal argmax expression, so there is no join, no
    * aggregation, and no shuffle at all, which is exactly what a
    * Structured Streaming micro-batch wants (zero streaming state; see
    * [[graft.streaming.StreamOps.assignStream]]). Bounded by
    * [[maxLiteralCentroids]] — above that the literal tree would blow past
    * codegen's method-size limit, and a batch caller should be on
    * [[assignNew]]'s broadcast-join path anyway; fails loudly rather than
    * degrading. Result values are bit-equal to [[assignNew]] on the same
    * centroid table (same cosine, same tie order; ExtSpec pins it). */
  def assignLiteral(rows: DataFrame, cents: Seq[(Int, Array[Double])],
                    idCol: String = "vec_id",
                    embCol: String = "embedding"): DataFrame = {
    require(cents.nonEmpty, "assignLiteral needs at least one centroid")
    require(cents.size <= maxLiteralCentroids,
      s"assignLiteral fuses ${cents.size} centroids as plan literals; the cap " +
        s"is $maxLiteralCentroids (codegen method size) — use assignNew's " +
        "broadcast-join path for coarser quantizers")
    assignCells(rows, cents, idCol, embCol, maxLiteralCentroids)
      .select(col(idCol), col("cell"), round(col("cos"), 6).as("cosine"))
  }

  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int = 2,
                   idCol: String = "vec_id", embCol: String = "embedding",
                   maxLiteralK: Int = maxLiteralCentroids): DataFrame =
    kmeansFit(corpus, k, iters, idCol, embCol, maxLiteralK)._2

  /** [[kmeansAssign]] exposing BOTH halves of the fit: the final centroid
    * VALUES (the standard bounded k·dim k-means driver state) and the
    * final assignment. Product quantization ([[pqFit]]) runs one fit per
    * subspace and needs the codebook vectors for reconstruction; plain
    * callers use [[kmeansAssign]]. */
  def kmeansFit(corpus: DataFrame, k: Int, iters: Int = 2,
                idCol: String = "vec_id", embCol: String = "embedding",
                maxLiteralK: Int = maxLiteralCentroids)
      : (Seq[(Int, Array[Double])], DataFrame) = {
    require(k >= 2, s"k-means needs k >= 2, got $k")
    require(iters >= 1, s"k-means needs iters >= 1, got $iters")
    val base = corpus.select(col(idCol), col(embCol))

    def meanCentroids(assigned: DataFrame): Seq[(Int, Array[Double])] =
      assigned.select(col("cell"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => round(x.getField("m"), 6)).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).toSeq

    val seedRows = base
      .select(col(idCol), col(embCol).cast("array<double>").as("__emb"))
      .withColumn("__h", TextAnalysis.h60(concat(lit("km"), col(idCol).cast("string"))))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .collect()
    require(seedRows.nonEmpty, "k-means needs a non-empty corpus")
    seedRows.foreach(r => require(!r.isNullAt(1),
      s"k-means seeding hit a null '$embCol' (id ${r.get(0)}) — filter nulls upstream"))
    var cents: Seq[(Int, Array[Double])] = seedRows.zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }
      .toSeq

    for (_ <- 1 to iters)
      cents = meanCentroids(assignCells(base, cents, idCol, embCol, maxLiteralK))

    (cents, assignCells(base, cents, idCol, embCol, maxLiteralK)
      .select(col(idCol), col("cell"), round(col("cos"), 6).as("cosine")))
  }

  /** Cross-corpus semantic near-dup: a NEW vector batch against a SEEN
    * corpus that already carries cells (a persisted [[writeIvfIndex]]
    * index, or any [[kmeansAssign]] output joined back) — the embedding
    * twin of [[Dedup.minhashLshAgainst]] and the incremental form of
    * [[semDedup]]. The new batch is assigned to the SAME fixed centroids
    * ([[assignNew]]), candidates come from the cell equi-join only (never
    * new × seen), and the exact cosine verifies. Per-batch cost tracks the
    * batch and the seen side's matching cells; the seen corpus is never
    * re-clustered and never self-joined. */
  def nearDupAgainst(newVecs: DataFrame, seenWithCell: DataFrame,
                     cents: DataFrame, minCos: Double,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val a = assignNew(newVecs, cents, idCol, embCol)
      .select(col(idCol).as("new_id"), col("cell"))
      .join(newVecs.select(col(idCol).as("new_id"), col(embCol).as("new_emb")), "new_id")
    seenWithCell
      .select(col(idCol).as("seen_id"), col(embCol).as("seen_emb"), col("cell"))
      .join(a, "cell")
      .withColumn("cos", cosine(col("new_emb"), col("seen_emb")))
      .filter(col("cos") >= minCos)
      .select(col("new_id"), col("seen_id"), col("cell"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Mutual k-NN edge list within IVF cells — the k-NN-GRAPH construction
    * step under graph-based dedup/clustering (and the neighborhood seed
    * for HNSW-style indexes): an edge (a, b) exists iff b is in a's
    * within-cell top-k AND a is in b's, the standard symmetric filter
    * that drops hub-dominated one-way links. Cells come from the caller
    * ([[kmeansAssign]] output or a persisted index) so the graph is
    * cell-LOCAL by construction — the blocked regime, never a corpus
    * self-product: cost is Σ|cell|², the [[semDedup]] bound, and every
    * step is an equi-join on the cell key plus [[graft.ops.TopK]]'s
    * per-partition heaps (no global sort, no window over the raw scored
    * set). Ranking compares RAW cosines (index-order fold, engine-
    * portable) with the id tiebreak; output rounds to 6 dp. A pair whose
    * members land in different cells is invisible (IVF recall, not a
    * bug) — at 100 TB the recall knob is the cell count/nprobe, audited
    * the q74/q116 way. */
  def mutualKnnCells(withCell: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding",
                     cellCol: String = "cell"): DataFrame = {
    require(k >= 1, s"mutualKnnCells needs k >= 1, got $k")
    val left = withCell.select(col(cellCol).as("cell"), col(idCol).as("a"),
      col(embCol).as("ea"))
    val right = withCell.select(col(cellCol).as("cell"), col(idCol).as("b"),
      col(embCol).as("eb"))
    val scored = left.join(right, Seq("cell"))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cos"))
    // materialized ONCE (k-bounded rows per vector): the mutuality check
    // consumes the directed top-k TWICE (each direction of the pair);
    // lazily both branches would re-run the Σ|cell|² cosine join + fold —
    // the round-16 shingle-stream defect class (VERDICT r16 #5 sweep)
    val topk = graft.ops.Materialize.stable(
      graft.ops.TopK.groupedTopK(scored, Seq("a"), col("cos"),
          col("b"), k)
        .select(col("a").cast("long").as("a"), col("id").as("b"),
          col("score").as("cos")),
      "mutual-knn-topk")
    val rev = topk.filter(col("a") > col("b"))
      .select(col("b").as("a"), col("a").as("b"))
    topk.filter(col("a") < col("b")).join(rev, Seq("a", "b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(col("cos"), 6).as("cosine"))
  }

  /** BUILD-ONCE IVF index persistence: cluster the corpus, write the
    * assigned vectors PARTITIONED BY CELL plus the centroid table. The
    * search-many economics: every subsequent query reads the cells-sized
    * centroid table and scans only its probes' cells (cell-partitioned
    * layout → partition pruning on the cell join/filter), instead of
    * re-running k-means and re-aggregating centroids per query. The
    * centroids written are the per-cell means of the FINAL assignment —
    * exactly what [[knnIvf]] derives internally, so a search against the
    * persisted index equals the direct path (SimSearchSpec pins it). */
  def writeIvfIndex(corpus: DataFrame, path: String, cells: Int, iters: Int = 2,
                    idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val assigned = kmeansAssign(corpus, cells, iters, idCol, embCol)
      .select(col(idCol), col("cell"))
    val indexed = corpus.select(col(idCol), col(embCol)).join(assigned, idCol)
    indexed.write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    centroids(indexed, "cell")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Read a [[writeIvfIndex]] index back as (vectors-with-cell,
    * centroids) — feed both to [[knnIvfWith]]. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/vectors"), spark.read.parquet(s"$path/centroids"))

  /** The end-to-end ANN path as ONE call: [[kmeansAssign]] produces the
    * coarse cells, [[knnIvf]] searches each probe's `nprobe` best ones.
    * Runs the corpus through k-means (iters + 1 passes) and then the IVF
    * search — persist `corpus` upstream when it comes from cold storage. */
  def knnIvfAuto(probes: DataFrame, corpus: DataFrame, k: Int, cells: Int,
                 iters: Int = 2, nprobe: Int = 1,
                 idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val assigned = kmeansAssign(corpus, cells, iters, idCol, embCol)
      .select(col(idCol), col("cell"))
    knnIvf(probes, corpus.select(col(idCol), col(embCol)).join(assigned, idCol), "cell", k, nprobe)
  }

  /** Recall@k audit: per probe, the fraction of the EXACT top-k recovered
    * by an approximate search — the quality metric every production ANN
    * deployment monitors when tuning cells/nprobe/planes. Both inputs are
    * (probe_id, vec_id, ...) top-k tables (from [[knnBrute]] /
    * [[knnIvf]] / [[knnLsh]]); the audit is one equi-join + one groupBy
    * on id-sized rows. Run it on a probe SAMPLE at scale — the exact side
    * is the expensive one, and a few thousand probes bound recall tightly. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("probe_id"), col("vec_id"))
      .join(approx.select(col("probe_id"), col("vec_id"), lit(1).as("__hit")),
        Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("k"), count("__hit").as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / col("k"), 6))

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means clusters bound the pairwise work, then within each cluster
    * every item with a higher-precedence near-twin (cosine >= `tau`) is
    * dropped. Precedence is the deterministic greedy min-id rule (keep the
    * lowest id of each near pair — the same survivor convention as the
    * text-dedup keep-list), rather than the paper's centroid-distance
    * ordering, so the decision is engine-reproducible with no float
    * tiebreak.
    *
    * Shape at scale: the only pairwise step is a self-equi-join ON THE
    * CELL KEY — cost ∝ Σ|cell|², never corpus², and k is the knob that
    * bounds it (pick k so cells stay ~10^4 rows at 100 TB). Everything
    * else is the k-means passes (map-only assignment) and one distinct +
    * one anti-join, all shuffle-partitionable.
    *
    * Returns every corpus row with its cell and a `kept` verdict. */
  def semDedup(corpus: DataFrame, k: Int, tau: Double, iters: Int = 2,
               idCol: String = "vec_id", embCol: String = "embedding",
               maxLiteralK: Int = maxLiteralCentroids): DataFrame = {
    require(tau > 0 && tau <= 1, s"semDedup needs tau in (0, 1], got $tau")
    val assigned = kmeansAssign(corpus, k, iters, idCol, embCol, maxLiteralK)
      .select(col(idCol), col("cell"))
    // materialized ONCE (corpus rows, id+cell+embedding): THREE branches
    // consume the assigned corpus — both sides of the within-cell pair
    // join and the final verdict join — and each would otherwise re-run
    // the k-means assignment map over the corpus (VERDICT r16 #5 sweep)
    val emb = graft.ops.Materialize.stable(
      corpus.select(col(idCol), col(embCol)).join(assigned, idCol),
      "semdedup-assigned")
    val removed = emb.select(col("cell"), col(idCol).as("__id_a"), col(embCol).as("__ea"))
      .join(emb.select(col("cell"), col(idCol).as("__id_b"), col(embCol).as("__eb")), "cell")
      .filter(col("__id_a") < col("__id_b"))
      .filter(cosine(col("__ea"), col("__eb")) >= tau)
      .select(col("__id_b").as(idCol)).distinct()
      .withColumn("__removed", lit(true))
    emb.join(removed, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("__removed"), lit(true)).as("kept"))
  }

  /** Hyperplane coefficients for [[knnLsh]], derived from the portable
    * md5 hash so the DuckDB oracle regenerates the identical planes:
    * c(p, i) = (h60("hp<p>_<i>") % 2001 - 1000) / 1000  in [-1, 1]. */
  def lshPlanes(nPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until nPlanes).map(p => Array.tabulate(dim)(i =>
      (TextAnalysis.h60Local(s"hp${p}_$i") % 2001 - 1000) / 1000.0))

  /** Sign-bit bucket id: bit p set iff dot(v, plane_p) > 0. The dot goes
    * through the codegen'd [[graft.functions.DotProduct]] against a LITERAL
    * coefficient array — a sequential left-to-right double fold, so the
    * sign decision is deterministic and engine-portable (a distributed
    * per-dimension aggregation would sum in partition order and could flip
    * a near-zero sign). */
  def lshBucket(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (cs, p) =>
      when(graft.functions.VectorExprs.dot(emb, typedlit(cs.toSeq)) > 0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed approximate kNN: probes search only their own
    * random-hyperplane bucket. With nPlanes=8 the corpus shards into <=256
    * buckets, cutting the scan ~256x at the cost of recall near bucket
    * boundaries — the scale path when brute force is too big, one notch
    * below [[knnIvf]] in recall but requiring no clustering column. */
  def knnLsh(probes: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
             dim: Option[Int] = None,
             maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    val planes = lshPlanes(nPlanes, resolveDim(corpus, dim))
    val c = graft.ops.Partitioning.spread(corpus)
      .withColumn("bucket", lshBucket(col("embedding"), planes))
    val p = guardProbes(probes, maxProbeRows)
      .withColumn("bucket", lshBucket(col("p_embedding"), planes))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
    c.join(broadcast(p), "bucket")
      .withColumn("cos", cosine(col("p_embedding"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("bucket"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** All pairs with cosine >= minCos (near-dup detection over embeddings).
    * Exact but pairwise — this is the RECALL ORACLE for
    * [[nearDupPairsBlocked]], not a scale path: O(n^2) cosine evaluations.
    * The size guard makes reaching it by accident at scale a loud error
    * instead of a cluster-melting plan; raise `maxRows` only for a
    * deliberate offline recall study. */
  def nearDupPairs(corpus: DataFrame, minCos: Double, maxRows: Long = 100000L): DataFrame = {
    // Bounded probe: scan at most maxRows+1 rows to decide, instead of a
    // full count() that would execute the whole upstream pipeline twice.
    val lim = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val n = corpus.limit(lim).count()
    require(n <= maxRows,
      s"nearDupPairs is the exact all-pairs recall oracle (O(n^2) > " +
        s"${BigInt(maxRows) * BigInt(maxRows) / 2} cosine evals beyond maxRows=$maxRows); " +
        "use nearDupPairsBlocked at scale")
    val a = graft.ops.Partitioning.spread(corpus)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.crossJoin(broadcast(b)).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Scale path for embedding near-dup: OR-amplified hyperplane LSH.
    * `tables` independent hash tables, each bucketing on `planesPerTable`
    * sign bits; a pair is a candidate if it collides in ANY table (standard
    * AND-OR amplification — per-plane survival 1 - theta/pi, per-table
    * p^k, overall recall 1 - (1 - p^k)^L). Candidate generation is an
    * EQUI-join on (table, bucket) — shuffle-partitionable, no broadcast of
    * the corpus — followed by the exact cosine check on candidates only.
    * Tune k up (smaller buckets, cheaper join) and L up (recall) for the
    * target threshold; k=2/L=3 gives ~86% recall at cos 0.45. */
  def nearDupPairsBlocked(corpus: DataFrame, minCos: Double,
                          tables: Int = 3, planesPerTable: Int = 2,
                          dim: Option[Int] = None,
                          onCache: DataFrame => Unit = _ => ()): DataFrame = {
    val planes = lshPlanes(tables * planesPerTable, resolveDim(corpus, dim))
    // Bucket table only — (vec_id, tbl, bucket), ID-sized, no embeddings —
    // persisted because both self-join branches would otherwise recompute
    // every plane dot product (Catalyst has no cross-branch reuse).
    val keyed = graft.ops.Partitioning.spread(corpus)
      .select(col("vec_id"),
        explode(array((0 until tables).map { l =>
          val sub = planes.slice(l * planesPerTable, (l + 1) * planesPerTable)
          struct(lit(l).as("tbl"), lshBucket(col("embedding"), sub).as("bucket"))
        }: _*)).as("t"))
      .select(col("vec_id"), col("t.tbl"), col("t.bucket"))
      .persist()
    onCache(keyed)
    val cand = keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val emb = corpus.select(col("vec_id"), col("embedding"))
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  // ---- random-projection (Johnson–Lindenstrauss) dimension-compressed scan ----

  /** Deterministic ±1 projection rows (Achlioptas 2003's database-friendly
    * JL variant, JCSS 66(4) — ±1 entries preserve pairwise geometry like
    * Gaussian rows but need no float RNG), signs from the portable hash so
    * the oracle regenerates the identical matrix:
    * coef(j, i) = +1 iff h60("rp<salt>_<j>_<i>") is even. */
  def rpPlanes(rDim: Int, dim: Int, salt: String = "rp-v1"): Seq[Array[Double]] =
    (0 until rDim).map(j => Array.tabulate(dim)(i =>
      if (TextAnalysis.h60Local(s"rp${salt}_${j}_${i}") % 2 == 0) 1.0 else -1.0))

  /** Project an embedding onto the rDim hash-derived ±1 rows — rDim
    * codegen'd sequential-fold dot products against literal coefficient
    * arrays (the lshBucket discipline: never a distributed per-dimension
    * sum, whose partition order could drift a double). The JL 1/sqrt(r)
    * scale is omitted: cosine is scale-invariant and the re-rank below is
    * exact anyway. */
  def projectRp(emb: Column, planes: Seq[Array[Double]]): Column =
    array(planes.map(p =>
      graft.functions.VectorExprs.dot(emb, typedlit(p.toSeq))): _*)

  /** The ANN tier that compresses DIMENSIONS, completing the compression
    * triptych: [[knnQuantized]] shrinks values (int8), [[knnPq]] shrinks
    * to codes, this shrinks width — project corpus and probes to rDim via
    * the JL ±1 matrix (map-only, plan-literal coefficients), run the
    * approximate scan in rDim (dim/rDim × fewer bytes and multiplies
    * through the scan), keep k·refine candidates per probe, re-rank
    * exactly on the true vectors. Same bounded per-probe re-rank margin
    * as the other tiers; recall degrades gracefully as rDim shrinks (JL:
    * pairwise angles preserved to ~1/sqrt(rDim)). Composable with int8
    * quantization of the PROJECTED vectors for both wins at once. */
  def knnRandomProjection(probes: DataFrame, corpus: DataFrame, k: Int,
                          rDim: Int = 16, refine: Int = 4,
                          dim: Option[Int] = None, salt: String = "rp-v1",
                          maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(rDim >= 1, s"rDim must be >= 1, got $rDim")
    val d = resolveDim(corpus, dim)
    require(rDim <= d, s"projection dim $rDim exceeds embedding dim $d")
    val planes = rpPlanes(rDim, d, salt)
    val approxCorpus = corpus.select(col("vec_id"),
      projectRp(col("embedding"), planes).as("embedding"))
    val approxProbes = probes.select(col("probe_id"),
      projectRp(col("p_embedding"), planes).as("p_embedding"))
    val cand = knnBrute(approxProbes, approxCorpus, k * refine, maxProbeRows)
      .select("probe_id", "vec_id")
    rerankExact(cand, probes, corpus, k)
  }

  /** The composed tier: JL-project to rDim, THEN int8-quantize the
    * projected vectors — width and value compression multiply
    * (dim/rDim × 4 fewer bytes through the approximate scan; 64-dim
    * floats → 16 int8 codes is 16×), with the same exact re-rank on the
    * TRUE vectors bounding the recall cost to the shortlist margin. The
    * quantizer's per-dim (min, max) model is fitted on the PROJECTED
    * corpus — rDim rows of driver state, smaller than the unprojected
    * fit. */
  def knnRpQuantized(probes: DataFrame, corpus: DataFrame, k: Int,
                     rDim: Int = 16, refine: Int = 4,
                     dim: Option[Int] = None, salt: String = "rp-v1",
                     maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val d = resolveDim(corpus, dim)
    require(rDim >= 1 && rDim <= d,
      s"projection dim $rDim must be in [1, $d]")
    val planes = rpPlanes(rDim, d, salt)
    val projCorpus = corpus.select(col("vec_id"),
      projectRp(col("embedding"), planes).as("embedding"))
    val projProbes = probes.select(col("probe_id"),
      projectRp(col("p_embedding"), planes).as("p_embedding"))
    val (mins, maxs) = quantizeStats(projCorpus, Some(rDim))
    val approxCorpus = quantizeVectors(projCorpus, mins, maxs)
      .select(col("vec_id"), dequant(mins, maxs).as("embedding"))
    val cand = knnBrute(projProbes, approxCorpus, k * refine, maxProbeRows)
      .select("probe_id", "vec_id")
    rerankExact(cand, probes, corpus, k)
  }

  // ---- int8 scalar quantization (memory-bandwidth-compressed ANN scan) ----

  /** Per-dimension (min, max) over the corpus — the quantizer's "model".
    * One posexplode groupBy (map-side partials), then a dim-rows collect:
    * the same bounded driver-state budget as the k-means centroids (dim
    * doubles, corpus-size-independent). */
  def quantizeStats(corpus: DataFrame,
                    dim: Option[Int] = None): (Array[Double], Array[Double]) = {
    val d = resolveDim(corpus, dim)
    val rows = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect()
    require(rows.length == d,
      s"quantizeStats: expected $d dimensions, aggregated ${rows.length}")
    val mn = new Array[Double](d); val mx = new Array[Double](d)
    rows.foreach { r =>
      val p = r.getInt(0); mn(p) = r.getDouble(1); mx(p) = r.getDouble(2)
    }
    (mn, mx)
  }

  private def spanOf(mins: Array[Double], maxs: Array[Double]): Array[Double] =
    mins.indices.map(i =>
      if (maxs(i) == mins(i)) 1.0 else maxs(i) - mins(i)).toArray

  /** Scalar int8 quantization: code_i = round((x_i − mn_i)·254/span_i) − 127
    * ∈ [−127, 127], stored as ARRAY<TINYINT> — 4× smaller than float32, so
    * a quantized ANN scan moves a quarter of the bytes through memory and
    * network (the production reason to quantize; see the IVF-SQ layout in
    * the FAISS line of work). Map-only; the per-dim params ride as plan
    * literals (dim-bounded, the centroid precedent). */
  def quantizeVectors(corpus: DataFrame, mins: Array[Double],
                      maxs: Array[Double]): DataFrame = {
    val spans = spanOf(mins, maxs)
    val mnLit = array(mins.map(lit(_)): _*)
    val spLit = array(spans.map(lit(_)): _*)
    corpus.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        (round((x.cast("double") - element_at(mnLit, i + 1)) * 254 /
          element_at(spLit, i + 1)).cast("int") - 127).cast("byte"))
        .as("qcode"))
  }

  /** Dequantized double vector: mn_i + (code_i + 127)·span_i/254 — the
    * value the approximate scan scores against. */
  private def dequant(mins: Array[Double], maxs: Array[Double]): Column = {
    val spans = spanOf(mins, maxs)
    val mnLit = array(mins.map(lit(_)): _*)
    val spLit = array(spans.map(lit(_)): _*)
    transform(col("qcode"), (c, i) =>
      element_at(mnLit, i + 1) +
        (c.cast("double") + 127) * element_at(spLit, i + 1) / 254)
  }

  /** Approximate kNN over int8-quantized vectors with exact re-rank: the
    * brute scan runs on dequantized codes (4× less memory traffic at the
    * cost of ≤ half a quantization step per dimension), keeps k·`refine`
    * candidates per probe, and the true float vectors are consulted only
    * for that bounded candidate set — the standard SQ/ADC two-stage
    * search. Raise `refine` to recover any recall the quantizer loses
    * ([[recallAtK]] against [[knnBrute]] is the audit).
    *
    * Shape at scale: stats are one dim-bounded aggregate; the candidate
    * scan inherits [[knnBrute]]'s shape (corpus streamed, probes
    * broadcast, per-partition heaps — never a shuffle of the scored set);
    * the re-rank joins touch k·refine·|probes| rows, and its rank window
    * is partitioned by probe over ≤ k·refine rows — bounded, never
    * corpus-sized. */
  def knnQuantized(probes: DataFrame, corpus: DataFrame, k: Int,
                   refine: Int = 4, dim: Option[Int] = None,
                   maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val (mins, maxs) = quantizeStats(corpus, dim)
    val approxCorpus = quantizeVectors(corpus, mins, maxs)
      .select(col("vec_id"), dequant(mins, maxs).as("embedding"))
    val cand = knnBrute(probes, approxCorpus, k * refine, maxProbeRows)
      .select("probe_id", "vec_id")
    rerankExact(cand, probes, corpus, k)
  }

  /** Exact re-rank of a bounded (probe_id, vec_id) candidate set on the
    * TRUE vectors — the second stage every compressed-scan search
    * ([[knnQuantized]], [[knnPq]]) shares. The window is per-probe over
    * the candidate margin only. */
  private def rerankExact(cand: DataFrame, probes: DataFrame,
                          corpus: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("cos"), col("vec_id"))
    cand
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes.select(col("probe_id"), col("p_embedding"))), "probe_id")
      .withColumn("cos", cosine(col("p_embedding"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"),
        round(col("cos"), 6).as("cosine"))
  }

  // ---- product quantization (Jégou/Douze/Schmid, TPAMI 2011) ----

  /** Product-quantize the corpus: split each embedding into `m`
    * contiguous subspaces, k-means each subspace independently
    * ([[kmeansFit]] — the identical seeding/assignment chain, so an
    * engine-portable oracle can replay it), and keep per vector only the
    * m subspace codes. With kCent = 8 and m = 4 a 64-float vector
    * becomes 4 small ints — the compression regime where a 100 TB ANN
    * scan's bytes drop by ~60× and the codebooks (m·kCent·(dim/m)
    * doubles) ride along as driver literals.
    *
    * Returns (codes, codebooks): codes = (idCol, code_0..code_{m−1}),
    * codebooks(s) = subspace s's (cell, centroid) values. */
  def pqFit(corpus: DataFrame, m: Int, kCent: Int = 8, iters: Int = 2,
            dim: Option[Int] = None, idCol: String = "vec_id",
            embCol: String = "embedding")
      : (DataFrame, Seq[Seq[(Int, Array[Double])]]) = {
    require(m >= 1, s"pqFit needs >= 1 subspaces, got $m")
    val d = resolveDim(
      corpus.select(col(idCol), col(embCol).as("embedding")), dim)
    require(d % m == 0, s"embedding dim $d is not divisible by $m subspaces")
    val sub = d / m
    val base = corpus.select(col(idCol), col(embCol))
    var codes = corpus.select(col(idCol))
    val books = (0 until m).map { s =>
      val sliced = base.select(col(idCol),
        slice(col(embCol), s * sub + 1, sub).as(embCol))
      val (cents, assigned) = kmeansFit(sliced, kCent, iters, idCol, embCol)
      codes = codes.join(
        assigned.select(col(idCol), col("cell").as(s"code_$s")), idCol)
      cents
    }
    (codes, books)
  }

  /** Reconstruct the approximation each PQ code vector stands for: the
    * concatenation of its m codebook centroids — map-only (the codebooks
    * fold in as a literal code→centroid map per subspace; a dead cell
    * can't appear in codes, so the map is total over observed codes). */
  def pqReconstruct(codes: DataFrame,
                    books: Seq[Seq[(Int, Array[Double])]],
                    idCol: String = "vec_id",
                    outCol: String = "embedding"): DataFrame = {
    val parts = books.zipWithIndex.map { case (cents, s) =>
      val keys = array(cents.map(c => lit(c._1)): _*)
      val vals = array(cents.map(c => typedlit(c._2.toSeq)): _*)
      element_at(map_from_arrays(keys, vals), col(s"code_$s"))
    }
    codes.select(col(idCol), concat(parts: _*).as(outCol))
  }

  /** Approximate kNN over PQ codes with exact re-rank — [[knnQuantized]]'s
    * aggressive sibling: the approximate scan reads m code ints per
    * vector instead of dim floats, scores against the reconstructed
    * centroids, keeps k·`refine` candidates per probe, and the true
    * vectors are consulted only for that bounded set. More compression,
    * more quantization error — `refine` and kCent are the recall knobs,
    * [[recallAtK]] vs [[knnBrute]] the audit.
    *
    * Same scale shape as [[knnQuantized]]: fit = m bounded k-means runs;
    * reconstruction map-only; candidate scan streams the corpus with
    * per-partition heaps; the re-rank window is per-probe-bounded. */
  def knnPq(probes: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 4, kCent: Int = 8, iters: Int = 2, refine: Int = 4,
            dim: Option[Int] = None,
            maxProbeRows: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val (codes, books) = pqFit(corpus, m, kCent, iters, dim)
    val approx = pqReconstruct(codes, books)
    val cand = knnBrute(probes, approx, k * refine, maxProbeRows)
      .select("probe_id", "vec_id")
    rerankExact(cand, probes, corpus, k)
  }

  /** Centroid-based silhouette — the clustering-quality audit for a cell
    * assignment (IVF cells, labels, semdedup groups): per point, cosine
    * distance a to its OWN cell centroid and b to the NEAREST other
    * centroid; s = (b − a)/max(a, b) ∈ [−1, 1]. Positive = the point
    * sits with its cluster; negative = it would rather live elsewhere —
    * read per cell, this is the "which labels are incoherent" report a
    * curation pass consults before trusting cell-scoped dedup.
    *
    * Full silhouette is pairwise (Σ|cell|² — the reason nobody runs it
    * at corpus scale); the centroid form is the standard linear-time
    * surrogate: one broadcast of the (bounded, [[centroids]]-contract)
    * centroid table, a |cells|-way fan-out per point, two conditional
    * folds. Determinism: distances round at 6 dp BEFORE the min/compare
    * (the rank-boundary rule), the per-point s rounds at 6 dp, and the
    * per-cell mean is a DECIMAL sum with ONE final division. A corpus
    * with a single cell has no "other" centroid — its silhouette is
    * null, not 0. Returns (cell, n, mean_sil). */
  def centroidSilhouette(corpus: DataFrame, cellCol: String): DataFrame = {
    val cents = centroids(corpus, cellCol)
    val scored = corpus
      .select(col("vec_id"), col(cellCol).as("cell"), col("embedding"))
      .crossJoin(broadcast(
        cents.select(col("cell").as("__c"), col("centroid"))))
      .withColumn("__d", TextAnalysis.round6Portable(
        lit(1.0) - cosine(col("embedding"), col("centroid"))))
    val ab = scored.groupBy("vec_id", "cell").agg(
      max(when(col("cell") === col("__c"), col("__d"))).as("__a"),
      min(when(col("cell") =!= col("__c"), col("__d"))).as("__b"))
    val denom = greatest(col("__a"), col("__b"))
    val sil = when(col("__b").isNull, lit(null).cast("double"))
      .when(denom === 0.0, lit(0.0))
      .otherwise(TextAnalysis.round6Portable(
        (col("__b") - col("__a")) / denom))
    ab.withColumn("__sil", sil)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        when(count(col("__sil")) > 0, TextAnalysis.round6Portable(
          sum(col("__sil").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
            .cast("double") / count(col("__sil")))).as("mean_sil"))
  }
}
