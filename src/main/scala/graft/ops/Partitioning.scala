package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-heavy scans of small inputs.
  *
  * Spark sizes scan partitions by input BYTES (`files.maxPartitionBytes`),
  * which is right for IO-bound plans but wrong when a cheap-to-read side
  * feeds a compute-bound operator: a 200 KB parquet file arrives as ONE
  * partition, so a BroadcastNestedLoopJoin scoring millions of pairs against
  * it runs on one core. [[spread]] repartitions UP to the cluster's default
  * parallelism only when the plan has fewer partitions — on a real multi-TB
  * input (thousands of splits) it is a no-op, so the shuffle cost is only
  * ever paid when the input is small enough for it to be trivial.
  */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    // Streaming plans cannot be size-probed (optimizedPlan analysis is
    // batch-only) and micro-batch parallelism is the trigger's concern —
    // no-op so shared operators (round 18: cmsCounters et al.) stay
    // usable on their streaming twins.
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Size-statistics probe, NOT df.rdd.getNumPartitions: the RDD conversion
    // forced eager PHYSICAL planning of every scored pipeline (each input
    // planned twice) and pinned an AQE-opaque RDD boundary into the plan.
    // Optimized-plan stats are driver-side metadata — no job, no physical
    // plan, no boundary: file relations report their on-disk bytes, so an
    // input smaller than one scan split per core (i.e. one that cannot fill
    // the cluster by byte-based splitting) is repartitioned up, and a real
    // multi-split input passes through untouched — same decision the
    // partition-count probe made, for metadata cost.
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(maxSplit) * target) df.repartition(target) else df
  }

  /** Z-value (Morton code) of two non-negative integer columns, `bits`
    * bits each: bit i of `x` lands at position 2i, of `y` at 2i+1, so
    * sorting by the z-value interleaves locality in BOTH dimensions.
    * Pure integer shift/mask arithmetic composed as one fixed expression
    * (2·bits terms) — codegen'd, map-only, and reproducible in any engine.
    * Precondition: 0 <= x, y < 2^bits (caller clamps or scales; violations
    * interleave garbage high bits, they do not error). */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"zValue needs 1 <= bits <= 31, got $bits")
    import org.apache.spark.sql.functions._
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** N-dimensional Morton code: bit i of column j lands at position
    * i·n + j (round-robin interleave), so a z-sort clusters locality
    * across ALL n dimensions from one key. 2-D [[zValue]] is the n = 2
    * special case (identical bit layout). Same precondition per column:
    * 0 <= value < 2^bits. n·bits must fit a signed long. */
  def zValueN(cols: Seq[org.apache.spark.sql.Column],
              bits: Int): org.apache.spark.sql.Column = {
    require(cols.size >= 2, s"zValueN needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    import org.apache.spark.sql.functions._
    val n = cols.size
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ + _)
  }

  /** Write `df` clustered by the z-value of (x, y): range-partition on z
    * into `files` output files, sort within each. The data-layout step
    * that makes BOTH `x` range scans and `y` range scans prune well from
    * ONE copy of the data — each output file covers a compact z-range,
    * i.e. a small rectangle in (x, y) space, so parquet/engine min-max
    * stats on either column skip most files. The shuffle is paid once at
    * write time (same economics as [[writeBucketed]]). */
  def writeZOrdered(df: DataFrame, path: String,
                    x: String, y: String, bits: Int, files: Int = 64): Unit =
    writeZOrderedN(df, path, Seq(x, y), bits, files)

  /** N-dimensional [[writeZOrdered]]: cluster on the [[zValueN]] key so
    * range scans on ANY of the `cols` prune well from one data copy.
    * The 2-D entry point is the n = 2 special case (identical z key).
    * Dimensional honesty: each added dimension splits the same bit
    * budget, so per-dimension box tightness falls as n grows — 3-4
    * dimensions is the practical ceiling before min-max skipping decays
    * toward a plain hash layout. */
  def writeZOrderedN(df: DataFrame, path: String,
                     cols: Seq[String], bits: Int, files: Int = 64): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__z", zValueN(cols.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Layout AUDIT for a z-order clustering: assign rows to equal-width
    * z-range stripes and report each stripe's row count and per-dimension
    * min-max box. Tight boxes == good data-skipping; the stripe stats are
    * exactly what a file-level min-max index would hold after
    * [[writeZOrdered]]. Stripe width adapts to the OCCUPIED z-range
    * (width = max(z) div stripes + 1, folded into the plan as a 1-row
    * broadcast — no sampling, no driver collect, so an oracle reproduces
    * every stripe id), because the fixed 4^bits space is mostly empty
    * whenever the dimensions don't fill their bit budget. One map-only z
    * computation + one partial-agg groupBy. */
  def zorderStats(df: DataFrame, x: String, y: String,
                  bits: Int, stripes: Int = 64): DataFrame =
    zorderStatsN(df, Seq(x, y), bits, stripes)

  /** N-dimensional [[zorderStats]]: the same adaptive-stripe audit over a
    * [[zValueN]] key, reporting every dimension's min-max box per stripe.
    * Same plan shape regardless of n — one map-only z expression, a 1-row
    * broadcast for the occupied range, one partial-agg groupBy. */
  def zorderStatsN(df: DataFrame, cols: Seq[String],
                   bits: Int, stripes: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions._
    require(stripes >= 1, s"zorderStats needs >= 1 stripes, got $stripes")
    val z = df.withColumn("__z", zValueN(cols.map(col), bits))
    val zm = z.agg(max("__z").as("__zmax"))
    val boxes = cols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c")))
    z.crossJoin(broadcast(zm))
      .groupBy(expr(s"__z div (__zmax div $stripes + 1)").as("stripe"))
      .agg(count(lit(1)).as("n"), boxes: _*)
  }

  /** Contiguous, deterministic GLOBAL ids 0..n-1 without a global sort —
    * the scale-safe alternative to an unpartitioned `row_number()` (which
    * moves the whole table to ONE partition) and to
    * `monotonically_increasing_id` (non-contiguous, partitioning-
    * dependent). The training-shard sequencer: stable example ids across
    * reruns, retries, and engines.
    *
    * Two-phase bucket-offset pattern: rows hash into `buckets` streams
    * (the portable h60 — no RNG), rank LOCALLY per bucket (window state
    * bounded by bucket size), then each bucket's starting offset is the
    * prefix sum of bucket COUNTS — a bucket-cardinality-sized table,
    * computed in-plan and broadcast back. global_id = offset + local rank.
    * The id order is (hash, id) — i.e. assignment doubles as a
    * deterministic global shuffle of the corpus, which is what a training
    * pipeline wants anyway. `idCol` must be UNIQUE: two rows sharing an id
    * would tie in the sort and receive their two global ids in an
    * arbitrary (though set-stable) order. */
  def contiguousIds(df: DataFrame, idCol: String, buckets: Int = 64): DataFrame =
    hashOrderIds(df, idCol, "gid:", buckets, "global_id")

  /** Deterministic per-epoch global shuffle: position 0..n-1 under the
    * epoch-salted hash order — each epoch is a DIFFERENT (but fully
    * reproducible) permutation of the corpus, which is exactly what a
    * trainer wants between epochs. Same two-phase bucket-offset shape as
    * [[contiguousIds]] (no global sort, no RNG): re-deriving epoch k on
    * any engine, partitioning, or retry yields the identical permutation,
    * so a resumed training run sees the same example order. Compose with
    * [[writeShards]]' layout by reading examples in `pos` order. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   buckets: Int = 64): DataFrame =
    hashOrderIds(df, idCol, s"ep$epoch:", buckets, "pos")

  /** Deterministic negative-pair sampling for contrastive training: each
    * anchor draws `k` partners at salted-hash OFFSETS in the
    * [[contiguousIds]] ring — partner(gid) = (gid + off_j) mod n with
    * off_j = h60(salt:j) % (n−1) + 1, so a partner is never the anchor
    * and the whole draw is engine-reproducible (no RNG — the q47/q97
    * rule: retries, engines, and partitionings all agree). Scale shape:
    * the two-phase hash-order ids, a 1-row count broadcast, a k-row
    * offset explode, and ONE equi-join on the partner id — never a
    * cross join, never a per-anchor shuffle of the corpus. Offsets for
    * different j are independent hash draws and may coincide; n must be
    * >= 2 (at n = 1 the modulo nulls out and the join drops the row
    * rather than pairing an anchor with itself). */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
                    salt: String): DataFrame = {
    require(k >= 1, s"negativePairs needs k >= 1, got $k")
    import org.apache.spark.sql.functions._
    val ids = contiguousIds(df, idCol).select(col(idCol), col("global_id"))
    val n = ids.agg(count(lit(1)).as("__n"))
    val withJ = ids.crossJoin(broadcast(n))
      .withColumn("j", explode(array((1 to k).map(lit(_)): _*)))
      .withColumn("__off", graft.ext.TextAnalysis.h60(
        concat(lit(salt + ":"), col("j").cast("string"))) % (col("__n") - 1) + 1)
      .withColumn("__pgid", (col("global_id") + col("__off")) % col("__n"))
    val partners = ids.select(col(idCol).as("neg_id"),
      col("global_id").as("__pgid"))
    withJ.join(partners, "__pgid")
      .select(col(idCol).as("anchor_id"), col("j"), col("neg_id"))
  }

  private def hashOrderIds(df: DataFrame, idCol: String, salt: String,
                           buckets: Int, outCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    require(buckets >= 1, s"hash-order ids need >= 1 buckets, got $buckets")
    val h = graft.ext.TextAnalysis.h60(concat(lit(salt), col(idCol).cast("string")))
    val local = df.withColumn("__h", h)
      .withColumn("__b", (col("__h") % buckets).cast("int"))
      .withColumn("__r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__b")
          .orderBy("__h", idCol)))
    // prefix-sum the per-bucket counts: `buckets` rows, partitionBy(lit(0))
    // keeps the (trivially single-group) window warning-free
    val offsets = local.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy("__b").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("__b", "__off")
    local.join(broadcast(offsets), "__b")
      .withColumn(outCol, col("__off") + col("__r") - 1)
      .drop("__h", "__b", "__r", "__off")
  }

  /** Training-shard writer: assign [[contiguousIds]] and write exactly
    * `rowsPerShard` consecutive examples per shard directory
    * (`shard=<k>/`), each shard one file, rows in global-id order. The
    * last mile of a curation pipeline — downstream trainers address
    * examples as (shard, offset), and because the ids are deterministic
    * hash-order, a rerun writes byte-identical shards.
    *
    * One extra shuffle (repartition by shard) beyond the id assignment;
    * shard size is the file-size knob — pick rowsPerShard so a shard is
    * ~100 MB-1 GB at your row width. */
  def writeShards(df: DataFrame, path: String, idCol: String,
                  rowsPerShard: Long, buckets: Int = 64): Unit = {
    import org.apache.spark.sql.functions._
    require(rowsPerShard >= 1, s"rowsPerShard must be >= 1, got $rowsPerShard")
    contiguousIds(df, idCol, buckets)
      .withColumn("shard", expr(s"global_id div $rowsPerShard"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "global_id")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Quantile-range-partitioned write: bucket every row by its corpus
    * value QUANTILE ([[graft.ext.Sketches.equiDepthBucket]]'s sketch-CDF
    * assignment — deterministic, unlike `repartitionByRange`'s sampled
    * boundaries) and write one directory per bucket with rows sorted by
    * the value. Each bucket is a CONTIGUOUS value range of near-equal
    * population, so on ANY skewed signal (a) output sizes stay balanced
    * — the hash layout's property — while (b) every file covers a tight
    * value interval, so min/max stats prune range scans file-level — the
    * range layout's property. The shuffle is paid once at write time
    * ([[writeBucketed]] economics); this is the layout writer the
    * equi-depth STATS (q118) point at, and the missing piece between
    * quantile statistics and quantile PARTITIONING. Bucket resolution
    * caveats are [[graft.ext.Sketches.equiDepthBucket]]'s (one histogram
    * bin; a boundary-spanning hot value makes neighbors uneven — that is
    * the value's true mass). */
  def writeRangeBucketed(df: DataFrame, path: String,
                         value: org.apache.spark.sql.Column, k: Int,
                         histBuckets: Int = graft.ext.Sketches.HIST_BUCKETS,
                         bucketCol: String = "range_bucket"): Unit = {
    import org.apache.spark.sql.functions._
    graft.ext.Sketches.equiDepthBucket(df, value, k, histBuckets, bucketCol)
      .repartition(col(bucketCol))
      .sortWithinPartitions(col(bucketCol), value)
      .write.mode("overwrite").partitionBy(bucketCol).parquet(path)
  }

  /** Bucketed materialization for co-located joins: write `df` as a table
    * hash-bucketed (and sorted) by `key`, so every future equi-join or
    * aggregation on `key` between same-bucketed tables plans WITHOUT a
    * shuffle — the join's exchange is paid ONCE at write time instead of
    * once per downstream query. The scale lever for fact-to-fact joins
    * repeated across a pipeline (events ⋈ purchases by user, docs ⋈
    * features by doc_id): at 100 TB, re-shuffling both sides per query
    * dominates everything; two tables bucketed by the same key into the
    * same count join map-side. Requires a metastore table (`saveAsTable`) —
    * plain parquet paths carry no bucket metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Modulus for the portable rendezvous weights: products of two
    * residues stay under 2^60, inside BIGINT on every engine (DuckDB
    * ERRORS on 64-bit overflow, Spark wraps — neither may happen). */
  val RendezvousP = 1000000007L

  /** The highest-random-weight score of (id, shard): an affine hash in
    * Z_P, portable to any SQL engine verbatim. */
  def rendezvousWeight(id: org.apache.spark.sql.Column,
                       shard: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (pmod(id.cast("long"), lit(RendezvousP)) *
      lit((2654435761L * (shard + 1)) % RendezvousP) + shard) % RendezvousP
  }

  /** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
    * 1996: key → argmax over shards of a per-(key, shard) hash weight.
    * The property that matters at fleet scale: REMOVING a shard
    * relocates exactly the keys that lived on it (each surviving
    * shard's weight is unchanged, so every other key keeps its argmax)
    * — no ring, no token table, no remap storm; consistent-hashing
    * semantics from pure arithmetic. Weights are affine hashes mod a
    * 31-bit prime so any SQL engine reproduces every assignment
    * bit-for-bit (no library murmur). Ties break to the SMALLER shard
    * id via a max(struct(weight, −shard)) over the unrolled shard list.
    * Shape: MAP-ONLY — the assignment is a per-row expression over
    * `shards` inline structs; nothing shuffles until the caller
    * aggregates or writes by `shard`. Adds a `shard` column. */
  def rendezvousShard(df: DataFrame, idCol: String, shards: Int,
                      outCol: String = "shard"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(shards >= 1 && shards <= 4096,
      s"shards must be in [1,4096]: $shards")
    // Loud-guard (ADVICE r13): a non-numeric id silently casts to null
    // in rendezvousWeight's cast("long"), nulling every arm's weight and
    // emitting a null shard for every row. String keys route through the
    // portable h60 hash instead; anything else is a schema error.
    val idType = df.schema(idCol).dataType
    val idNum: org.apache.spark.sql.Column = idType match {
      case _: org.apache.spark.sql.types.NumericType => col(idCol)
      case org.apache.spark.sql.types.StringType =>
        graft.ext.TextAnalysis.h60(col(idCol))
      case other => throw new IllegalArgumentException(
        s"rendezvousShard: id column `$idCol` must be numeric or string " +
          s"(strings hash through h60), got $other")
    }
    val arms = (0 until shards).map { sh =>
      struct(rendezvousWeight(idNum, sh).as("w"),
        lit(-sh.toLong).as("ns"))
    }
    val best =
      if (arms.size == 1) arms.head else greatest(arms: _*)
    df.withColumn(outCol, (-best.getField("ns")).cast("int"))
  }

  /** Hilbert-curve index of (x, y) on a 2^bits × 2^bits grid — the
    * space-filling layout key whose CONSECUTIVE indices are always
    * grid-NEIGHBORS (Manhattan distance exactly 1), unlike the Morton
    * [[zValue]] whose curve jumps across the space at every power-of-two
    * boundary. Same write-time economics as [[writeZOrdered]], strictly
    * better worst-case box tightness per file; the price is the deeper
    * key expression. Standard iterative xy2d transform (per-level
    * reflect-and-swap) unrolled into `bits` levels of named intermediate
    * columns — declarative, codegen'd, no UDF. Precondition per column:
    * 0 ≤ value < 2^bits (rebase first, the [[zValue]] contract).
    * [[hilbertCtesSql]] renders the identical transform as a SQL CTE
    * chain so an external engine reproduces every index bit-for-bit. */
  def hilbertValue(df: DataFrame, xCol: String, yCol: String,
                   bits: Int, outCol: String = "hilbert"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 16, s"hilbertValue needs 1 <= bits <= 16: $bits")
    var cur = df.withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
      cur = cur
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx",
          when(col("__ry") === 0L,
            when(col("__rx") === 1L, lit(s - 1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0L,
            when(col("__rx") === 1L, lit(s - 1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.withColumn(outCol, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry", "__nx", "__ny")
  }

  /** The [[hilbertValue]] transform as a SQL CTE chain (DuckDB/ANSI
    * dialect): emits `h0 AS (...), h1 AS (...), …` reading `x`/`y` from
    * relation `src`, leaving the index in column `hd` of CTE
    * `h{bits}` — splice into a WITH clause. Level k's state columns are
    * suffixed k so the chain is linear-sized (no expression blow-up). */
  def hilbertCtesSql(src: String, bits: Int): String = {
    require(bits >= 1 && bits <= 16, s"hilbertCtesSql needs 1 <= bits <= 16: $bits")
    val b = new StringBuilder
    b ++= s"h0 AS (SELECT *, CAST(x AS BIGINT) AS hx0, " +
      s"CAST(y AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 FROM $src)"
    var lvl = 0
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val (p, n) = (lvl, lvl + 1)
      b ++= s""",
         |h$n AS (SELECT * EXCLUDE (hx$p, hy$p, hd$p),
         |  hd$p + ${s * s} * xor(3 * (CASE WHEN (hx$p & $s) > 0 THEN 1 ELSE 0 END),
         |                        (CASE WHEN (hy$p & $s) > 0 THEN 1 ELSE 0 END)) AS hd$n,
         |  CASE WHEN (hy$p & $s) = 0 THEN
         |    (CASE WHEN (hx$p & $s) > 0 THEN ${s - 1} - hy$p ELSE hy$p END)
         |  ELSE hx$p END AS hx$n,
         |  CASE WHEN (hy$p & $s) = 0 THEN
         |    (CASE WHEN (hx$p & $s) > 0 THEN ${s - 1} - hx$p ELSE hx$p END)
         |  ELSE hy$p END AS hy$n
         |FROM h$p)""".stripMargin
      lvl = n
    }
    b.result().linesIterator.mkString("\n")
  }

  /** [[zorderStats]]' sibling audit for the Hilbert key: per-stripe row
    * count and min-max box over the [[hilbertValue]] index — same
    * adaptive stripe width, same map-only + one-fold shape. */
  def hilbertStats(df: DataFrame, x: String, y: String,
                   bits: Int, stripes: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions._
    require(stripes >= 1, s"hilbertStats needs >= 1 stripes, got $stripes")
    val h = hilbertValue(df.select(col(x), col(y)), x, y, bits, "__h")
    val hm = h.agg(max("__h").as("__hmax"))
    h.crossJoin(broadcast(hm))
      .groupBy(expr(s"__h div (__hmax div $stripes + 1)").as("stripe"))
      .agg(count(lit(1)).as("n"),
        min(x).as(s"min_$x"), max(x).as(s"max_$x"),
        min(y).as(s"min_$y"), max(y).as(s"max_$y"))
  }
}
