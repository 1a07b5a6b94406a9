package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-join techniques: skew salting and Bloom runtime filtering —
  * result-identical to the plain equi-join (specs + oracle queries pin it),
  * different physics at 100 TB.
  */
object JoinOps {

  /** Skew-safe inner equi-join: the BIG side's rows are salted into
    * `salts` shards by a hash of `rowKey` (any expression unique-ish per
    * row — NOT the join key: the whole point is spreading one hot join
    * key's rows across shards), and the SMALL side is replicated once per
    * salt, so the shuffle key becomes (key, salt) and a hot key's rows
    * land on `salts` reducers instead of one.
    *
    * Result is EXACTLY the plain inner join (every big row matches its
    * key's small rows in precisely its own salt shard). Deterministic —
    * the salt is the portable h60 hash, not RNG — so retries and engines
    * agree. Use when a key's row count exceeds what one task should hold
    * and the small side is too big to broadcast outright (else AQE's
    * skew-join or a plain broadcast already solves it); the cost is
    * materializing the small side `salts` times into the shuffle. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     rowKey: Column, salts: Int): DataFrame = {
    require(salts >= 2, s"salting needs >= 2 shards, got $salts")
    require(!big.columns.contains("__graft_salt") && !small.columns.contains("__graft_salt"),
      "__graft_salt is reserved")
    // null-safe: a null rowKey must not null the salt (the row would then
    // silently vanish from an inner join the plain join keeps) — all such
    // rows land deterministically in one shard instead
    // spread the big side (round 18, opt guide §2.5): a few-split scan
    // pinned the salt hash + join map work to the file's split count
    // (q71 measured 2.4s over 3 tasks). No-op on multi-split inputs.
    val saltedBig = graft.ops.Partitioning.spread(big).withColumn("__graft_salt",
      pmod(graft.ext.TextAnalysis.h60(coalesce(rowKey.cast("string"), lit(""))),
        lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }

  /** Driver-side Bloom bitmask over `build`'s `key` values: BLOOM_BITS
    * bits packed into BLOOM_BITS/64 longs (32 KB at the default 2^18) —
    * bounded by the filter geometry, NEVER by the build side's row count,
    * the same driver-state contract as k-means centroids. The bit
    * positions come from [[graft.ext.Sketches.bloomBits]], so the mask is
    * engine-reproducible bit-for-bit.
    *
    * EAGER by design: the mask must materialize before the probe plan can
    * embed it as a literal (Spark's own runtime filters execute the same
    * build-side subquery eagerly). One build-side scan + a <= 32 KB
    * collect at CONSTRUCTION time — persist the build side upstream if it
    * also feeds the exact join. */
  def bloomMask(build: DataFrame, key: Column): Array[Long] = {
    val mask = new Array[Long](graft.ext.Sketches.BLOOM_BITS / 64)
    // null build keys produce null bit positions; dropping them is correct
    // (null never equi-joins) and prevents getLong's null->0 from setting
    // bit 0 spuriously
    graft.ext.Sketches.bloomBits(build.filter(key.isNotNull), Nil, key)
      .filter(col("bloom_pos").isNotNull)
      .collect().foreach { r =>
        val pos = r.getLong(0)
        mask((pos >> 6).toInt) |= (1L << (pos & 63))
      }
    mask
  }

  /** MAP-ONLY Bloom membership predicate against a [[bloomMask]]: true iff
    * all BLOOM_K of the value's bit positions are set. The mask rides the
    * plan as one literal array (broadcast with the task binary), so the
    * probe side is reduced before any exchange — no join, no shuffle, no
    * fold. Never a false negative. */
  def bloomKeep(value: Column, mask: Array[Long]): Column = {
    require(mask.length == graft.ext.Sketches.BLOOM_BITS / 64,
      s"mask length ${mask.length} != ${graft.ext.Sketches.BLOOM_BITS / 64}")
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.ShiftRight
    // variable-distance shift: functions.shiftright only takes a literal
    // Int distance, so reach the Catalyst expression through the bridge
    def shr(v: Column, bits: Column): Column =
      bridge.column(ShiftRight(bridge.expression(v), bridge.expression(bits)))
    val lits = typedlit(mask.toSeq)
    (0 until graft.ext.Sketches.BLOOM_K).map { i =>
      val pos = graft.ext.TextAnalysis.h60(
        concat(lit(s"$i:"), value.cast("string"))) % graft.ext.Sketches.BLOOM_BITS
      (shr(element_at(lits, (pos / 64).cast("int") + 1), (pos % 64).cast("int"))
        .bitwiseAND(lit(1L))) === 1L
    }.reduce(_ && _)
  }

  /** Bloom runtime-filtered inner equi-join: kill non-matching probe rows
    * MAP-SIDE with [[bloomKeep]] before the exact join — the classic
    * semi-join reduction. With a selective build side, the probe shuffle
    * carries the ~matching fraction (plus the filter's false-positive
    * rate) instead of the whole table; the exact join then removes the
    * false positives, so the result is EXACTLY the plain join. This is
    * the engine-portable form of Spark's own runtime row-level filters
    * (spark.sql.optimizer.runtime.bloomFilter), usable when the build
    * side crosses query or engine boundaries. */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame, key: String): DataFrame =
    probe.filter(bloomKeep(col(key), bloomMask(build, col(key))))
      .join(build, key)

  /** Range (interval) join as a bucketed EQUI-join — the operator Spark
    * has no native physical strategy for. A naive `points JOIN intervals
    * ON p BETWEEN lo AND hi` plans a broadcast-nested-loop (fine only
    * while one side is broadcastable) or, worse, a cartesian product.
    * Binning turns it into shuffle-partitionable work at any size:
    *
    *   - each interval is EXPLODED over the `binWidth`-sized bins it
    *     overlaps — ceil(span/width)+1 copies, so pick width near the
    *     median interval span to keep replication ~2x;
    *   - each point is stamped with its single bin (map-only);
    *   - equi-join on (bin ++ equiKeys), then the exact `BETWEEN` filter
    *     keeps true containment (bounds inclusive).
    *
    * Exact: an interval covers every bin it overlaps, and a contained
    * point's bin is one of them, so no pair is missed; the residual
    * filter kills the false candidates. Each matching pair meets in
    * EXACTLY one bin (the point's), so no dedup pass is needed. At
    * 100 TB both sides shuffle on the bin key; a hot bin (rush-hour
    * points) is AQE-skew-splittable because the join is a plain
    * equi-join. Negative values bin correctly (floor division). */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val reserved = "__graft_bin"
    require(!points.columns.contains(reserved) && !intervals.columns.contains(reserved),
      s"$reserved is reserved")
    val binned = intervals.withColumn(reserved,
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val stamped = points.withColumn(reserved,
      floor(col(pointCol) / binWidth).cast("long"))
    stamped.join(binned, reserved +: equiKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(reserved)
  }

  /** Pre-join skew report for a key column — the numbers that decide
    * between a plain join, [[saltedEquiJoin]], and AQE skew handling:
    * row/key counts, the largest group, exact p50/p99 group sizes, and
    * the heaviest key's share of all rows. ONE row out.
    *
    * Exact quantiles WITHOUT sorting rows: group sizes fold to
    * counts-of-counts (distinct-sizes-sized — the q205 two-level-fold
    * idiom), and the percentile is the smallest size whose running key
    * count reaches ceil(p·n_keys/100) — integer rank arithmetic on a
    * window over DISTINCT sizes only (the bounded-cardinality contract
    * shared with rocAuc). The share is the single rounded division. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = df.groupBy(col(keyCol)).agg(count(lit(1)).as("gs"))
    val dist = sizes.groupBy("gs").agg(count(lit(1)).as("nk"))
    val run = Window.orderBy("gs")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dist.withColumn("cum", sum("nk").over(run))
    val tot = cum.agg(sum("nk").as("n_keys"),
      sum(col("gs") * col("nk")).as("n_rows"), max("gs").as("max_gs"))
    def pct(p: Int) = {
      // smallest size whose cumulative key count reaches ceil(p*n/100),
      // in INTEGER arithmetic ((p*n + 99) div 100 — never a double rank)
      cum.crossJoin(broadcast(tot.select("n_keys")))
        .filter(col("cum") >= expr(s"($p * n_keys + 99) div 100"))
        .agg(min("gs").as(s"p${p}_gs"))
    }
    tot.crossJoin(broadcast(pct(50))).crossJoin(broadcast(pct(99)))
      .select(col("n_rows"), col("n_keys"), col("max_gs"),
        col("p50_gs"), col("p99_gs"),
        graft.ext.TextAnalysis.round6Portable(
          col("max_gs").cast("double") / col("n_rows")).as("top1_share"))
  }
}
