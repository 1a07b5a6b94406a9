package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed, ENGINE-PORTABLE cardinality sketches.
  *
  * HyperLogLog (Flajolet/Fusy/Gandouet/Meunier, AofA 2007) with two
  * deliberate deviations from a production HLL, both in service of
  * cross-engine determinism:
  *
  *   - the hash is the portable md5-derived [[TextAnalysis.h60]], so a SQL
  *     oracle reproduces every register exactly;
  *   - the harmonic denominator sum(2^-rho_j) is accumulated in EXACT
  *     integer arithmetic — sum of 2^(52 - rho_j) as BIGINT, rescaled once
  *     at the end — so there is no floating summation order to drift and
  *     nothing to round away. (rho <= 52 and m = 512 keep the scaled sum
  *     <= 2^61, inside BIGINT.)
  *
  * `approx_count_distinct` (HLL++) is the production choice when
  * cross-engine reproducibility of the ESTIMATE doesn't matter; this
  * operator exists for pipelines that pin sketch outputs in regression
  * gates across engines.
  *
  * Shape at scale: one groupBy(keys, bucket) MAX — partial-aggregated
  * map-side, so the shuffle carries at most m register rows per key group,
  * never the values — then one groupBy(keys) fold over <= m rows. Cost is
  * independent of the cardinality being estimated; compare the exact
  * count(DISTINCT x), whose shuffle carries every distinct value.
  */
object Sketches {

  /** log2 register count; m = 512 registers => ~1.04/sqrt(512) = 4.6%
    * standard error. */
  val HLL_P = 9
  val HLL_M: Int = 1 << HLL_P

  /** alpha_m * m^2 * 2^52 — the whole numerator as ONE driver-side double
    * so both engines consume the identical constant (the oracle embeds
    * this value's shortest-round-trip decimal form). */
  val HLL_NUMERATOR: Double =
    0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * (1L << 52).toDouble

  /** Sparse register set per key group: (keys..., bucket, max rho) — one
    * row per NON-EMPTY register. h60 supplies 60 hash bits: low 9 =
    * register index, high 51 = the pattern word w; rho = leading zeros of w
    * within 51 bits + 1 = 52 - bitlen(w) (52 when w = 0, so rho is always
    * >= 1 for a present bucket — 0 unambiguously means "empty register").
    *
    * The input is PROJECTED to keys + value first, so internal working
    * columns can never silently shadow (and corrupt) a caller DATA column;
    * the internals carry a `__graft_hll_` prefix so even a KEY column with
    * a generic internal-looking name (`__h`, `max_rho`) stays intact.
    *
    * Public because the sparse form is also the STREAMING sketch state
    * ([[graft.streaming.StreamOps.hllRegisterStream]]): the same groupBy is
    * a legal streaming aggregation whose state is the sketch itself. */
  def sparseRegisters(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val m = HLL_M
    val keyCols = keys.map(col)
    df.select((keyCols :+ value.cast("string").as("__graft_hll_v")): _*)
      .withColumn("__graft_hll_h", TextAnalysis.h60(col("__graft_hll_v")))
      .withColumn("__graft_hll_w", expr(s"__graft_hll_h div $m"))
      .withColumn("__graft_hll_rho",
        when(col("__graft_hll_w") > 0, lit(52) - length(bin(col("__graft_hll_w")))).otherwise(lit(52)))
      .groupBy((keyCols :+ (col("__graft_hll_h") % m).as("__graft_hll_bucket")): _*)
      .agg(max("__graft_hll_rho").as("__graft_hll_maxrho"))
  }

  /** DENSE register vector per key group: keys + `hll_registers`
    * (ARRAY<INT>, m = 512 slots, slot j = max rho of bucket j, 0 = empty) —
    * the PERSISTABLE, MERGEABLE sketch form. Real pipelines materialize
    * these per day/shard/engine and combine later: register max is
    * associative and commutative, so merge(registers(A), registers(B)) ==
    * registers(A ∪ B) EXACTLY (pinned in ExtSpec), and an estimate over
    * merged vectors equals the estimate over the union. Shuffle carries
    * <= m register rows per group, independent of cardinality. */
  def hllRegisters(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val m = HLL_M
    val keyCols = keys.map(col)
    sparseRegisters(df, keys, value)
      .groupBy(keyCols: _*)
      .agg(map_from_entries(collect_list(
        struct(col("__graft_hll_bucket").cast("int"), col("__graft_hll_maxrho").cast("int")))).as("__graft_hll_m"))
      .select((keyCols :+ transform(sequence(lit(0), lit(m - 1)),
        i => coalesce(element_at(col("__graft_hll_m"), i), lit(0))).as("hll_registers")): _*)
  }

  /** Element-wise max of two register vectors — the sketch union. */
  def hllMerge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => greatest(x, y))

  /** Merge register vectors ACROSS ROWS per key group (e.g. daily sketches
    * -> monthly): posexplode to (key, slot) rows, max per slot, rebuild.
    * The shuffle carries <= m rows per input row — register-sized, never
    * data-sized. */
  def hllMergeAgg(df: DataFrame, keys: Seq[String],
                  regCol: String = "hll_registers"): DataFrame = {
    val keyCols = keys.map(col)
    df.select((keyCols :+ posexplode(col(regCol)).as(Seq("__graft_hll_pos", "__graft_hll_rho"))): _*)
      .groupBy((keyCols :+ col("__graft_hll_pos")): _*).agg(max("__graft_hll_rho").as("__graft_hll_rho"))
      .groupBy(keyCols: _*)
      .agg(transform(array_sort(collect_list(struct(col("__graft_hll_pos"), col("__graft_hll_rho")))),
        x => x.getField("__graft_hll_rho")).as(regCol))
  }

  /** Estimate from a dense register vector (column `regCol`), identical
    * math to the grouped path: exact-integer harmonic sum (empty slot
    * contributes 2^52; slot rho contributes 2^(52-rho)), linear-counting
    * fallback below 2.5m with empty registers. */
  def hllEstimate(regCol: String): Column = {
    val m = HLL_M
    val s = expr(s"aggregate($regCol, CAST(0 AS BIGINT), " +
      "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 52 - r))")
    val zeros = expr(s"size(filter($regCol, r -> r = 0))")
    val raw = lit(HLL_NUMERATOR) / s.cast("double")
    round(when(raw <= 2.5 * m && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double"))).otherwise(raw), 6)
  }

  // ---- count-min sketch (frequency estimation) ----

  /** Count-min depth: independent hash rows; the estimate takes the min. */
  val CMS_DEPTH = 4

  /** Count-min width: counters per row. Overestimate bias ~ N/width per
    * row before the min; depth rows drive the tail down exponentially. */
  val CMS_WIDTH = 1024

  /** Count-min sketch counters (Cormode/Muthukrishnan, J.Alg 2005) of
    * `value` occurrences per `keys` group: one row per NON-ZERO counter —
    * (keys..., cms_row, cms_bucket, cms_cnt), cms_bucket =
    * h60(row ":" value) % width. ONE groupBy with map-side partials; the
    * shuffle carries <= depth·width counter rows per key group, never the
    * values — the frequency-sketch sibling of [[hllRegisters]]. Counters
    * MERGE BY SUM ([[cmsMergeAgg]]): sketch per day/shard, add later, and
    * the merged sketch equals the sketch of the union exactly. The
    * portable h60 hash makes every counter engine-reproducible. */
  def cmsCounters(df: DataFrame, keys: Seq[String], value: Column,
                  width: Int = CMS_WIDTH): DataFrame = {
    val keyCols = keys.map(col)
    // spread the (narrow) value stream before the depth-explode + h60
    // pass (round 18, opt guide §2.5): a one-split input serialized the
    // 4× hash fan-out on one core (q57 measured 2.5s/1 task). No-op on
    // multi-split inputs.
    graft.ops.Partitioning.spread(
        df.select((keyCols :+ value.cast("string").as("__graft_cms_v")): _*))
      .withColumn("cms_row", explode(array((0 until CMS_DEPTH).map(lit(_)): _*)))
      .withColumn("cms_bucket", TextAnalysis.h60(
        concat(col("cms_row").cast("string"), lit(":"), col("__graft_cms_v"))) % width)
      .groupBy((keyCols :+ col("cms_row") :+ col("cms_bucket")): _*)
      .agg(count(lit(1)).as("cms_cnt"))
  }

  /** Merge counter tables ACROSS sketches per key group: counters add.
    * merge(cms(A), cms(B)) == cms(A ++ B) exactly (multiset union —
    * counts, unlike HLL's distinct, are additive). */
  def cmsMergeAgg(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy((keys.map(col) :+ col("cms_row") :+ col("cms_bucket")): _*)
      .agg(sum("cms_cnt").as("cms_cnt"))

  /** Point frequency estimates for `probe`'s rows: min over the depth rows
    * of the matching counters (absent counter = 0). Never underestimates
    * the true count (each counter upper-bounds it). `probe` rows must be
    * distinct — they become the group key of the final fold; columns named
    * cms_row/cms_bucket/cms_cnt are reserved. The probe side is typically
    * tiny (the items being audited); the counter side is bounded by
    * depth·width per key group, so the join broadcasts naturally. */
  def cmsEstimate(probe: DataFrame, counters: DataFrame, value: Column,
                  keys: Seq[String] = Nil, width: Int = CMS_WIDTH): DataFrame = {
    val probeCols = probe.columns.map(col).toSeq
    probe
      .withColumn("cms_row", explode(array((0 until CMS_DEPTH).map(lit(_)): _*)))
      .withColumn("cms_bucket", TextAnalysis.h60(
        concat(col("cms_row").cast("string"), lit(":"), value.cast("string"))) % width)
      .join(counters, keys ++ Seq("cms_row", "cms_bucket"), "left")
      .na.fill(0L, Seq("cms_cnt"))
      .groupBy(probeCols: _*)
      .agg(min("cms_cnt").as("cms_est"))
  }

  /** Join-cardinality estimate from two count-min counter tables over the
    * SAME width (the count-min inner-product estimator, Cormode &
    * Muthukrishnan): per depth row, dot = Σ_bucket aᵣ(b)·bᵣ(b); the
    * estimate is the MIN of the row dots and NEVER underestimates
    * |A ⋈ B| on the sketched key — every true (key-match) product is in
    * every row's dot, collisions only add. Expected overshoot is
    * ‖a‖₁·‖b‖₁ / width, so width is the tightness knob (q175 measures
    * the 1/width shrink); the sketches stay ≤ depth·width rows each
    * regardless of input size, the estimator is one tiny counter join,
    * and the join being sized NEVER runs — this is the pre-flight a
    * planner (or a skew guard) asks before committing to a shuffle.
    * A depth row with no shared buckets means a zero dot: the fold
    * guards on row count so a missing group yields 0, not the min of
    * the surviving rows. Integer arithmetic end-to-end — the estimate
    * is engine-exact, not approximately reproducible. */
  def cmsJoinSize(countersA: DataFrame, countersB: DataFrame): DataFrame = {
    val a = countersA.select(col("cms_row"), col("cms_bucket"),
      col("cms_cnt").as("a_cnt"))
    val b = countersB.select(col("cms_row"), col("cms_bucket"),
      col("cms_cnt").as("b_cnt"))
    a.join(b, Seq("cms_row", "cms_bucket"))
      .groupBy("cms_row")
      .agg(sum(col("a_cnt") * col("b_cnt")).as("dot"))
      .agg(when(count(lit(1)) < CMS_DEPTH, lit(0L))
        .otherwise(min(col("dot"))).cast("long").as("join_size_est"))
  }

  // ---- Bloom filter (set membership) ----

  /** Bloom hash count. */
  val BLOOM_K = 3

  /** Bloom bit-space size (2^18). At n distinct members the false-positive
    * rate is (1 - e^(-k·n/m))^k — ~2.4% at n = 30k, k = 3; size m up with
    * the member count. */
  val BLOOM_BITS: Int = 1 << 18

  /** SET bit positions of the Bloom filter over `value` per `keys` group,
    * as a (keys..., bloom_pos) table — one row per set bit, at most m per
    * group, typically k·|distinct values| before saturation. The
    * TABLE-form sketch merges by `unionByName(...).distinct()` (bit OR),
    * and membership ([[bloomMightContain]]) is an equi-join — both
    * shuffle-partitionable, nothing driver-sized. Bit i of a value =
    * h60(i ":" value) % m, so the filter is engine-reproducible
    * bit-for-bit. The classic pre-filter: run the cheap no-false-negative
    * membership join first, pay the exact check only on survivors. */
  def bloomBits(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val keyCols = keys.map(col)
    df.select((keyCols :+ value.cast("string").as("__graft_bloom_v")): _*)
      .withColumn("__graft_bloom_i", explode(array((0 until BLOOM_K).map(lit(_)): _*)))
      .select((keyCols :+ (TextAnalysis.h60(concat(col("__graft_bloom_i").cast("string"),
        lit(":"), col("__graft_bloom_v"))) % BLOOM_BITS).as("bloom_pos")): _*)
      .distinct()
  }

  /** Membership test: `probe` rows + `bloom_might_contain` (true iff ALL k
    * of the value's bit positions are set in `bits`). Never a false
    * negative; false positives at the filter's design rate. The probe
    * explodes k rows per input, joins the bit table on (keys, bloom_pos),
    * and folds back — one equi-join, no broadcast requirement either way.
    * `probe` rows must be distinct (they become the fold's group key);
    * bloom_pos/bloom_might_contain are reserved names. */
  def bloomMightContain(probe: DataFrame, bits: DataFrame, value: Column,
                        keys: Seq[String] = Nil): DataFrame = {
    val probeCols = probe.columns.map(col).toSeq
    probe
      .withColumn("__graft_bloom_i", explode(array((0 until BLOOM_K).map(lit(_)): _*)))
      .withColumn("bloom_pos", TextAnalysis.h60(concat(col("__graft_bloom_i").cast("string"),
        lit(":"), value.cast("string"))) % BLOOM_BITS)
      .join(bits.withColumn("__graft_bloom_hit", lit(1)),
        keys ++ Seq("bloom_pos"), "left")
      .groupBy(probeCols: _*)
      .agg((count(col("__graft_bloom_hit")) === BLOOM_K).as("bloom_might_contain"))
  }

  // ---- equi-width histogram (mergeable quantile sketch) ----

  /** Histogram bucket count. Quantile error is bounded by one bucket width
    * of the value range — 1/HIST_BUCKETS of (hi-lo) — independent of row
    * count; size up for tighter tails. */
  val HIST_BUCKETS = 128

  /** Equi-width histogram counters of `value` per `keys` group over
    * [lo, hi): one row per NON-EMPTY bucket — (keys..., hist_bucket,
    * hist_cnt), bucket = floor((x-lo)/w) clamped to the edge buckets, so
    * out-of-range values are counted, never dropped. ONE groupBy with
    * map-side partials; the shuffle carries <= `buckets` counter rows per
    * key group, never the values — the quantile-sketch sibling of
    * [[hllRegisters]]/[[cmsCounters]]. Counters MERGE BY SUM
    * ([[histMergeAgg]]): sketch per day/shard/engine, add later, and the
    * merged sketch equals the sketch of the union exactly (counts are
    * additive). Everything is integer/IEEE-deterministic, so a SQL oracle
    * reproduces every counter and every interpolated quantile bit-for-bit —
    * the role `percentile_approx` (GK sketch) can't play across engines. */
  def histCounts(df: DataFrame, keys: Seq[String], value: Column,
                 lo: Double, hi: Double, buckets: Int = HIST_BUCKETS): DataFrame = {
    require(hi > lo, s"histCounts needs hi > lo, got [$lo, $hi)")
    require(buckets >= 2, s"histCounts needs >= 2 buckets, got $buckets")
    val w = (hi - lo) / buckets
    val keyCols = keys.map(col)
    df.select((keyCols :+ value.cast("double").as("__graft_hist_v")): _*)
      .select((keyCols :+ least(greatest(
        floor((col("__graft_hist_v") - lit(lo)) / lit(w)), lit(0L)),
        lit(buckets - 1L)).cast("int").as("hist_bucket")): _*)
      .groupBy((keyCols :+ col("hist_bucket")): _*)
      .agg(count(lit(1)).as("hist_cnt"))
  }

  /** Merge histogram counter tables ACROSS sketches per key group:
    * counters add. merge(hist(A), hist(B)) == hist(A ++ B) exactly. */
  def histMergeAgg(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy((keys.map(col) :+ col("hist_bucket")): _*)
      .agg(sum("hist_cnt").as("hist_cnt"))

  /** Quantile estimates from histogram counters: for each q in `qs`, rank
    * r = ceil(q·N) (clamped to >= 1), the answer bucket is the first whose
    * cumulative count reaches r, and the estimate interpolates linearly
    * inside it: lo + w·(bucket + (r - cum_prev)/cnt). Runs entirely on
    * SKETCH-SIZED data — the window partitions carry <= `buckets` rows per
    * key group, so the quantile extraction costs nothing at any corpus
    * scale; the single data-sized pass already happened in [[histCounts]].
    * Returns (keys..., q, quantile_est). */
  def histQuantiles(hist: DataFrame, keys: Seq[String],
                    lo: Double, hi: Double, qs: Seq[Double],
                    buckets: Int = HIST_BUCKETS): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1], got $qs")
    val w = (hi - lo) / buckets
    val keyCols = keys.map(col)
    val win = Window.partitionBy(keys.map(col): _*).orderBy("hist_bucket")
    val cum = hist
      .withColumn("__graft_hist_cum", sum("hist_cnt").over(win))
      .withColumn("__graft_hist_n",
        sum("hist_cnt").over(Window.partitionBy(keys.map(col): _*)))
    cum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("__graft_hist_r",
        greatest(ceil(col("q") * col("__graft_hist_n")), lit(1L)))
      .filter(col("__graft_hist_cum") >= col("__graft_hist_r"))
      .groupBy((keyCols :+ col("q")): _*)
      .agg(min(struct(col("hist_bucket"), col("__graft_hist_cum"),
        col("hist_cnt"), col("__graft_hist_r"))).as("__graft_hist_pick"))
      .select((keyCols :+ col("q") :+ round(lit(lo) +
        lit(w) * (col("__graft_hist_pick.hist_bucket") +
          (col("__graft_hist_pick.__graft_hist_r") -
            (col("__graft_hist_pick.__graft_hist_cum") - col("__graft_hist_pick.hist_cnt"))).cast("double") /
            col("__graft_hist_pick.hist_cnt")), 6).as("quantile_est")): _*)
  }

  /** Inclusion–exclusion distinct-INTERSECTION estimates between every
    * pair of key groups in a register table: est(A ∩ B) = est(A) + est(B)
    * − est(A ∪ B), where the union estimate comes from the element-wise
    * register max ([[hllMerge]] — EXACTLY the sketch of the union, so the
    * only error is the three estimates' own). The set-overlap question
    * ("how many users did both X and Y", "how many shingles do these two
    * crawls share") answered from persisted sketches alone — the data is
    * never re-read, and a k-group table yields all k(k−1)/2 overlaps from
    * k sketches.
    *
    * Shape at scale: the pairwise join runs on GROUP-cardinality rows of
    * m-int vectors — sketch-sized, independent of the cardinalities being
    * estimated, but QUADRATIC in the number of key groups (it is a
    * theta-join; k keys -> k(k-1)/2 pairs of m-int vectors). That is the
    * design point for event-type/source/domain cardinalities; pointed at
    * an unbounded key (user ids, shingles) it would plan 10^12 pairs, so
    * the key count is bounded up front by a loud `maxKeys` probe (the
    * Guards style: a limit(max+1) scan over the sketch table — never a
    * full count). Raise `maxKeys` deliberately for an offline all-pairs
    * run. Estimates round to 6 before the subtraction (identical doubles
    * in every engine); small intersections of large sets can estimate
    * negative — that IS the sketch's answer, clamp downstream if a rate
    * is needed. */
  def hllIntersectEstimate(regs: DataFrame, keyCol: String,
                           regCol: String = "hll_registers",
                           maxKeys: Int = 1024): DataFrame = {
    require(maxKeys >= 2, s"maxKeys must be >= 2, got $maxKeys")
    val nKeys = regs.limit(maxKeys + 1).count()
    require(nKeys <= maxKeys,
      s"hllIntersectEstimate is all-pairs in the key groups: > $maxKeys sketch " +
        "rows means the pairwise join explodes quadratically — group coarser, " +
        "filter the sketch table to the pairs of interest, or raise maxKeys " +
        "deliberately for an offline run")
    val a = regs.select(col(keyCol).as("key_a"), col(regCol).as("__graft_hll_ra"))
    val b = regs.select(col(keyCol).as("key_b"), col(regCol).as("__graft_hll_rb"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("__graft_hll_rm",
        hllMerge(col("__graft_hll_ra"), col("__graft_hll_rb")))
      .select(col("key_a"), col("key_b"),
        hllEstimate("__graft_hll_ra").as("est_a"),
        hllEstimate("__graft_hll_rb").as("est_b"),
        hllEstimate("__graft_hll_rm").as("est_union"))
      .withColumn("est_intersect",
        round(col("est_a") + col("est_b") - col("est_union"), 6))
  }

  /** Sketch-CDF percentile normalization: annotate every row with the
    * approximate percentile of `value`, derived from the equi-width
    * histogram sketch — the scale-safe stand-in for a global
    * `percent_rank()` window, which would funnel the whole corpus through
    * ONE partition. The normalization step before blending
    * incommensurable quality signals (length, LM score, dup fraction)
    * into one curation verdict: each signal maps to [0, 1] by corpus
    * position, at one-bin resolution (the bin MIDPOINT convention:
    * pct = (count below bin + half the bin's count) / n).
    *
    * Shape at scale: one data-sized groupBy ([[histCounts]]), a
    * ≤ `buckets`-row cumulative pass, and the bin→pct table folds back as
    * a BROADCAST join on the row's bin — the annotation pass is map-only.
    * Merge-friendly like every sketch here: normalize a new day against
    * last month's histogram by summing counters first.
    *
    * Values OUTSIDE [lo, hi] clamp silently into the edge bins — fine
    * when the bounds come from the corpus ([[percentileNormalizeAuto]]),
    * a trap when a caller guesses them for an unfamiliar signal; set
    * `oobCol` to also emit a boolean out-of-range flag per row so the
    * clamped population is measurable downstream. */
  def percentileNormalize(df: DataFrame, value: Column, lo: Double,
                          hi: Double, buckets: Int = HIST_BUCKETS,
                          outCol: String = "pct",
                          oobCol: Option[String] = None): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val w = (hi - lo) / buckets
    val pcts = binPctMap(histCounts(df, Nil, value, lo, hi, buckets), outCol)
    val flagged = oobCol match {
      case None => df
      case Some(c) => df.withColumn(c,
        value.cast("double") < lit(lo) || value.cast("double") > lit(hi))
    }
    flagged.withColumn("hist_bucket", least(greatest(
        floor((value.cast("double") - lit(lo)) / lit(w)), lit(0L)),
        lit(buckets - 1L)).cast("int"))
      .join(broadcast(pcts), "hist_bucket")
      .drop("hist_bucket")
  }

  /** Bin→percentile CDF map off a histogram counter table: each bin's
    * midpoint cumulative share, rounded to 6 dp — ≤ `buckets` rows, the
    * broadcastable annotation key [[percentileNormalize]] and the
    * equi-depth assignments share. Window partitions carry sketch-sized
    * rows only. */
  private def binPctMap(hist: DataFrame, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(lit(0)).orderBy("hist_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("__graft_hist_cumb", coalesce(sum("hist_cnt").over(win), lit(0L)))
      .withColumn("__graft_hist_n",
        sum("hist_cnt").over(Window.partitionBy(lit(0))))
      .select(col("hist_bucket"),
        round((col("__graft_hist_cumb").cast("double") +
          col("hist_cnt").cast("double") / 2) / col("__graft_hist_n"), 6)
          .as(outCol))
  }

  /** One-pass corpus bounds for [[percentileNormalize]]: the global
    * (min, max) of `value` as a single aggregate — a 1-row driver
    * materialization (the dim-probe precedent), so a user normalizing an
    * unfamiliar signal never has to guess magic constants, and nothing
    * can clamp out of range (every value lies inside the derived bounds
    * by construction). Persist the bounds WITH the histogram sketch when
    * merging across days: re-deriving them from a new slice would shift
    * every bin edge. */
  def valueBounds(df: DataFrame, value: Column): (Double, Double) = {
    val r = df.agg(min(value.cast("double")).as("__graft_lo"),
      max(value.cast("double")).as("__graft_hi")).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      "cannot derive bounds: the value column is empty or all-null")
    (r.getDouble(0), r.getDouble(1))
  }

  /** [[percentileNormalize]] with CORPUS-DERIVED bounds: one extra
    * min/max pass replaces caller-supplied constants. The right default
    * for one-shot normalization; for incremental (merge-across-days)
    * use, derive bounds once, persist them with the sketch, and call
    * [[percentileNormalize]] with the pinned values. */
  def percentileNormalizeAuto(df: DataFrame, value: Column,
                              buckets: Int = HIST_BUCKETS,
                              outCol: String = "pct"): DataFrame = {
    val (lo, hi) = valueBounds(df, value)
    require(hi > lo,
      s"degenerate bounds [$lo, $hi]: the value column is constant — every " +
        "row is the same percentile; normalize a signal with spread instead")
    percentileNormalize(df, value, lo, hi, buckets, outCol)
  }

  /** EQUI-DEPTH quantile bucketing: annotate every row with its corpus
    * quantile BUCKET 0..k-1 (each holding ≈ n/k rows), derived from the
    * same sketch CDF as [[percentileNormalize]] — the missing piece
    * between quantile STATS ([[histQuantiles]]) and quantile LAYOUT: the
    * bucket column is a balanced range-partition key (bucket boundaries
    * are value quantiles, so every bucket is a contiguous value range of
    * near-equal population), which is what a skew-proof range layout
    * needs where `repartitionByRange`'s sampling is nondeterministic and
    * a hash layout scatters the value dimension entirely. Feed it to
    * `Partitioning.writeShards`-style writers or PARTITION BY to get
    * min/max-prunable, balanced files on a skewed signal.
    *
    * Shape at scale: [[valueBounds]]' 1-row probe + one data-sized
    * histogram groupBy; the bin→bucket map folds back as a ≤ `buckets`-row
    * broadcast, so the annotation pass is map-only — no global sort, no
    * sampling pass, no data-sized window. Resolution caveat: buckets
    * sharing a histogram bin land together (one-bin resolution, the
    * percentileNormalize contract), so keep `buckets` ≫ k; a value so
    * frequent it spans a quantile boundary makes neighboring depth
    * buckets uneven — that is the value's true mass, not an artifact. */
  def equiDepthBucket(df: DataFrame, value: Column, k: Int,
                      buckets: Int = HIST_BUCKETS,
                      outCol: String = "depth_bucket"): DataFrame = {
    val (lo, hi) = valueBounds(df, value)
    require(hi > lo,
      s"degenerate bounds [$lo, $hi]: the value column is constant — one " +
        "bucket would hold everything; bucket a signal with spread instead")
    equiDepthBucketFrom(df, histCounts(df, Nil, value, lo, hi, buckets),
      value, lo, hi, k, buckets, outCol)
  }

  /** [[equiDepthBucket]] from a PERSISTED (typically merged-across-days)
    * histogram state with PINNED bounds — the incremental form of the
    * layout key. Histogram counters ADD ([[histMergeAgg]]), so bucketing
    * today's rows against yesterday's-state-plus-today's-slice equals
    * bucketing against a from-scratch corpus histogram EXACTLY — q125
    * proves increment == rebuild by answering q118's oracle through the
    * merged path. The contract valueBounds documents is load-bearing
    * here: bounds must be derived once and persisted WITH the sketch —
    * re-deriving them per slice shifts every bin edge and the states no
    * longer merge. `df` need not be the data the state was built from
    * (bucket a new day against the standing corpus CDF); out-of-range
    * values clamp into the edge bins per the histCounts contract. */
  def equiDepthBucketFrom(df: DataFrame, hist: DataFrame, value: Column,
                          lo: Double, hi: Double, k: Int,
                          buckets: Int = HIST_BUCKETS,
                          outCol: String = "depth_bucket"): DataFrame = {
    require(k >= 2, s"equi-depth bucketing needs k >= 2, got $k")
    require(buckets >= k,
      s"histogram resolution ($buckets bins) must be >= k ($k) buckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val w = (hi - lo) / buckets
    val pcts = binPctMap(hist, "__graft_depth_pct")
    df.withColumn("hist_bucket", least(greatest(
        floor((value.cast("double") - lit(lo)) / lit(w)), lit(0L)),
        lit(buckets - 1L)).cast("int"))
      .join(broadcast(pcts), "hist_bucket")
      .withColumn(outCol,
        least(floor(col("__graft_depth_pct") * k), lit(k - 1L)).cast("int"))
      .drop("__graft_depth_pct", "hist_bucket")
  }

  /** EXACT heavy hitters (values with true count >= `minCount`) found
    * through a count-min SCREEN: estimate every candidate's frequency off
    * the depth×width counter table, keep only candidates whose estimate
    * clears the threshold, and pay the exact recount ONLY on the
    * survivors. Count-min never underestimates, so the screened candidate
    * set is a SUPERSET of the true heavy hitters — the exact recount then
    * drops the sketch's false positives, and the result equals a plain
    * `GROUP BY value HAVING count(*) >= minCount` row for row. Output:
    * (value-as-`outCol`, cnt), exact counts only.
    *
    * Why screen at all when the exact groupBy exists: at corpus scale the
    * unscreened groupBy's shuffle carries up to |vocabulary| partial
    * counts PER MAP PARTITION (map-side combine collapses rows within a
    * partition but not the key domain — a 10M-term vocabulary shuffles
    * 10M rows per partition). After the screen the recount's key domain
    * is the candidate set — bounded by N/minCount true hitters plus the
    * sketch's design-rate false positives — so the shuffle carries at
    * most that many rows per partition, and the semi-join pre-filter
    * drops every non-candidate row before it is ever hashed. The counter
    * table itself merges by SUM across shards/days ([[cmsMergeAgg]]), so
    * standing corpora keep the sketch incrementally and only the final
    * recount scans the data.
    *
    * `candidates` supplies the probe domain (distinct values; defaults to
    * `df`'s own distinct — pass a standing vocabulary table to skip that
    * pass on a corpus that already maintains one). The exactness
    * guarantee is only as complete as that domain: a vocabulary table
    * MISSING a value that occurs in `df` silently misses it as a hitter
    * — maintain the vocab with the same pipeline that feeds `df`, or
    * leave the default. The candidate set
    * surviving the screen is broadcast via [[graft.ops.Guards.broadcastIfSmall]]:
    * a threshold low enough to pass millions of candidates degrades to a
    * shuffled semi-join instead of melting the driver.
    *
    * Size `width` to the load: screen selectivity needs the per-counter
    * collision bias (~ N_occurrences/width before the depth-min) well
    * BELOW `minCount`, or every candidate's estimate clears the bar and
    * the screen passes everything — still correct (the recount is exact
    * regardless), just paying the unscreened cost. */
  def heavyHitters(df: DataFrame, value: Column, minCount: Long,
                   candidates: Option[DataFrame] = None,
                   width: Int = CMS_WIDTH,
                   outCol: String = "value"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // Round 18 (opt guide §1.2/§2.3): ONE corpus pass instead of three.
    // The old shape scanned `df` separately for the counter build, the
    // default probe domain, and the exact recount (q120 measured three
    // full shingle passes). Every one of those is a re-aggregation of
    // the vocabulary count table groupBy(value).count — vocab-sized, the
    // compact-table materialization contract — so build THAT once
    // (spread first: a one-split input would serialize the only
    // corpus-text pass) and derive counters (SUM of cnt per cell ==
    // COUNT of rows per cell), probe domain (vc's keys ARE the distinct
    // values), and the exact recount (vc filtered to the screen) from
    // it. Results identical by construction; the screen math unchanged.
    val vals = graft.ops.Partitioning.spread(df)
      .select(value.cast("string").as(outCol))
    val vc = graft.ops.Materialize.stable(
      vals.groupBy(outCol).agg(count(lit(1)).as("cnt")), "hh-vocab")
    val counters = vc
      .withColumn("cms_row", explode(array((0 until CMS_DEPTH).map(lit(_)): _*)))
      .withColumn("cms_bucket", TextAnalysis.h60(
        concat(col("cms_row").cast("string"), lit(":"), col(outCol))) % width)
      .groupBy(col("cms_row"), col("cms_bucket"))
      .agg(sum("cnt").as("cms_cnt"))
    val probe = candidates.map(_.select(value.cast("string").as(outCol)).distinct())
      .getOrElse(vc.select(outCol))
    val screened = cmsEstimate(probe, counters, col(outCol), width = width)
      .filter(col("cms_est") >= minCount)
      .select(outCol)
    vc.join(graft.ops.Guards.broadcastIfSmall(screened), Seq(outCol), "left_semi")
      .filter(col("cnt") >= minCount)
      .select(col(outCol), col("cnt"))
  }

  /** HLL approximate distinct count of `value` per `keys` group, in one
    * shot (collapses the registers without materializing the dense vector;
    * use [[hllRegisters]] + [[hllEstimate]] to persist/merge sketches).
    * Estimate math is slot-for-slot identical to [[hllEstimate]]. */
  def approxDistinct(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val m = HLL_M
    val keyCols = keys.map(col)
    sparseRegisters(df, keys, value)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__graft_hll_nb"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - __graft_hll_maxrho)")).as("__graft_hll_sne"))
      .withColumn("__graft_hll_s",
        col("__graft_hll_sne") + (lit(m) - col("__graft_hll_nb")) * lit(1L << 52))
      .withColumn("__graft_hll_zeros", lit(m) - col("__graft_hll_nb"))
      .withColumn("__graft_hll_raw", lit(HLL_NUMERATOR) / col("__graft_hll_s").cast("double"))
      .withColumn("approx_distinct", round(
        when(col("__graft_hll_raw") <= 2.5 * m && col("__graft_hll_zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__graft_hll_zeros")))
          .otherwise(col("__graft_hll_raw")), 6))
      .select((keyCols :+ col("approx_distinct")): _*)
  }

  /** EXACT heavy hitters (items with frequency > n/(k+1)) without ever
    * shuffling the full item domain — the Misra–Gries two-pass:
    *
    *   1. each partition runs a k-counter Misra–Gries summary (Misra &
    *      Gries 1982, "Finding repeated elements") and emits only its
    *      surviving candidate items. Pigeonhole across partitions: if
    *      freq(x) > n/(k+1) = Σ_p n_p/(k+1), then freq_p(x) > n_p/(k+1)
    *      in at least one partition p — and MG's per-stream guarantee
    *      keeps exactly those items — so the candidate union contains
    *      EVERY global heavy hitter (no false negatives);
    *   2. an exact recount of the candidates only (broadcast semi-join,
    *      map-side partials over a ≤ k·partitions key domain) discards
    *      the false positives with the integer gate freq·(k+1) > n.
    *
    * The naive `groupBy(item).count` shuffles every distinct item of a
    * 100 TB corpus; this shuffles ≤ k·partitions candidate rows plus a
    * candidate-sized count — output-proportional, and the final result
    * is EXACT (count, share, and membership), not an estimate. The
    * candidate set passes [[graft.ops.Guards.requireBroadcastable]] so
    * a pathological k·partitions blow-up fails loudly. Returns
    * (item, freq, n, share) for every item with freq·(k+1) > n.
    *
    * Sibling of [[heavyHitters]] (the CMS-screened recount): that one
    * answers "items with count ≥ c" (absolute threshold, sketch-width
    * tunable false-positive screen), this one answers "items with share
    * > 1/(k+1)" (relative threshold) with a DETERMINISTIC candidate
    * bound of k per partition — no width/bias knob to size. */
  def heavyHittersExact(items: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 100000, s"k must be in [1,100000]: $k")
    val spark = items.sparkSession
    import spark.implicits._
    val keyed = items.select(key.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val candidates = keyed.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters(x) = c + 1L
          case None if counters.size < k => counters(x) = 1L
          case None =>
            // decrement-all step: every counter drops by 1, zeros evicted
            val dead = counters.iterator.collect {
              case (key0, 1L) => key0
            }.toList
            counters.mapValuesInPlace((_, c) => c - 1L)
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    val guarded = graft.ops.Guards.requireBroadcastable(candidates,
      s"Misra-Gries candidate set (k=$k x partitions)",
      "a smaller k, fewer/larger input partitions, or the CMS sketch " +
        "(Sketches.cmsRegisters) when approximate counts suffice")
    val tot = keyed.agg(count(lit(1)).as("n"))
    keyed.join(broadcast(guarded), "item")
      .groupBy("item").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(tot))
      .filter(col("freq").cast("decimal(38,0)") * (k + 1) > col("n"))
      .select(col("item"), col("freq"), col("n"),
        TextAnalysis.round6Portable(
          col("freq").cast("double") / col("n")).as("share"))
  }

  // ------------------------------------------------------------------
  // Mergeable quantile sketch (VERDICT r14 #7): bottom-k row sample by
  // pinned hash (KMV-style).
  //
  // WHY NOT KLL / t-digest: their compaction state depends on ARRIVAL
  // ORDER, so (a) a distributed partial aggregation over arbitrary
  // splits is nondeterministic run-to-run, and (b) no SQL oracle can
  // replay the sketch — both against this engine's core discipline
  // (every operator hash-gated cross-engine). The bottom-k-by-h60
  // sample is a deterministic FUNCTION OF THE ROW SET: min-k of a
  // union == min-k of per-part min-k's, so the merge law holds
  // EXACTLY (KLL's only holds distributionally), partial aggregation
  // is k-bounded map-side, and DuckDB rebuilds the identical sample
  // with ORDER BY (h, v) LIMIT k. The price is rank error
  // O(sqrt(q(1-q)/k)) whp over the (fixed, pinned) hash — one
  // sqrt-factor worse than KLL's O(1/k·polylog) at equal state. At
  // k = 256 that is ~±3% rank error at the median: the drift-gate
  // regime this engine's sketches serve ([[histQuantiles]] remains
  // the fixed-bin alternative; exact counts-of-counts percentiles
  // remain the exact path, at distinct-value shuffle cost).
  // ------------------------------------------------------------------

  /** Per-group bottom-k quantile sketch: `sample` = the k (h60(rowKey),
    * value) pairs with smallest hashes, ascending; `n` = the group's
    * count of rows with BOTH rowKey and value non-null (null rows can
    * neither hash nor rank, so they are outside the sketched
    * population). `rowKey` must be row-unique (duplicated keys would
    * under-weight their rows in the sample — the uniformity the rank
    * error bound rides on). That contract is deliberately UNENFORCED
    * (VERDICT r15 #3, decided loudly): checking it exactly is a
    * distinct-count shuffle over the data — the cost this sketch exists
    * to avoid — and a sketched check would be circular. Callers own it
    * the way [[graft.ops.TopK.groupedTopK]] callers own pre-rounded
    * scores. A violated contract degrades RANK ACCURACY only: duplicate
    * keys hash identically on every shard, so determinism and the exact
    * merge law are unaffected. Map-side k-bounded fold; the shuffle
    * carries ≤ k · partitions rows per group, never the values.
    *
    * The sketch is SELF-DESCRIBING (VERDICT r16 #2): a constant `k`
    * column rides beside `sample`/`n`, and [[kmvMergeAgg]] /
    * [[wkmvQuantiles]] `require` it against their own k — a reader
    * assuming a LARGER k than the build k would silently read a
    * truncated sample as exhaustive; the column makes that misuse loud
    * instead of wrong. */
  /** ADVICE r17: the sketch frames OWN the columns they emit beside the
    * keys; a grouping key with one of those names would be silently
    * OVERWRITTEN by withColumn (a user key literally named "k" would
    * then "pass" the self-describing check with an unrelated meaning).
    * Guarded up front in every builder/merger/reader. */
  private def requireKeysAvoid(op: String, keys: Seq[String],
                               reserved: Seq[String]): Unit = {
    val clash = keys.filter(reserved.contains)
    require(clash.isEmpty,
      s"$op: grouping key(s) ${clash.mkString(", ")} collide with the " +
        s"sketch's reserved output columns (${reserved.mkString(", ")}) " +
        "— rename the key before sketching")
  }

  def kmvSketch(df: DataFrame, keys: Seq[String], rowKey: Column,
                value: Column, k: Int = 256): DataFrame = {
    require(k >= 16 && k <= 65536, s"k in [16, 65536]: $k")
    requireKeysAvoid("kmvSketch", keys, Seq("sample", "n", "k"))
    graft.ops.TopK.groupedBottomK(df, keys,
      TextAnalysis.h60(concat(lit("kmv:"), rowKey.cast("string"))),
      value, k)
      .withColumn("k", lit(k))
  }

  /** Merge sketch rows down to coarser keys (or one row with keys = Nil):
    * explode every input sketch's (h, v) pairs and RE-FOLD them through
    * the k-bounded [[graft.ops.TopK.BottomKAgg]] — output == bottom-k of
    * the union (the KMV merge law: min-k(union) == min-k of min-k's), so
    * this is value-identical to flatten + sort + first-k, but the merge
    * STATE is genuinely sketch-sized everywhere: partial (map-side)
    * buffers hold ≤ k pairs before any exchange, so the keys = Nil total
    * merge of 10⁵ partition-sketches costs its one reducer a k-row
    * buffer — not a collect_list of every input sample, which was
    * O(#sketches · k) on that reducer (VERDICT r15 #2; TopKSpec pins
    * refold == collect-reference). `n` rides the same aggregate as a
    * plain sum over each input row's count (taken once per row, off the
    * sample's first element).
    *
    * Two contracts enforced LOUDLY in-plan (ADVICE r16 / VERDICT r16
    * #2): the merge k must not EXCEED any input's build `k` column (a
    * larger merge-k would emit a sketch whose sample is NOT bottom-k of
    * the union — the inputs already truncated at the smaller k — and
    * every downstream read would be silently wrong; a SMALLER merge-k
    * is legal by the prefix property — bottom-k of bottom-k' samples
    * with k ≤ k' IS bottom-k of the union — and the output `k` column
    * is restamped to the merge k so the chain stays self-consistent;
    * ADVICE r17), and every input
    * row's `sample` must be non-empty ([[kmvSketch]] guarantees it and
    * merging preserves it, but a hand-built empty row would previously
    * VANISH from the merged `n` — posexplode emitted nothing for it;
    * now the outer explode routes it into a raise_error instead of an
    * undercount). Both checks ride the per-row value expressions, so
    * they cost nothing and cannot be pruned. */
  def kmvMergeAgg(df: DataFrame, keys: Seq[String], k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.columns.contains("k"),
      "kmvMergeAgg: input sketch carries no `k` column — build it with " +
        "kmvSketch (sketches are self-describing since round 17)")
    requireKeysAvoid("kmvMergeAgg", keys, Seq("sample", "n", "k"))
    val agg = udaf(new graft.ops.TopK.BottomKAgg(k))
    val ex = df
      .select(keys.map(col) :+ col("n") :+ col("k").as("__bk") :+
        posexplode_outer(col("sample")).as(Seq("__p", "__e")): _*)
      .withColumn("__h", when(col("__p").isNull,
          raise_error(lit("kmvMergeAgg: input sketch row with an EMPTY " +
            "sample — kmvSketch never emits one; merging it would " +
            "silently drop its n from the merged total")))
        .otherwise(when(col("__bk").isNull || col("__bk") < lit(k),
            raise_error(concat(lit(s"kmvMergeAgg: merge k=$k EXCEEDS " +
              "the sketch's build k="), col("__bk").cast("string"),
              lit(" — the inputs already truncated below the merge k, " +
                "so the merge would read truncated samples as " +
                "exhaustive (silently wrong); re-sketch at the larger " +
                "k instead (a merge k <= build k is legal and " +
                "tightens the sample)"))))
          .otherwise(col("__e.h"))))
    val grouped =
      if (keys.isEmpty) ex.groupBy()
      else ex.groupBy(keys.map(col): _*)
    grouped.agg(
      agg(col("__h"), col("__e.v")).as("sample"),
      sum(when(col("__p") === 0, col("n")).otherwise(lit(0L))).as("n"))
      .withColumn("k", lit(k))
  }

  /** p-column name for a requested quantile: integral percents stay
    * `p<int>` (p50, p99); fractional percents keep the fraction with an
    * underscore (0.995 → p99_5, 0.549 → p54_9) instead of rounding —
    * rounding let distinct requests collide into one duplicate column
    * name (0.995 and 1.0 both "p100"; ADVICE r15). Percent rendered at
    * 4 dp then zero-stripped, so binary noise (0.55·100 =
    * 55.000000000000007) still names p55. */
  private def pName(q: Double): String = {
    val s = f"${q * 100}%.4f".reverse.dropWhile(_ == '0').reverse
      .stripSuffix(".")
    "p" + s.replace('.', '_')
  }

  /** Type-1 empirical quantiles off the sample: for each q, the sample
    * value at 1-based rank max(1, ceil(q·m)) in value order. Emits
    * m (sample size) and one [[pName]] column per requested quantile.
    * All integer/array arithmetic — both engines replay it exactly.
    * Needs no k: it reads whatever sample is present in full (rank
    * error tracks the ACTUAL sample size m, which it reports) — the
    * k contracts live on [[kmvMergeAgg]] and the weighted reader. */
  def kmvQuantiles(sketch: DataFrame, keys: Seq[String],
                   qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles in (0, 1]: $qs")
    val names = qs.map(pName)
    require(names.distinct.size == names.size,
      s"quantile column names collide: ${qs.zip(names)}")
    requireKeysAvoid("kmvQuantiles", keys,
      Seq("sample", "n", "k", "m") ++ names)
    val vs = array_sort(expr("transform(sample, x -> x.v)"))
    val m = size(col("sample"))
    val cols = keys.map(col) ++ Seq(col("n"), m.cast("long").as("m")) ++
      qs.zip(names).map { case (q, name) =>
        element_at(vs, greatest(lit(1), ceil(lit(q) * m)).cast("int"))
          .as(name)
      }
    sketch.select(cols: _*)
  }

  // ------------------------------------------------------------------
  // WEIGHTED quantile sketch — priority sampling (Duffield, Lund,
  // Thorup, "Priority sampling for estimation of arbitrary subset
  // sums", JACM 2007) with the house determinism discipline: the
  // uniform draw is the pinned row hash u = (h60('wkmv:'||id)+1)/2⁶⁰
  // ∈ (0,1], priority p = w/u, keep the m = k+1 HIGHEST priorities.
  // Every arithmetic step is a single correctly-rounded IEEE double
  // op (long→double cast, one divide) — no libm (ln/pow), so BOTH
  // engines produce bit-identical priorities and the sketch stays a
  // pure FUNCTION OF THE ROW SET with the exact merge law
  // (top-m of a union == top-m of per-shard top-m's), like [[kmvSketch]].
  // The estimator: with τ = the (k+1)-th priority (0 if the group is
  // exhaustive), each kept row represents weight ŵ = max(w, τ) —
  // unbiased for any subset sum, hence for the weighted CDF; weighted
  // quantiles walk the kept rows in (v, id) order until the running ŵ
  // crosses q·Σŵ. Answers the 100 TB layout question ("what size does
  // the median BYTE live in?") that the unweighted [[kmvSketch]]
  // cannot: its uniform row sample under-represents exactly the rows
  // that carry the mass.
  // ------------------------------------------------------------------

  /** Per-group weighted sketch: `sample` = the k+1 (p, id, v, w) rows
    * with highest priority, (p DESC, id ASC); `wtot` / `n` = the
    * group's exact total weight and row count. Population = rows with
    * id, value, weight all non-null AND weight ≥ 1 (integer weights;
    * a zero weight carries no mass and would break p = w/u's strict
    * positivity). `id` must be row-unique — same deliberately
    * unenforced contract, for the same reasons, as [[kmvSketch]]'s
    * rowKey. k+1 rows (not k) so the merged sketch still carries the
    * threshold τ the estimator needs. Map-side k-bounded fold; the
    * payload (v, w) rides inside the buffer, so no data-sized rejoin.
    * Self-describing like [[kmvSketch]]: a constant `k` column rides
    * beside the sample and the readers `require` it. */
  def wkmvSketch(df: DataFrame, keys: Seq[String], id: Column,
                 value: Column, weight: Column, k: Int = 256): DataFrame = {
    require(k >= 16 && k <= 65536, s"k in [16, 65536]: $k")
    requireKeysAvoid("wkmvSketch", keys, Seq("sample", "wtot", "n", "k"))
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new graft.ops.TopK.WTopKAgg(k + 1))
    val u = (TextAnalysis.h60(concat(lit("wkmv:"), id.cast("string"))) +
      lit(1L)).cast("double") / lit(1152921504606846976L).cast("double")
    df.filter(id.isNotNull && value.isNotNull && weight.isNotNull &&
        weight >= 1)
      .select(keys.map(col) :+ (weight.cast("double") / u).as("__p") :+
        id.cast("long").as("__id") :+ value.cast("long").as("__v") :+
        weight.cast("long").as("__w"): _*)
      .groupBy(keys.map(col): _*)
      .agg(agg(col("__p"), col("__id"), col("__v"), col("__w")).as("sample"),
        sum("__w").cast("long").as("wtot"), count(lit(1)).as("n"))
      .withColumn("k", lit(k))
  }

  /** Merge weighted sketches down to coarser keys — the same k-bounded
    * explode-and-refold as [[kmvMergeAgg]] (partial buffers ≤ k+1
    * everywhere; `wtot`/`n` ride the first sample element), exact by
    * the same law, with the same two LOUD in-plan contracts: merge k
    * must not exceed the sketch's build `k` column (smaller is legal —
    * same prefix property — and restamps the output k; ADVICE r17),
    * and empty-sample rows
    * (which [[wkmvSketch]] never emits) fail instead of silently
    * dropping their `wtot`/`n` from the merged totals. */
  def wkmvMergeAgg(df: DataFrame, keys: Seq[String], k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.columns.contains("k"),
      "wkmvMergeAgg: input sketch carries no `k` column — build it with " +
        "wkmvSketch (sketches are self-describing since round 17)")
    requireKeysAvoid("wkmvMergeAgg", keys, Seq("sample", "wtot", "n", "k"))
    val agg = udaf(new graft.ops.TopK.WTopKAgg(k + 1))
    val ex = df
      .select(keys.map(col) :+ col("wtot") :+ col("n") :+
        col("k").as("__bk") :+
        posexplode_outer(col("sample")).as(Seq("__i", "__e")): _*)
      .withColumn("__p0", when(col("__i").isNull,
          raise_error(lit("wkmvMergeAgg: input sketch row with an EMPTY " +
            "sample — wkmvSketch never emits one; merging it would " +
            "silently drop its wtot/n from the merged totals")))
        .otherwise(when(col("__bk").isNull || col("__bk") < lit(k),
            raise_error(concat(lit(s"wkmvMergeAgg: merge k=$k EXCEEDS " +
              "the sketch's build k="), col("__bk").cast("string"),
              lit(" — the inputs already truncated below the merge k, " +
                "so the merge would read truncated samples as " +
                "exhaustive (silently wrong); re-sketch at the larger " +
                "k instead (a merge k <= build k is legal and " +
                "tightens the sample)"))))
          .otherwise(col("__e.p"))))
    val grouped =
      if (keys.isEmpty) ex.groupBy()
      else ex.groupBy(keys.map(col): _*)
    grouped.agg(
      agg(col("__p0"), col("__e.id"), col("__e.v"), col("__e.w"))
        .as("sample"),
      sum(when(col("__i") === 0, col("wtot")).otherwise(lit(0L)))
        .cast("long").as("wtot"),
      sum(when(col("__i") === 0, col("n")).otherwise(lit(0L))).as("n"))
      .withColumn("k", lit(k))
  }

  /** WEIGHTED type-1 quantiles off the priority sample: τ = the
    * (k+1)-th priority (0 when the group is exhaustive — then ŵ = w
    * and the answer is EXACT up to the grid), ŵ = max(w, τ) per kept
    * row, walk kept rows in (v, id) order and emit the first v whose
    * running ŵ reaches q·Σŵ. ŵ is quantized to a RELATIVE grid —
    * floor(ŵ / max-ŵ-in-group · 1e12 + 0.5) — and accumulated as
    * exact LONGs (the house quantized-walk discipline: a running
    * DOUBLE sum is sequential in Spark but segment-tree-associated in
    * DuckDB window aggregates, so its bits are not portable; the
    * quantized LONG walk is order-free and engine-identical). The
    * grid divisor is the group's max ŵ (a window MAX — pure
    * comparisons, order-free, exact), so per-row terms are ≤ 1e12 and
    * the cum-sum of ≤ 65537 kept rows tops out below 2⁶⁶⁻ᵉ — NO
    * weight-scale limit (ADVICE r16: the old absolute 1e-6 grid
    * overflowed silently past group weight ~9.2e12, below the 100 TB
    * use case this sketch exists for). Every step (one divide, one
    * multiply, one add, floor) is a correctly-rounded IEEE op — no
    * libm — so both engines quantize bit-identically; estimator
    * perturbation ≤ 5e-13 · max-ŵ per row. The crossing compares in
    * double space (long < double promotes identically in both
    * engines). Emits n, wtot (exact), m (kept rows) and one [[pName]]
    * column per quantile. The walk runs over ≤ k rows per group —
    * sketch-sized windows, nothing data-sized. `k` MUST NOT exceed
    * the build k, and since round 17 the sketch CARRIES its k, so the
    * contract is enforced loudly in-plan (VERDICT r16 #2): a larger
    * reader-k used to read a truncated sample as exhaustive (τ = 0 —
    * silently wrong quantiles); now it raises. A SMALLER reader k is
    * legal (ADVICE r17): the top-(k+1) priority prefix of the stored
    * sample is exactly the sketch that k would have built. */
  def wkmvQuantiles(sketch: DataFrame, keys: Seq[String], k: Int,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles in (0, 1]: $qs")
    val names = qs.map(pName)
    require(names.distinct.size == names.size,
      s"quantile column names collide: ${qs.zip(names)}")
    require(sketch.columns.contains("k"),
      "wkmvQuantiles: input sketch carries no `k` column — build it with " +
        "wkmvSketch (sketches are self-describing since round 17)")
    requireKeysAvoid("wkmvQuantiles", keys,
      Seq("sample", "wtot", "n", "k", "m") ++ names)
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__e.v"), col("__e.id"))
    // unordered + frameless: the default frame over an unordered window
    // is the ENTIRE partition, which is exactly the group-max we want
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val ex = sketch
      .withColumn("__tau", when(col("k").isNull || col("k") < lit(k),
          raise_error(concat(lit(s"wkmvQuantiles: reader k=$k EXCEEDS " +
            "the sketch's build k="), col("k").cast("string"),
            lit(" — a larger reader k reads a truncated sample as " +
              "exhaustive (tau=0, silently wrong quantiles); re-sketch " +
              "at the larger k (a reader k <= build k is legal — the " +
              "top-(k+1) priority prefix IS the smaller-k sketch)"))))
        .otherwise(when(size(col("sample")) > k,
          element_at(col("sample"), k + 1).getField("p"))
          .otherwise(lit(0.0))))
      .withColumn("m", least(size(col("sample")), lit(k)).cast("long"))
      .select(keys.map(col) :+ col("wtot") :+ col("n") :+ col("m") :+
        col("__tau") :+ explode(expr(s"slice(sample, 1, $k)")).as("__e"): _*)
      .withColumn("__hw", greatest(col("__e.w").cast("double"), col("__tau")))
      .withColumn("__hw6",
        floor(col("__hw") / max(col("__hw")).over(wg) * lit(1e12) + 0.5)
          .cast("long"))
      .withColumn("__cum", sum("__hw6").over(wv.rowsBetween(Long.MinValue, 0)))
      .withColumn("__tot", max(col("__cum"))
        .over(wv.rowsBetween(Long.MinValue, Long.MaxValue)))
    val aggs = qs.zip(names).map { case (q, name) =>
      min(when(col("__cum").cast("double") >=
        lit(q) * col("__tot").cast("double"), col("__e.v"))).as(name)
    }
    ex.groupBy((keys.map(col) :+ col("n") :+ col("wtot") :+ col("m")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
