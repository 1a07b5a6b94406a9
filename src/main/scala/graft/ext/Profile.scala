package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-flight report (null rates,
  * cardinalities, value ranges) every ingestion pipeline runs before
  * trusting a new drop, in the deequ/great-expectations mold but
  * engine-portable and sketch-bounded.
  */
object Profile {

  /** One-pass column profile: for each named column — row count, null
    * count, HLL approximate distinct count, lexicographic min/max of the
    * STRING form. Returns (col_name, n_rows, n_null, approx_distinct,
    * min_v, max_v), one row per profiled column.
    *
    * Shape at scale: ONE map-only explode fans each row into |cols|
    * (col_name, value-string) entries; everything downstream is
    * column-keyed aggregation with map-side partials — the base stats
    * shuffle |cols| rows, and the distinct estimate goes through
    * [[Sketches.approxDistinct]]'s registers (≤ 512 rows per column,
    * cost independent of the cardinality being estimated — the exact
    * `count(DISTINCT)` a naive profiler runs shuffles every distinct
    * value of every column). The explode's ×|cols| row fan-out happens
    * before any shuffle and carries short strings, so a 100-column
    * profile of a 100 TB table is |cols| concurrent column profiles off
    * one scan, not |cols| scans.
    *
    * Values profile through their STRING form deliberately: one schema
    * for every column type, lexicographic min/max, and the engine-
    * portable h60 hash under the HLL. Callers comparing numeric ranges
    * want [[Sketches.valueBounds]] / [[Sketches.histCounts]] on the
    * typed column instead. Floating columns stringify differently
    * across engines once magnitudes hit scientific notation (~1e7) —
    * the cross-engine caveat the oracle respects by profiling bounded
    * numerics only. */
  /** Embedding-distribution drift between two corpus slices (model/data
    * drift monitoring): per label, the cosine between the slices' MEAN
    * vectors and the L2 length of the shift — the cheap first alarm
    * before anything as heavy as an MMD test. cos ≈ 1 and l2 ≈ 0 means
    * the drops agree; a label whose centroid swings is the one to
    * investigate.
    *
    * Shape at scale: per side, one posexplode + one (label, pos) groupBy
    * with map-side partials — dim-bounded output (labels × dims rows) —
    * then per-label collect of ≤ dim entries (the bounded-by-construction
    * collect, q93's centroid idiom). Per-position means round to 6 dp
    * (the k-means centroid precedent), and both the cosine and the
    * squared-diff fold run INSIDE the assembled arrays in index order —
    * sequential, so the doubles are engine-portable without DECIMAL
    * machinery. Comparison is inner-join on label: a label present in
    * only one slice (itself a drift signal) is absent here — read
    * [[profileColumns]]-style counts for presence drift. Both slices
    * must share one embedding width: mismatched dims zip into null
    * diffs and the row's l2_shift comes back null — treat a null as a
    * schema-drift alarm, not a score. */
  def embeddingDrift(a: DataFrame, b: DataFrame, labelCol: String = "label",
                     embCol: String = "embedding"): DataFrame = {
    def meanVec(df: DataFrame, out: String): DataFrame =
      df.select(col(labelCol).as("label"),
          posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(avg(col("v").cast("double")), 6).as("m"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as(out))
    meanVec(a, "va").join(meanVec(b, "vb"), "label")
      .withColumn("cos_drift",
        round(graft.functions.VectorExprs.cosine(col("va"), col("vb")), 6))
      .withColumn("l2_shift", round(sqrt(aggregate(
        zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z)), 6))
      .select("label", "cos_drift", "l2_shift")
  }

  /** Per-DIMENSION embedding-matrix profile — the anisotropy/QA report
    * an embedding pipeline runs before trusting a new encoder drop: for
    * each vector position, count, mean, variance, min, max, plus each
    * dimension's share of total variance (a collapsed/dead dimension
    * shows up as var_share ≈ 0, a dominant rogue dimension as a share
    * far above 1/dim — the "anisotropy" symptom that kills cosine
    * retrieval, Ethayarajh 2019).
    *
    * Shape at scale: ONE posexplode (map-only ×dim fan-out of floats)
    * into ONE (pos) groupBy with map-side partials — dim-bounded output
    * — plus a 1-row total-variance broadcast for the share. Exact
    * engine-portable cores: values quantize to 6-dp integers (v6 =
    * floor(v·1e6+0.5), the EWMA/CUSUM rule), sums and sums-of-squares
    * accumulate in DECIMAL(38,0) (|v6| ≤ 2e6 ⇒ v6² ≤ 4e12 — a 2^63
    * Long would overflow near ~2e6 rows per dim; DECIMAL doesn't), and
    * the variance core n·S2 − S² stays an exact decimal integer until a
    * final correctly-rounded IEEE double chain — so the hash is stable
    * across engines, partitionings, and row order. */
  def dimProfile(embs: DataFrame, embCol: String = "embedding"): DataFrame = {
    val v6 = floor(col("v").cast("double") * 1e6 + 0.5).cast("decimal(38,0)")
    val perDim = embs
      .select(posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(v6).as("s1"), sum(v6 * v6).as("s2"),
        min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .withColumn("varnum", col("n") * col("s2") - col("s1") * col("s1"))
    // fixed-width embeddings ⇒ n is identical across dims, so each dim's
    // variance share reduces to the pure integer ratio varnum / Σvarnum
    // (no per-dim n² normalization needed). Every division below is a
    // correctly-rounded IEEE double op on EXACT decimal inputs — both
    // engines produce the same bits (the q221 sqrt-chain precedent).
    val tot = perDim.agg(sum(col("varnum")).as("__tv"))
    perDim.crossJoin(broadcast(tot))
      .select(col("pos").as("dim"), col("n"),
        TextAnalysis.round6Portable(col("s1").cast("double") / col("n") / 1e6)
          .as("mean"),
        TextAnalysis.round6Portable(
          col("varnum").cast("double") / col("n") / col("n") / 1e12)
          .as("variance"),
        TextAnalysis.round6Portable(col("mn")).as("min_v"),
        TextAnalysis.round6Portable(col("mx")).as("max_v"),
        TextAnalysis.round6Portable(
          col("varnum").cast("double") / col("__tv").cast("double"))
          .as("var_share"))
  }

  /** Exact lower median of an INTEGER column via counts-of-counts: the
    * smallest value whose cumulative count reaches (n+1) div 2. Never
    * sorts rows — one value-keyed fold (map-side partials) plus a
    * distinct-value-sized running window, the q214/q222 quantile shape.
    * Returns a 1-row (n, median) DataFrame for broadcasting. */
  def exactMedian(df: DataFrame, value: Column): DataFrame = {
    val counts = df.select(value.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__nk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    counts.withColumn("__cum", sum("__nk").over(run))
      .crossJoin(broadcast(counts.agg(sum("__nk").as("n"))))
      .filter(col("__cum") >= expr("(n + 1) div 2"))
      .groupBy("n").agg(min("__v").as("median"))
  }

  /** Per-GROUP [[exactMedian]]: the lower median of `value` within each
    * key — same counts-of-counts economics, with the running window
    * partitioned BY KEY over the distinct (key, value) table, so state
    * is Σ|distinct values per key| and every group computes in
    * parallel. Returns (key, n, median) — one row per key, ready to
    * broadcast back (seasonal profiles, per-segment baselines). */
  def exactMedianBy(df: DataFrame, key: Column, value: Column): DataFrame = {
    val counts = df.select(key.as("__k"), value.cast("long").as("__v"))
      .groupBy("__k", "__v").agg(count(lit(1)).as("__nk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val tots = counts.groupBy("__k").agg(sum("__nk").as("n"))
    counts.withColumn("__cum", sum("__nk").over(run))
      .join(tots, "__k")
      .filter(col("__cum") >= expr("(n + 1) div 2"))
      .groupBy(col("__k").as("key"), col("n"))
      .agg(min("__v").as("median"))
      .select(col("key"), col("n"), col("median"))
  }

  /** Per-group EXACT ordinary-least-squares fit + Pearson correlation
    * of two INTEGER columns (quantize to v6 first): slope, intercept,
    * r, and r² per key from the five moment sums n, Σx, Σy, Σxy, Σx²,
    * Σy² — the per-segment trend detector ("is quality drifting down
    * within each source") and, pointed at (y_{t−1}, y_t) lag pairs, the
    * autocorrelation estimator.
    *
    * Every moment accumulates in DECIMAL(38,0) — EXACT, order-free, so
    * the cores agree bit-for-bit across engines (at v6 scale the xy
    * products pass 2^63 long before 10^38). Each reported float is a
    * fixed expression over the exact cores: slope = num/sxx (one IEEE
    * division of two decimal→double casts), r = num/(√sxx·√syy),
    * r² = (num/sxx)·(num/syy), intercept = (Σy − slope·Σx)/n consuming
    * the ALREADY-6dp slope — identical op order both engines, then
    * 6-dp. Degenerate variance (constant x or y) nulls the affected
    * outputs. ONE groupBy fold with map-side partials; output is
    * key-count-sized. */
  def olsBy(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val g = df.select(key.as("key"),
        x.cast("long").cast(dec).as("__x"), y.cast("long").cast(dec).as("__y"))
      .groupBy("key")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum("__x").as("sx"), sum("__y").as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = when(dxx > 0.0, TextAnalysis.round6Portable(num / dxx))
    g.select(col("key"), col("n").cast("long").as("n"),
      slope.as("slope"),
      when(dxx > 0.0, TextAnalysis.round6Portable(
        (col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double"))).as("intercept"),
      when(dxx > 0.0 && dyy > 0.0, TextAnalysis.round6Portable(
        num / (sqrt(dxx) * sqrt(dyy)))).as("r"),
      when(dxx > 0.0 && dyy > 0.0, TextAnalysis.round6Portable(
        (num / dxx) * (num / dyy))).as("r2"))
  }

  /** Exact lower WEIGHTED median of an INTEGER column with INTEGER
    * weights: the smallest value whose cumulative weight reaches half
    * the total (2·cumW ≥ totW) — "the price where half the QUANTITY
    * sits", robust where the row-median ignores row mass. Same
    * counts-of-counts shape as [[exactMedian]] with weight sums instead
    * of row counts; state is |distinct values|. Returns one row
    * (total_w, wmedian). Rows with weight ≤ 0 are excluded. */
  def exactWeightedMedian(df: DataFrame, value: Column,
                          weight: Column): DataFrame = {
    val counts = df.select(value.cast("long").as("__v"),
        weight.cast("long").as("__w"))
      .filter(col("__w") > 0L)
      .groupBy("__v").agg(sum("__w").as("__wk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    counts.withColumn("__cum", sum("__wk").over(run))
      .crossJoin(broadcast(counts.agg(sum("__wk").as("total_w"))))
      .filter(col("__cum").cast("decimal(38,0)") * 2 >= col("total_w"))
      .groupBy("total_w").agg(min("__v").as("wmedian"))
  }

  /** EXACT trimmed mean of an INTEGER column: drop the k smallest and
    * k largest rows, k = (n·trimPm) div 1000, average the rest — the
    * robust location estimate between the mean (trimPm 0) and the
    * median, immune to the tail a plain mean chases. Entirely from the
    * counts-of-counts fold: each distinct value keeps
    * max(0, min(cum, n−k) − max(cum_prev, k)) of its copies (the
    * overlap of its rank interval with the kept band) — integer
    * arithmetic, no row ever sorts; the kept-mass sum accumulates in
    * DECIMAL and divides ONCE. Returns one row
    * (n, k_trimmed_each, n_kept, mean, trimmed_mean); degenerate
    * n_kept = 0 nulls the trimmed mean. */
  def trimmedMean(df: DataFrame, value: Column, trimPm: Int): DataFrame = {
    require(trimPm >= 0 && trimPm < 500,
      s"trimPm must be in [0,500): $trimPm")
    val counts = df.select(value.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__nk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val tot = counts.agg(sum("__nk").as("n"),
      sum(col("__v").cast("decimal(38,0)") * col("__nk")).as("__sall"))
    val dec = "decimal(38,0)"
    val kept = greatest(lit(0L).cast(dec),
      least(col("__cum"), col("n") - col("__k")).cast(dec) -
        greatest(col("__cum") - col("__nk"), col("__k")).cast(dec))
    counts.withColumn("__cum", sum("__nk").over(run))
      .crossJoin(broadcast(tot))
      .withColumn("__k", expr(s"(n * $trimPm) div 1000"))
      .withColumn("__kept", kept)
      .agg(max("n").as("n"), max("__k").as("k_trimmed_each"),
        max(col("n") - col("__k") * 2).as("n_kept"),
        max("__sall").as("__sa"),
        sum(col("__v").cast(dec) * col("__kept")).as("__st"))
      .select(col("n"), col("k_trimmed_each"), col("n_kept"),
        TextAnalysis.round6Portable(
          col("__sa").cast("double") / col("n")).as("mean"),
        when(col("n_kept") > 0, TextAnalysis.round6Portable(
          col("__st").cast("double") / col("n_kept").cast("double")))
          .as("trimmed_mean"))
  }

  /** Exact quantile normalization of an INTEGER feature ACROSS GROUPS:
    * map each group's value onto the GLOBAL value at the same rank —
    * v′ = min global u with gcdf(u) ≥ cdf_g(v) — so after mapping,
    * every group's distribution matches the pooled corpus (up to value
    * discreteness). The feature-alignment step for multi-source
    * training data: "source B's quality scores run hot" becomes a
    * rank-preserving recalibration instead of a hand-tuned offset.
    *
    * Exact integer rank arithmetic: the target global rank is
    * ceil(scum·gtot / stot) — and `gcum ≥ ceil(x)` ⟺
    * `gcum·stot ≥ scum·gtot` over integers, which is the relation the
    * oracle checks with a correlated min, independent of this plan.
    * The rank→value lookup is NOT an inequality join: global cum rows
    * (rank = gcum, value u) and per-group targets (rank = target)
    * UNION into one stream ordered by (rank, tag) — targets before
    * globals at equal rank — and v′ = first following global u, one
    * window over a DISTINCT-VALUES-sized table (the counts-of-counts
    * contract; never the rows). Output: one row per (group, distinct
    * v): (group, v, n_rows, v_norm), monotone in v within each group. */
  def quantileNormalize(df: DataFrame, groupCol: String,
                        value: Column): DataFrame = {
    val src = df.select(col(groupCol).as("grp"), value.cast("long").as("__v"))
    val gCounts = src.groupBy("__v").agg(count(lit(1)).as("__nk"))
    val runG = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val g = gCounts.withColumn("__gcum", sum("__nk").over(runG))
    val gt = gCounts.agg(sum("__nk").as("__gtot"))
    val sCounts = src.groupBy("grp", "__v").agg(count(lit(1)).as("__snk"))
    val runS = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val st = sCounts.groupBy("grp").agg(sum("__snk").as("__stot"))
    val targets = sCounts.withColumn("__scum", sum("__snk").over(runS))
      .join(st, "grp").crossJoin(broadcast(gt))
      .withColumn("__rank",
        expr("(__scum * __gtot + __stot - 1) div __stot"))
    // one ordered stream: global rows carry the value, target rows
    // pick up the first following (or equal-rank) global value
    val globalRows = g.select(lit(null).cast("string").as("grp"),
      lit(null).cast("long").as("__v"), lit(null).cast("long").as("__snk"),
      col("__gcum").as("__rank"), lit(1).as("__tag"), col("__v").as("__u"))
    val targetRows = targets.select(col("grp").cast("string").as("grp"),
      col("__v"), col("__snk"), col("__rank"), lit(0).as("__tag"),
      lit(null).cast("long").as("__u"))
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("__rank"), col("__tag"))
      .rowsBetween(0, Long.MaxValue)
    globalRows.unionByName(targetRows)
      .withColumn("__vnorm", first(col("__u"), ignoreNulls = true).over(wNext))
      .filter(col("__tag") === 0)
      .select(col("grp").as(groupCol), col("__v").as("v"),
        col("__snk").as("n_rows"), col("__vnorm").as("v_norm"))
  }

  /** EXACT winsorized mean — [[trimmedMean]]'s clamping sibling: the
    * k smallest rows count AS the (k+1)-th value and the k largest AS
    * the (n−k)-th, k = (n·trimPm) div 1000, so tail rows keep their
    * vote but lose their leverage (the convention when row COUNT
    * matters — rates, averages-of-averages). The clamp bounds are two
    * rank lookups off the same counts-of-counts cumulative (lo = value
    * at rank k+1, hi = value at rank n−k, both 1-row broadcasts); the
    * winsorized sum is Σ clamp(v)·count(v) in DECIMAL with ONE final
    * division. Returns (n, k_each, lo, hi, mean, winsorized_mean). */
  def winsorizedMean(df: DataFrame, value: Column, trimPm: Int): DataFrame = {
    require(trimPm >= 0 && trimPm < 500,
      s"trimPm must be in [0,500): $trimPm")
    val dec = "decimal(38,0)"
    val counts = df.select(value.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__nk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val cum = counts.withColumn("__cum", sum("__nk").over(run))
      .crossJoin(broadcast(counts.agg(sum("__nk").as("n"),
        sum(col("__v").cast(dec) * col("__nk")).as("__sall"))))
      .withColumn("__k", expr(s"(n * $trimPm) div 1000"))
    val bounds = cum
      .agg(max("n").as("n"), max("__k").as("k_each"), max("__sall").as("__sa"),
        min(when(col("__cum") >= col("__k") + 1, col("__v"))).as("lo"),
        min(when(col("__cum") >= col("n") - col("__k"), col("__v"))).as("hi"))
    cum.crossJoin(broadcast(bounds.select(col("lo").as("__lo"),
        col("hi").as("__hi"))))
      .agg(sum(greatest(least(col("__v"), col("__hi")), col("__lo"))
        .cast(dec) * col("__nk")).as("__ws"))
      .crossJoin(broadcast(bounds))
      .select(col("n"), col("k_each"), col("lo"), col("hi"),
        TextAnalysis.round6Portable(
          col("__sa").cast("double") / col("n")).as("mean"),
        TextAnalysis.round6Portable(
          col("__ws").cast("double") / col("n").cast("double"))
          .as("winsorized_mean"))
  }

  /** Robust outlier screen by median/MAD (Hampel filter): a row is an
    * outlier when |x − median| > k·MAD, with MAD = median(|x − median|).
    * Unlike mean/stddev z-scores, the 50%-breakdown median pair cannot
    * be dragged by the outliers it is hunting — the reason every data
    * validation suite ships it. EXACT end to end on integer columns:
    * both medians come from [[exactMedian]]'s counts-of-counts (no row
    * sort, distinct-value-sized state), they broadcast as 1-row tables,
    * and the flag `dev > k·mad` is a pure integer compare — so both
    * engines agree on every boundary row. Doubles: quantize to v6 first
    * (the EWMA rule). Two value-fold passes over the column + map-only
    * flagging; at 100 TB the fold state is |distinct values|, not rows. */
  def robustOutliers(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 1, s"robustOutliers needs k >= 1, got $k")
    val med = exactMedian(df, value).select(col("n"), col("median"))
    val dev = df.crossJoin(broadcast(med))
      .withColumn("dev", abs(value.cast("long") - col("median")))
    val mad = exactMedian(dev, col("dev"))
      .select(col("median").as("mad"))
    dev.crossJoin(broadcast(mad))
      .withColumn("is_outlier", col("dev") > lit(k) * col("mad"))
  }

  /** Leave-one-SOURCE-out influence on a corpus mean — the cheap source
    * ablation: for each group g, the corpus mean of `value` with g
    * removed, mean_loo = (S − S_g)/(N − N_g), next to the overall mean
    * and the delta — which source is dragging average quality/length,
    * WITHOUT |sources| recomputation passes (the jackknife identity
    * makes it one fold). `value` must be integer-typed (cast/quantize
    * first): S and the per-group sums stay exact DECIMAL(38,0), and
    * each output is ONE IEEE double division (then a subtraction)
    * rounded at 6 dp. Shape: one groupBy(group) fold with map-side
    * partials + a 1-row totals broadcast — group-count-sized output. A
    * group covering the whole corpus (N = N_g) nulls its mean_loo and
    * influence rather than dividing by zero. */
  def leaveOneOutMeans(df: DataFrame, groupCol: String,
                       value: Column): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(value.cast("decimal(38,0)")).as("__sg"))
    val tot = g.agg(sum("n_rows").as("__N"), sum("__sg").as("__S"))
    val meanAll = col("__S").cast("double") / col("__N")
    val meanLoo = (col("__S") - col("__sg")).cast("double") /
      (col("__N") - col("n_rows"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"),
        TextAnalysis.round6Portable(meanAll).as("mean_all"),
        when(col("__N") === col("n_rows"), lit(null).cast("double"))
          .otherwise(TextAnalysis.round6Portable(meanLoo)).as("mean_loo"),
        when(col("__N") === col("n_rows"), lit(null).cast("double"))
          .otherwise(TextAnalysis.round6Portable(meanLoo - meanAll))
          .as("influence"))
  }

  /** Operating-point selection for a score vs a binary label: the
    * LARGEST threshold t (flag = score >= t) whose recall still meets
    * `recallPm` per-mille — i.e. the fewest-flagged operating point
    * achieving the recall target — plus the achieved recall, precision,
    * and flagged count. The thresholding every production quality /
    * moderation classifier ships with, chosen exactly.
    *
    * Exactness and shape: score-value counts-of-counts (one fold,
    * map-side partials) + a distinct-value-sized descending running
    * window; the recall test is the integer compare
    * 1000·cum_pos >= recallPm·P (never a float recall), and the chosen
    * row is an arg-max struct fold — no row sort, no row-scale window.
    * Integer scores only (quantize doubles to v6 first). Returns one
    * row; recall/precision are single rounded IEEE divisions. Empty or
    * zero-positive inputs return no row (a recall target over zero
    * positives is undefined) — contract-check P > 0 upstream. */
  def operatingPoint(df: DataFrame, score: Column, label: Column,
                     recallPm: Int): DataFrame = {
    require(recallPm >= 1 && recallPm <= 1000,
      s"recallPm must be in [1, 1000], got $recallPm")
    val c = df.select(score.cast("long").as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy("__s").agg(count(lit(1)).as("__n"), sum("__y").as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("__s").desc)
      .rowsBetween(Long.MinValue, 0)
    val cum = c.withColumn("__cn", sum("__n").over(w))
      .withColumn("__cp", sum("__p").over(w))
    val tot = c.agg(sum("__p").as("__ptot"))
    cum.crossJoin(broadcast(tot))
      .filter(col("__ptot") > 0 &&
        col("__cp") * 1000 >= lit(recallPm) * col("__ptot"))
      .agg(max(struct(col("__s"), col("__cn"), col("__cp"), col("__ptot")))
        .as("b"))
      .filter(col("b").isNotNull)
      .select(col("b.__s").as("threshold"), col("b.__cn").as("n_flagged"),
        TextAnalysis.round6Portable(col("b.__cp") / col("b.__ptot"))
          .as("recall"),
        TextAnalysis.round6Portable(col("b.__cp") / col("b.__cn"))
          .as("precision"))
  }

  /** Full precision-recall sweep — [[operatingPoint]]'s big sibling:
    * one row per DISTINCT score value s, reporting the classifier
    * "flag everything scoring ≥ s" (n_flagged, true positives,
    * precision, recall, F1). The whole curve in one pass: the model-
    * selection report a linker/filter tuning session reads, instead of
    * re-running one operating point per candidate threshold.
    *
    * Same counts-of-counts economics as [[operatingPoint]]: one
    * score-keyed fold with map-side partials, one distinct-score-sized
    * descending running window, one 1-row totals broadcast. Integer
    * cores; each output float is one IEEE division (F1: one more
    * divide) rounded at 6 dp. Score must be integer-typed (quantize
    * first). Curve length = |distinct scores| — bounded by the score
    * domain, never by rows. */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val c = df.select(score.cast("long").as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy("__s").agg(count(lit(1)).as("__n"), sum("__y").as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("__s").desc)
      .rowsBetween(Long.MinValue, 0)
    val cum = c.withColumn("__cn", sum("__n").over(w))
      .withColumn("__cp", sum("__p").over(w))
    val tot = c.agg(sum("__p").as("__ptot"))
    val prec = col("__cp").cast("double") / col("__cn")
    val rec = col("__cp").cast("double") / col("__ptot")
    cum.crossJoin(broadcast(tot))
      .filter(col("__ptot") > 0)
      .select(col("__s").as("threshold"),
        col("__cn").as("n_flagged"), col("__cp").as("tp"),
        TextAnalysis.round6Portable(prec).as("precision"),
        TextAnalysis.round6Portable(rec).as("recall"),
        when(col("__cp") > 0, TextAnalysis.round6Portable(
          lit(2.0) * col("__cp") / (col("__cn") + col("__ptot"))))
          .as("f1"))
  }

  /** Inclusion-dependency ratio — the DISCOVERY half of
    * [[Contract]]'s declared-ForeignKey check: how much of `child`'s
    * distinct value set lives inside `parent`'s. containment = 1 marks
    * a candidate FK an undocumented dataset drop actually honors;
    * partial ratios expose lookalike columns that merely overlap. Both
    * sides profile through their STRING form (one comparison semantics
    * across physical types, the profileColumns rule). Shape: two
    * DISTINCT folds (map-side partials, distinct-value-sized) and one
    * LEFT ANTI join between the distinct sets; 1 row out. */
  def inclusionRatio(child: DataFrame, childCol: String,
                     parent: DataFrame, parentCol: String,
                     label: String): DataFrame = {
    val c = child.select(col(childCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull).distinct()
    val p = parent.select(col(parentCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull).distinct()
    val n = c.agg(count(lit(1)).as("n_child_distinct"))
    val miss = c.join(p, Seq("__v"), "left_anti")
      .agg(count(lit(1)).as("n_missing"))
    n.crossJoin(miss).select(lit(label).as("candidate"),
      col("n_child_distinct"), col("n_missing"),
      when(col("n_child_distinct") > 0, TextAnalysis.round6Portable(
        (col("n_child_distinct") - col("n_missing")).cast("double") /
          col("n_child_distinct"))).as("containment"),
      (col("n_missing") === 0 && col("n_child_distinct") > 0)
        .as("is_inclusion"))
  }

  /** Cumulative Poisson(1) CDF thresholds P(X <= k), k = 0..5 — the
    * inverse-CDF lookup both engines share as double literals (mass
    * above k = 5 is ~6e-5; those draws cap at 6). */
  val PoissonCum: Seq[Double] = {
    val pdf = (0 to 5).scanLeft(math.exp(-1.0)) { (p, k) => p / (k + 1) }
    pdf.take(6).scanLeft(0.0)(_ + _).tail
  }

  /** Poisson-bootstrap confidence interval for a corpus mean (Chamandy
    * et al., "Estimating Uncertainty for Massive Data Streams", Google
    * 2012): each of `reps` replicates reweights every row by a
    * Poisson(1) draw and the replicate means' empirical quantiles give
    * the CI — the one bootstrap that works in one pass over distributed
    * data (no resampling shuffle; weights are per-row arithmetic).
    *
    * Every "draw" is DETERMINISTIC: u = h60(salt:rep:id)/2^60 through
    * the shared Poisson CDF table — so the interval is reproducible
    * across engines, partitionings, and retries, and the DuckDB oracle
    * hash-matches it (the epoch-shuffle no-RNG discipline applied to
    * resampling). `value` must be integer-valued (counts, lengths —
    * cast to long internally): replicate sums then stay exact integers
    * and the means are portable doubles. Returns one row per `keys`
    * group (one total row when `keys` is empty):
    * (keys..., n_rows, n_reps, point_mean, ci_lo, ci_hi) with the
    * ceil(α/2·B)-rank quantile convention — the per-group form is the
    * dashboard shape (per-source/per-language means with error bars),
    * and the rank window partitions by group carrying `reps` rows each,
    * never data.
    *
    * Shape at scale: one map-only ×`reps` fan-out (short integer rows),
    * one partial-agg'd groupBy(rep) to `reps` rows, quantile extraction
    * over those `reps` rows (driver-trivial window). Cost ≈ reps × one
    * metric aggregation — B = 50–200 buys honest error bars on any
    * corpus-level statistic before a curation decision. */
  def bootstrapCI(df: DataFrame, value: Column, idCol: String,
                  reps: Int = 50, salt: String = "boot",
                  alpha: Double = 0.05, keys: Seq[String] = Nil): DataFrame = {
    require(reps >= 10, s"bootstrap needs >= 10 replicates, got $reps")
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val keyCols = keys.map(col)
    val base = df.select((keyCols :+ col(idCol).cast("string").as("__id")
      :+ value.cast("long").as("__x")): _*)
    val repMeans = replicateMeans(base, keys, reps, salt)
    val loRank = math.max(1, math.ceil(alpha / 2 * reps).toInt)
    val hiRank = math.max(1, math.ceil((1 - alpha / 2) * reps).toInt)
    // per-group rank window: `reps` rows per group partition, never data
    val rankPart = if (keys.isEmpty) Seq(lit(0)) else keyCols
    val ranked = repMeans.withColumn("__r",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(rankPart: _*)
          .orderBy("rep_mean", "__rep")))
    val point = base.groupBy(keyCols: _*).agg(count(lit(1)).as("n_rows"),
      round(sum("__x").cast("double") / count(lit(1)), 6).as("point_mean"))
    val lo = ranked.filter(col("__r") === loRank)
      .select((keyCols :+ col("rep_mean").as("ci_lo")): _*)
    val hi = ranked.filter(col("__r") === hiRank)
      .select((keyCols :+ col("rep_mean").as("ci_hi")): _*)
    val joined =
      if (keys.isEmpty) point.crossJoin(lo).crossJoin(hi)
      else point.join(lo, keys).join(hi, keys)
    joined.select((keyCols :+ col("n_rows") :+ lit(reps.toLong).as("n_reps")
      :+ col("point_mean") :+ col("ci_lo") :+ col("ci_hi")): _*)
  }

  /** Shared replicate stage: `base` must carry keys ++ (__id, __x); one
    * ×reps fan-out, the deterministic Poisson weight, one partial-agg'd
    * groupBy to (keys, __rep, rep_mean). */
  private def replicateMeans(base: DataFrame, keys: Seq[String],
                             reps: Int, salt: String): DataFrame = {
    val keyCols = keys.map(col)
    val u = graft.ext.TextAnalysis.h60(concat(lit(salt), lit(":"),
      col("__rep").cast("string"), lit(":"), col("__id")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val w = PoissonCum.zipWithIndex.reverse
      .foldLeft(lit(6): Column) { case (acc, (c, k)) =>
        when(col("__u") < lit(c), lit(k)).otherwise(acc)
      }
    base
      .withColumn("__rep", explode(array((1 to reps).map(lit(_)): _*)))
      .withColumn("__u", u)
      .withColumn("__w", w)
      .groupBy((keyCols :+ col("__rep")): _*)
      .agg(sum(col("__w") * col("__x")).as("__wx"), sum("__w").as("__sw"))
      .withColumn("rep_mean",
        round(col("__wx").cast("double") / col("__sw"), 6))
  }

  /** Paired bootstrap difference CI: is group `a`'s mean REALLY above
    * group `b`'s, or inside the noise? Per replicate, the SAME
    * deterministic draw stream produces both groups' reweighted means
    * (draws key on (rep, id) — group membership never changes a row's
    * weight), the per-replicate DIFFERENCE mean(a) − mean(b) is the
    * bootstrap statistic, and its empirical quantiles give the CI.
    * `significant` = the interval excludes zero — the proper paired
    * answer to the A/B question a bare q136-style per-group CI overlap
    * only approximates. One row:
    * (n_a, n_b, point_diff, ci_lo, ci_hi, significant). Same exactness
    * and determinism contract as [[bootstrapCI]]; same one-pass shape
    * plus one `reps`-row self-join on the replicate id. */
  def bootstrapDiffCI(df: DataFrame, value: Column, idCol: String,
                      groupCol: String, a: String, b: String,
                      reps: Int = 50, salt: String = "boot",
                      alpha: Double = 0.05): DataFrame = {
    require(reps >= 10, s"bootstrap needs >= 10 replicates, got $reps")
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    require(a != b, s"compare two distinct groups, got '$a' twice")
    val base = df.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).cast("string").as("__g"),
        col(idCol).cast("string").as("__id"), value.cast("long").as("__x"))
    val rm = replicateMeans(base, Seq("__g"), reps, salt)
    val diffs = rm.filter(col("__g") === a)
      .select(col("__rep"), col("rep_mean").as("__ma"))
      .join(rm.filter(col("__g") === b)
        .select(col("__rep"), col("rep_mean").as("__mb")), "__rep")
      .withColumn("rep_diff", round(col("__ma") - col("__mb"), 6))
    val loRank = math.max(1, math.ceil(alpha / 2 * reps).toInt)
    val hiRank = math.max(1, math.ceil((1 - alpha / 2) * reps).toInt)
    val ranked = diffs.withColumn("__r",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy("rep_diff", "__rep")))
    val point = base.groupBy("__g")
      .agg(count(lit(1)).as("__n"),
        round(sum("__x").cast("double") / count(lit(1)), 6).as("__m"))
    val pa = point.filter(col("__g") === a)
      .select(col("__n").as("n_a"), col("__m").as("__pma"))
    val pb = point.filter(col("__g") === b)
      .select(col("__n").as("n_b"), col("__m").as("__pmb"))
    pa.crossJoin(pb)
      .crossJoin(ranked.filter(col("__r") === loRank)
        .select(col("rep_diff").as("ci_lo")))
      .crossJoin(ranked.filter(col("__r") === hiRank)
        .select(col("rep_diff").as("ci_hi")))
      .withColumn("point_diff", round(col("__pma") - col("__pmb"), 6))
      .withColumn("significant", col("ci_lo") > 0.0 || col("ci_hi") < 0.0)
      .select("n_a", "n_b", "point_diff", "ci_lo", "ci_hi", "significant")
  }

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val entries = array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)
    // spread before the per-column explode (round 18, opt guide §2.5):
    // the stringify+explode fan-out is |cols|× the row count and ran on
    // the input's scan splits (q132 measured 2.9s over 3 tasks).
    val stream = graft.ops.Partitioning.spread(df).select(explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    val base = stream.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min("v").as("min_v"), max("v").as("max_v"))
    val ad = Sketches.approxDistinct(
      stream.filter(col("v").isNotNull), Seq("col_name"), col("v"))
    base.join(ad, Seq("col_name"), "left")
      .na.fill(0.0, Seq("approx_distinct"))
      .select("col_name", "n_rows", "n_null", "approx_distinct",
        "min_v", "max_v")
  }

  /** Per-group Tukey-fence outlier screen: exact quartiles (percentile_disc
    * semantics — the value at rank ceil(p·n), an ORDER STATISTIC, never an
    * interpolated float) and the counts beyond the classic 1.5·IQR fences.
    * The robust length/quality screen a heterogeneous corpus needs where
    * a z-score screen is itself wrecked by the outliers it hunts: a
    * handful of 100 MB documents moves the mean and sigma arbitrarily
    * but cannot move Q1/Q3. Returns one row per group:
    * (keys..., n, q1, q3, iqr, n_low, n_high).
    *
    * Shape at scale: one rank window PARTITIONED BY the group keys
    * (the per-group rank precedent — one shuffle+sort by key), one
    * groupBy selecting the two order statistics, then the fence counts
    * via a second key-joined aggregation (the quartile table is
    * group-cardinality-sized and joins via [[graft.ops.Guards.broadcastIfSmall]]
    * — degrades to a shuffled join past the bound instead of melting
    * the driver). Order statistics of an integer column are exact
    * integers, so the whole row hashes engine-portably; the fences
    * compare in double space where long < double promotes identically
    * in both engines. For groups too large to sort, the sketch path is
    * [[Sketches.histQuantiles]] — this operator is the EXACT member of
    * that family. */
  def tukeyOutliers(df: DataFrame, valueCol: String,
                    keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "tukeyOutliers needs at least one group key")
    import org.apache.spark.sql.expressions.Window
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__x"))
    val ranked = df.select(kc :+ col(valueCol).as("__x"): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(kc: _*)))
    val quart = ranked.groupBy(kc: _*).agg(
      max("__n").as("n"),
      min(when(col("__rn") === ceil(col("__n") * 0.25), col("__x"))).as("q1"),
      min(when(col("__rn") === ceil(col("__n") * 0.75), col("__x"))).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    df.select(kc :+ col(valueCol).as("__x"): _*)
      .join(graft.ops.Guards.broadcastIfSmall(quart), keys)
      .groupBy(kc: _*)
      .agg(max("n").as("n"), max("q1").as("q1"), max("q3").as("q3"),
        max("iqr").as("iqr"),
        sum(when(col("__x").cast("double") <
          col("q1").cast("double") - lit(1.5) * col("iqr").cast("double"),
          1L).otherwise(0L)).as("n_low"),
        sum(when(col("__x").cast("double") >
          col("q3").cast("double") + lit(1.5) * col("iqr").cast("double"),
          1L).otherwise(0L)).as("n_high"))
  }

  /** MERGEABLE form of [[profileColumns]]: one state row per column —
    * (col_name, n_rows, n_null, min_v, max_v, hll_registers) — where
    * every field merges associatively (sums, min/max, register max).
    * Real pipelines profile per drop/day/shard and combine: the state is
    * what you persist, [[profileMerge]] combines states, and
    * [[profileFinalize]] yields exactly [[profileColumns]]' report.
    * merge == rebuild EXACTLY (register max is the sketch union), so an
    * incremental profile never re-reads old drops. */
  def profileColumnsState(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumnsState needs at least one column")
    val entries = array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)
    // spread before the per-column explode (round 18, opt guide §2.5):
    // the stringify+explode fan-out is |cols|× the row count and ran on
    // the input's scan splits (q132 measured 2.9s over 3 tasks).
    val stream = graft.ops.Partitioning.spread(df).select(explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    val base = stream.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min("v").as("min_v"), max("v").as("max_v"))
    val regs = Sketches.hllRegisters(
      stream.filter(col("v").isNotNull), Seq("col_name"), col("v"))
    base.join(regs, Seq("col_name"), "left")
  }

  /** Merge profile states across rows (shards/days/engines) per column:
    * counts add, string bounds min/max, registers element-wise max —
    * all associative, so any merge tree gives the rebuild's state. */
  def profileMerge(states: DataFrame): DataFrame = {
    val base = states.groupBy("col_name").agg(
      sum("n_rows").as("n_rows"), sum("n_null").as("n_null"),
      min("min_v").as("min_v"), max("max_v").as("max_v"))
    val regs = Sketches.hllMergeAgg(
      states.select("col_name", "hll_registers").na.drop(Seq("hll_registers")),
      Seq("col_name"))
    base.join(regs, Seq("col_name"), "left")
  }

  /** State → the [[profileColumns]] report (identical schema/values). */
  def profileFinalize(state: DataFrame): DataFrame =
    state.select(col("col_name"), col("n_rows"), col("n_null"),
      coalesce(Sketches.hllEstimate("hll_registers"), lit(0.0))
        .as("approx_distinct"),
      col("min_v"), col("max_v"))

  /** The SKETCH member of the [[tukeyOutliers]] family: quartiles from
    * per-group histogram counters ([[Sketches.histCounts]] →
    * [[Sketches.histQuantiles]] — rank-interpolated inside deterministic
    * fixed bins) instead of an exact per-group sort. For groups too large
    * to sort in one window partition — a billion-document language — the
    * histogram pass is ONE map-side-combined groupBy whose shuffle
    * carries ≤ `buckets` counter rows per group, and the quantile
    * extraction runs on sketch-sized data; the fence counts are a second
    * map-only pass against the group-cardinality-sized fence table
    * (broadcastIfSmall — degrades to a shuffled join past the bound).
    * Same estimates whatever the partitioning (integer counters +
    * fixed binning), so the approximate numbers are still hash-provable
    * cross-engine. Returns (keys..., n, q1, q3, lo_fence, hi_fence,
    * n_low, n_high) with the quantile estimates rounded to 6 dp. */
  def tukeyOutliersSketch(df: DataFrame, valueCol: Column, keys: Seq[String],
                          lo: Double, hi: Double,
                          buckets: Int = Sketches.HIST_BUCKETS): DataFrame = {
    require(keys.nonEmpty, "tukeyOutliersSketch needs at least one group key")
    val kc = keys.map(col)
    val hist = Sketches.histCounts(df, keys, valueCol, lo, hi, buckets)
    val fences = Sketches
      .histQuantiles(hist, keys, lo, hi, Seq(0.25, 0.75), buckets)
      .groupBy(kc: _*)
      .agg(min(when(col("q") === 0.25, col("quantile_est"))).as("q1"),
        min(when(col("q") === 0.75, col("quantile_est"))).as("q3"))
      .withColumn("iqr", round(col("q3") - col("q1"), 6))
      .withColumn("lo_fence", round(col("q1") - lit(1.5) * col("iqr"), 6))
      .withColumn("hi_fence", round(col("q3") + lit(1.5) * col("iqr"), 6))
    df.select(kc :+ valueCol.cast("double").as("__x"): _*)
      .join(graft.ops.Guards.broadcastIfSmall(fences), keys)
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n"), max("q1").as("q1"), max("q3").as("q3"),
        max("lo_fence").as("lo_fence"), max("hi_fence").as("hi_fence"),
        sum(when(col("__x") < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("__x") > col("hi_fence"), 1L).otherwise(0L)).as("n_high"))
  }

  /** Corpus snapshot diff: per-id status between two drops of the same
    * table — `added` (only in new), `removed` (only in old), `changed`
    * (both, compared columns differ), `unchanged`. The change audit an
    * incremental pipeline runs before reprocessing a refreshed dump:
    * everything downstream (re-embed, re-dedup, re-shard) only needs the
    * added ∪ changed slice, and `removed` drives tombstones.
    *
    * Shape at scale: each side collapses to (id, md5-of-compared-columns)
    * in a map-only projection — the full-outer equi-join on the id then
    * carries two 32-char digests per row instead of the document bodies,
    * so diffing two 100 TB snapshots shuffles id+hash, never text.
    * The per-column encoding is INJECTIVE across column boundaries:
    * each value folds as `v<charlen>:<value>` (null as the distinct
    * sentinel `null:`), so content shifting BETWEEN columns — e.g.
    * (text="1v:2", src="3") vs (text="1", src="2v:3"), which a plain
    * tag-only concat folds to the same "v:1v:2v:3" bytes — still
    * digests differently; a value moving between NULL and the
    * empty string still reads as a change. Duplicate ids are rejected
    * loudly via a per-side count guard folded into the join (a snapshot
    * with repeated primary ids would silently cross-multiply). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "corpusDiff needs at least one compared column")
    def digest(df: DataFrame, hName: String): DataFrame = {
      // length-prefixed encoding — see the injectivity note above; a
      // bare "v:"+value tag is NOT injective once values may contain
      // the tag (ADVICE r10)
      val parts = compareCols.map { c =>
        val s = col(c).cast("string")
        coalesce(concat(lit("v"), length(s).cast("string"), lit(":"), s),
          lit("null:"))
      }
      df.select(col(idCol).as("__id"),
          md5(concat_ws("", parts: _*)).as(hName))
        .groupBy("__id")
        .agg(count(lit(1)).as(s"${hName}_n"), min(hName).as(hName))
        .withColumn(hName,
          when(col(s"${hName}_n") > 1,
            raise_error(concat(lit(s"corpusDiff: duplicate $idCol in snapshot: "),
              col("__id").cast("string"))))
            .otherwise(col(hName)))
        .drop(s"${hName}_n")
    }
    digest(oldDf, "__h_old")
      .join(digest(newDf, "__h_new"), Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** k-anonymity audit over a set of quasi-identifier columns — the
    * re-identification complement to [[graft.ext.TextAnalysis.piiScrubbed]]:
    * scrubbing removes DIRECT identifiers, but a row is still
    * re-identifiable when its quasi-identifier COMBINATION (language ×
    * source × length bucket × …) is shared by fewer than k rows. Emits one
    * row per quasi-identifier class: its values, its size, and whether it
    * violates k — the release gate suppresses or generalizes the violating
    * classes before data leaves the boundary.
    *
    * One hash-aggregate with map-side partials (class count ≤ the
    * quasi-space's cardinality, never row count) — the 100 TB cost is the
    * scan, and the audit output is small enough to join back as a
    * broadcast suppression filter. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2 to be an anonymity bound, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates_k", col("class_size") < k)
  }

  /** Generalization ladder to k-anonymity — the FIXER half of
    * [[kAnonymity]]'s check: coarsen the numeric quasi-identifier
    * through successively wider buckets (width 1 = raw, …, the last
    * rung suppressing it entirely via one global bucket) and report
    * each rung's equivalence-class census; `chosen` marks the FIRST
    * rung whose smallest class reaches k — the minimal information
    * loss that satisfies the bound. Rungs evaluate in ONE pass (a
    * per-row explode of the ladder, then a (rung, stratum, bucket)
    * fold with map-side partials); the chosen-rung pick is an argmin
    * over the rung-count-sized summary. Width 0 encodes "suppress".
    * Returns one row per rung: (level, width, n_classes, min_class,
    * qualifies, chosen). */
  def generalizationLadder(df: DataFrame, stratumCol: String,
                           value: Column, widths: Seq[Long],
                           k: Int): DataFrame = {
    require(widths.nonEmpty, "ladder needs at least one width")
    require(k >= 2, s"k must be >= 2, got $k")
    val rungs = widths.zipWithIndex.map { case (w, l) =>
      struct(lit(l).as("level"), lit(w).as("width"),
        (if (w == 0L) lit(0L) else (value.cast("long") - pmod(value.cast("long"), lit(w)))).as("bucket"))
    }
    val census = df
      .select(col(stratumCol).as("__s"), explode(array(rungs: _*)).as("__r"))
      .groupBy(col("__r.level").as("level"), col("__r.width").as("width"),
        col("__s"), col("__r.bucket").as("__b"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("level", "width")
      .agg(count(lit(1)).as("n_classes"), min("__n").as("min_class"))
      .withColumn("qualifies", col("min_class") >= k)
    val best = census.filter(col("qualifies"))
      .agg(min("level").as("__best"))
    census.crossJoin(broadcast(best))
      .withColumn("chosen", col("level") === col("__best"))
      .drop("__best")
  }

  /** Off-diagonal correlation audit of an embedding matrix — the
    * whitening report [[dimProfile]]'s per-dim variances can't see:
    * how much of the feature mass lives in CROSS-dimension structure.
    * For every dim pair i < j, corr²(i, j) from EXACT DECIMAL moment
    * cores (cov_num = n·Σxy − Σx·Σy, var_num per dim), each corr²
    * computed as the fixed chain r = cov/√var_i/√var_j, r·r, 6-dp,
    * summed as DECIMAL — order-free. Reports the pair count, the
    * summed off-diagonal corr² (0 = perfectly white, n_pairs = fully
    * redundant), the max |corr| pair and its dims. Shape: one
    * posexplode self-join per vector (dim²/2 fan-out — dim-bounded,
    * never row-bounded), one (i, j)-keyed fold, a dim-sized variance
    * broadcast. */
  def correlationAudit(embs: DataFrame, idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame = {
    val dec = "decimal(38,0)"
    // spread before the dim-explode + pair fan-out (round 18, opt guide
    // §2.5): a one-split embeddings file serialized the dim²/2 pair
    // stream (q265 measured 2.5s/1 task). No-op on multi-split inputs.
    val ex = graft.ops.Partitioning.spread(embs).select(col(idCol).as("__row"),
        posexplode(col(embCol)).as(Seq("__i", "__xv")))
      .select(col("__row"), col("__i"),
        floor(col("__xv").cast("double") * 1e6 + 0.5).cast("long").as("__x"))
    val pairs = ex.select(col("__row"), col("__i"), col("__x"))
      .join(ex.select(col("__row"), col("__i").as("__j"),
        col("__x").as("__y")), "__row")
      .filter(col("__i") < col("__j"))
    val mom = pairs.groupBy("__i", "__j")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("__x").cast(dec)).as("sx"),
        sum(col("__y").cast(dec)).as("sy"),
        sum(col("__x").cast(dec) * col("__y")).as("sxy"))
    val vars = ex.groupBy("__i")
      .agg(count(lit(1)).cast(dec).as("vn"),
        sum(col("__x").cast(dec)).as("vs"),
        sum(col("__x").cast(dec) * col("__x")).as("vss"))
      .select(col("__i"),
        (col("vn") * col("vss") - col("vs") * col("vs"))
          .cast("double").as("__var"))
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val corr = cov / sqrt(col("__vi")) / sqrt(col("__vj"))
    val corr2 = TextAnalysis.round6Portable(corr * corr)
    mom
      .join(broadcast(vars.select(col("__i"), col("__var").as("__vi"))), "__i")
      .join(broadcast(vars.select(col("__i").as("__j"),
        col("__var").as("__vj"))), "__j")
      .filter(col("__vi") > 0.0 && col("__vj") > 0.0)
      .withColumn("__c2", corr2)
      .agg(count(lit(1)).as("n_pairs"),
        TextAnalysis.round6Portable(
          sum(col("__c2").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
            .cast("double")).as("offdiag_corr2"),
        max(struct(col("__c2").as("c2"), (-col("__i")).as("ni"),
          (-col("__j")).as("nj"))).as("__mx"))
      .select(col("n_pairs"), col("offdiag_corr2"),
        col("__mx.c2").as("max_corr2"),
        (-col("__mx.ni")).cast("int").as("max_i"),
        (-col("__mx.nj")).cast("int").as("max_j"))
  }

  /** Mutual information (nats) between two discrete columns — the
    * feature-dependence report behind "does document length leak the
    * language label": MI = Σ_xy p_xy·ln(p_xy/(p_x·p_y)), plus both
    * marginal entropies and the normalized MI/min(H_x, H_y) ∈ [0, 1].
    * Portability: counts are exact; each cell term is the FIXED chain
    * (n_xy/n)·ln(n_xy·n/(n_x·n_y)) rounded at 6 dp then DECIMAL-summed
    * (the PSI/entropy ln rule), entropies likewise. Shape: one
    * (x, y)-keyed fold + two marginal folds (all map-side partials),
    * joined cell→marginals (joint-domain-sized tables), 1 row out. */
  def mutualInformation(df: DataFrame, x: Column, y: Column): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(24, 6)
    val cells = df.select(x.cast("string").as("__x"),
        y.cast("string").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("__nxy"))
    val mx = cells.groupBy("__x").agg(sum("__nxy").as("__nx"))
    val my = cells.groupBy("__y").agg(sum("__nxy").as("__ny"))
    val tot = cells.agg(sum("__nxy").as("__n"))
    def entropy(m: DataFrame, nCol: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .select(TextAnalysis.round6Portable(
          (col(nCol).cast("double") / col("__n")) *
            -log(col(nCol).cast("double") / col("__n"))).cast(dec6)
          .as("__h"))
        .agg(TextAnalysis.round6Portable(sum("__h").cast("double")).as("h"))
    val miTerm = TextAnalysis.round6Portable(
      (col("__nxy").cast("double") / col("__n")) *
        log(col("__nxy").cast("double") * col("__n") /
          (col("__nx").cast("double") * col("__ny")))).cast(dec6)
    val mi = cells.join(mx, "__x").join(my, "__y")
      .crossJoin(broadcast(tot))
      .agg(max("__n").as("n"), count(lit(1)).as("n_cells"),
        TextAnalysis.round6Portable(sum(miTerm).cast("double")).as("mi"))
    mi.crossJoin(broadcast(entropy(mx, "__nx")
        .select(col("h").as("h_x"))))
      .crossJoin(broadcast(entropy(my, "__ny")
        .select(col("h").as("h_y"))))
      .select(col("n"), col("n_cells"), col("mi"), col("h_x"), col("h_y"),
        when(least(col("h_x"), col("h_y")) > 0.0,
          TextAnalysis.round6Portable(
            col("mi") / least(col("h_x"), col("h_y")))).as("nmi"))
  }

  /** Gini-impurity decrease of candidate split features against a
    * label — decision-stump feature scoring, the "which metadata
    * column actually predicts the label" triage before any model:
    * decrease_f = gini(label) − Σ_b (n_b/n)·gini_b. Counts are exact;
    * each bucket contributes the FIXED chain
    * (n_b − Σ_c n_bc²/n_b)/n rounded at 6 dp then DECIMAL-summed, so
    * engines agree term for term; the parent impurity runs the same
    * chain with one bucket. Shape: one explode to (feature, bucket,
    * label) — map-only — then two keyed folds with partials; output is
    * feature-count-sized. */
  def giniStumpScores(df: DataFrame, label: Column,
                      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "giniStumpScores needs >= 1 feature")
    val dec6 = org.apache.spark.sql.types.DecimalType(24, 6)
    val dec = "decimal(38,0)"
    // a null feature value is its OWN bucket (not a dropped row):
    // dropping would make the weighted impurity's row base differ from
    // the parent's and bias the decrease for sparse features
    val kv = df.select(label.cast("string").as("__l"), explode(map(
        features.flatMap { case (nm, c) =>
          Seq(lit(nm), coalesce(c.cast("string"), lit("__null__"))) }: _*))
        .as(Seq("feature", "__b")))
      .filter(col("__l").isNotNull)
    val cellCounts = kv.groupBy("feature", "__b", "__l")
      .agg(count(lit(1)).as("__nbc"))
    val buckets = cellCounts.groupBy("feature", "__b")
      .agg(sum("__nbc").as("__nb"),
        sum(col("__nbc").cast(dec) * col("__nbc")).as("__ssq"))
    val tot = buckets.groupBy("feature")
      .agg(sum("__nb").as("__n"), count(lit(1)).as("n_buckets"))
    val term = TextAnalysis.round6Portable(
      (col("__nb").cast("double") -
        col("__ssq").cast("double") / col("__nb")) / col("__n"))
      .cast(dec6)
    val weighted = buckets.join(tot, "feature")
      .groupBy("feature", "n_buckets")
      .agg(TextAnalysis.round6Portable(sum(term).cast("double"))
        .as("weighted_gini"))
    // parent impurity: the same chain over label counts alone
    val lab = df.select(label.cast("string").as("__l"))
      .filter(col("__l").isNotNull)
      .groupBy("__l").agg(count(lit(1)).as("__nc"))
    val parent = lab
      .crossJoin(broadcast(lab.agg(sum("__nc").as("__n"))))
      .select(TextAnalysis.round6Portable(
        col("__nc").cast("double") / col("__n") *
          (lit(1.0) - col("__nc").cast("double") / col("__n"))).cast(dec6)
        .as("__t"))
      .agg(TextAnalysis.round6Portable(sum("__t").cast("double"))
        .as("parent_gini"))
    weighted.crossJoin(broadcast(parent))
      .select(col("feature"), col("n_buckets"), col("parent_gini"),
        col("weighted_gini"),
        TextAnalysis.round6Portable(
          col("parent_gini") - col("weighted_gini")).as("gini_decrease"))
  }

  /** Distribution drift between two corpus snapshots over ONE scalar
    * feature — the release gate that catches "the new drop's length
    * profile moved" before a model trains on it. Bins both sides into a
    * shared fixed-width histogram (clamped to [lo, hi)), then scores the
    * two count vectors:
    *
    *   - `tv`  — total-variation distance Σ|p_a − p_b|/2, computed on an
    *     EXACT integer core (Σ|c_a·N_b − c_b·N_a| in DECIMAL, one final
    *     correctly-rounded division) so both engines produce identical
    *     bits;
    *   - `psi` — population-stability index with Laplace smoothing
    *     (+0.5/bin), the industry drift alarm. Its per-bin ln terms ride
    *     the q176 DECIMAL contribution-sum discipline (round 6 dp per
    *     term, exact sum) because ln is the one non-correctly-rounded op
    *     in the pipeline;
    *   - `max_bin_gap` — the single worst bin's |p_a − p_b|, which names
    *     where the drift lives.
    *
    * Shape at 100 TB: each side is one scan folding to ≤ bins rows with
    * map-side partials; the compare is a bins-sized full-outer join and
    * a 1-row fold. Nothing row-sized ever shuffles. Pick lo/hi/bins so
    * the bin width is a dyadic rational (e.g. 0..1024 × 16) and the bin
    * assignment's double arithmetic is exact in any engine. Bins empty
    * on BOTH sides contribute 0 to every score (smoothed ratio = 1), so
    * the missing-bin spine is unnecessary by construction. */
  def histogramDrift(a: DataFrame, b: DataFrame, value: Column,
                     lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, s"need bins>=2 and hi>lo, got $bins, [$lo,$hi)")
    val w = (hi - lo) / bins
    // NULL features are excluded, not binned: greatest/least skip nulls,
    // so an unfiltered null would land in bin 0 and silently inflate
    // both the lowest bin and the totals.
    def counts(df: DataFrame, n: String): DataFrame =
      df.select(value.as("__v")).filter(col("__v").isNotNull)
        .select(least(lit(bins - 1), greatest(lit(0),
          floor((col("__v") - lo) / w))).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val ca = counts(a, "c_a")
    val cb = counts(b, "c_b")
    val joined = ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val tot = joined.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val j = joined.crossJoin(broadcast(tot))
    val pa = (col("c_a") + 0.5) / (col("n_a") + 0.5 * bins)
    val pb = (col("c_b") + 0.5) / (col("n_b") + 0.5 * bins)
    val psiTerm = round((pa - pb) * log(pa / pb), 6).cast("decimal(20,6)")
    val gapNum = abs(col("c_a").cast("decimal(38,0)") * col("n_b")
      - col("c_b").cast("decimal(38,0)") * col("n_a"))
    j.agg(first("n_a").as("n_a"), first("n_b").as("n_b"),
        sum(gapNum).as("tv_num"), max(gapNum).as("gap_num"),
        sum(psiTerm).as("psi_sum"))
      .select(col("n_a"), col("n_b"),
        TextAnalysis.round6Portable(col("tv_num").cast("double")
          / (lit(2.0) * col("n_a") * col("n_b"))).as("tv"),
        TextAnalysis.round6Portable(col("gap_num").cast("double")
          / (col("n_a").cast("double") * col("n_b"))).as("max_bin_gap"),
        col("psi_sum").cast("double").as("psi"))
  }

  /** 2^61 − 1: the Mersenne modulus the fingerprint sum folds into so
    * its output stays a plain BIGINT in every engine. */
  val fingerprintMod: Long = 2305843009213693951L

  /** Orderless whole-table content fingerprint — the dataset-versioning /
    * migration audit: three commutative-monoid aggregates over a portable
    * per-row hash, so fingerprint(A) == fingerprint(B) iff (w.h.p.) A and
    * B hold the SAME MULTISET of rows, regardless of row order, partition
    * layout, file count, or the path the bytes took to get there. Run it
    * on a table before and after a rewrite (compaction, engine migration,
    * format change, Z-order): equal fingerprints certify the copy carried
    * every row exactly once; xor catches a flipped row, sum-mod catches a
    * dropped+duplicated pair that xor alone cancels, n_rows anchors both.
    *
    * Row hash = h60 (portable md5-derived 60-bit) over the SAME
    * length-prefixed injective encoding [[corpusDiff]] uses
    * (`v<len>:<value>`, nulls as `null:`) — a value containing the tag
    * bytes cannot collide with a neighboring column (ADVICE r10's
    * injectivity rule). Columns hash through their string form: callers
    * pick columns whose casts are engine-portable (integers, strings,
    * dates — not raw doubles, the cross-engine caveat [[profileColumns]]
    * documents).
    *
    * Shape at 100 TB: ONE scan, map-side partial aggregation, a 1-row
    * result — no shuffle wider than the partial-agg exchange, no sort,
    * no window. The sum accumulates in DECIMAL(38,0) (exact to 10^38,
    * far past 10^12 rows × 2^60) and folds modulo 2^61−1 into a BIGINT
    * so the OUTPUT type is engine-portable; the xor is bitwise and never
    * overflows. Associativity/commutativity of (+, xor, count) is what
    * makes the fingerprint layout-invariant AND incrementally mergeable:
    * fingerprint(A ∪ B) folds from fingerprint(A) and fingerprint(B)
    * without rescanning — the per-shard audit ledger pattern. */
  /** Fold per-shard [[tableFingerprint]] rows into the fingerprint of the
    * union — the audit-ledger half of the fingerprint design: each
    * ingestion shard records its (n_rows, sum_mod, xor60) once, and ANY
    * subset's combined fingerprint is three residue folds over the ledger
    * rows — no rescan, ever. Residue arithmetic is exact: counts add,
    * xors xor, and sum-mods add in DECIMAL then fold modulo 2^61−1
    * (each input is already a residue, so the sum of ≤ 10^15 ledger rows
    * stays far below DECIMAL(38)'s range). Equality with the whole-table
    * fingerprint is algebra, and q191 pins it cross-engine. */
  def mergeFingerprints(ledger: DataFrame, label: String): DataFrame =
    ledger.agg(sum("n_rows").as("n_rows"),
        (sum(col("sum_mod").cast("decimal(38,0)")) % fingerprintMod)
          .cast("long").as("sum_mod"),
        expr("bit_xor(xor60)").as("xor60"))
      .select(lit(label).as("label"), col("n_rows"), col("sum_mod"),
        col("xor60"))

  private def fingerprintRowHash(cols: Seq[String]): Column = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val parts = cols.map { c =>
      val s = col(c).cast("string")
      coalesce(concat(lit("v"), length(s).cast("string"), lit(":"), s),
        lit("null:"))
    }
    TextAnalysis.h60(concat_ws("", parts: _*))
  }

  def tableFingerprint(df: DataFrame, cols: Seq[String],
                       label: String): DataFrame =
    df.select(fingerprintRowHash(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("h").cast("decimal(38,0)")) % fingerprintMod)
          .cast("long").as("sum_mod"),
        expr("bit_xor(h)").as("xor60"))
      .select(lit(label).as("label"), col("n_rows"), col("sum_mod"),
        col("xor60"))

  /** Per-shard fingerprint ledger: one [[tableFingerprint]] row per value
    * of `groupCol` (label = the group value's string form). Same one-scan
    * map-side-partial shape — the per-shard rows [[mergeFingerprints]]
    * folds without rescanning. */
  def groupedFingerprint(df: DataFrame, cols: Seq[String],
                         groupCol: String): DataFrame =
    df.select(col(groupCol).cast("string").as("label"),
        fingerprintRowHash(cols).as("h"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("h").cast("decimal(38,0)")) % fingerprintMod)
          .cast("long").as("sum_mod"),
        expr("bit_xor(h)").as("xor60"))

  /** Merkle-style anti-entropy screen between two replicas/snapshots:
    * rows hash-partition into `buckets` by KEY (so a changed value
    * stays in its bucket), each side folds to one fingerprint row per
    * bucket ([[groupedFingerprint]]'s exact monoids), and only buckets
    * whose (n_rows, sum_mod, xor60) triples disagree come back. The
    * replica-repair protocol at 100 TB: exchange `buckets` rows of
    * three integers each, then run the row-level [[snapshotDiff]] on
    * the dirty buckets ONLY — never full-table compare traffic.
    * q216 chains exactly that repair plan. */
  def bucketDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                 cols: Seq[String], buckets: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "bucketDiff needs key columns")
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    def side(df: DataFrame): DataFrame =
      groupedFingerprint(
        df.withColumn("__bucket",
          pmod(fingerprintRowHash(keyCols), lit(buckets)).cast("string")),
        cols, "__bucket")
    side(a).select(col("label").cast("long").as("bucket"),
        col("n_rows").as("n_a"), col("sum_mod").as("sum_a"),
        col("xor60").as("xor_a"))
      .join(side(b).select(col("label").cast("long").as("bucket"),
        col("n_rows").as("n_b"), col("sum_mod").as("sum_b"),
        col("xor60").as("xor_b")), Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) ||
        !(col("sum_a") <=> col("sum_b")) || !(col("xor_a") <=> col("xor_b")))
  }

  /** Keyed two-snapshot diff — the EXPLANATION to [[tableFingerprint]]'s
    * verdict: when the fingerprints disagree, this says how. One keyed
    * full-outer join classifies every key as added (new only), removed
    * (old only), changed (both, any compare column differs under
    * null-safe equality) or unchanged, and counts, per compare column,
    * how many common keys changed THAT column. Output is one (label, n)
    * row per compare column (`chg_<col>`) plus the four `zz_` status
    * totals — a |cols|+4-row report.
    *
    * Shape at scale: the join shuffles each side once on the key (or
    * broadcasts a small snapshot — Catalyst's choice); everything after
    * it is a conditional single-row aggregate with map-side partials, and
    * the long-format reshape explodes that ONE row. No window, no driver
    * state, no second scan of either snapshot. Keys must be unique per
    * snapshot (a keyed diff is meaningless under duplicates): duplicate
    * keys multiply through the join and inflate counts — run
    * [[tableFingerprint]]'s n_rows or a key-uniqueness Contract first. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compare column")
    val o = oldDf.select(
      keyCols.map(col) ++ (compareCols.map(c => col(c).as(s"o_$c")) :+
        lit(1).as("o_present")): _*)
    val n = newDf.select(
      keyCols.map(col) ++ (compareCols.map(c => col(c).as(s"n_$c")) :+
        lit(1).as("n_present")): _*)
    val j = o.join(n, keyCols, "full_outer")
    val both = col("o_present").isNotNull && col("n_present").isNotNull
    val same = compareCols.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduce(_ && _)
    val aggs = Seq(
      sum(when(col("o_present").isNull, 1L).otherwise(0L)).as("zz_added"),
      sum(when(col("n_present").isNull, 1L).otherwise(0L)).as("zz_removed"),
      sum(when(both && !same, 1L).otherwise(0L)).as("zz_changed"),
      sum(when(both && same, 1L).otherwise(0L)).as("zz_unchanged")) ++
      compareCols.map(c =>
        sum(when(both && !(col(s"o_$c") <=> col(s"n_$c")), 1L)
          .otherwise(0L)).as(s"chg_$c"))
    val one = j.agg(aggs.head, aggs.tail: _*)
    val labels = compareCols.map(c => s"chg_$c") ++
      Seq("zz_added", "zz_removed", "zz_changed", "zz_unchanged")
    one.select(explode(array(labels.map(l =>
        struct(lit(l).as("label"), col(l).as("n"))): _*)).as("kv"))
      .select(col("kv.label").as("label"), col("kv.n").as("n"))
  }

  import org.apache.spark.sql.types.DecimalType
  import org.apache.spark.sql.expressions.Window

  /** Pearson chi-square test of independence between two categorical
    * columns — the "is lang independent of source?" audit a corpus
    * balance report runs. Includes EMPTY cells (every row-category ×
    * col-category pair contributes its expected count), so the statistic
    * matches the textbook definition, not a present-cells-only variant.
    *
    * Determinism: each cell term is ((o·N − r·c)² in exact DECIMAL →
    * double) / ((r·c → double) · (N → double)), rounded to 6 dp, then
    * DECIMAL-summed — order-free and engine-identical. The integer core
    * is exact while N² fits DECIMAL(38) (N ≤ ~10¹⁹ᐟ²); the final square
    * is a correctly-rounded double op in both engines.
    *
    * Shape at scale: one (a,b) groupBy folds 100 TB to |A|·|B| cells
    * with map-side partials; marginals and the zero-cell grid are
    * cells-sized cross/left joins; the output is ONE row. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(19,0)"
    val cells = df.groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("b").agg(sum("o").as("cb"))
    val n = cells.agg(sum("o").as("n"))
    val grid = ra.crossJoin(cb).crossJoin(broadcast(n))
      .join(cells, Seq("a", "b"), "left").na.fill(0L, Seq("o"))
    val dnum = (col("o").cast(dec) * col("n").cast(dec) -
      col("ra").cast(dec) * col("cb").cast(dec)).cast("double")
    val rc = (col("ra").cast(dec) * col("cb").cast(dec)).cast("double")
    val term = TextAnalysis.round6Portable(
      dnum * dnum / (rc * col("n").cast("double")))
    grid.agg(max("n").as("n"),
        countDistinct("a").as("n_a"), countDistinct("b").as("n_b"),
        sum(term.cast(DecimalType(24, 6))).cast("double").as("chi2"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"), col("chi2"))
  }

  /** ROC-AUC of a score against a boolean outcome, computed as the
    * tie-corrected Mann-Whitney rank statistic: with average ranks over
    * ascending scores, AUC = (Σ ranks₊ − P(P+1)/2) / (P·Nneg). The
    * threshold-free classifier-quality audit run before trusting any
    * quality score as a filter.
    *
    * EXACT integer core: scores fold to one row per DISTINCT value
    * (map-side partials), a running count gives each tie group's rank
    * offset, and 2·Σranks₊ = Σ np·(2·cum_before + n + 1) stays integral
    * in DECIMAL — the single final division is rounded to 6 dp. No
    * float enters until that division.
    *
    * Shape at scale: the per-score fold is the only full shuffle; the
    * running window then orders DISTINCT scores in ONE partition —
    * deliberate and bounded: callers must feed a bounded-cardinality
    * score (integers, or a 6-dp-rounded float ⇒ ≤ ~2M distinct values),
    * the same contract as [[Sketches]] histograms. */
  def rocAuc(df: DataFrame, scoreCol: String, pos: Column): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(pos, 1L).otherwise(0L)).as("np"))
    val before = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cum_before",
      coalesce(sum("n").over(before), lit(0L)))
    val twice = (col("np").cast("decimal(38,0)") *
      (lit(2) * col("cum_before") + col("n") + 1)).as("t")
    ranked.agg(sum("n").as("n"), sum("np").as("n_pos"),
        count(lit(1)).as("n_scores"), sum(twice).as("t2"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        col("n_scores"),
        // null when either class is empty (AUC undefined)
        when(col("n_pos") > 0 && col("n") > col("n_pos"),
          TextAnalysis.round6Portable(
            (col("t2") - col("n_pos").cast("decimal(38,0)") *
              (col("n_pos") + 1)).cast("double") /
            (lit(2).cast("decimal(38,0)") * col("n_pos") *
              (col("n") - col("n_pos"))).cast("double"))).as("auc"))
  }

  /** Calibration-by-bins (reliability diagram rows): predictions in
    * [0,1] bucket into `bins` equal-width bins (the top edge closes into
    * the last bin); each bin reports volume, observed positive rate,
    * mean prediction, and its Brier contribution — miscalibration is
    * mean_pred far from frac_pos. Per-row doubles are 6-dp-rounded then
    * DECIMAL-summed (order-free); each per-bin division rounds once.
    * One groupBy on the bin: map-side partials, `bins` output rows. */
  def calibration(df: DataFrame, pred: Column, pos: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins must be in [2,10000]: $bins")
    val bin = least(floor(pred * bins), lit(bins - 1)).cast("int")
    val y = when(pos, 1.0).otherwise(0.0)
    val sq = (pred - y) * (pred - y)
    df.select(bin.as("bin"),
        TextAnalysis.round6Portable(pred).cast(DecimalType(24, 6)).as("p6"),
        when(pos, 1L).otherwise(0L).as("is_pos"),
        TextAnalysis.round6Portable(sq).cast(DecimalType(24, 6)).as("sq6"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("is_pos").as("n_pos"),
        sum("p6").as("sp"), sum("sq6").as("sb"))
      .select(col("bin"), col("n"), col("n_pos"),
        TextAnalysis.round6Portable(
          col("n_pos").cast("double") / col("n")).as("frac_pos"),
        TextAnalysis.round6Portable(
          col("sp").cast("double") / col("n")).as("mean_pred"),
        TextAnalysis.round6Portable(
          col("sb").cast("double") / col("n")).as("brier"))
  }

  /** Two-proportion z-test — the closed-form A/B significance check
    * (is variant B's rate really higher, or is the diff noise): z =
    * (p̂_a − p̂_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) under the pooled
    * null. The algebraic complement to the bootstrap CIs (q135–q137):
    * O(1) after one fold, no resampling.
    *
    * Portability: counts are exact; every division/multiplication/sqrt
    * after them is a correctly-rounded IEEE op (sqrt included — unlike
    * ln), evaluated in the SAME expression order both engines, then the
    * z rounds to 6 dp. One conditional fold over the rows; ONE row out
    * with both rates, z, and the |z| > 1.96 verdict. Degenerate pooled
    * rates (0 or 1 — zero variance) yield null z. */
  def twoProportionTest(df: DataFrame, isA: Column, isB: Column,
                        pos: Column): DataFrame = {
    val one = df.agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA && pos, 1L).otherwise(0L)).as("k_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB && pos, 1L).otherwise(0L)).as("k_b"))
    val pa = col("k_a").cast("double") / col("n_a")
    val pb = col("k_b").cast("double") / col("n_b")
    val pp = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = when(col("n_a") > 0 && col("n_b") > 0 &&
        pp > 0.0 && pp < 1.0,
      TextAnalysis.round6Portable((pa - pb) / se))
    one.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
      TextAnalysis.round6Portable(pa).as("p_a"),
      TextAnalysis.round6Portable(pb).as("p_b"),
      z.as("z"),
      (abs(z) > 1.96).as("significant"))
  }

  /** Corpus-concentration report for a categorical (source, domain,
    * license): group count, row count, the Gini coefficient of the
    * group-size distribution, and its Shannon entropy (nats) — the
    * "is this corpus one giant domain in a trenchcoat" numbers a
    * mixture designer reads before setting quotas.
    *
    * Gini rides an EXACT integer core: with sizes ranked ascending,
    * G = Σ(2i − n − 1)·x_i / (n·Σx) — both sides integral in DECIMAL,
    * one rounded division. Entropy terms p·ln(p) round to 6 dp then
    * DECIMAL-sum (the [[histogramDrift]] PSI rule: ln is the one
    * non-correctly-rounded op, so round each term, sum exactly).
    * Shape: one group fold, then rank + folds over the groups-sized
    * table (bounded-cardinality window contract). ONE row out. */
  def concentration(df: DataFrame, groupCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("x"))
    val tot = g.agg(count(lit(1)).as("n_groups"), sum("x").as("n_rows"))
    val ranked = g.withColumn("i",
      row_number().over(Window.orderBy(col("x").asc,
        col(groupCol).asc)).cast("long"))
    val folded = ranked.crossJoin(broadcast(tot))
      .withColumn("__gnum", (lit(2L) * col("i") - col("n_groups") - 1L)
        .cast("decimal(38,0)") * col("x"))
      .withColumn("__p", col("x").cast("double") / col("n_rows"))
      .withColumn("__h",
        TextAnalysis.round6Portable(-col("__p") * log(col("__p")))
          .cast(DecimalType(24, 6)))
      .agg(max("n_groups").as("n_groups"), max("n_rows").as("n_rows"),
        sum("__gnum").as("__gn"), sum("__h").as("__hs"))
    folded.select(col("n_groups"), col("n_rows"),
      TextAnalysis.round6Portable(col("__gn").cast("double") /
        (col("n_groups").cast("decimal(38,0)") * col("n_rows"))
          .cast("double")).as("gini"),
      col("__hs").cast("double").as("entropy"))
  }

  /** Coverage curve: how many of the heaviest groups it takes to cover
    * p% of the rows, for each requested percentile — "3 domains are
    * half the corpus" as one row (k_50, k_90, k_99, ...). Integer rank
    * arithmetic throughout: k_p = min k with running row count ≥
    * ceil(p·total/100) over sizes ranked DESC (ties by group value).
    * One group fold + one groups-sized running window. */
  def coverageCurve(df: DataFrame, groupCol: String,
                    pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be within [1,100]: $pcts")
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("x"))
    val run = Window.orderBy(col("x").desc, col(groupCol).asc)
    val ranked = g.withColumn("k", row_number().over(run).cast("long"))
      .withColumn("cum", sum("x").over(
        run.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = ranked.agg(count(lit(1)).as("n_groups"),
      sum("x").as("n_rows"))
    val aggs = pcts.map(p => min(when(
      col("cum") >= expr(s"($p * n_rows + 99) div 100"), col("k")))
      .as(s"k_$p"))
    ranked.crossJoin(broadcast(tot))
      .agg(max("n_groups").as("n_groups"), aggs: _*)
  }

  /** Per-class precision/recall/F1 from a predicted-vs-actual pair —
    * the confusion-matrix report behind every classifier gate. All
    * three scores come from EXACT integer forms (precision tp/(tp+fp),
    * recall tp/(tp+fn), F1 as 2tp/(2tp+fp+fn) — never the rounded
    * p·r composite), one rounded division each; a class never predicted
    * gets null precision, never present gets null recall. Classes are
    * the union of both sides (full outer on the marginals).
    *
    * Shape at scale: one (pred, actual) cell fold with map-side
    * partials; marginals and tp are cells-sized folds joined class-to-
    * class. One row per class. */
  def confusionStats(df: DataFrame, pred: Column, actual: Column): DataFrame = {
    val cells = df.groupBy(pred.cast("string").as("p"),
        actual.cast("string").as("a"))
      .agg(count(lit(1)).as("n"))
    val byPred = cells.groupBy(col("p").as("clazz"))
      .agg(sum("n").as("n_pred"))
    val byAct = cells.groupBy(col("a").as("clazz"))
      .agg(sum("n").as("n_actual"))
    val tp = cells.filter(col("p") <=> col("a"))
      .select(col("p").as("clazz"), col("n").as("tp"))
    byPred.join(byAct, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        TextAnalysis.round6Portable(
          col("tp").cast("double") / col("n_pred"))))
      .withColumn("recall", when(col("n_actual") > 0,
        TextAnalysis.round6Portable(
          col("tp").cast("double") / col("n_actual"))))
      .withColumn("f1", when(col("n_pred") + col("n_actual") > 0,
        TextAnalysis.round6Portable((lit(2L) * col("tp")).cast("double") /
          (col("n_pred") + col("n_actual")))))
  }

  /** Cohen's kappa — chance-corrected agreement between two raters
    * (model vs labels, two model versions, annotator vs annotator):
    * κ = (p_o − p_e)/(1 − p_e) computed from the EXACT integer identity
    * κ = (agree·N − Σₖ aₖ·bₖ) / (N² − Σₖ aₖ·bₖ); the only float op is
    * the final 6-dp-rounded division (κ is null when p_e = 1 — a
    * degenerate single-class pair of raters). One pass for agreement +
    * two class-sized marginal folds joined on the class: map-side
    * partials everywhere, one output row. */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val r = df.select(raterA.cast("string").as("ra"),
      raterB.cast("string").as("rb"))
    val base = r.agg(count(lit(1)).as("n"),
      sum(when(col("ra") <=> col("rb"), 1L).otherwise(0L)).as("agree"))
    // Null-safe marginal join: `agree` counts null<=>null as agreement,
    // so a NULL rater class must also contribute its aₖ·bₖ term to the
    // chance mass s_e — a null-unsafe === would drop it and overstate κ.
    val s = r.groupBy("ra").agg(count(lit(1)).as("ca"))
      .join(r.groupBy("rb").agg(count(lit(1)).as("cb")),
        col("ra") <=> col("rb"))
      .agg(coalesce(sum(col("ca").cast("decimal(38,0)") * col("cb")),
        lit(0).cast("decimal(38,0)")).as("s_e"))
    val j = base.crossJoin(broadcast(s))
    val nDec = col("n").cast("decimal(38,0)")
    val kden = (nDec * nDec - col("s_e")).cast("double")
    j.select(col("n"), col("agree"),
      when(col("n") > 0, TextAnalysis.round6Portable(
        col("agree").cast("double") / col("n"))).as("p_o"),
      when(col("n") > 0, TextAnalysis.round6Portable(
        col("s_e").cast("double") / (nDec * nDec).cast("double")))
        .as("p_e"),
      when(kden =!= 0.0, TextAnalysis.round6Portable(
        (col("agree").cast("decimal(38,0)") * col("n") - col("s_e"))
          .cast("double") / kden)).as("kappa"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic on an INTEGER column
    * (quantize doubles to v6 first, the EWMA rule): D = sup over values
    * of |F_a(v) − F_b(v)| — the distribution-drift alarm that catches
    * shape changes a mean/variance monitor misses. EXACT end to end:
    * the sup is maximized over the INTEGER cross-products
    * |ca·n_b − cb·n_a| (DECIMAL(38,0) — at 100 TB row counts the
    * product leaves BIGINT), so the argmax never compares rounded
    * doubles; ONE division at the end produces the 6-dp D. Ties in the
    * gap resolve to the SMALLEST attaining value via a max(struct)
    * fold, so both engines name the same location. Shape: one
    * value-keyed fold with map-side partials, one distinct-value-sized
    * running window (the [[exactMedian]] counts-of-counts contract —
    * state is |distinct values|, never rows), one 1-row broadcast. */
  def ksTwoSample(df: DataFrame, value: Column,
                  isA: Column, isB: Column): DataFrame = {
    val counts = df.select(value.cast("long").as("__v"),
        when(isA, 1L).otherwise(0L).as("__a"),
        when(isB, 1L).otherwise(0L).as("__b"))
      .filter(col("__a") === 1L || col("__b") === 1L)
      .groupBy("__v").agg(sum("__a").as("na_v"), sum("__b").as("nb_v"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val tot = counts.agg(sum("na_v").as("n_a"), sum("nb_v").as("n_b"))
    counts
      .withColumn("__ca", sum("na_v").over(run).cast("decimal(38,0)"))
      .withColumn("__cb", sum("nb_v").over(run).cast("decimal(38,0)"))
      .crossJoin(broadcast(tot))
      .withColumn("__gap",
        abs(col("__ca") * col("n_b") - col("__cb") * col("n_a")))
      .groupBy("n_a", "n_b")
      .agg(max(struct(col("__gap").as("g"), (-col("__v")).as("nv")))
        .as("__mx"))
      .select(col("n_a"), col("n_b"),
        TextAnalysis.round6Portable(col("__mx.g").cast("double") /
          (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double"))
          .as("d_stat"),
        (-col("__mx.nv")).as("at_v"))
  }

  /** Benford first-digit shares of 0.301030 … 0.045757, pinned as 6-dp
    * literals so both engines consume IDENTICAL constants — log10 is
    * not correctly rounded and may differ in the last ulp across libm
    * implementations, so the law itself is the one thing not computed
    * at runtime. */
  val BenfordE6: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-significant-digit audit of a POSITIVE integer
    * measure (quantize money to cents first): per digit 1–9, the
    * observed count, observed share, expected Benford share, and an
    * EXACT integer deviation |n_obs·10⁶ − n·e6| — a fabricated or
    * truncated numeric column announces itself as a fat deviation on
    * one digit. Rows with value ≤ 0 are excluded (Benford is defined on
    * positive magnitudes). The first digit comes from the decimal
    * STRING form — exact, no log10 in the row path. Shape: map-only
    * digit extraction, one 9-group fold with map-side partials, one
    * 1-row broadcast; 9 rows out. */
  def benfordDigits(df: DataFrame, value: Column): DataFrame = {
    val digits = df.select(value.cast("long").as("__v"))
      .filter(col("__v") > 0L)
      .select(substring(col("__v").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val e6 = BenfordE6.foldLeft(lit(null).cast("long")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    digits.crossJoin(broadcast(digits.agg(sum("n_obs").as("n"))))
      .withColumn("e6", e6)
      .select(col("digit"), col("n_obs"), col("n"),
        TextAnalysis.round6Portable(
          col("n_obs").cast("double") / col("n")).as("obs_share"),
        (col("e6").cast("double") / 1e6).as("exp_share"),
        abs(col("n_obs").cast("decimal(38,0)") * 1000000L -
          col("n").cast("decimal(38,0)") * col("e6")).cast("long")
          .as("dev_num"))
  }

  /** Exact 2-D Pareto frontier (skyline), both dimensions MINIMIZED
    * (negate a column to maximize it): keep every row no other row
    * dominates, where p dominates q iff p.x ≤ q.x ∧ p.y ≤ q.y ∧ (p.x <
    * q.x ∨ p.y < q.y). All copies of a frontier point are kept (no
    * arbitrary dedup). The quality-vs-cost trade-off curve a curation
    * pass reads before picking thresholds.
    *
    * Never a pair join and never a row sort — the domination test
    * factors through x: q is dominated iff
    *   min{y : x < q.x} ≤ q.y   (strictly-better-x side), or
    *   min{y : x = q.x} < q.y   (equal-x side).
    * Both minima come from the counts-of-counts shape: one groupBy(x)
    * fold (map-side partials) to a distinct-x-sized table, one running
    * strict-prefix window over THAT table, then a broadcast equi-join
    * back to the rows — the [[exactMedian]] contract (state is
    * |distinct x|, not rows), vs the textbook NOT EXISTS self-join the
    * oracle runs. Integer columns only (cast/quantize first) so every
    * boundary compare is exact. */
  def paretoFront(df: DataFrame, x: Column, y: Column): DataFrame = {
    val keyed = df.withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
    val perX = keyed.groupBy("__x").agg(min("__y").as("__ymin"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__x")
      .rowsBetween(Long.MinValue, -1)
    val marks = perX.withColumn("__yprev", min("__ymin").over(run))
      .select(col("__x"), col("__ymin"), col("__yprev"))
    keyed.join(graft.ops.Guards.broadcastIfSmall(marks), Seq("__x"))
      .filter((col("__yprev").isNull || col("__yprev") > col("__y")) &&
        col("__ymin") === col("__y"))
      .drop("__ymin", "__yprev", "__x", "__y")
  }

  /** Exact equi-depth (quantile) binning of an INTEGER column: type-1
    * quantile edges — edge_q = min v with cum·bins ≥ q·n — from the
    * counts-of-counts fold, then a map-only assignment
    * bin = 1 + |{q : v > edge_q}| against the broadcast (bins−1)-row
    * edge set. All ties of one value land in one bin by construction
    * (edges are VALUES, not row ranks), so the binning is a pure
    * function of v — the property a feature-store discretizer needs
    * for train/serve consistency. Integer compares end to end; no row
    * ever sorts. Returns per-row input plus `bin`; aggregate downstream
    * as needed. */
  def quantileBins(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000]: $bins")
    val counts = df.select(value.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__nk"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val qs = (1 until bins).map(q => lit(q.toLong))
    val edges = counts.withColumn("__cum", sum("__nk").over(run))
      .crossJoin(broadcast(counts.agg(sum("__nk").as("__n"))))
      .select(col("__v"), col("__cum"), col("__n"),
        explode(array(qs: _*)).as("__q"))
      .filter(col("__cum").cast("decimal(38,0)") * bins >=
        col("__q").cast("decimal(38,0)") * col("__n"))
      .groupBy("__q").agg(min("__v").as("__edge"))
      .agg(array_sort(collect_list("__edge")).as("__edges"))
    df.withColumn("__v", value.cast("long"))
      .crossJoin(broadcast(edges))
      .withColumn("bin",
        (size(filter(col("__edges"), e => col("__v") > e)) + 1))
      .drop("__edges", "__v")
  }

  /** Mann-Whitney U rank-sum test (Mann & Whitney 1947) between two
    * labeled samples of an INTEGER metric — the nonparametric sibling of
    * q236's KS drift and q221's z-test: "did source B's quality scores
    * shift relative to A", with no normality assumption and exact
    * handling of ties via midranks and the tie-corrected variance
    *   σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1))).
    * Also emits the rank-biserial effect size r = 1 − 2U_a/(n_a·n_b),
    * the drift magnitude a monitoring dashboard actually thresholds on.
    *
    * Counts-of-counts discipline end-to-end: one (value → n_a, n_b)
    * conditional aggregation over the pooled rows, a running-total
    * window over DISTINCT VALUES only, and exact integer cores — the
    * midrank 2·cum_before + t + 1 is kept DOUBLED so the rank-sum core
    * stays an exact decimal(38,0) integer (one halving to U_a happens in
    * double, at the end); tie cubes go through decimal(38,0) too (a
    * single tied value can hold ~1e9 rows at corpus scale, so t³
    * overflows long). Floats appear only in U, σ and z. */
  def mannWhitneyU(df: DataFrame, value: Column, groupCol: Column,
                   groupA: String, groupB: String): DataFrame = {
    val dec = "decimal(38,0)"
    val src = df.filter(groupCol.isin(groupA, groupB))
      .select(value.cast("long").as("__v"),
        (groupCol === groupA).as("__isa"))
    val counts = src.groupBy("__v")
      .agg(sum(when(col("__isa"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__isa"), 0L).otherwise(1L)).as("__nb"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
      .rowsBetween(Long.MinValue, 0)
    val t = col("__na") + col("__nb")
    counts
      .withColumn("__cum", sum(col("__na") + col("__nb")).over(run))
      // doubled midrank of every row tied at __v: 2·(rows before) + t + 1
      .withColumn("__mr2", (col("__cum") - t) * 2 + t + 1)
      .agg(sum("__na").cast(dec).as("n_a"), sum("__nb").cast(dec).as("n_b"),
        sum(col("__na").cast(dec) * col("__mr2")).as("__ra2"),
        sum(t.cast(dec) * t * t - t).as("__tt"))
      .select(
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        ((col("__ra2") - col("n_a") * (col("n_a") + 1)).cast("double") / 2)
          .as("u_a"),
        col("__tt"),
        (col("n_a") + col("n_b")).cast("long").as("__n"))
      .select(col("n_a"), col("n_b"), col("u_a"),
        round6Portable(lit(1.0) - col("u_a").cast("double") * 2 /
          (col("n_a").cast("double") * col("n_b"))).as("rank_biserial"),
        round6Portable(
          (col("u_a").cast("double") -
            col("n_a").cast("double") * col("n_b") / 2) /
            sqrt(col("n_a").cast("double") * col("n_b") / 12 *
              ((col("__n") + lit(1)).cast("double") -
                col("__tt").cast("double") /
                  (col("__n").cast("double") * (col("__n") - 1))))).as("z"))
  }
  private def round6Portable(c: Column) = TextAnalysis.round6Portable(c)

  /** CUPED variance reduction (Deng et al. WSDM 2013) — the adjustment
    * every large experimentation platform applies before reading an A/B
    * metric: regress the experiment-period metric Y on the PRE-period
    * metric X of the same unit, and report Y_adj = Y − θ(X − X̄) with
    * θ = cov(X,Y)/var(X) estimated pooled (pre-period data is
    * assignment-independent, so θ is unbiased under both arms). Emits
    * per-variant n, raw and adjusted means, plus the pooled θ and the
    * variance-reduction factor ρ² = cov²/（var_x·var_y) — the fraction
    * of metric variance the covariate removed.
    *
    * Shape at scale: one conditional-sum aggregation per unit (the only
    * corpus shuffle), then sufficient statistics — Σx, Σy, Σxy, Σx²,
    * Σy² in decimal(38,0) over v6-quantized longs (x·y reaches ~1e21 at
    * real per-user totals, past long) — collapse to ONE row; per-variant
    * means re-aggregate the same unit table. θ uses the textbook
    * n·Σxy − Σx·Σy form so every input to the final double division is
    * an exact integer. */
  def cuped(df: DataFrame, unitCol: Column, variantCol: Column,
            metric: Column, isPre: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val units = graft.ops.Materialize.stable(
      df.groupBy(unitCol.as("__u"), variantCol.as("variant"))
        .agg(coalesce(sum(when(isPre, metric.cast("long"))), lit(0L)).as("__x"),
          coalesce(sum(when(!isPre, metric.cast("long"))), lit(0L)).as("__y")),
      "cuped-units")
    val x = col("__x").cast(dec)
    val y = col("__y").cast(dec)
    val stats = units.agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
    val sxy = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val sxx = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val syy = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val glob = broadcast(stats.select(
      (col("__sx").cast("double") / col("__n").cast("double")).as("__mx"),
      (sxy / sxx).as("__theta"),
      round6Portable(sxy / sxx).as("theta"),
      round6Portable(sxy * sxy / (sxx * syy)).as("rho2")))
    units.crossJoin(glob)
      .groupBy("variant")
      .agg(count(lit(1)).as("n_units"),
        round6Portable(sum(y).cast("double") / count(lit(1)) / 1e6)
          .as("mean_y"),
        round6Portable(
          (sum(y).cast("double") / count(lit(1)) -
            first(col("__theta")) *
              (sum(x).cast("double") / count(lit(1)) - first(col("__mx"))))
            / 1e6).as("mean_y_adj"),
        first(col("theta")).as("theta"), first(col("rho2")).as("rho2"))
      .orderBy("variant")
  }

  /** Wasserstein-1 (earth-mover) distance between two labeled samples
    * of an INTEGER metric: W₁ = Σ |F_a(v) − F_b(v)|·Δv over the pooled
    * distinct values — the TOTAL distribution shift in metric units,
    * where q236's KS reads only the worst single point. The number a
    * drift dashboard can threshold in dollars/chars/tokens directly.
    *
    * Counts-of-counts: one conditional aggregation to per-value counts,
    * one running-total window + lead over DISTINCT values, per-step
    * contributions quantized to integer micro-units and LONG-summed
    * (order-independent, engine-identical). */
  def wasserstein1(df: DataFrame, value: Column, groupCol: Column,
                   groupA: String, groupB: String): DataFrame = {
    val src = df.filter(groupCol.isin(groupA, groupB))
      .select(value.cast("long").as("__v"),
        (groupCol === groupA).as("__isa"))
    val counts = src.groupBy("__v")
      .agg(sum(when(col("__isa"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__isa"), 0L).otherwise(1L)).as("__nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy("__v")
    val run = w.rowsBetween(Long.MinValue, 0)
    val tot = counts.agg(sum("__na").as("n_a"), sum("__nb").as("n_b"))
    counts
      .withColumn("__ca", sum("__na").over(run))
      .withColumn("__cb", sum("__nb").over(run))
      .withColumn("__gap",
        coalesce(lead("__v", 1).over(w) - col("__v"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__t6", floor(abs(col("__ca").cast("double") / col("n_a") -
        col("__cb").cast("double") / col("n_b")) * col("__gap") * 1e6 + 0.5)
        .cast("long"))
      .groupBy("n_a", "n_b")
      .agg(TextAnalysis.round6Portable(sum("__t6").cast("double") / 1e6)
        .as("w1"))
      .select("n_a", "n_b", "w1")
  }

  /** Population Stability Index — THE model-monitoring drift score
    * (PSI = Σ (p_a − p_b)·ln(p_a/p_b) over fixed bins; folklore gates:
    * < 0.1 stable, > 0.25 investigate) — beside W₁'s metric-unit answer
    * and KS's worst-point answer, PSI is what risk teams actually log.
    * `bins` equi-width cells over the pooled range; Laplace-smoothed
    * cell shares so empty cells stay finite and the score is defined
    * for every split. ALL `bins` cells fold — including cells empty in
    * both groups, whose smoothed shares 1/(n+B) still differ between
    * unequal-sized groups (ADVICE r14) — so the smoothed distributions
    * each sum to exactly 1 and n_cells always reads `bins`. Per-cell
    * terms quantize to picounits and LONG-sum. */
  /** Equi-width bin id for a long value against broadcast extrema.
    * `div` (not `/`) keeps exact integer division — a double round-trip
    * mis-bins values near bin edges at large magnitudes. Overflow
    * discipline (ADVICE r14): when the value span approaches
    * Long.MaxValue/bins the (v − lo)·bins product runs in
    * DECIMAL(38,0) so it cannot wrap into negative ids — but ONLY
    * then: the unconditional decimal form tripled q288's bench line
    * (Decimal allocation per row vs codegen'd long arithmetic), so the
    * common case keeps the long path and a double-space span guard
    * (conservative 2⁷-wide margin, far above double's ulp at that
    * magnitude) routes borderline ranges to decimal. Both paths agree
    * wherever both are valid. */
  private def binId(v: String, lo: String, hi: String, bins: Int) = {
    val safe = java.lang.Long.MAX_VALUE / bins / 128
    expr(s"CASE WHEN CAST($hi AS DOUBLE) - CAST($lo AS DOUBLE) < ${safe}D " +
      s"THEN (($v - $lo) * $bins) div ($hi - $lo + 1) " +
      s"ELSE ((CAST($v AS DECIMAL(38,0)) - $lo) * $bins) div " +
      s"(CAST($hi AS DECIMAL(38,0)) - $lo + 1) END")
  }

  def psi(df: DataFrame, value: Column, groupCol: Column,
          groupA: String, groupB: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1024, s"bins in [2,1024]: $bins")
    val src = df.filter(groupCol.isin(groupA, groupB))
      .select(value.cast("long").as("__v"),
        (groupCol === groupA).as("__isa"))
    val ext = broadcast(src.agg(min("__v").as("__lo"), max("__v").as("__hi")))
    val observed = src.crossJoin(ext)
      .select(binId("__v", "__lo", "__hi", bins).as("b"), col("__isa"))
      .groupBy("b")
      .agg(sum(when(col("__isa"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__isa"), 0L).otherwise(1L)).as("__cb"))
    // EVERY cell id participates in the smoothed fold (ADVICE r14): bins
    // empty in BOTH groups still carry (1/(n_a+B) − 1/(n_b+B))·ln terms
    // when n_a ≠ n_b, and the smoothed shares must sum to 1 — generate
    // the full id range and left-join the observed counts onto it
    val cells = df.sparkSession.range(bins).select(col("id").as("b"))
      .join(observed, Seq("b"), "left")
      .na.fill(0L, Seq("__ca", "__cb"))
    val tot = cells.agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"))
    val pa = (col("__ca") + lit(1)).cast("double") / (col("n_a") + bins)
    val pb = (col("__cb") + lit(1)).cast("double") / (col("n_b") + bins)
    cells.crossJoin(broadcast(tot))
      .withColumn("__t12",
        floor((pa - pb) * log(pa / pb) * 1e12 + 0.5).cast("long"))
      .groupBy("n_a", "n_b")
      .agg(count(lit(1)).as("n_cells"),
        TextAnalysis.round6Portable(sum("__t12").cast("double") / 1e12)
          .as("psi"))
      .select("n_a", "n_b", "n_cells", "psi")
  }

  /** Categorical-association card for two discrete columns: χ²,
    * Cramér's V = √(χ²/(n·(min(r,c)−1))) — the 0..1 strength number a
    * profiler can threshold — and BOTH Theil's uncertainty coefficients
    * U(a|b) = I(a;b)/H(a), U(b|a) = I/H(b), the asymmetric "how much of
    * a does b explain" that V (symmetric) hides. Complements q266's
    * MI/NMI with the classical normalizations.
    *
    * One contingency aggregation (cells = |a|·|b| — counts-of-counts);
    * χ² terms and entropy terms quantize to picounits off exact count
    * ratios and LONG-sum; H(a), H(b), H(a,b) share one quantization so
    * I = H(a)+H(b)−H(ab) is integer arithmetic until the final
    * divisions. */
  def categoricalAssociation(df: DataFrame, aCol: Column,
                             bCol: Column): DataFrame = {
    val cells = graft.ops.Materialize.stable(
      df.groupBy(aCol.as("__a"), bCol.as("__b"))
        .agg(count(lit(1)).as("__c")),
      "assoc-cells")
    val ra = cells.groupBy("__a").agg(sum("__c").as("__ra"))
    val cb = cells.groupBy("__b").agg(sum("__c").as("__cb"))
    val tot = broadcast(cells.agg(sum("__c").as("n"),
      countDistinct("__a").as("__da"), countDistinct("__b").as("__db")))
    def h12(cnt: Column, n: Column): Column =
      floor(-(cnt.cast("double") / n * log(cnt.cast("double") / n)) *
        1e12 + 0.5).cast("long")
    val ha = ra.crossJoin(tot).agg(sum(h12(col("__ra"), col("n"))).as("h"))
      .select(col("h").as("__ha12"))
    val hb = cb.crossJoin(tot).agg(sum(h12(col("__cb"), col("n"))).as("h"))
      .select(col("h").as("__hb12"))
    val hab = cells.crossJoin(tot).agg(sum(h12(col("__c"), col("n"))).as("h"))
      .select(col("h").as("__hab12"))
    // chi-square over a SPARSE contingency table: zero cells are never
    // materialized, but each contributes (0−e)²/e = e, and Σ_all e = n —
    // so fold per-observed-cell (o−e)²/e − e and add n back at the end
    // (one deterministic double add, no order-dependent e summation)
    val e = col("__ra").cast("double") * col("__cb") / col("n")
    val chi = cells.join(ra, "__a").join(cb, "__b").crossJoin(tot)
      .withColumn("__x12", floor(
        ((col("__c") - e) * (col("__c") - e) / e - e) * 1e12 + 0.5)
        .cast("long"))
      .agg(max("n").as("n"), max("__da").as("__da"), max("__db").as("__db"),
        sum("__x12").as("__chi12"))
    val chi2d = col("__chi12").cast("double") / 1e12 + col("n")
    val mi12 = col("__ha12") + col("__hb12") - col("__hab12")
    chi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .crossJoin(broadcast(hab))
      .select(col("n"),
        TextAnalysis.round6Portable(chi2d).as("chi2"),
        TextAnalysis.round6Portable(sqrt(chi2d /
            (col("n") * (least(col("__da"), col("__db")) - 1))))
          .as("cramers_v"),
        TextAnalysis.round6Portable(
          mi12.cast("double") / col("__ha12")).as("theil_u_a"),
        TextAnalysis.round6Portable(
          mi12.cast("double") / col("__hb12")).as("theil_u_b"))
  }

  /** Murphy decomposition of the Brier score over an integer-percent
    * forecast: reliability (calibration error the forecaster can fix),
    * resolution (discrimination the forecaster earned), uncertainty
    * (the base rate's floor), with BS = REL − RES + UNC. The
    * eval-integrity companion to q199's calibration bins: one number
    * per failure mode instead of a curve to eyeball.
    *
    * Forecasts arrive as integer percent (0..100), so cells are the
    * ≤ 101 distinct forecast values — counts-of-counts — and the raw
    * Brier score is EXACT integer arithmetic over denominator 10⁴·n;
    * only REL/RES quantize (picounits per cell). */
  def brierDecomposition(df: DataFrame, pctCol: Column,
                         label: Column): DataFrame = {
    val cells = df.select(pctCol.cast("long").as("__p"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy("__p").agg(count(lit(1)).as("__nk"), sum("__y").as("__sk"))
    val tot = broadcast(cells.agg(sum("__nk").as("n"), sum("__sk").as("__s")))
    val dec = "decimal(38,0)"
    val yk = col("__sk").cast("double") / col("__nk")
    val ybar = col("__s").cast("double") / col("n")
    cells.crossJoin(tot)
      .withColumn("__bs", (col("__nk").cast(dec) * col("__p") * col("__p") -
        col("__sk").cast(dec) * col("__p") * 200 +
        col("__sk").cast(dec) * 10000))
      .withColumn("__rel12", floor(col("__nk") *
        (col("__p").cast("double") / 100 - yk) *
        (col("__p").cast("double") / 100 - yk) * 1e12 + 0.5).cast("long"))
      .withColumn("__res12", floor(col("__nk") * (yk - ybar) * (yk - ybar) *
        1e12 + 0.5).cast("long"))
      .groupBy("n", "__s")
      .agg(count(lit(1)).as("n_cells"), sum("__bs").as("__bsum"),
        sum("__rel12").as("__rel"), sum("__res12").as("__res"))
      .select(col("n"), col("n_cells"),
        TextAnalysis.round6Portable(col("__bsum").cast("double") /
          (lit(10000.0) * col("n"))).as("brier"),
        TextAnalysis.round6Portable(col("__rel").cast("double") / 1e12 /
          col("n")).as("reliability"),
        TextAnalysis.round6Portable(col("__res").cast("double") / 1e12 /
          col("n")).as("resolution"),
        TextAnalysis.round6Portable(
          (col("__s").cast("double") / col("n")) *
            (lit(1.0) - col("__s").cast("double") / col("n")))
          .as("uncertainty"))
  }

  /** Pairwise [[wasserstein1]] for every pair of the given groups — the
    * drift MATRIX a mixture designer reads next to q281's JSD matrix,
    * in metric units. Pair fan-out happens on the per-group VALUE COUNT
    * table (the q281 discipline): one corpus aggregation, then
    * |pairs|·|distinct values| window work, never a rescan per pair.
    * COST IS |groups|² PAIRS — `maxGroups` is the loud guard; preselect
    * top-m sources by volume or raise it deliberately.
    *
    * Degenerate contract (deliberately NOT the cosine/vocab 0-fill):
    * a pair whose side has no rows emits nothing — W₁ against an empty
    * sample is undefined, and a 0-fill would read as "identical
    * distributions", the one wrong answer. Check group presence
    * upstream if every cell must exist. */
  def wasserstein1Matrix(df: DataFrame, value: Column, groupCol: Column,
                         groups: Seq[String], maxGroups: Int = 64): DataFrame = {
    require(groups.size >= 2 && groups.distinct.size == groups.size,
      s"need >= 2 distinct groups: $groups")
    require(groups.size <= maxGroups,
      s"wasserstein1Matrix fans out |groups|^2 = ${groups.size * groups.size} " +
        s"CDF walks (> maxGroups=$maxGroups pairs base); preselect top-m " +
        "sources by volume or raise maxGroups deliberately")
    val cnt = graft.ops.Materialize.stable(
      df.filter(groupCol.isin(groups: _*))
        .select(groupCol.as("src"), value.cast("long").as("__v"))
        .groupBy("src", "__v").agg(count(lit(1)).as("c")),
      "w1m-counts")
    val sorted = groups.sorted
    val prs = sorted.zipWithIndex.flatMap { case (a, i) =>
      sorted.drop(i + 1).map(b => (a, b)) }
    import df.sparkSession.implicits._
    val pairDf = broadcast(prs.toDF("sa", "sb"))
    val perVal = cnt.join(pairDf,
        col("src") === col("sa") || col("src") === col("sb"))
      .groupBy("sa", "sb", "__v")
      .agg(sum(when(col("src") === col("sa"), col("c")).otherwise(0L))
        .as("__na"),
        sum(when(col("src") === col("sb"), col("c")).otherwise(0L))
          .as("__nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sa", "sb").orderBy("__v")
    val run = w.rowsBetween(Long.MinValue, 0)
    val tots = perVal.groupBy("sa", "sb")
      .agg(sum("__na").as("n_a"), sum("__nb").as("n_b"))
    perVal
      .withColumn("__ca", sum("__na").over(run))
      .withColumn("__cb", sum("__nb").over(run))
      .withColumn("__gap",
        coalesce(lead("__v", 1).over(w) - col("__v"), lit(0L)))
      .join(broadcast(tots), Seq("sa", "sb"))
      .withColumn("__t6", floor(abs(col("__ca").cast("double") / col("n_a") -
        col("__cb").cast("double") / col("n_b")) * col("__gap") * 1e6 + 0.5)
        .cast("long"))
      .groupBy("sa", "sb")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        TextAnalysis.round6Portable(sum("__t6").cast("double") / 1e6)
          .as("w1"))
      .orderBy("sa", "sb")
  }

  /** McNemar's test (McNemar 1947) on PAIRED classifier decisions — the
    * eval-integrity check for "is rule B actually better than rule A on
    * the SAME documents": only the discordant pairs vote (b = A right &
    * B wrong, c = A wrong & B right), χ² = (max(|b−c|−1, 0))²/(b+c) with
    * the Edwards continuity correction clamped at zero (the b = c case
    * reads as exactly no evidence, not 1/(b+c)). A two-proportion z-test
    * on the same rows would double-count the concordant mass; McNemar is
    * the correct paired form. One conditional-count aggregation — four
    * integers off one scan, a single final division. */
  def mcNemar(df: DataFrame, label: Column, predA: Column,
              predB: Column): DataFrame = {
    val aRight = predA === label
    val bRight = predB === label
    df.agg(count(lit(1)).as("n"),
        sum(when(aRight && !bRight, 1L).otherwise(0L)).as("b"),
        sum(when(!aRight && bRight, 1L).otherwise(0L)).as("c"))
      .select(col("n"), col("b"), col("c"),
        when(col("b") + col("c") > 0, TextAnalysis.round6Portable(
          (greatest(abs(col("b") - col("c")) - 1, lit(0L)) *
            greatest(abs(col("b") - col("c")) - 1, lit(0L))).cast("double") /
            (col("b") + col("c")))).as("chi2"))
  }

  /** Spearman rank correlation between two INTEGER metrics — the
    * monotone-association complement to a Pearson audit: outlier-robust,
    * scale-free, exactly what "does length track token count across the
    * corpus" should be measured with. Midranks for ties, then the
    * Pearson formula over ranks.
    *
    * Counts-of-counts ranks (one distinct-values window per variable,
    * joined back by value — never a row-level sort), kept DOUBLED so
    * every rank is an exact integer; the five sufficient statistics
    * accumulate in decimal(38,0) (doubled ranks reach 2n, their products
    * 4n², sums 4n³ — past long at corpus scale; decimal(38,0) itself
    * holds 4n³ up to n ≈ 2.9e12 rows — beyond that Spark nulls the
    * overflowing sum loudly rather than wrapping). The constant factor 2
    * cancels in the correlation, so no de-doubling ever happens; floats
    * appear only in the final ratio. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val src = df.select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
    def ranks(vc: String): DataFrame = {
      val counts = src.groupBy(col(vc).as("__v"))
        .agg(count(lit(1)).as("__nk"))
      val run = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy("__v")
        .rowsBetween(Long.MinValue, 0)
      counts.withColumn("__cum", sum("__nk").over(run))
        .select(col("__v").as(vc),
          ((col("__cum") - col("__nk")) * 2 + col("__nk") + 1).as(vc + "r"))
    }
    val rx = col("__xr").cast(dec)
    val ry = col("__yr").cast(dec)
    src.join(ranks("__x"), "__x").join(ranks("__y"), "__y")
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(rx).as("__sx"), sum(ry).as("__sy"), sum(rx * ry).as("__sxy"),
        sum(rx * rx).as("__sxx"), sum(ry * ry).as("__syy"))
      .select(col("__n").cast("long").as("n"),
        TextAnalysis.round6Portable(
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx"))
              .cast("double") *
              (col("__n") * col("__syy") - col("__sy") * col("__sy"))
                .cast("double"))).as("rho"))
  }

  /** Jenks natural breaks (Fisher 1958 / Jenks 1967): the OPTIMAL
    * 1-D classing — k contiguous classes minimizing total within-class
    * squared error — where q240's quantile bins optimize nothing and
    * equal-width bins ignore the data entirely. The layout primitive
    * behind choosing file-split boundaries, histogram legends, and
    * skew-aware range partitions.
    *
    * Scale shape: the corpus contributes ONE pass of bin statistics
    * (n, Σv, Σv² per equi-width pre-bin — the sketch); the O(k·B²) DP
    * runs on the DRIVER over ≤ `bins` rows (the bounded-geometry rule:
    * same class as IVF centroids). Exactness contract: the DP cost is
    * the within-segment SSE = Σv² − (Σv)²/n computed in DOUBLE from
    * exact decimal sums and quantized to floor(x/1e6 + 0.5) longs —
    * both engines build the identical quantized table, so argmin and
    * breaks match bit-for-bit (ties take the smallest split). Optimal
    * on the BINNED data; `bins` trades sketch fidelity for DP size. */
  def jenksBreaks(df: DataFrame, value: Column, k: Int = 5,
                  bins: Int = 64): DataFrame = {
    require(k >= 2 && k <= 16 && bins >= k && bins <= 256,
      s"need 2 <= k <= 16 <= bins <= 256, got k=$k bins=$bins")
    val dec = "decimal(38,0)"
    val src = df.select(value.cast("long").as("__v"))
    val ext = broadcast(src.agg(min("__v").as("__lo"), max("__v").as("__hi")))
    val stats = src.crossJoin(ext)
      .select(binId("__v", "__lo", "__hi", bins).as("b"), col("__v"))
      .groupBy("b").agg(count(lit(1)).as("n"),
        sum(col("__v").cast(dec)).as("s1"),
        sum(col("__v").cast(dec) * col("__v")).as("s2"))
      .orderBy("b")
      .collect() // <= bins rows: bounded driver geometry, never corpus rows
    val m = stats.length
    require(m >= k, s"only $m occupied bins for $k classes")
    val bl = stats.map(_.getAs[Long]("b"))
    val cn, c1, c2 = new Array[BigInt](m + 1)
    cn(0) = BigInt(0); c1(0) = BigInt(0); c2(0) = BigInt(0)
    for (i <- 1 to m) {
      cn(i) = cn(i - 1) + BigInt(stats(i - 1).getAs[Long]("n"))
      c1(i) = c1(i - 1) +
        BigInt(stats(i - 1).getAs[java.math.BigDecimal]("s1").toBigInteger)
      c2(i) = c2(i - 1) +
        BigInt(stats(i - 1).getAs[java.math.BigDecimal]("s2").toBigInteger)
    }
    // quantized segment cost over 1-based inclusive bin positions [a, b]
    def sse6(a: Int, b: Int): Long = {
      val n = (cn(b) - cn(a - 1)).toDouble
      val s1 = (c1(b) - c1(a - 1)).toDouble
      val s2 = (c2(b) - c2(a - 1)).toDouble
      math.floor((s2 - s1 * s1 / n) / 1e6 + 0.5).toLong
    }
    val e = Array.ofDim[Long](k + 1, m + 1)
    val bp = Array.ofDim[Int](k + 1, m + 1)
    for (i <- 1 to m) e(1)(i) = sse6(1, i)
    for (c <- 2 to k; i <- c to m) {
      var bestE = Long.MaxValue; var bestJ = -1
      for (j <- (c - 1) until i) {
        val cand = e(c - 1)(j) + sse6(j + 1, i)
        if (cand < bestE) { bestE = cand; bestJ = j } // ties keep smallest j
      }
      e(c)(i) = bestE; bp(c)(i) = bestJ
    }
    val hi = new Array[Int](k + 1); val lo = new Array[Int](k + 1)
    hi(k) = m
    for (c <- k to 1 by -1) {
      lo(c) = if (c == 1) 0 else bp(c)(hi(c))
      if (c > 1) hi(c - 1) = lo(c)
    }
    val out = (1 to k).map { c =>
      val n = (cn(hi(c)) - cn(lo(c))).toDouble
      val s1 = (c1(hi(c)) - c1(lo(c))).toDouble
      (c, bl(lo(c)), bl(hi(c) - 1), (cn(hi(c)) - cn(lo(c))).toLong,
        math.floor(s1 / n * 1e6 + 0.5) / 1e6, sse6(lo(c) + 1, hi(c)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("class", "bin_lo", "bin_hi", "n_rows", "mean", "sse6")
  }

  /** Difference-in-differences (the Card–Krueger design): the treated
    * arm's pre→post movement minus the control arm's — so any shared
    * trend (seasonality, platform drift) cancels and what remains is
    * the treatment effect under the parallel-trends assumption. The
    * observational sibling of [[cuped]]'s randomized adjustment. Means
    * are over OBSERVED unit-period cells (a unit silent in one period
    * contributes no cell — stated, not imputed). One unit-cell
    * aggregation (the only corpus shuffle), then four conditional sums
    * into a single row; v6-quantized metric, exact decimal cores, four
    * mirrored double divisions at the end. */
  def diffInDiff(df: DataFrame, unitCol: Column, treatedCol: Column,
                 postCol: Column, metric: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val units = df.groupBy(unitCol.as("__u"), treatedCol.as("__t"),
        postCol.as("__p"))
      .agg(sum(metric.cast("long")).as("__y"))
    def cell(t: Boolean, p: Boolean, out: String) = Seq(
      sum(when(col("__t") === t && col("__p") === p, 1L).otherwise(0L))
        .as("n_" + out),
      sum(when(col("__t") === t && col("__p") === p, col("__y").cast(dec)))
        .as("__s" + out))
    def mean(out: String): Column = TextAnalysis.round6Portable(
      col("__s" + out).cast("double") / col("n_" + out) / 1e6)
      .as("mean_" + out)
    val aggs = cell(true, false, "tpre") ++ cell(true, true, "tpost") ++
      cell(false, false, "cpre") ++ cell(false, true, "cpost")
    units.agg(aggs.head, aggs.tail: _*)
      .select(col("n_tpre") +: col("n_tpost") +: col("n_cpre") +:
        col("n_cpost") +: mean("tpre") +: mean("tpost") +: mean("cpre") +:
        mean("cpost") +:
        TextAnalysis.round6Portable(
          ((col("__stpost").cast("double") / col("n_tpost") -
            col("__stpre").cast("double") / col("n_tpre")) -
            (col("__scpost").cast("double") / col("n_cpost") -
              col("__scpre").cast("double") / col("n_cpre"))) / 1e6)
          .as("did") +: Nil: _*)
  }

  /** Kendall tau-b on EQUI-WIDTH-BINNED values — the pair-concordance
    * association measure, made corpus-scale by the binning sketch: raw
    * Kendall is Θ(n log n) at best and pair-enumeration in SQL, but on
    * B bins the concordant/discordant counts come from a B²-cell joint
    * histogram self-join — bounded by the SKETCH GEOMETRY (≤ B⁴ cell
    * pairs), independent of row count, with within-bin pairs correctly
    * landing in the tie terms of the tau-b denominator
    * (C−D)/√((n₀−n₁)(n₀−n₂)). Exact ON THE BINNED VALUES (the
    * estimator's bias is the binning, stated, not a sampling artifact);
    * finer B trades cell-join size for fidelity.
    *
    * Everything before the final ratio is exact integers: bin ids by
    * integer arithmetic over the broadcast min/max, pair counts as
    * decimal(38,0) products of cell counts (n(n−1)/2 alone overflows
    * long past n ~ 6e9 rows). */
  def kendallTauBinned(df: DataFrame, xCol: Column, yCol: Column,
                       bins: Int = 32): DataFrame = {
    require(bins >= 2 && bins <= 1024, s"bins must be in [2,1024]: $bins")
    val dec = "decimal(38,0)"
    val src = df.select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
    val ext = broadcast(src.agg(
      min("__x").as("__xlo"), max("__x").as("__xhi"),
      min("__y").as("__ylo"), max("__y").as("__yhi")))
    val cells = graft.ops.Materialize.stable(
      src.crossJoin(ext)
        .select(
          binId("__x", "__xlo", "__xhi", bins).as("bx"),
          binId("__y", "__ylo", "__yhi", bins).as("by"))
        .groupBy("bx", "by").agg(count(lit(1)).as("nc")),
      "kendall-cells")
    val a = cells.select(col("bx").as("bxa"), col("by").as("bya"),
      col("nc").cast(dec).as("na"))
    val b = cells.select(col("bx").as("bxb"), col("by").as("byb"),
      col("nc").cast(dec).as("nb"))
    // every unordered cell pair once (strict bx order); same-bx pairs are
    // x-ties and belong to the denominator, never to C or D
    val cd = a.join(b, col("bxb") < col("bxa"))
      .agg(coalesce(sum(when(col("byb") < col("bya"),
        col("na") * col("nb"))), lit(0).cast(dec)).as("c_pairs"),
        coalesce(sum(when(col("byb") > col("bya"),
          col("na") * col("nb"))), lit(0).cast(dec)).as("d_pairs"))
    val n = cells.agg(sum(col("nc").cast(dec)).as("__n"))
    val tx = cells.groupBy("bx").agg(sum(col("nc").cast(dec)).as("__t"))
      .agg(sum(col("__t") * (col("__t") - 1)).as("__n1x2"))
    val ty = cells.groupBy("by").agg(sum(col("nc").cast(dec)).as("__t"))
      .agg(sum(col("__t") * (col("__t") - 1)).as("__n2x2"))
    cd.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("__n").cast("long").as("n"),
        col("c_pairs").cast("double").as("c_pairs"),
        col("d_pairs").cast("double").as("d_pairs"),
        TextAnalysis.round6Portable(
          (col("c_pairs") - col("d_pairs")).cast("double") /
            sqrt((col("__n") * (col("__n") - 1) - col("__n1x2")).cast("double") /
              2 *
              ((col("__n") * (col("__n") - 1) - col("__n2x2")).cast("double") /
                2))).as("tau_b"))
  }

  /** l-diversity audit (Machanavajjhala et al. ICDE 2006) — the privacy
    * check ONE RUNG past q263's k-anonymity ladder: a quasi-identifier
    * group where everyone shares the same sensitive value leaks that
    * value at ANY k, so each group is scored by how diverse its
    * sensitive attribute actually is. Emits per-QI-group: k (group
    * size), distinct-l, and entropy H = −Σ p·ln p over the group's
    * sensitive-value histogram (entropy-l-diversity holds iff
    * H ≥ ln l); `meets_l` flags distinct-l ≥ the required l.
    *
    * Two nested aggregations on the same keys — (QI, sensitive) counts,
    * then QI rollup — so the second group-by is shuffle-free under the
    * first's partitioning. Entropy terms round to 6 dp and sum as
    * DECIMAL (the q95 discipline), everything else exact integers. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitive: Column,
                 l: Int = 3): DataFrame = {
    require(qiCols.nonEmpty && l >= 1, s"need QI cols and l >= 1")
    val qi = qiCols.map(col)
    val cells = df.groupBy(qi :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*)
    val p = col("__c").cast("double") / col("__k")
    cells
      .withColumn("__k", sum("__c").over(run))
      .withColumn("__h", round(-(p * log(p)), 6)
        .cast(org.apache.spark.sql.types.DecimalType(20, 6)))
      .groupBy(qi: _*)
      .agg(max("__k").as("k"), count(lit(1)).as("l_distinct"),
        sum("__h").cast("double").as("entropy"))
      .withColumn("meets_l", col("l_distinct") >= l)
      .orderBy(qi: _*)
  }
}
