package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analysis over the `events` table (batch shape; the streaming
  * twins live in graft.streaming.StreamOps).
  *
  * All timestamp arithmetic uses `ts_ms` (epoch millis, integer-truncated
  * from the source's nanosecond column) so the DuckDB oracle — which reads
  * the nanos directly and truncates with epoch_ms() — lands on identical
  * integers.
  */
object Events {

  val sessionGapMs: Long = 30 * 60 * 1000L

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapMs`. Classic two-window shape: the boundary
    * flag via lag, the session id via a running sum. Shuffles once by
    * user_id; within-user data is sorted once and reused by both windows. */
  def sessionize(events: DataFrame, gapMs: Long = sessionGapMs): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    events
      .withColumn("new_sess",
        when(col("ts_ms") - lag("ts_ms", 1).over(byUser) > gapMs, 1)
          .when(lag("ts_ms", 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats: session count, events, longest session. */
  def sessionStats(events: DataFrame, gapMs: Long = sessionGapMs): DataFrame =
    sessionize(events, gapMs)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_ms") - min("ts_ms")).as("dur_ms"))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        sum("n_events").as("n_events"),
        max("dur_ms").as("longest_ms"))

  /** Ordered funnel: how many users performed steps 0..i IN ORDER
    * (each step strictly after their earliest qualifying occurrence of
    * the previous one — the standard earliest-entry funnel). Returns one
    * row per step: (step, step_name, n_users), n_users non-increasing.
    *
    * Shape at scale: per step, ONE conditional min-aggregation — a
    * groupBy(user) with map-side partials — plus an equi-join on the
    * user key carrying a single timestamp per user forward. Never a
    * per-user event sort, never a window over the raw stream; a
    * billion-event day funnels through `steps` hash-join/agg pairs whose
    * shuffled payload after the first step is user-sized, not
    * event-sized. Each step's user-sized table is MATERIALIZED (the
    * shared [[graft.ops.Materialize]] point — executor-local by default,
    * replicated/snapshot via `spark.graft.materialize.mode`): step i's
    * plan would
    * otherwise chain on step i−1's unmaterialized plan AND each per-step
    * count would re-derive every earlier step, so the event scan behind
    * step 0 ran O(steps²/2) times (measured round 8: 10 filtered scans
    * for a 4-step funnel). Now the stream is scanned exactly once per
    * step, and the final counts read only materialized user-sized rows. */
  /** `windowMs`, when set, bounds each CONVERSION: step i+1 must land in
    * (t_i, t_i + windowMs] of the user's step-i time — the
    * conversion-window funnel every product-analytics question actually
    * asks ("purchased within a day of signup"), where the unwindowed
    * recurrence admits arbitrarily stale conversions. Semantics stay
    * greedy earliest-entry: each step takes the user's EARLIEST
    * qualifying event, even when a later step-i choice would have opened
    * a window catching a step-i+1 event the earliest one misses — the
    * deterministic convention of the public windowed-funnel operators,
    * and the only one expressible without per-user backtracking. Plan
    * shape is unchanged: the window is one more predicate on the
    * step join. */
  /** Rate-anomaly detection: per (event_type, time bucket) counts scored
    * against the trailing `trailing` buckets' mean/std — z =
    * (cnt − mean)/σ, flagged when |z| ≥ `zThresh`. The ops-monitoring
    * staple (error-rate spikes, traffic cliffs) over the same integer
    * bucket arithmetic as the rest of the event family.
    *
    * Shape at scale: ONE event-sized groupBy with map-side partials
    * collapses the stream to a calendar-sized (type, bucket) count
    * table; the trailing window runs over THAT table (≤ buckets rows per
    * type partition — never the raw stream). All window inputs are
    * exact integers (sum, sum of squares), so mean/variance/z are
    * deterministic IEEE doubles and the 6-dp rounded score is
    * engine-portable. Trailing frame is ROWS over OBSERVED buckets: an
    * empty bucket (zero events that hour) is ABSENT, not zero — densify
    * upstream if silence itself is the anomaly being hunted. Buckets
    * without a full trailing history emit nothing (no partial-window
    * scores). σ = 0 (constant history) scores z = 0 rather than ±∞. */
  def rateAnomalies(events: DataFrame, bucketMs: Long = 3600000L,
                    trailing: Int = 24, zThresh: Double = 3.0,
                    typeCol: String = "event_type",
                    tsCol: String = "ts_ms"): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(trailing >= 2, s"trailing window needs >= 2 buckets, got $trailing")
    require(zThresh > 0, s"zThresh must be positive, got $zThresh")
    val counts = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsCol div $bucketMs").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(-trailing, -1)
    counts
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum("cnt").over(w))
      .withColumn("__s2", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("__n") === trailing)
      .withColumn("__mean", col("__s").cast("double") / trailing)
      .withColumn("__var",
        col("__s2").cast("double") / trailing - col("__mean") * col("__mean"))
      .withColumn("z", round(when(col("__var") <= 0, lit(0.0))
        .otherwise((col("cnt") - col("__mean")) / sqrt(col("__var"))), 6))
      .withColumn("is_spike", abs(col("z")) >= zThresh)
      .select("event_type", "bucket", "cnt", "z", "is_spike")
  }

  /** Per-type rate BASELINE over all observed buckets: (event_type,
    * base_mean, base_std) — the static table the streaming anomaly
    * screen ([[graft.streaming.StreamOps.anomalyScreenStream]]) scores
    * arriving buckets against, re-derived periodically by a batch job
    * (the temperatureRates/seen-keys pattern: global history is a batch
    * fact a stream cannot know). Same exact-integer sums as
    * [[rateAnomalies]], so the doubles are engine-portable; same
    * observed-bucket semantics (absent hour ≠ zero). Output is
    * type-cardinality-sized. */
  def rateBaseline(events: DataFrame, bucketMs: Long = 3600000L,
                   typeCol: String = "event_type",
                   tsCol: String = "ts_ms"): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"$tsCol div $bucketMs").as("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("__n"), sum("__cnt").as("__s"),
        sum(col("__cnt") * col("__cnt")).as("__s2"))
      .withColumn("base_mean", col("__s").cast("double") / col("__n"))
      .withColumn("base_std", sqrt(greatest(
        col("__s2").cast("double") / col("__n")
          - col("base_mean") * col("base_mean"), lit(0.0))))
      .select("event_type", "base_mean", "base_std")
  }

  /** Zero-filled per-type rate series: (event_type, bucket, cnt) over the
    * GLOBAL observed bucket span, absent buckets explicit at cnt = 0 — the
    * dense grid a dashboard, a forecast model, or a gap alarm needs where
    * [[rateBaseline]]/[[rateAnomalies]] deliberately score only OBSERVED
    * buckets (there, absent hour ≠ zero; here the silence is the signal).
    * All types share one grid, so cross-type comparisons align.
    *
    * Shape at scale: the event stream collapses to a bucket-counts table
    * first (one groupBy with map-side partials — everything after is
    * type × span sized, never event-sized). The grid comes from
    * `sequence()` exploded per type against a 1-row broadcast bounds
    * table — no driver-side min/max action — and the zero-fill is a
    * left join back onto the counts. An in-plan guard on the bounds row
    * fails loudly when span × bucketMs would explode the grid (a
    * sub-second bucket over years), naming the knob.
    *
    * `sharedGrid = false` spans each type's OWN [first, last] bucket
    * instead of the global bounds — the semantics of the streaming twin
    * ([[graft.streaming.StreamOps.rateGridStream]]), where a per-key
    * state function cannot know the global minimum. */
  def rateSeriesFilled(events: DataFrame, bucketMs: Long = 3600000L,
                       typeCol: String = "event_type",
                       tsCol: String = "ts_ms",
                       maxGridBuckets: Long = 10000000L,
                       sharedGrid: Boolean = true): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(maxGridBuckets > 0, s"maxGridBuckets must be positive")
    val counts = graft.ops.Materialize.stable(
      events
        .groupBy(col(typeCol).as("event_type"),
          expr(s"$tsCol div $bucketMs").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      "rate-grid-counts")
    def guarded(hi: Column, lo: Column): Column =
      when(hi - lo >= maxGridBuckets,
        raise_error(lit(
          s"rateSeriesFilled: grid span exceeds $maxGridBuckets buckets " +
            s"at bucketMs=$bucketMs — widen bucketMs or raise " +
            "maxGridBuckets deliberately")))
        .otherwise(hi)
    val grid =
      if (sharedGrid) {
        val bounds = counts
          .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
          .withColumn("__hi", guarded(col("__hi"), col("__lo")))
        counts.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
      } else
        counts.groupBy("event_type")
          .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
          .withColumn("__hi", guarded(col("__hi"), col("__lo")))
          .select(col("event_type"),
            explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    grid.join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Cohort retention matrix: users grouped by the PERIOD of their first
    * `anchorType` event (integer period index = ts div periodMs —
    * calendar-free, engine-portable), against the periods they were
    * active in afterwards. Returns (cohort_period, offset, n_users):
    * of the users whose first anchor landed in cohort_period, n_users
    * had at least one event exactly `offset` periods later — the classic
    * triangular retention table (offset 0 = the cohort's size, since the
    * anchor event itself is activity).
    *
    * Shape at scale: the cohort table is ONE conditional min-groupBy on
    * the user key (map-side partials, user-sized output); activity
    * collapses the event stream to DISTINCT (user, period) — partial
    * aggregation bounds each map task's output by users × periods, and
    * hot users (bots) collapse to one row per period. The join is an
    * UNHINTED user-key equi-join (a web-scale user table is billions of
    * rows — never broadcast; AQE downgrades on small corpora), and the
    * final groupBy's key domain is cohorts × offsets — calendar-sized,
    * not data-sized. No windows, no per-user event sort anywhere. After
    * the distinct, each user holds ONE row per period and ONE cohort, so
    * plain count(*) IS the distinct-user count — no countDistinct
    * shuffle. */
  def retentionCohorts(events: DataFrame, anchorType: String,
                       periodMs: Long = 86400000L,
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts_ms"): DataFrame = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    val cohort = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(min(expr(s"$tsCol div $periodMs")).as("cohort_period"))
    val active = events
      .select(col(userCol), expr(s"$tsCol div $periodMs").as("__period"))
      .distinct()
    active.join(cohort, userCol)
      .filter(col("__period") >= col("cohort_period"))
      .groupBy(col("cohort_period"),
        (col("__period") - col("cohort_period")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts_ms",
             windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMs.forall(_ > 0), s"windowMs must be positive: $windowMs")
    val reached = steps.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (st, _)) =>
        val hits = events.filter(col(typeCol) === st)
        Some(graft.ops.Materialize.stable(prev match {
          case None =>
            hits.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
          case Some(p) =>
            val inWindow = windowMs.map(w => col(tsCol) <= col("__prev") + w)
              .getOrElse(lit(true))
            hits.join(p.withColumnRenamed("__t", "__prev"), userCol)
              .filter(col(tsCol) > col("__prev") && inWindow)
              .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        }, "funnel-step"))
      }
      .flatten
    reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** SCD Type-2 history builder: fold a change LOG (one row per observed
    * state, many consecutive repeats) into a dimension HISTORY (one row per
    * state RUN, with a validity interval) — the warehouse primitive behind
    * every "what was this entity's state at time T" join (which
    * [[graft.ops.AsOfJoin]] then answers without scanning the raw log).
    *
    *   1. drop no-op rows: a row whose state equals the PREVIOUS row's
    *      state (per key, ordered by `(orderCol, tieCol)`) opens no new
    *      version — `lag` over the key window;
    *   2. close intervals: `effective_from` = the change row's `orderCol`,
    *      `effective_to` = the NEXT change's `orderCol` (NULL on the open,
    *      current version) — `lead` over the same window;
    *   3. `version` = 1-based change ordinal per key, `is_current` =
    *      open-interval flag.
    *
    * The state may span several columns; they are compared as a struct so
    * a NULL field participates in equality the way a reader expects
    * (struct equality is null-safe per field). `tieCol` makes equal
    * timestamps deterministic — REQUIRED, because a log that can carry two
    * states at one instant has no well-defined history without one.
    *
    * Scale: both windows share ONE partitioning (`keyCol`), so the whole
    * operator is a single hash shuffle followed by two sort-window passes
    * that Spark plans over the same sort — per-key state is a row of lag
    * memory, never a buffer. Skew bound: the largest key's LOG size, same
    * bound as sessionize. At 100 TB the change log is typically
    * time-partitioned; the shuffle is the unavoidable group-by-entity. */
  /** First-order transition matrix over each entity's event stream: for
    * every (from_type → to_type) adjacency in (ts, event_id) order, the
    * count and the row-normalized probability — the Markov-chain view of
    * user behavior (what follows an error? where do signups go next?)
    * that feeds next-event prediction features and funnel design.
    *
    * Scale: ONE hash shuffle by `keyCol` + one within-key sort (the
    * sessionize economics) produces every adjacency via lag-memory lead;
    * the aggregation output is ≤ |types|² rows, so the second exchange
    * and the per-from total window are type-cardinality-sized, never
    * row-sized. The probability is one correctly-rounded division of
    * exact integers → engine-identical bits under round6Portable. */
  def transitionMatrix(events: DataFrame, keyCol: String = "user_id",
                       typeCol: String = "event_type"): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy("ts_ms", "event_id")
    val pairs = events
      .withColumn("__to", lead(col(typeCol), 1).over(byKey))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from", sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p", TextAnalysis.round6Portable(
        col("n").cast("double") / col("n_from")))
      .select("from_type", "to_type", "n", "n_from", "p")
  }

  /** Half-life-decayed engagement per entity: each event contributes
    * 2^-floor(age/halfLife), summed — the recency-weighted activity
    * score behind churn features and freshness-weighted sampling, with
    * the decay math built for engine determinism rather than exp():
    * weights are DYADIC (1 / (1 << k), an exact shift-and-divide, never
    * pow/exp whose last ulp is libm-specific), and ages beyond
    * `horizonHalfLives` contribute exactly 0, so every weight is a
    * multiple of 2^-horizon and the per-entity sum is EXACT in a double
    * regardless of summation order — partition-layout-invariant and
    * identical across engines. floor(age/halfLifeMs) is safe in double
    * space: integer inputs keep the true quotient ≥ 1/halfLifeMs away
    * from the next integer, far beyond one ulp.
    *
    * Scale: the reference instant (max ts) broadcasts as one row; the
    * score is one groupBy with map-side partials. At 100 TB the weight
    * column costs nothing (arithmetic on the scanned row) and nothing
    * row-sized shuffles except the keyed aggregation itself. */
  def decayedEngagement(events: DataFrame, keyCol: String = "user_id",
                        halfLifeDays: Int = 7,
                        horizonHalfLives: Int = 20): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    require(horizonHalfLives >= 1 && horizonHalfLives <= 52,
      s"horizonHalfLives must be in [1, 52], got $horizonHalfLives")
    val halfLifeMs = halfLifeDays * 86400000L
    val ref = events.agg(max("ts_ms").as("__ref_ms"))
    events.filter(col("ts_ms").isNotNull)
      .crossJoin(broadcast(ref))
      .withColumn("__k",
        floor((col("__ref_ms") - col("ts_ms")) / lit(halfLifeMs.toDouble))
          .cast("int"))
      .withColumn("__w", when(col("__k") <= horizonHalfLives,
        lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), __k)"))
        .otherwise(lit(0.0)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("__w").as("score"))
  }

  /** Per-type inter-arrival quantiles: for each event type, the exact
    * p50/p95/max of the millisecond gap between a user's consecutive
    * events OF THAT TYPE — the cadence profile behind rate alarms and
    * retention heuristics ("purchases arrive weekly, errors in
    * bursts"). Exact integer quantiles via the counts-of-counts idiom
    * ([[graft.ops.JoinOps.skewReport]]): gaps fold to (type, gap) →
    * count, the percentile is the smallest gap whose running count
    * reaches ceil(p·n/100) — integer rank arithmetic on a window over
    * DISTINCT (type, gap) pairs only; gap values in ms quantize
    * naturally, so the distinct-pair table stays bounded. One lag
    * window (shuffle on (type, key)) + bounded folds. */
  def interArrivalStats(events: DataFrame, typeCol: String = "event_type",
                        keyCol: String = "user_id"): DataFrame = {
    val byKey = Window.partitionBy(col(typeCol), col(keyCol))
      .orderBy("ts_ms", "event_id")
    val gaps = events
      .withColumn("__gap", col("ts_ms") - lag("ts_ms", 1).over(byKey))
      .filter(col("__gap").isNotNull)
      .groupBy(col(typeCol), col("__gap")).agg(count(lit(1)).as("nk"))
    val run = Window.partitionBy(col(typeCol)).orderBy("__gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = gaps.withColumn("cum", sum("nk").over(run))
    val tot = cum.groupBy(col(typeCol))
      .agg(sum("nk").as("n_gaps"), max("__gap").as("max_gap"))
    def pct(p: Int) = cum.join(tot, Seq(typeCol))
      .filter(col("cum") >= expr(s"($p * n_gaps + 99) div 100"))
      .groupBy(col(typeCol)).agg(min("__gap").as(s"p${p}_gap"))
    tot.join(pct(50), Seq(typeCol)).join(pct(95), Seq(typeCol))
      .select(col(typeCol), col("n_gaps"), col("p50_gap"),
        col("p95_gap"), col("max_gap"))
  }

  /** Gaps-and-islands INTERVAL merge: per key, coalesce overlapping or
    * touching [start, end] intervals (closed ends; `start <= running
    * max end so far` joins the island) into disjoint islands with their
    * extent and member count — the validity-window/downtime/coverage
    * primitive. Differs from sessionize (point events + gap) in that
    * intervals carry width and can nest or overlap arbitrarily.
    *
    * Shape at scale: one shuffle+sort per key; the island boundary is a
    * running MAX(end) over preceding rows (O(1)-per-row accumulator),
    * the island id a running SUM, and the fold a plain groupBy with
    * map-side partials. All exact integer domains. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      byKey.rowsBetween(Window.unboundedPreceding, -1))
    val tagged = df
      .withColumn("__new", when(prevMax >= col(startCol), 0L).otherwise(1L))
      .withColumn("island_id", sum("__new").over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    tagged.groupBy(col(keyCol), col("island_id"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Dyadic-exact EWMA over the trailing `horizon` observations: weight
    * 2^-k at row distance k, normalized by the weights actually present
    * (short histories renormalize instead of decaying toward zero).
    * Engine-portable by construction: values quantize to 6 dp integers
    * (v6), each term is v6 · 2^(horizon−k) — an exact integer — and
    * both the weighted sum and the weight mass stay integral until ONE
    * final rounded division. No pow/exp, no order-dependent double
    * accumulation, no drift.
    *
    * Shape at scale: `horizon+1` lag() exprs share ONE window spec —
    * one shuffle+sort per key, one Window node (codegen'd), output a
    * column per row. Each term v6·2^(horizon−k) accumulates in
    * DECIMAL(38,0) (cusumShift's discipline), so the weighted sum is
    * exact for |v6|·2^(horizon+1) ≤ 10³⁸ — i.e. any |value| up to
    * ~10¹⁸ even at horizon = 40; a Long accumulator would wrap at
    * |value| ≈ 4 there. The weight mass Σ 2^(horizon−k) < 2^(horizon+1)
    * always fits a long. */
  def ewmaDyadic(df: DataFrame, keyCol: String, valueCol: String,
                 orderCols: Seq[String], horizon: Int = 20,
                 outCol: String = "ewma"): DataFrame = {
    require(horizon >= 1 && horizon <= 40,
      s"horizon must be in [1, 40], got $horizon")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val v6 = floor(col(valueCol) * 1e6 + 0.5).cast("long")
    val base = df.withColumn("__v6", v6)
    val lags = (0 to horizon).map(k => lag(col("__v6"), k).over(w))
    val zero = lit(0).cast("decimal(38,0)")
    val s = lags.zipWithIndex.map { case (l, k) =>
      coalesce(l.cast("decimal(38,0)") * (1L << (horizon - k)), zero) }
      .reduce(_ + _).cast("decimal(38,0)")
    val m = lags.zipWithIndex.map { case (l, k) =>
      when(l.isNotNull, lit(1L << (horizon - k))).otherwise(0L) }
      .reduce(_ + _)
    base.withColumn(outCol, TextAnalysis.round6Portable(
        s.cast("double") / m / 1e6))
      .drop("__v6")
  }

  /** CUSUM level-shift detection with an EXACT integer core: per key,
    * the centered prefix sum D_t = n·Σ_{i≤t} v6_i − t·Σ v6 (v6 = value
    * at 6 dp; both terms integral, so D_t is the textbook CUSUM
    * scaled by n·10⁶ — no float ever enters the recursion). Reports the
    * first instant |D_t| exceeds `threshold` (in value·rows units) and
    * the peak normalized excursion — the "did the level shift, and
    * when" alarm for rates, quality scores, and queue depths.
    *
    * Shape at scale: one shuffle+sort per key for the running sum, one
    * keyed fold for the totals (broadcast back cells-sized), one final
    * fold to a row per key. DECIMAL(38) carries n·prefix exactly to
    * ~10¹⁸ rows·value6 per key. */
  def cusumShift(df: DataFrame, keyCol: String, valueCol: String,
                 orderCols: Seq[String], threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v6 = floor(col(valueCol) * 1e6 + 0.5).cast("long")
    val run = df.withColumn("__v6", v6)
      .withColumn("__pre", sum("__v6").over(w).cast("decimal(38,0)"))
      .withColumn("__t", count(lit(1)).over(w).cast("decimal(38,0)"))
    val tot = run.groupBy(col(keyCol))
      .agg(sum("__v6").cast("decimal(38,0)").as("__s"),
        count(lit(1)).cast("decimal(38,0)").as("__n"))
    val d = run.join(tot, Seq(keyCol))
      .withColumn("__d", col("__n") * col("__pre") - col("__t") * col("__s"))
      .withColumn("__alarm",
        abs(col("__d")).cast("double") >
          lit(threshold) * col("__n").cast("double") * 1e6)
    d.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        min(when(col("__alarm"),
          struct(orderCols.map(col): _*))).as("__first"),
        max(abs(col("__d"))).as("__peak"))
      .select(col(keyCol) +: col("n") +:
        orderCols.map(c => col(s"__first.$c").as(s"alarm_$c")) :+
        TextAnalysis.round6Portable(col("__peak").cast("double") /
          col("n") / 1e6).as("peak_shift"): _*)
  }

  /** Funnel step with EXCLUSION — "startType then endType with no
    * excludeType between", the negative-condition funnel ("signup →
    * purchase with no error between") plain funnels cannot express.
    * Per key: the FIRST start event, the first end event after it, and
    * the number of excluded events strictly between the two; converted
    * means the end exists and nothing excluded intervened.
    *
    * One window pass carries three running values — the excluded-event
    * count, the first start instant, and the excluded-count AT that
    * first start (the [[forwardFill]] carry trick: min of a struct
    * tagged at start rows) — so "between" is a subtraction of two
    * running counters, never a range self-join. One shuffle+sort per
    * key, then a keyed arg-min fold. */
  def funnelWithExclusion(events: DataFrame, startType: String,
                          endType: String, excludeType: String,
                          keyCol: String = "user_id",
                          typeCol: String = "event_type",
                          orderCols: Seq[String] = Seq("ts_ms", "event_id"))
      : DataFrame = {
    val run = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = struct(orderCols.map(col): _*)
    // tags precede the windows so exc_run and first_start share ONE
    // Window node; the carry (exc_run AT the first start) depends on
    // exc_run, so it is the second — same shuffle and sort, no third
    val tagged = events
      .withColumn("__is_exc", when(col(typeCol) === excludeType, 1))
      .withColumn("__start_ord", when(col(typeCol) === startType, ord))
      .withColumn("__exc_run", count(col("__is_exc")).over(run))
      .withColumn("__first_start", min(col("__start_ord")).over(run))
      .withColumn("__start_carry", when(col("__start_ord").isNotNull,
        struct(col("__start_ord").as("o"), col("__exc_run").as("e"))))
      .withColumn("__exc_at_start", min(col("__start_carry")).over(run))
    val ends = tagged.filter(col(typeCol) === endType &&
        col("__first_start").isNotNull && ord > col("__first_start"))
      .groupBy(col(keyCol))
      .agg(min(struct(ord.as("o"), col("__first_start").as("s"),
        (col("__exc_run") - col("__exc_at_start.e")).as("x"))).as("__w"))
    val starts = tagged.filter(col(typeCol) === startType)
      .groupBy(col(keyCol)).agg(min(ord).as("__start"))
    starts.join(ends, Seq(keyCol), "left")
      .select(col(keyCol) +:
        orderCols.map(c => col(s"__start.$c").as(s"start_$c")) ++:
        orderCols.map(c => col(s"__w.o.$c").as(s"end_$c")) :+
        col("__w.x").as("n_excluded_between") :+
        (col("__w").isNotNull && col("__w.x") === 0L).as("converted"): _*)
  }

  /** Trailing event-time window features — for EVERY event, the
    * activity of its key over the preceding `windowMs` (inclusive of
    * the current instant): total events, events of a marked type, and
    * the max value seen. The point-in-time feature primitive behind
    * fraud/engagement models ("purchases in the last 24 h at decision
    * time"), computed without self-joins.
    *
    * A RANGE frame on the epoch-ms column, so simultaneous events are
    * peers (both engines include the full tie group — deterministic
    * where a ROWS frame would be layout-dependent under ties). Outputs
    * stay in exact domains: counts, and MAX of the value (selection,
    * never double addition) — a trailing SUM of doubles would hash-
    * drift across engines (segment-tree vs running association order),
    * so it is deliberately absent; round-then-DECIMAL-sum if needed.
    *
    * Shape at scale: ONE shuffle+sort per key; the range frame slides
    * with two pointers (amortized O(1) per row), no self-join, no
    * second pass. 100 TB parallelizes by key. */
  def trailingWindowFeatures(events: DataFrame, keyCol: String,
                             tsMsCol: String, windowMs: Long,
                             markType: String,
                             typeCol: String = "event_type",
                             valueCol: String = "value"): DataFrame = {
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    val w = Window.partitionBy(keyCol).orderBy(col(tsMsCol))
      .rangeBetween(-windowMs, 0)
    // the mark indicator is projected BEFORE the window exprs so all
    // three collapse into ONE Window node (a CASE nested inside one of
    // several withColumn windows blocks CollapseWindow with a Project)
    events
      .withColumn("__marked", when(col(typeCol) === markType, 1))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("n_marked", count(col("__marked")).over(w))
      .withColumn("max_value", max(col(valueCol)).over(w))
      .drop("__marked")
  }

  /** Per-key forward fill (last observation carried forward): in
    * (`orderCols`) order within each key, replace every null of
    * `valueCol` with the most recent non-null value, and count the
    * observations seen so far (`obs_seen` — 0 until the first
    * observation, so a still-null fill is distinguishable from a filled
    * zero). The gap-repair primitive behind sparse sensor/price/state
    * streams where only change events carry the value.
    *
    * Shape at scale: ONE shuffle+sort on the key; both outputs ride a
    * running frame (UNBOUNDED PRECEDING .. CURRENT ROW), which Spark
    * executes as an O(1)-per-row accumulator — no per-partition
    * buffering, no second pass, no driver state. Keys are independent,
    * so 100 TB parallelizes by key; a single pathological key serializes
    * only its own rows (the sort is the cost, not the frame). */
  def forwardFill(events: DataFrame, keyCol: String, valueCol: String,
                  orderCols: Seq[String] = Seq("ts_ms", "event_id"),
                  outCol: String = "filled"): DataFrame = {
    require(orderCols.nonEmpty, "forwardFill needs at least one order column")
    val run = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(run))
      .withColumn("obs_seen", count(col(valueCol)).over(run))
  }

  def scd2History(log: DataFrame, keyCol: String, orderCol: String,
                  tieCol: String, stateCols: Seq[String]): DataFrame = {
    require(stateCols.nonEmpty, "scd2History needs at least one state column")
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val state = struct(stateCols.map(col): _*)
    val changes = log
      .withColumn("__prev_state", lag(state, 1).over(byKey))
      // first row per key: lag is NULL -> always a change (null-safe <=>)
      .filter(!(state <=> col("__prev_state")))
      .drop("__prev_state")
    val chgByKey = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    changes
      .withColumn("version", row_number().over(chgByKey))
      .withColumn("effective_from", col(orderCol))
      .withColumn("effective_to", lead(col(orderCol), 1).over(chgByKey))
      .withColumn("is_current", col("effective_to").isNull)
      .select((Seq(keyCol) ++ stateCols).map(col) ++ Seq(
        col("version"), col("effective_from"), col("effective_to"),
        col("is_current")): _*)
  }

  /** Seasonal (hour-of-day) median baseline + residuals: each event's
    * value against the EXACT median of its hour-of-day slot — the
    * detrend step that keeps a daily-rhythm metric from flagging every
    * evening peak as an anomaly. Slot medians come from
    * [[Profile.exactMedianBy]]'s per-key counts-of-counts (state is
    * distinct values per slot, never rows) and broadcast back as a
    * 24-row table; the residual is a map-only integer subtract, ready
    * for [[Profile.robustOutliers]]. Values quantize to v6 first. */
  def seasonalResiduals(events: DataFrame, tsMsCol: String,
                        value: Column): DataFrame = {
    val src = events
      .withColumn("__v6", floor(value * 1e6 + 0.5).cast("long"))
      .withColumn("hour",
        expr(s"(CAST($tsMsCol AS BIGINT) div 3600000) % 24").cast("int"))
    val med = Profile.exactMedianBy(src, col("hour"), col("__v6"))
      .select(col("key").as("hour"), col("median").as("hour_median_v6"))
    src.join(broadcast(med), "hour")
      .withColumn("resid_v6", col("__v6") - col("hour_median_v6"))
  }

  /** Time-weighted average (TWAP) per key: each observation's value
    * holds until the NEXT observation, so the average weighs values by
    * HOLDING TIME, not by tick count — the difference between "average
    * quoted price" and "average price you were actually exposed to".
    * Exact core: Σ v6·Δms in DECIMAL (order-free) over the observed
    * span [first, last), ONE division at the end; the last observation
    * bounds the window and carries no weight (standard left-closed
    * convention). A key with < 2 observations has no span — null twap,
    * reported with n_obs for the caller's minimum-support filter.
    * Shape: one per-key lead() window ordered by (ts, tie) + one
    * key fold; corpus-parallel, state bounded per key. */
  def twap(events: DataFrame, keyCol: String, tsMsCol: String,
           value: Column, tieCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    events
      .select(col(keyCol).as("key"), col(tsMsCol).cast("long").as("__t"),
        col(tieCol).as("__tie"),
        floor(value * 1e6 + 0.5).cast("long").as("__v6"))
      .withColumn("__dt", lead(col("__t"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("__t", "__tie")) - col("__t"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("__dt").isNotNull,
          col("__v6").cast(dec) * col("__dt"))).as("__wsum"),
        sum(col("__dt")).as("__span"))
      .select(col("key"), col("n_obs"),
        col("__span").as("span_ms"),
        when(col("__span") > 0, TextAnalysis.round6Portable(
          col("__wsum").cast("double") / col("__span").cast("double") / 1e6))
          .as("twap"))
  }

  /** EXACT rolling-window distinct count — "distinct users in the
    * trailing 24 hours, per hour": the DAU/abuse-velocity metric a
    * sliding HLL only approximates. Reduce to distinct (id, bucket)
    * pairs first (ONE shuffle — collapses any event volume to active
    * pairs), then each pair contributes to the `windowBuckets` anchors
    * it covers via a sequence explode, distinct again, count. Anchors
    * are restricted to buckets that actually contain events (broadcast
    * semi-join of the observed-bucket set).
    *
    * Honest cost model: the explode multiplies the ACTIVE-PAIR stream
    * by the window length — exactness over a sliding set has no free
    * lunch (the mergeable alternative is per-bucket HLL registers
    * folded over the window, q55's machinery, when ±5% is acceptable).
    * Window length is capped to keep the fan-out deliberate. */
  def rollingDistinct(events: DataFrame, tsMsCol: String, idCol: String,
                      windowBuckets: Int, bucketMs: Long): DataFrame = {
    require(windowBuckets >= 1 && windowBuckets <= 168,
      s"windowBuckets must be in [1,168]: $windowBuckets")
    require(bucketMs >= 1L, s"bucketMs must be >= 1: $bucketMs")
    val pairs = events.select(col(idCol).as("id"),
        expr(s"CAST($tsMsCol AS BIGINT) div $bucketMs").as("b"))
      .distinct()
    val observed = pairs.select(col("b").as("anchor")).distinct()
    pairs.select(col("id"),
        explode(sequence(col("b"), col("b") + (windowBuckets - 1)))
          .as("anchor"))
      .join(graft.ops.Guards.broadcastIfSmall(observed), Seq("anchor"),
        "left_semi")
      .distinct()
      .groupBy("anchor").agg(count(lit(1)).as("n_distinct_ids"))
  }

  /** Batch resample-to-grid with forward fill — the feature-serving
    * twin of the streaming ffill (StreamOps): per key, one row per
    * fixed-width time bucket from the key's FIRST observation to the
    * corpus-wide LAST bucket, carrying the latest observed value
    * forward through empty buckets. What a training pipeline joins
    * against to get "sensor state at every hour" without nulls.
    *
    * Determinism: the per-bucket representative is the LAST event in
    * the bucket, ties on ts_ms broken by largest `tieCol` — one
    * max(struct) fold, engine-portable. Values quantize to v6 BEFORE
    * the argmax so the carried value is exact.
    *
    * Shape at scale: one (key, bucket) fold with map-side partials,
    * ONE 1-row global-max broadcast, a `sequence()` explode that is
    * calendar-sized per key (grid = span/width buckets — bounded by
    * the calendar, never by event count; the q124/q189 contract), and
    * one per-key window over grid rows for the fill. The window
    * partitions by key — corpus-parallel, state bounded by the
    * per-key grid. */
  def resampleFfill(events: DataFrame, keyCol: String, tsMsCol: String,
                    valueCol: Column, tieCol: String,
                    bucketMs: Long): DataFrame = {
    require(bucketMs >= 1L, s"bucketMs must be >= 1: $bucketMs")
    val obs = events
      .select(col(keyCol).as("key"),
        expr(s"CAST($tsMsCol AS BIGINT) div $bucketMs").as("bucket"),
        col(tsMsCol).cast("long").as("__ts"),
        col(tieCol).cast("long").as("__tie"),
        floor(valueCol * 1e6 + 0.5).cast("long").as("__v6"))
      .groupBy("key", "bucket")
      .agg(max(struct(col("__ts"), col("__tie"), col("__v6"))).as("__m"))
      .select(col("key"), col("bucket"), col("__m.__v6").as("obs_v6"))
    val gmax = obs.agg(max("bucket").as("__gmax"))
    val grid = obs.groupBy("key").agg(min("bucket").as("__b0"))
      .crossJoin(broadcast(gmax))
      .select(col("key"),
        explode(sequence(col("__b0"), col("__gmax"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("filled_v6", last(col("obs_v6"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("obs_v6").isNotNull)
  }
}
