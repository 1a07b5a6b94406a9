package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators: the reference's
  * producer/consumer queue (/root/reference/main.py:473-518) generalizes to
  * a stream of arriving search/event rows; Spark's native answer is
  * readStream -> transforms -> writeStream with watermarked event time.
  */
object StreamOps {

  /** Streaming twin of q14_events_hourly: tumbling 1-hour window with a
    * 2-hour watermark for late data. Works on any DataFrame with (ts:
    * timestamp, event_type, value) — batch or streaming. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Ev(user_id: Long, ts_ms: Long)
  case class SessionState(sessionCount: Long, lastTsMs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long)

  /** Stateful gap sessionization with mapGroupsWithState: per-user session
    * counter that increments when the inter-event gap exceeds `gapMs`.
    *
    * No state timeout here: ProcessingTimeTimeout makes the engine schedule
    * continuous empty micro-batches for timeout checks (each one a full
    * state-store checkpoint), which burns CPU and can keep
    * `processAllAvailable` from ever settling. At scale, bound state growth
    * with an event-time watermark + `flatMapGroupsWithState(EventTimeTimeout)`
    * instead — timeouts then fire only as the watermark advances. */
  @deprecated("NoTimeout state never evicts — on an unbounded stream this " +
    "grows without bound. Kept only as the mapGroupsWithState test/demo " +
    "twin; use sessionWindows (EventTimeTimeout, watermark-bounded state) " +
    "for any real stream.", "0.5")
  def sessionCounts(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_ms)
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          sorted.foreach { e =>
            s = if (s.lastTsMs == Long.MinValue || e.ts_ms - s.lastTsMs > gapMs)
              SessionState(s.sessionCount + 1, e.ts_ms)
            else s.copy(lastTsMs = e.ts_ms)
          }
          state.update(s)
          UserSessions(user, s.sessionCount)
      }
  }

  case class EvT(user_id: Long, ts: java.sql.Timestamp)
  case class SessionBuf(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Event-time session windows with bounded state: sessions close either
    * when a later event arrives past the gap (emitted immediately) or when
    * the WATERMARK passes session end + gap (EventTimeTimeout fires and the
    * state is evicted). This is the production shape for unbounded streams —
    * unlike processing-time timeouts it needs no wall-clock-driven empty
    * batches, and state size is bounded by the number of users active within
    * one watermark horizon. */
  def sessionWindows(events: Dataset[EvT],
                     gapMs: Long = 30 * 60 * 1000L,
                     watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EvT], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(b => SessionOut(user, b.start, b.end, b.n)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.map(_.ts.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var buf = state.getOption
            sorted.foreach { t =>
              buf match {
                case Some(b) if t - b.end > gapMs =>
                  closed += SessionOut(user, b.start, b.end, b.n)
                  buf = Some(SessionBuf(t, t, 1))
                case Some(b) =>
                  buf = Some(b.copy(end = math.max(b.end, t), n = b.n + 1))
                case None =>
                  buf = Some(SessionBuf(t, t, 1))
              }
            }
            buf.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(b.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** File-source streaming ingestion of events: a LANDING DIRECTORY of
    * parquet files becomes an unbounded stream (new files picked up per
    * trigger, `maxFilesPerTrigger` for rate control — file sources stream
    * directories, not single files). Timestamp-layout handling is shared
    * with [[graft.ops.Ingest.withTsCols]], so the same downstream
    * transforms serve batch and streaming regardless of how the generator
    * encoded `ts`. */
  def eventsFileStream(spark: org.apache.spark.sql.SparkSession, landingDir: String,
                       maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(landingDir).schema
    graft.ops.Ingest.withTsCols(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(landingDir))
  }

  /** Streaming exact dedup on an id column:
    * `dropDuplicatesWithinWatermark` keeps the FIRST arrival of each id and
    * drops later duplicates arriving within the watermark horizon, while
    * the state store evicts ids once the watermark passes them — bounded
    * state, unlike a plain `dropDuplicates(id)` whose state grows forever.
    * The ingestion-side twin of the batch `Dedup.exact`. */
  def dedupStream(rows: DataFrame, idCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream INTERVAL join: event e pairs with EVERY purchase p of
    * the same user with p_ts in [e.ts - horizon, e.ts] — one output row per
    * in-horizon purchase (multi-touch attribution), NOT the single
    * latest-purchase row the batch as-of (q53, [[graft.ops.AsOfJoin]])
    * emits. An exact streaming as-of would need unbounded state (any past
    * purchase could be "the latest") plus a second stateful per-event
    * argmax; pipelines that need last-touch semantics aggregate
    * max_by(purchase_id, p_ts) per event downstream. Watermarks on BOTH
    * sides plus the interval condition let the engine size and EVICT join
    * state — purchase state is dropped once the watermark passes
    * p_ts + horizon, event state once matches can no longer arrive.
    * `leftOuter` keeps untouched events (emitted when their horizon
    * closes). */
  def attributionStream(events: DataFrame, purchases: DataFrame,
                        horizon: String = "1 hour",
                        watermark: String = "10 minutes"): DataFrame = {
    val ev = events.withWatermark("ts", watermark)
    val pur = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("purchase_id"))
      .withWatermark("p_ts", watermark)
    ev.join(pur,
      col("user_id") === col("p_user_id")
        && col("p_ts") <= col("ts")
        && col("p_ts") >= col("ts") - expr(s"INTERVAL $horizon"),
      "leftOuter")
      .drop("p_user_id")
  }

  /** Streaming HLL distinct-count maintenance: the SAME sparse-register
    * groupBy as the batch sketch ([[graft.ext.Sketches.sparseRegisters]]),
    * run as a streaming aggregation in Update mode. The state store holds
    * the sketch itself — at most 512 register rows per key group,
    * INDEPENDENT of the stream's cardinality — which is what makes
    * streaming distinct-count viable where exact streaming
    * `count(DISTINCT)` state would grow with every new value. No watermark
    * needed: register max is idempotent and commutative, so late or
    * replayed rows can only re-assert existing state, never corrupt it,
    * and the streamed registers equal the batch sketch of everything seen
    * (StreamOpsSpec pins stream == batch). Estimate with
    * [[graft.ext.Sketches.hllEstimate]]-equivalent math over the latest
    * register rows (see the spec), or fold the sink table through
    * [[graft.ext.Sketches.hllMergeAgg]]. */
  def hllRegisterStream(rows: DataFrame, keys: Seq[String],
                        value: org.apache.spark.sql.Column): DataFrame =
    graft.ext.Sketches.sparseRegisters(rows, keys, value)

  /** Streaming count-min counters: [[graft.ext.Sketches.cmsCounters]]
    * applied to the stream — one update-mode aggregation whose state is
    * the (row, bucket) counter table, bounded at depth × width per key
    * group whatever the stream's cardinality. Counters ADD across
    * micro-batches (multiset union), so the standing state IS the batch
    * sketch of everything seen: point it at
    * [[graft.ext.Sketches.cmsEstimate]] for live heavy-hitter screens,
    * or persist it and merge with batch counters via `cmsMergeAgg` (the
    * q120 screen fed by a stream instead of a scan). The streaming
    * sibling of [[hllRegisterStream]] — frequencies where that is
    * distincts. */
  def cmsCounterStream(rows: DataFrame, keys: Seq[String],
                       value: org.apache.spark.sql.Column,
                       width: Int = graft.ext.Sketches.CMS_WIDTH): DataFrame =
    graft.ext.Sketches.cmsCounters(rows, keys, value, width)

  /** Exact-dedup ON INGEST: drop arriving rows whose dedup key (e.g.
    * md5(text)) already exists in the SEEN-corpus key table — a
    * stream-static LEFT ANTI join, map-only per micro-batch, zero
    * streaming state. The static side is re-read per micro-batch, so a
    * periodically-rewritten key table (the batch dedup job's output)
    * takes effect without restarting the stream. Catches new-vs-seen
    * duplicates only; compose with [[dedupStream]] (watermark-bounded)
    * for duplicates arriving WITHIN the stream. */
  def dedupScreenStream(rows: DataFrame, seenKeys: DataFrame,
                        keyCol: String): DataFrame =
    rows.join(seenKeys.select(keyCol), Seq(keyCol), "left_anti")

  /** Streaming curation-on-ingest: apply the temperature-mix keep decision
    * to an ARRIVING document stream against a STATIC rates table (from
    * [[graft.ext.TextAnalysis.temperatureRates]], re-derived periodically
    * by a batch pass — rates need global group counts a stream cannot
    * know; stream-static join is the standard pattern). Map-only on the
    * stream with ZERO streaming state: the keep predicate is the same
    * deterministic hash threshold as the batch mixer, so the kept set
    * equals the batch operator's given the same rates (StreamOpsSpec pins
    * stream == batch). The rates side routes through the SAME
    * broadcastIfSmall guard as the batch mixer (the probe is one cheap
    * job on the static table, before the stream starts): source/language
    * rate tables broadcast per micro-batch; a per-domain-scale table
    * stays unhinted and the join shuffles instead of melting the driver. */
  def mixStream(rows: DataFrame, rates: DataFrame, groupCol: String,
                keyCol: String, salt: String,
                maxBroadcastGroups: Long = graft.ops.Guards.MaxBroadcastRows): DataFrame =
    rows.join(graft.ops.Guards.broadcastIfSmall(rates, maxBroadcastGroups), groupCol)
      .filter(graft.ext.TextAnalysis.mixKeep(keyCol, salt))

  /** Rate-anomaly screen ON INGEST: z-score each arriving (type, hour)
    * bucket against a STATIC per-type baseline
    * ([[graft.ext.Events.rateBaseline]], re-derived periodically by
    * batch — global history is a batch fact) and flag spikes as the
    * window closes. The baseline joins BEFORE the windowed aggregation
    * and rides the group key (constant per type), so no join-after-
    * aggregation restriction applies and the post-agg z arithmetic is
    * map-only; streaming state is the watermark-bounded window
    * aggregation itself, nothing more. Same σ=0 → z=0 convention and
    * 6-dp rounding as the batch scorer (StreamOpsSpec pins stream ==
    * batch on the same baseline). */
  def anomalyScreenStream(events: DataFrame, baseline: DataFrame,
                          zThresh: Double = 3.0): DataFrame = {
    require(zThresh > 0, s"zThresh must be positive, got $zThresh")
    events
      .withWatermark("ts", "2 hours")
      .join(graft.ops.Guards.broadcastIfSmall(
        baseline.select("event_type", "base_mean", "base_std")), Seq("event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        col("base_mean"), col("base_std"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("z", round(when(col("base_std") <= 0, lit(0.0))
        .otherwise((col("cnt") - col("base_mean")) / col("base_std")), 6))
      .withColumn("is_spike", abs(col("z")) >= zThresh)
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("z"), col("is_spike"))
  }

  /** Incremental ANN-index ingest on a STREAM: assign each arriving
    * vector to its nearest fixed centroid (the cell column a persisted
    * IVF index partitions by) as it lands — the streaming twin of
    * [[graft.ext.SimSearch.assignNew]]. The centroids are collected ONCE,
    * before the stream starts (cells × dims doubles — the standard
    * bounded k-means driver state), and fuse into a single map-only
    * codegen'd argmax per micro-batch: no join, no aggregation, ZERO
    * streaming state. Re-clustering stays a periodic batch job (like the
    * rates table [[mixStream]] consumes); restart the stream to pick up
    * new centroids — an acceptable contract because centroid refresh is
    * orders of magnitude rarer than micro-batches. */
  def assignStream(rows: DataFrame, cents: DataFrame,
                   idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame =
    graft.ext.SimSearch.assignLiteral(rows,
      graft.ext.SimSearch.collectCentroids(cents), idCol, embCol)

  /** Chunk-level contamination hits ON INGEST: explode each arriving
    * document into its CDC chunks (the compiled map-only
    * [[graft.functions.CdcChunksExpr]] kernel — no shuffle, no streaming
    * state) and inner-join chunk md5s against the STATIC seen-chunk table
    * (the batch CDC job's persisted hashes, re-read per micro-batch like
    * every stream-static side). Emits one (id, chunk_md5) row per hit —
    * the per-document verdict (drop / flag / route to review) is the
    * consumer's aggregation, which keeps this operator zero-state and
    * exactly stream == batch (StreamOpsSpec pins it). The CDC boundary
    * property is what makes screening on ingest work at all: a SHIFTED
    * copy of seen boilerplate still collides chunk-for-chunk, where a
    * fixed-window screen re-phases and misses. */
  def cdcHitsStream(rows: DataFrame, seenChunks: DataFrame,
                    idCol: String, textCol: String,
                    k: Int = 3, modulus: Int = 8): DataFrame =
    rows.select(col(idCol),
        explode(graft.functions.TextExprs.cdcChunks(col(textCol), k, modulus))
          .as("__chunk"))
      .select(col(idCol), md5(col("__chunk")).as("chunk_md5"))
      // distinct on the static side: a duplicated hash row in the
      // persisted seen table would otherwise multiply every matching
      // hit row and silently inflate the consumer's per-doc counts
      .join(seenChunks.select(col("chunk_md5")).distinct(), "chunk_md5")

  case class FunnelEv(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelBuf(evs: List[(Int, Long)], lastMs: Long)
  case class FunnelOut(user_id: Long, steps_reached: Int, last_step_ms: Long)

  /** Streaming twin of the batch earliest-entry funnel
    * ([[graft.ext.Events.funnel]]): per user, buffer this user's STEP
    * events (non-step events are filtered before they ever reach state)
    * within the watermark horizon, and when the user goes quiet —
    * the event-time watermark passes their last step event + `quietMs` —
    * finalize EXACTLY the batch recurrence over the buffered events
    * (t_0 = min ts of step 0; t_i = min ts of step-i events strictly
    * after t_{i-1}) and evict. Emitting only at the quiet horizon is what
    * makes out-of-order arrival exact: a late-but-in-watermark step-0
    * event can lower t_0 and thereby change every later step, so no
    * prefix of the funnel is safe to emit while events can still arrive.
    *
    * State per user = their step events within one horizon (the same
    * bounded-by-activity contract as [[sessionWindows]]), never the
    * stream; a user active again after finalization starts a FRESH
    * funnel — the session-window semantics applied to funnels.
    * StreamOpsSpec pins per-step counts over the emitted rows == the
    * batch funnel on the same data. */
  def funnelStream(events: Dataset[FunnelEv], steps: Seq[String],
                   quietMs: Long = 30 * 60 * 1000L,
                   watermark: String = "10 minutes",
                   windowMs: Option[Long] = None): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMs.forall(_ > 0), s"windowMs must be positive: $windowMs")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    // same greedy earliest-entry recurrence as the batch funnel,
    // including the optional conversion window on each step transition
    def finalizeUser(user: Long, evs: List[(Int, Long)]): Iterator[FunnelOut] = {
      var prev = Long.MinValue
      var reached = 0
      var stop = false
      for (i <- steps.indices if !stop) {
        val cand = evs.collect {
          case (s, t) if s == i &&
            (i == 0 || (t > prev && windowMs.forall(t <= prev + _))) => t
        }
        if (cand.isEmpty) stop = true
        else { prev = cand.min; reached = i + 1 }
      }
      // users whose buffered events never include step 0 (e.g. click-only
      // users) produce NO row — the batch funnel has no counterpart row
      // either, so row-counting consumers see identical tables
      if (reached == 0) Iterator.empty
      else Iterator.single(FunnelOut(user, reached, prev))
    }
    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(b => finalizeUser(user, b.evs))
              .getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            val add = rows.map(e => stepIdx(e.event_type) -> e.ts.getTime).toList
            val prevBuf = state.getOption
            val buf = FunnelBuf(
              prevBuf.map(_.evs).getOrElse(Nil) ++ add,
              (prevBuf.map(_.lastMs).getOrElse(Long.MinValue) ::
                add.map(_._2)).max)
            state.update(buf)
            state.setTimeoutTimestamp(buf.lastMs + quietMs)
            Iterator.empty
          }
      }
  }

  case class RateEv(event_type: String, ts: java.sql.Timestamp)
  case class GridState(nextBucket: Long, pending: Map[Long, Long])
  case class GridOut(event_type: String, bucket: Long, cnt: Long)

  /** Streaming twin of the per-type zero-filled rate grid
    * ([[graft.ext.Events.rateSeriesFilled]] with `sharedGrid = false`):
    * per type, emit (bucket, cnt) for EVERY bucket from the type's first
    * observed bucket onward — including explicit cnt = 0 rows for silent
    * buckets. The silence IS the alarm: a type that stops emitting keeps
    * producing zero rows as the event-time watermark advances (driven by
    * the other types' traffic — event time is global), which is exactly
    * the outage signal the observed-buckets-only anomaly screen
    * ([[anomalyScreenStream]]) is structurally blind to.
    *
    * Bucket b finalizes when the watermark passes its end (wm ≥
    * (b+1)·bucketMs) — late-but-in-watermark events still land in their
    * bucket because nothing at or above the horizon has been emitted.
    * State per type = the un-finalized buckets' counts (bounded by the
    * watermark horizon), PLUS one long for the emit cursor; the key
    * space is type-cardinality-sized, so this operator's total state is
    * tiny by construction. The state never self-evicts — a standing
    * alarm must keep firing zeros; decommissioning a type is a stream
    * restart concern, not an eviction policy.
    *
    * StreamOpsSpec pins stream == batch(`sharedGrid = false`) on the
    * finalized span, and the trailing-zero alarm rows beyond a type's
    * last event explicitly. */
  def rateGridStream(events: Dataset[RateEv], bucketMs: Long = 3600000L,
                     watermark: String = "10 minutes"): Dataset[GridOut] = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[GridState, GridOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[RateEv], state: GroupState[GridState]) =>
          val horizon = state.getCurrentWatermarkMs() / bucketMs
          val newCounts = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
            val b = e.ts.getTime / bucketMs
            m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          // first sight of a type anchors its grid at its first bucket
          // (a per-key state fn cannot know the global minimum — the
          // documented per-type-span semantics)
          val st0 = state.getOption.getOrElse(
            GridState(newCounts.keys.min, Map.empty))
          val pending = newCounts.foldLeft(st0.pending) { case (m, (b, c)) =>
            // the watermark already filtered rows below the horizon, so
            // a bucket under the cursor cannot occur; guard anyway
            if (b >= st0.nextBucket) m.updated(b, m.getOrElse(b, 0L) + c)
            else m
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[GridOut]
          var nb = st0.nextBucket
          while (nb < horizon) {
            out += GridOut(typ, nb, pending.getOrElse(nb, 0L))
            nb += 1
          }
          state.update(GridState(nb, pending.filter(_._1 >= nb)))
          // wake when the watermark can finalize the cursor bucket, even
          // if this type never sends another event — the zero-row alarm
          state.setTimeoutTimestamp((nb + 1) * bucketMs)
          out.iterator
      }
  }

  case class FfEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                  pv: Option[Double])
  case class FfBuf(evs: List[(Long, Long, Option[Double])], lastMs: Long)
  case class FfOut(user_id: Long, event_id: Long,
                   last_purchase_value: Option[Double], obs_seen: Long)

  /** Streaming twin of [[graft.ext.Events.forwardFill]]: per key, every
    * event is emitted with the most recent non-null observation at or
    * before it and the running observation count. Arrival order inside
    * the watermark does NOT matter: events buffer per key and the fill
    * replays in (ts, event_id) order when the key's quiet-period timeout
    * fires — the same disorder-tolerant finalize shape as
    * [[funnelStream]]/[[sessionWindows]]. The cost is state = the key's
    * in-flight events (bounded by the watermark horizon); a pipeline
    * that can GUARANTEE per-key ordered arrival keeps just (last value,
    * count) — the buffered form is the one that stays correct when it
    * can't. Stream == batch is q209's oracle-proven law. */
  def forwardFillStream(events: Dataset[FfEv], quietMs: Long,
                        watermark: String): Dataset[FfOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FfBuf, FfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FfEv], state: GroupState[FfBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map { b =>
              val sorted = b.evs.sortBy(e => (e._1, e._2))
              val res = scala.collection.mutable.ListBuffer.empty[FfOut]
              var last: Option[Double] = None
              var seen = 0L
              sorted.foreach { case (_, id, pv) =>
                if (pv.isDefined) { last = pv; seen += 1 }
                res += FfOut(user, id, last, seen)
              }
              res.iterator
            }.getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            val add = rows.map(e => (e.ts.getTime, e.event_id, e.pv)).toList
            val prev = state.getOption
            val buf = FfBuf(prev.map(_.evs).getOrElse(Nil) ++ add,
              (prev.map(_.lastMs).getOrElse(Long.MinValue) ::
                add.map(_._1)).max)
            state.update(buf)
            state.setTimeoutTimestamp(buf.lastMs + quietMs)
            Iterator.empty
          }
      }
  }

  case class CdcEv(k: Long, seq: Long, op: String, g: Option[String],
                   old_g: Option[String])
  case class CdcState(maxSeq: Long, prevNew: Option[String],
                      oldEmitted: Boolean)
  case class DeltaOut(g: String, d: Long)

  /** Streaming twin of [[graft.ops.Resolve.ivmCounts]]: changelog
    * entries arrive as a stream (joined upstream to the base's pre-state
    * group), and each key's state emits CORRECTION rows — −1 against the
    * pre-state group the first time the key is touched, +1 for the
    * current post-state group, and a retraction pair whenever a
    * higher-seq entry supersedes the one already applied. Summing every
    * emission per group (a downstream streaming aggregation) converges
    * to exactly the batch delta REGARDLESS of arrival order — late or
    * out-of-order entries only ever add a retraction pair; entries with
    * seq ≤ the applied one emit nothing. NoTimeout: corrections flow
    * per micro-batch, state is three small fields per touched key.
    * Stream-final == batch-IVM == recount is q210's oracle-proven law. */
  def ivmDeltaStream(log: Dataset[CdcEv]): Dataset[DeltaOut] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.k)
      .flatMapGroupsWithState[CdcState, DeltaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[CdcEv], state: GroupState[CdcState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[DeltaOut]
          var st = state.getOption.getOrElse(CdcState(Long.MinValue, None, false))
          // apply in seq order within the batch; cross-batch order is
          // irrelevant because supersession emits retractions
          rows.toList.sortBy(_.seq).foreach { e =>
            if (e.seq > st.maxSeq) {
              if (!st.oldEmitted) {
                e.old_g.foreach(g => out += DeltaOut(g, -1L))
                st = st.copy(oldEmitted = true)
              }
              st.prevNew.foreach(g => out += DeltaOut(g, -1L))
              val nw = if (e.op != "D") e.g else None
              nw.foreach(g => out += DeltaOut(g, 1L))
              st = CdcState(e.seq, nw, st.oldEmitted)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Convenience writer for tests/demos: stream to an in-memory sink. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}
