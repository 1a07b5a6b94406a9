package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming hourly counts over a MemoryStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.toMemorySink(
      StreamOps.hourlyCounts(events), "hourly_test", OutputMode.Update())
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("hourly_test")
        .orderBy("hour_start", "event_type").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Timestamp]("hour_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(out(0).getAs[Long]("n_events") === 2L)
      assert(out(1).getAs[String]("event_type") === "view")
    } finally q.stop()
  }

  test("streaming HLL registers: incremental state == batch sketch of everything seen") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(String, String)]
    val rows = in.toDF().toDF("g", "v")
    val q = StreamOps.toMemorySink(
      StreamOps.hllRegisterStream(rows, Seq("g"), col("v")),
      "hll_stream_test", OutputMode.Update())
    try {
      val batch1 = (1 to 400).map(i => ("g1", s"v$i"))
      val batch2 = (200 to 700).map(i => ("g1", s"v$i")) // overlaps batch 1
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // Update-mode sink appends each register's updates; keep the latest
      // (= max, registers only grow)
      val streamed = spark.table("hll_stream_test")
        .groupBy("g", "__graft_hll_bucket")
        .agg(max("__graft_hll_maxrho").as("__graft_hll_maxrho"))
      val batch = graft.ext.Sketches.sparseRegisters(
        (batch1 ++ batch2).toDF("g", "v"), Seq("g"), col("v"))
      val s = streamed.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val b = batch.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(s === b, "streamed register state must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming count-min counters == batch sketch; estimates over stream state match batch estimates") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(String, String)]
    val q = StreamOps.toMemorySink(
      StreamOps.cmsCounterStream(in.toDF().toDF("g", "v"), Seq("g"), col("v")),
      "cms_stream_test", OutputMode.Update())
    try {
      // skewed stream: "hot" dominates, split across two micro-batches
      val batch1 = (1 to 300).map(i => ("g1", if (i % 3 == 0) "hot" else s"v$i"))
      val batch2 = (1 to 200).map(i => ("g1", if (i % 2 == 0) "hot" else s"w$i"))
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // Update-mode sink appends each counter's updates; counters only
      // grow, so the latest value per cell is its max
      val streamed = spark.table("cms_stream_test")
        .groupBy("g", "cms_row", "cms_bucket")
        .agg(max("cms_cnt").as("cms_cnt"))
      val batch = graft.ext.Sketches.cmsCounters(
        (batch1 ++ batch2).toDF("g", "v"), Seq("g"), col("v"))
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(cells(streamed) === cells(batch),
        "streamed counter state must equal the batch sketch")
      // and the estimate over the streamed state answers like batch
      val probe = Seq(Tuple1("hot")).toDF("v")
      val est = graft.ext.Sketches.cmsEstimate(probe,
          streamed.drop("g"), col("v"))
        .head.getLong(1)
      assert(est >= 200L, s"the hot key's estimate must dominate: $est")
    } finally q.stop()
  }

  test("streaming pivotDense (complete mode) == batch matrix over everything seen") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[(String, String, Long)]
    val langs = Seq("de", "en", "fr")
    def matrix(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Reshape.pivotDense(df, "source", "lang", langs,
        Seq("n" -> (c => count(when(c, 1))),
          "chars" -> (c => coalesce(sum(when(c, col("n_chars"))), lit(0L)))))
    val q = StreamOps.toMemorySink(
      matrix(in.toDF().toDF("source", "lang", "n_chars")),
      "pivot_stream_test", OutputMode.Complete())
    try {
      val b1 = Seq(("s0", "en", 10L), ("s0", "de", 5L), ("s1", "fr", 3L))
      val b2 = Seq(("s0", "en", 20L), ("s1", "de", 7L), ("s2", "zh", 9L))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("pivot_stream_test").collect()
        .map(_.toString).sorted.toSeq
      val batch = matrix((b1 ++ b2).toDF("source", "lang", "n_chars"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed === batch,
        "complete-mode streaming matrix must equal the batch pivot")
    } finally q.stop()
  }

  test("streaming exact-dedup screen drops seen keys, passes fresh ones") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val seen = Seq("dup one", "dup two").toDF("text")
      .select(md5(col("text")).as("h"))
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.toMemorySink(
      StreamOps.dedupScreenStream(
        in.toDF().toDF("doc_id", "text").withColumn("h", md5(col("text"))),
        seen, "h"),
      "dedup_screen_test", OutputMode.Append())
    try {
      in.addData((1L, "dup one"), (2L, "fresh a"))
      q.processAllAvailable()
      in.addData((3L, "dup two"), (4L, "fresh b"), (5L, "dup one"))
      q.processAllAvailable()
      val kept = spark.table("dedup_screen_test")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq === Seq(2L, 4L), "only unseen texts may pass")
    } finally q.stop()
  }

  test("streaming temperature mix against static rates == batch mixer's kept set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val docs = ((1 to 90).map(i => ("head", i.toLong)) ++
      (1 to 10).map(i => ("tail", 100L + i))).toDF("source", "doc_id")
    val rates = graft.ext.TextAnalysis.temperatureRates(docs, "source",
      alpha = 0.5, nTarget = 40)
    val in = MemoryStream[(String, Long)]
    val q = StreamOps.toMemorySink(
      StreamOps.mixStream(in.toDF().toDF("source", "doc_id"), rates,
        "source", "doc_id", "mx"),
      "mix_stream_test", OutputMode.Append())
    try {
      // arrival order/batching must not matter: deliver in two odd slices
      val all = ((1 to 90).map(i => ("head", i.toLong)) ++
        (1 to 10).map(i => ("tail", 100L + i)))
      in.addData(all.take(37): _*)
      q.processAllAvailable()
      in.addData(all.drop(37): _*)
      q.processAllAvailable()
      val streamed = spark.table("mix_stream_test")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val batch = graft.ext.TextAnalysis.temperatureMix(docs, "source",
        "doc_id", alpha = 0.5, nTarget = 40, salt = "mx")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(streamed.toSeq === batch.toSeq,
        "streamed kept set must equal the batch mixer's")
    } finally q.stop()
  }

  test("streaming cell assignment against static centroids == batch assignNew") {
    implicit val sqlCtx = spark.sqlContext
    val vecs = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, Array(base(0) + i * 0.01f, base(1)))
    }
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cell", "centroid")
    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.toMemorySink(
      StreamOps.assignStream(in.toDF().toDF("vec_id", "embedding"), cents),
      "assign_stream_test", OutputMode.Append())
    try {
      in.addData(vecs.take(11): _*)
      q.processAllAvailable()
      in.addData(vecs.drop(11): _*)
      q.processAllAvailable()
      val streamed = spark.table("assign_stream_test")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val batch = graft.ext.SimSearch.assignNew(
        vecs.toDF("vec_id", "embedding"), cents)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(streamed === batch, "streamed assignment must equal batch assignNew")
    } finally q.stop()
  }

  test("event-time session windows: gap close + watermark timeout eviction") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.EvT]
    val q = StreamOps.toMemorySink(
      StreamOps.sessionWindows(in.toDS(), gapMs = 30 * 60000L, watermark = "5 minutes").toDF(),
      "sessw_test", OutputMode.Append())
    val base = 1000L // minutes; keep clear of epoch-0 watermark edge cases
    def ts(min: Long) = StreamOps.EvT(_: Long, new Timestamp((base + min) * 60000L))
    try {
      // user 1: burst at t0..t10; user 2: single event at t5
      in.addData(ts(0)(1L), ts(10)(1L), ts(5)(2L))
      q.processAllAvailable()
      // user 1 returns at t120 -> closes their first session by gap;
      // watermark advances to t115, past user 2's timeout (t5+30=t35)
      in.addData(ts(120)(1L))
      q.processAllAvailable()
      in.addData(ts(125)(1L)) // one more batch so the timeout fires
      q.processAllAvailable()
      val out = spark.table("sessw_test")
        .orderBy("user_id", "start_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1) / 60000L - base, r.getLong(2) / 60000L - base, r.getLong(3)))
      assert(out.contains((1L, 0L, 10L, 2L)), s"user 1 first session closed by gap: ${out.toSeq}")
      assert(out.contains((2L, 5L, 5L, 1L)), s"user 2 session closed by timeout: ${out.toSeq}")
    } finally q.stop()
  }

  test("file-source streaming over the events parquet equals the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    // file sources stream a directory; stage the single file into one
    val landing = java.nio.file.Files.createTempDirectory("graft-landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events-000.parquet"))
    val streamed = StreamOps.hourlyCounts(
      StreamOps.eventsFileStream(spark, landing.toString))
    val q = StreamOps.toMemorySink(streamed, "hourly_file_test", OutputMode.Update())
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_file_test")
        .groupBy("hour_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
      val expected = graft.ops.Ingest.eventsWithTs(spark, dir)
        .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
          org.apache.spark.sql.functions.col("ts")).as("hour_start"),
          org.apache.spark.sql.functions.col("event_type"))
        .count().withColumnRenamed("count", "n_events")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival, drops in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val base = 1000L * 60000L
    def row(id: Long, min: Long, v: String) = (id, new Timestamp(base + min * 60000L), v)
    val df = in.toDF().toDF("doc_id", "ts", "payload")
    val q = StreamOps.toMemorySink(
      StreamOps.dedupStream(df, "doc_id", "ts"), "dedup_test", OutputMode.Append())
    try {
      in.addData(row(1L, 0, "first"), row(1L, 1, "dup-same-batch"), row(2L, 0, "b"))
      q.processAllAvailable()
      in.addData(row(1L, 5, "dup-next-batch"), row(3L, 6, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_test").collect()
        .map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
      assert(out === Seq((1L, "first"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("stream-stream interval attribution: in-horizon purchase joins, out-of-horizon and unmatched emit null") {
    implicit val sqlCtx = spark.sqlContext
    val evIn = MemoryStream[(Long, Long, Timestamp)]
    val purIn = MemoryStream[(Long, Long, Timestamp)]
    val base = 1000L * 60000L // keep clear of epoch-0 watermark edge cases
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val events = evIn.toDF().toDF("event_id", "user_id", "ts")
    val purchases = purIn.toDF().toDF("purchase_id", "user_id", "ts")
    val q = StreamOps.toMemorySink(
      StreamOps.attributionStream(events, purchases,
        horizon = "1 hour", watermark = "5 minutes"),
      "attr_test", OutputMode.Append())
    try {
      // user 1: purchases at t10 AND t20, events at t30 (both in horizon ->
      // interval fan-out: one row per purchase) and t100 (81/91min later ->
      // outside the 1h horizon); user 2: event, no purchase at all
      purIn.addData((500L, 1L, ts(10)), (510L, 1L, ts(20)))
      evIn.addData((1L, 1L, ts(30)), (2L, 1L, ts(100)), (3L, 2L, ts(31)))
      q.processAllAvailable()
      // advance both watermarks far past every horizon so the outer side
      // emits the null rows (needs one batch to move the watermark and one
      // to apply it)
      purIn.addData((501L, 9L, ts(500)))
      evIn.addData((9L, 9L, ts(500)))
      q.processAllAvailable()
      purIn.addData((502L, 9L, ts(600)))
      evIn.addData((10L, 9L, ts(600)))
      q.processAllAvailable()
      val out = spark.table("attr_test")
        .select("event_id", "purchase_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(out(1L) === Set(500L, 510L),
        s"interval semantics: one row PER in-horizon purchase: $out")
      assert(out(2L) === Set(-1L), s"out-of-horizon event emits null: $out")
      assert(out(3L) === Set(-1L), s"user without purchases emits null: $out")
    } finally q.stop()
  }

  test("streaming CDC chunk screen: hits on arriving docs == batch hits; shifted copy still collides") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, md5}
    // seen corpus: one boilerplate-carrying doc, chunked by the batch op
    val boiler = (1 to 60).map(i => "b" + (i * 7 % 41)).mkString(" ")
    val seenDocs = Seq((100L, "intro words here " + boiler)).toDF("doc_id", "text")
    val seen = graft.ext.Dedup.cdcChunks(seenDocs, "doc_id", "text")
      .select(md5(col("chunk")).as("chunk_md5")).distinct()
    // arriving docs: 1 carries the boilerplate at a DIFFERENT offset,
    // 2 is fresh
    val arriving = Seq(
      (1L, "totally different lead in text " + boiler),
      (2L, "nothing shared with anything here at all"))
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.toMemorySink(
      StreamOps.cdcHitsStream(in.toDF().toDF("doc_id", "text"), seen,
        "doc_id", "text"),
      "cdc_screen_test", OutputMode.Append())
    try {
      in.addData(arriving: _*)
      q.processAllAvailable()
      val got = spark.table("cdc_screen_test").collect()
        .map(r => (r.getLong(1), r.getString(0))).toSet
      assert(got.nonEmpty && got.forall(_._1 === 1L),
        s"only the shifted boilerplate carrier may hit: ${got.take(5)}")
      // stream == batch: identical hits from the batch formulation
      val batch = graft.ext.Dedup.cdcChunks(
          arriving.toDF("doc_id", "text"), "doc_id", "text")
        .select(col("doc_id"), md5(col("chunk")).as("chunk_md5"))
        .join(seen, "chunk_md5")
        .collect().map(r => (r.getLong(1), r.getString(0))).toSet
      assert(got === batch, s"stream hits must equal batch hits")
    } finally q.stop()
  }

  test("rateGridStream == batch per-type grid on the finalized span; silent types keep emitting zero-row alarms") {
    implicit val sqlCtx = spark.sqlContext
    val minMs = 60000L
    val base = 1000L // minutes; keep clear of the epoch-0 watermark edge
    def ev(t: String, m: Long) =
      StreamOps.RateEv(t, new Timestamp((base + m) * minMs))
    val in = MemoryStream[StreamOps.RateEv]
    val q = StreamOps.toMemorySink(
      StreamOps.rateGridStream(in.toDS(), bucketMs = minMs,
        watermark = "0 seconds").toDF(),
      "rate_grid_test", OutputMode.Append())
    try {
      // a: minutes 0 (x2) and 3; b: minute 1 — then b goes loud again at
      // 20 while a goes SILENT; c starts late at 40
      Seq(
        Seq(ev("a", 0), ev("a", 0), ev("a", 3), ev("b", 1)),
        Seq(ev("b", 20)),
        Seq(ev("c", 40)), Seq(ev("c", 45)), Seq(ev("c", 50))
      ).foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      val got = spark.table("rate_grid_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.length === got.map(r => (r._1, r._2)).distinct.length,
        "every (type, bucket) cell emits exactly once")
      val byType = got.groupBy(_._1)
      // spot values: observed counts land in their buckets
      val cell = got.map(r => (r._1, r._2 - base) -> r._3).toMap
      assert(cell(("a", 0L)) === 2L && cell(("a", 3L)) === 1L &&
        cell(("b", 1L)) === 1L && cell(("b", 20L)) === 1L, s"$cell")
      // the alarm: a's last event is minute 3, yet zero rows keep coming
      // as the other types drive the watermark forward
      assert(byType("a").count(r => r._2 - base > 3 && r._3 == 0L) >= 10,
        s"silent type must keep emitting zero-row alarms: ${byType("a").toSeq.sortBy(_._2)}")
      // stream == batch(sharedGrid = false) on the finalized span: every
      // streamed cell within a type's batch span matches the batch grid,
      // every cell past it is an alarm zero, and each type's rows are
      // contiguous from its batch minimum
      val allEv = Seq(("a", 0L), ("a", 0L), ("a", 3L), ("b", 1L),
        ("b", 20L), ("c", 40L), ("c", 45L), ("c", 50L))
        .map { case (t, m) => (t, (base + m) * minMs) }
        .toDF("event_type", "ts_ms")
      val batchGrid = graft.ext.Events.rateSeriesFilled(allEv,
          bucketMs = minMs, sharedGrid = false)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      byType.foreach { case (t, rows) =>
        val bs = rows.map(_._2).sorted
        val batchBuckets = batchGrid.keys.filter(_._1 == t).map(_._2)
        assert(bs.head === batchBuckets.min,
          s"$t grid must start at the type's first bucket")
        assert(bs === (bs.head to bs.last),
          s"$t rows must be gap-free: $bs")
        rows.foreach { case (_, b, c) =>
          if (b <= batchBuckets.max)
            assert(c === batchGrid((t, b)), s"stream!=batch at ($t, $b)")
          else assert(c === 0L, s"past-span rows are alarm zeros ($t, $b)")
        }
      }
    } finally q.stop()
  }

  test("streaming funnel == batch funnel; out-of-order steps exact; quiet-horizon eviction") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "buy")
    val base = 1000L // minutes; keep clear of epoch-0 watermark edge cases
    def ev(u: Long, t: Long, s: String) =
      StreamOps.FunnelEv(u, s, new Timestamp((base + t) * 60000L))
    // u1: fully ordered; u2: click BEFORE view (stops at view);
    // u3: view only; u4: click arrives LATE (next batch, in-watermark)
    // but with an EARLIER ts than u4's buy — the finalize-at-quiet
    // contract must still credit the full ordered funnel
    val batch1 = Seq(
      ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 9, "buy"),
      ev(2, 3, "click"), ev(2, 6, "view"),
      ev(3, 2, "view"), ev(3, 2, "noise"),
      ev(4, 0, "view"), ev(4, 8, "buy"))
    // late arrival with an earlier ts than u4's buy; t=6 stays strictly
    // above the post-batch-1 watermark (t9 - 5min = t4 — an event AT the
    // watermark is dropped as late, the epoch-0 gotcha generalized)
    val late4 = ev(4, 6, "click")
    val in = MemoryStream[StreamOps.FunnelEv]
    val q = StreamOps.toMemorySink(
      StreamOps.funnelStream(in.toDS(), steps,
        quietMs = 30 * 60000L, watermark = "5 minutes").toDF(),
      "funnel_test", OutputMode.Append())
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(late4)
      q.processAllAvailable()
      // push the watermark past every user's quiet horizon, twice so the
      // timeouts fire in a batch after the watermark advances
      in.addData(ev(99, 500, "view"))
      q.processAllAvailable()
      in.addData(ev(99, 505, "view"))
      q.processAllAvailable()
      val out = spark.table("funnel_test")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
        .toMap
      assert(out(1L) === ((3, (base + 9) * 60000L)), s"ordered user: $out")
      assert(out(2L)._1 === 1, s"out-of-order user stops at view: $out")
      assert(out(3L)._1 === 1, s"view-only user: $out")
      assert(out(4L) === ((3, (base + 8) * 60000L)),
        s"late in-watermark click must complete the funnel: $out")
      // stream == batch: per-step counts over the emitted rows match the
      // batch funnel on the same events (sentinel user included)
      val allEvents = (batch1 :+ late4 :+ ev(99, 500, "view") :+ ev(99, 505, "view"))
        .map(e => (e.user_id, e.event_type, e.ts.getTime))
        .toDF("user_id", "event_type", "ts_ms")
      val batchCounts = graft.ext.Events.funnel(allEvents, steps)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      // user 99 is still in state (never quiet): batch sees them at step 1
      val streamed = spark.table("funnel_test").collect()
        .map(r => r.getInt(1)).toSeq :+ 1
      val streamCounts = steps.indices
        .map(i => i -> streamed.count(_ >= i + 1).toLong).toMap
      assert(streamCounts === batchCounts,
        s"stream $streamCounts != batch $batchCounts")
    } finally q.stop()
  }

  test("windowed streaming funnel == windowed batch funnel; no-step-0 users emit no row") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "buy")
    val base = 1000L
    def ev(u: Long, t: Long, s: String) =
      StreamOps.FunnelEv(u, s, new Timestamp((base + t) * 60000L))
    val w = 10 * 60000L // 10-minute conversion window
    // u1 converts inside every window; u2's click lands past the window
    // (stops at view); u3 has NO view at all (click-only -> no row);
    // u4's click is in-window but the buy is not (stops at click)
    val data = Seq(
      ev(1, 0, "view"), ev(1, 5, "click"), ev(1, 12, "buy"),
      ev(2, 0, "view"), ev(2, 20, "click"),
      ev(3, 2, "click"),
      ev(4, 0, "view"), ev(4, 8, "click"), ev(4, 30, "buy"))
    val in = MemoryStream[StreamOps.FunnelEv]
    val q = StreamOps.toMemorySink(
      StreamOps.funnelStream(in.toDS(), steps, quietMs = 30 * 60000L,
        watermark = "5 minutes", windowMs = Some(w)).toDF(),
      "funnel_window_test", OutputMode.Append())
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData(ev(99, 500, "view"))
      q.processAllAvailable()
      in.addData(ev(99, 505, "view"))
      q.processAllAvailable()
      val out = spark.table("funnel_window_test")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(out === Map(1L -> 3, 2L -> 1, 4L -> 2), s"got $out")
      assert(!out.contains(3L), "click-only user must emit no row")
      // stream == batch on the same events (u99 still in state at step 1)
      val allEvents = (data :+ ev(99, 500, "view") :+ ev(99, 505, "view"))
        .map(e => (e.user_id, e.event_type, e.ts.getTime))
        .toDF("user_id", "event_type", "ts_ms")
      val batchCounts = graft.ext.Events.funnel(allEvents, steps,
          windowMs = Some(w))
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      val streamed = spark.table("funnel_window_test").collect()
        .map(r => r.getInt(1)).toSeq :+ 1
      val streamCounts = steps.indices
        .map(i => i -> streamed.count(_ >= i + 1).toLong).toMap
      assert(streamCounts === batchCounts,
        s"stream $streamCounts != batch $batchCounts")
    } finally q.stop()
  }

  test("streaming anomaly screen == batch scoring on the same baseline; spike flags as the window closes") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // baseline from a batch history: "click" averages 2/hour (mean 2,
    // some spread), derived by the REAL batch helper
    val hour = 3600000L
    val hist = (0 until 10).flatMap { h =>
      val n = if (h % 2 == 0) 1 else 3
      (0 until n).map(i => ("click", h * hour + i.toLong))
    }.toDF("event_type", "ts_ms")
    val baseline = graft.ext.Events.rateBaseline(hist)
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = StreamOps.toMemorySink(
      StreamOps.anomalyScreenStream(events, baseline, zThresh = 3.0),
      "anomaly_test", OutputMode.Update())
    try {
      // hour 10:00 gets a 20-event spike; hour 11:00 a baseline-ish 2
      in.addData((0 until 20).map(i =>
        (Timestamp.valueOf(s"2024-01-01 10:${10 + i % 40}:00"), "click")): _*)
      in.addData(
        (Timestamp.valueOf("2024-01-01 11:05:00"), "click"),
        (Timestamp.valueOf("2024-01-01 11:35:00"), "click"))
      q.processAllAvailable()
      val streamed = spark.table("anomaly_test")
        // update mode re-emits a window per micro-batch; keep the final count
        .groupBy("hour_start", "event_type")
        .agg(max("cnt").as("cnt"))
        .collect().map(r => (r.getAs[Timestamp](0).getTime, r.getLong(2))).toMap
      assert(streamed(Timestamp.valueOf("2024-01-01 10:00:00").getTime) === 20L)
      // batch scoring with the SAME baseline and formula
      val batchScored = spark.table("anomaly_test")
        .groupBy("hour_start", "event_type").agg(max("cnt").as("cnt"))
        .join(baseline, "event_type")
        .withColumn("zb", round(when(col("base_std") <= 0, lit(0.0))
          .otherwise((col("cnt") - col("base_mean")) / col("base_std")), 6))
      val streamZ = spark.table("anomaly_test")
        .groupBy("hour_start").agg(max("z").as("z"), max("cnt").as("cnt"))
        .collect().map(r => r.getAs[Long]("cnt") -> r.getAs[Double]("z")).toMap
      val batchZ = batchScored.collect()
        .map(r => r.getAs[Long]("cnt") -> r.getAs[Double]("zb")).toMap
      assert(streamZ === batchZ, "stream z-scores must equal batch scoring on the same baseline")
      // the 20-event hour is a spike against mean 2 / std 1; the 2-event hour is not
      val flags = spark.table("anomaly_test")
        .groupBy("cnt").agg(max("is_spike").as("f"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(flags(20L) === true && flags(2L) === false)
    } finally q.stop()
  }

  test("stateful session counting via mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.Ev]
    // The deprecated NoTimeout variant IS the subject under test here (the
    // mapGroupsWithState demo twin); production callers use sessionWindows.
    val sessions: org.apache.spark.sql.DataFrame =
      (StreamOps.sessionCounts(in.toDS()): @scala.annotation.nowarn("cat=deprecation")).toDF()
    val q = StreamOps.toMemorySink(sessions, "sessions_test", OutputMode.Update())
    try {
      val min = 60000L
      in.addData(StreamOps.Ev(7L, 0L), StreamOps.Ev(7L, 10 * min))
      q.processAllAvailable()
      in.addData(StreamOps.Ev(7L, 50 * min)) // > 30 min gap -> second session
      q.processAllAvailable()
      val out = spark.table("sessions_test")
        .groupBy("user_id").max("n_sessions").collect()
      assert(out.head.getLong(1) === 2L)
    } finally q.stop()
  }

  test("forwardFillStream: out-of-order arrival INSIDE the watermark still fills in event order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.FfEv]
    val out = StreamOps.forwardFillStream(in.toDS(),
      quietMs = 60000L, watermark = "1 hour")
    val q = StreamOps.toMemorySink(out.toDF(), "ffill_test", OutputMode.Append())
    def ts(ms: Long) = new Timestamp(86400000L + ms)
    try {
      // arrival order scrambles event order: the late-arriving EARLIER
      // observation (5.0 at t=1s) must still fill the t=2s row
      in.addData(StreamOps.FfEv(1L, 3L, ts(2000), None))
      in.addData(StreamOps.FfEv(1L, 2L, ts(1000), Some(5.0)))
      in.addData(StreamOps.FfEv(1L, 4L, ts(3000), Some(7.0)))
      // watermark far past quiet timeout -> finalize user 1
      in.addData(StreamOps.FfEv(99L, 9L, ts(2L * 3600 * 1000 + 120000), None))
      q.processAllAvailable()
      val got = spark.table("ffill_test").filter("user_id = 1")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(1), Option(r.get(2)), r.getLong(3)))
      assert(got.toSeq === Seq((2L, Some(5.0), 1L), (3L, Some(5.0), 1L),
        (4L, Some(7.0), 2L)))
    } finally q.stop()
  }

  test("ivmDeltaStream: supersession retractions make the sum order-insensitive") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    def run(batches: Seq[Seq[StreamOps.CdcEv]], name: String): Map[String, Long] = {
      val in = MemoryStream[StreamOps.CdcEv]
      val q = StreamOps.toMemorySink(
        StreamOps.ivmDeltaStream(in.toDS()).toDF(), name, OutputMode.Append())
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).groupBy("g").agg(sum("d").as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 != 0L)
    }
    // key 1: base group a, U to b (seq 1), then D (seq 2)  -> -a
    // key 2: no base, I to c (seq 1)                       -> +c
    val fwd = Seq(
      Seq(StreamOps.CdcEv(1L, 1L, "U", Some("b"), Some("a"))),
      Seq(StreamOps.CdcEv(1L, 2L, "D", None, Some("a")),
        StreamOps.CdcEv(2L, 1L, "I", Some("c"), None)))
    // same entries, REVERSED arrival: the delete lands first, the
    // stale update arrives later and must emit nothing
    val rev = Seq(
      Seq(StreamOps.CdcEv(1L, 2L, "D", None, Some("a")),
        StreamOps.CdcEv(2L, 1L, "I", Some("c"), None)),
      Seq(StreamOps.CdcEv(1L, 1L, "U", Some("b"), Some("a"))))
    val a = run(fwd, "ivm_fwd")
    val b = run(rev, "ivm_rev")
    assert(a === Map("a" -> -1L, "c" -> 1L))
    assert(b === a, "arrival order must not change the converged deltas")
  }
}
