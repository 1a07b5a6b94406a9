package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Events, Multimodal, Retrieval, SimSearch, Sketches, TextAnalysis}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens drops empties; shingles need >= k tokens") {
    val df = Seq("a b  c", "a b", "").toDF("text")
      .select(TextAnalysis.tokens($"text").as("t"))
      .withColumn("sh", TextAnalysis.shingles($"t", 3))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq("a", "b", "c"))
    assert(rows(0).getSeq[String](1) === Seq("a b c"))
    assert(rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](0).isEmpty)
  }

  test("h60 is the md5-derived 60-bit value (portable across engines)") {
    // first 15 hex chars of md5('abc') = 900150983cd24fb -> 648541476951500027
    val v = Seq("abc").toDF("s").select(TextAnalysis.h60($"s")).head.getLong(0)
    assert(v === 648541476951500027L)
  }

  test("lang prediction: argmax with fixed precedence tiebreak") {
    val df = Seq("the cat sat on the mat", "el gato de la casa y el perro")
      .toDF("text").withColumn("t", TextAnalysis.tokens($"text"))
    val scored = df.select(
      TextAnalysis.predictLang(
        TextAnalysis.stopwordHits($"t", "en"), TextAnalysis.stopwordHits($"t", "es"),
        TextAnalysis.stopwordHits($"t", "fr"), TextAnalysis.stopwordHits($"t", "de"),
        TextAnalysis.stopwordHits($"t", "zh")).as("pred"))
    assert(scored.collect().map(_.getString(0)).toSeq === Seq("en", "es"))
  }

  test("PII scrub: ordered redaction, staged counts, zero-match identity") {
    val rows = Seq(
      "contact bob.smith+x@corp.example.org or 10.20.30.40 ref 123456789",
      "id 12345 is too short but 999999 is not",
      "plain text with no pii at all")
    val df = rows.toDF("txt").select(
      TextAnalysis.piiScrubbed($"txt").as("clean"),
      struct(TextAnalysis.piiCounts($"txt").map { case (n, c) => c.as(n) }: _*).as("n"))
    val got = df.collect()
    // email matched BEFORE its digits could count as an ID; ip and the
    // 9-digit run each redacted once
    assert(got(0).getString(0) === "contact <EMAIL> or <IP> ref <ID>")
    assert(got(0).getStruct(1).toSeq === Seq(1, 1, 1))
    // sub-6-digit runs survive; 6-digit runs do not
    assert(got(1).getString(0) === "id 12345 is too short but <ID> is not")
    assert(got(1).getStruct(1).toSeq === Seq(0, 0, 1))
    // no-match text is byte-identical
    assert(got(2).getString(0) === rows(2))
    assert(got(2).getStruct(1).toSeq === Seq(0, 0, 0))
  }

  test("unigramLogProb: fluent (common-token) docs outscore rare-token noise; partition-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the the the cat sat"),   // common tokens
      (2L, "zqx jvw pfft glorp nnn"), // hapax noise
      (3L, "the cat")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(2L), s"common-token doc must outscore noise: $got")
    assert(got(3L) > got(2L))
    // an external reference model scores only its known tokens
    val model = Seq((0L, "the cat the cat")).toDF("doc_id", "text")
    val scored = TextAnalysis.unigramLogProb(docs, "doc_id", "text", Some(model))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scored(1L) === 4L, "3x'the' + 1x'cat' known to the model")
    assert(!scored.contains(2L), "no model token -> no score row")
    // decimal sums: identical under repartition
    val a = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    val b = TextAnalysis.unigramLogProb(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    assert(a === b)
  }

  test("exactQuotaSample: exactly quota rows per group; short groups keep all; deterministic") {
    import org.apache.spark.sql.functions.col
    val df = ((1 to 100).map(i => ("big", i.toLong)) ++
      (1 to 3).map(i => ("tiny", 200L + i))).toDF("g", "id")
    val got = TextAnalysis.exactQuotaSample(df, "g", "id", quota = 10, salt = "s")
    val counts = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 10L, "tiny" -> 3L))
    val again = TextAnalysis.exactQuotaSample(df.repartition(9), "g", "id", 10, "s")
    assert(again.select("id").collect().map(_.getLong(0)).sorted ===
      got.select("id").collect().map(_.getLong(0)).sorted)
    intercept[IllegalArgumentException] {
      TextAnalysis.exactQuotaSample(df, "g", "id", 0, "s") }
  }

  test("exactQuotaSampleAtScale property: identical to the direct form, rescue path included") {
    import org.apache.spark.sql.functions.col
    // Seeded messy strata: group sizes spanning < quota, ~quota, and
    // >> quota, over several salts/quotas/margins. A margin of 1.01 at
    // quota 3 makes under-filled pre-filters (the rescue path) near
    // certain for some group; identity must hold regardless.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 600).map { i =>
      (s"g${rnd.nextInt(7)}", i.toLong) } ++ (1 to 2).map(i => ("tiny", 900L + i))
    val df = rows.toDF("g", "id")
    for ((quota, salt, margin) <- Seq((3, "a", 1.01), (10, "b", 1.2), (25, "c", 2.0))) {
      val direct = TextAnalysis.exactQuotaSample(df, "g", "id", quota, salt)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      val scaled = TextAnalysis.exactQuotaSampleAtScale(
          df.repartition(11), "g", "id", quota, salt, margin)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(scaled === direct, s"quota=$quota salt=$salt margin=$margin")
    }
    // The window input really is bounded: the ranked candidate set is the
    // pre-filter survivors (+ rescued groups), far below the input size.
    val big = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "id")
    val cand = TextAnalysis.exactQuotaSampleAtScale(big, "g", "id", 20, "s", 5.0)
    assert(cand.count() === 20)
  }

  test("weightedSample: weight drives inclusion; deterministic; top-k never global-sorts") {
    import org.apache.spark.sql.functions.{col, lit}
    // one item outweighs 200 peers 10000:1 — u^(1/10000) ~ 1 beats
    // everything, so it must be drawn into any k >= 1 sample
    val df = ((1 to 200).map(i => (i.toLong, 1.0)) :+ (999L, 10000.0))
      .toDF("doc_id", "w")
    val got = TextAnalysis.weightedSample(df, "doc_id", col("w"), k = 10, salt = "s")
    assert(got.collect().map(_.getLong(0)).contains(999L))
    // deterministic under repartition
    val a = got.collect().map(_.getLong(0)).sorted
    val b = TextAnalysis.weightedSample(df.repartition(7), "doc_id", col("w"), 10, "s")
      .collect().map(_.getLong(0)).sorted
    assert(a === b)
    // non-positive weights are unsampleable
    val withZero = df.withColumn("w", when(col("doc_id") <= 100, lit(0.0)).otherwise(col("w")))
    val kept = TextAnalysis.weightedSample(withZero, "doc_id", col("w"), 300, "s")
    assert(kept.filter(col("doc_id") <= 100).count() === 0)
    // plan shape: per-partition heaps, not a global sort
    val p = TextAnalysis.weightedSample(df, "doc_id", col("w"), 10, "s")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("nbQualityScore: log-odds separate the classes; smoothing keeps unseen-class terms finite; partition-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "good clean prose text", true),
      (2L, "clean good text prose", true),
      (3L, "spam spam buy now", false),
      (4L, "buy spam now spam", false),
      // mixed doc leaning positive; unlabeled vocab overlap both ways
      (5L, "good prose with spam", true)
    ).toDF("doc_id", "text", "seed")
    val got = TextAnalysis.nbQualityScore(docs, "doc_id", "text", col("seed"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(got(1L)._1 > 0 && got(1L)._2 === 1, s"seed-positive doc must score > 0: $got")
    assert(got(3L)._1 < 0 && got(3L)._2 === 0, s"seed-negative doc must score < 0: $got")
    assert(got(1L)._1 > got(5L)._1, "pure positive outscores the mixed doc")
    assert(got(5L)._1 > got(3L)._1, "mixed doc outscores pure negative")
    // every score finite: add-1 smoothing covers terms seen in one class only
    got.values.foreach { case (s, _) => assert(!s.isInfinite && !s.isNaN) }
    // decimal contribution sums: identical under repartition
    val b = TextAnalysis.nbQualityScore(docs.repartition(7), "doc_id", "text", col("seed"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(b === got)
  }

  test("temperatureMix: alpha < 1 upsamples the tail; deterministic under repartition") {
    // head source 900 docs, tail 100: at alpha=0.5 the weights are
    // 30/(30+10)=0.75 vs 0.25, so targets are 150 vs 50 of nTarget=200 —
    // keep-rates 0.166667 (head) vs 0.5 (tail): the tail is upsampled
    // 3x relative to proportional sampling
    val docs = ((1 to 900).map(i => ("head", i.toLong)) ++
      (1 to 100).map(i => ("tail", 1000L + i))).toDF("source", "doc_id")
    val got = TextAnalysis.temperatureMix(docs, "source", "doc_id",
      alpha = 0.5, nTarget = 200, salt = "t")
    val rates = got.groupBy("source").agg(min("mix_rate").as("r"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(rates("head")._1 === 0.166667)
    assert(rates("tail")._1 === 0.5)
    // hash-threshold keeps land near the targets (exact values are pinned
    // by the deterministic hash, bounds just document the regime)
    assert(math.abs(rates("head")._2 - 150) < 30, s"head kept ${rates("head")._2}")
    assert(math.abs(rates("tail")._2 - 50) < 15, s"tail kept ${rates("tail")._2}")
    // identical keep decisions regardless of partitioning
    val again = TextAnalysis.temperatureMix(docs.repartition(13), "source", "doc_id",
      alpha = 0.5, nTarget = 200, salt = "t")
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted ===
      got.select("doc_id").collect().map(_.getLong(0)).sorted)
    // alpha = 1 degenerates to proportional sampling: equal rates
    val prop = TextAnalysis.temperatureMix(docs, "source", "doc_id",
      alpha = 1.0, nTarget = 200, salt = "t")
      .select("mix_rate").distinct().collect()
    assert(prop.length === 1 && prop(0).getDouble(0) === 0.2)
    intercept[IllegalArgumentException] {
      TextAnalysis.temperatureMix(docs, "source", "doc_id", 0.0, 10, "t") }
  }

  test("temperatureMix: a high-cardinality group falls back to a shuffled rate join") {
    // per-domain-scale mixing: when the group count exceeds the broadcast
    // ceiling, the rates table must join UNHINTED (shuffled) instead of
    // broadcasting a driver-melting build side — with identical results.
    val docs = (1 to 500).map(i => (s"domain_$i", i.toLong)).toDF("source", "doc_id")
    val small = TextAnalysis.temperatureMix(docs, "source", "doc_id",
      alpha = 0.5, nTarget = 100, salt = "hc")
    // auto-broadcast off so the plan shows only what the HINT forces —
    // at real scale the stats-driven auto path stays available either way
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val big = TextAnalysis.temperatureMix(docs, "source", "doc_id",
        alpha = 0.5, nTarget = 100, salt = "hc", maxBroadcastGroups = 10)
      val p = big.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin [source"),
        "over-ceiling group cardinality must not broadcast the rates table:\n" + p)
      assert(big.select("doc_id").collect().map(_.getLong(0)).sorted ===
        small.select("doc_id").collect().map(_.getLong(0)).sorted,
        "plan choice must not change the kept set")
    }
  }

  test("pmiCollocations: exclusive pairs outscore promiscuous glue; minCount prunes; deterministic under repartition") {
    // "neural nets" always co-occur exclusively; "the" pairs with everything
    val docs = (
      Seq.fill(6)("neural nets beat the baseline") ++
      Seq.fill(6)("the cat sat on the mat") ++
      Seq.fill(6)("the dog ran past the mat")
    ).map(Tuple1(_)).toDF("text").repartition(4)
    val got = TextAnalysis.pmiCollocations(docs, "text", k = 12, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val top = got.head._3
    // the exclusive pairs tie at the max; every glue pair with "the"
    // scores strictly below them
    assert(got.filter(_._3 == top).exists(_._1 == "neural nets"),
      s"exclusive pair must sit in the top tie group: ${got.toSeq}")
    assert(got.filter(p => p._1.split(" ").contains("the"))
      .forall(_._3 < top), s"glue pairs must score below exclusives: ${got.toSeq}")
    // minCount: a pair seen < 5 times never appears
    assert(got.forall(_._2 >= 5L))
    val again = TextAnalysis.pmiCollocations(docs.repartition(7), "text", k = 12, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq === got.toSeq, "rank must be partitioning-invariant")
  }

  test("fingerprint is order-insensitive over the token bag") {
    val df = Seq("b a c", "c b a", "a b d").toDF("text")
      .select(TextAnalysis.fingerprint(TextAnalysis.tokens($"text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("h60Local (driver-side constant generator) == the engine's h60 expression") {
    val samples = Seq("", "a", "abc", "hp0_63", "mix-v1:123", "Ünïcode ♞", "x" * 100)
    val engine = samples.toDF("s")
      .select(TextAnalysis.h60(col("s"))).collect().map(_.getLong(0)).toSeq
    assert(engine === samples.map(TextAnalysis.h60Local))
  }

  test("jaroWinkler: DuckDB-verified fixtures, codegen == interpreted, null/empty handling") {
    import graft.functions.TextKernels.{jaroWinkler => jw}
    def j(a: String, b: String): Double =
      jw(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // values probed from DuckDB's jaro_winkler_similarity (the oracle)
    val fixtures = Seq(
      ("MARTHA", "MARHTA", 0.9611111111),
      ("DIXON", "DICKSONX", 0.8133333333),
      ("JELLYFISH", "SMELLYFISH", 0.8962962963),
      ("DWAYNE", "DUANE", 0.84),
      ("CRATE", "TRACE", 0.7333333333), // window excludes C/T: m=3
      ("prefix", "prefixxxxxxxxxxxxxxxxxxx", 0.85), // 4-char prefix cap
      ("abcdefgh", "abzzzzzz", 0.5), // below boost threshold: no bonus
      ("ab", "ba", 0.0), // window 0: positional matches only
      ("abc", "abc", 1.0), ("", "abc", 0.0),
      // re-probed against the oracle DuckDB build (v1.0.0, 2026-08-14):
      // jaro_winkler_similarity('','') = 0.0 there (NOT the rapidfuzz
      // 1.0 convention), so the kernel's 0.0 is the aligned value
      ("", "", 0.0))
    fixtures.foreach { case (a, b, want) =>
      assert(math.abs(j(a, b) - want) < 1e-9, s"jw($a, $b)")
      assert(j(a, b) === j(b, a), "symmetry")
    }
    // floored half-transpositions: the abc/bca 3-cycle inside a window
    assert(math.abs(j("abcdef", "bcadef") - 0.9444444444) < 1e-9)
    // the Column API agrees with the kernel (and survives codegen)
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"), (null, "x"))
      .toDF("a", "b")
      .select(graft.functions.TextExprs.jaroWinkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111) < 1e-9)
    assert(math.abs(rows(1).getDouble(0) - 0.7333333333) < 1e-9)
    assert(rows(2).isNullAt(0), "null input -> null similarity")
  }

  test("damerauLevenshtein: full (unrestricted) variant fixtures; transposition beats plain levenshtein by one") {
    import graft.functions.TextKernels.{damerauLevenshtein => dl}
    def d(a: String, b: String): Int =
      dl(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    // DuckDB-probed fixtures; ca/abc = 2 is the canonical full-vs-OSA
    // discriminator (OSA prices it 3)
    val fixtures = Seq(("ca", "abc", 2), ("abcdef", "abcfed", 2),
      ("MARTHA", "MARHTA", 1), ("ab", "ba", 1), ("", "abc", 3),
      ("kitten", "sitting", 3), ("aab", "aba", 1), ("abc", "abc", 0))
    fixtures.foreach { case (a, b, want) =>
      assert(d(a, b) === want, s"dl($a, $b)")
      assert(d(a, b) === d(b, a), "symmetry")
    }
    // randomized sanity vs plain levenshtein: dl <= lev always, and a
    // pure adjacent swap costs exactly 1
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val a = Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString
      val lev = Seq((a, b)).toDF("a", "b")
        .select(levenshtein(col("a"), col("b"))).head.getInt(0)
      assert(d(a, b) <= lev, s"dl must never exceed levenshtein: $a $b")
    }
    val rows = Seq(("smith", "simth"), (null, "x")).toDF("a", "b")
      .select(graft.functions.TextExprs.damerauLevenshtein(col("a"), col("b"))
        .as("d")).collect()
    assert(rows(0).getInt(0) === 1, "adjacent swap costs 1 through the Column API")
    assert(rows(1).isNullAt(0))
  }

  test("winnow: randomized overlap guarantee (shared substring >= k+w-1 shares a hash)") {
    import graft.functions.Winnow
    val rnd = new scala.util.Random(99)
    def randStr(n: Int, alphabet: String) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 40).foreach { _ =>
      val common = randStr(8 + rnd.nextInt(10), "abcdef ")  // >= k + w - 1 = 8
      val a = randStr(rnd.nextInt(12), "uvwxyz") + common + randStr(rnd.nextInt(12), "uvwxyz")
      val b = randStr(rnd.nextInt(12), "mnopqr") + common + randStr(rnd.nextInt(12), "mnopqr")
      val fa = Winnow.winnow(a, 5, 4).toSet
      val fb = Winnow.winnow(b, 5, 4).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared hash for common='$common' a='$a' b='$b'")
    }
  }

  test("DistinctWordShingles kernel == HOF composition on random strings") {
    val rnd = new scala.util.Random(5)
    val alphabet = "ab cd  e"
    val texts = (0 until 60).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = texts.toDF("text")
    val viaHof = df.select(array_distinct(
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    val viaKernel = df.select(
      graft.functions.TextExprs.distinctShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(viaHof === viaKernel)
  }

  test("WordShingles kernel == HOF composition (positional, non-distinct)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab cd  e"
    val texts = (0 until 60).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) :+
      "" :+ "a b" :+ "x x x x x"
    val df = texts.toDF("text")
    val viaHof = df.select(
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    val viaKernel = df.select(
      graft.functions.TextExprs.wordShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(viaHof === viaKernel)
  }

  test("PrefixQGrams kernel == HOF chain (random strings incl. supplementary chars)") {
    val rnd = new scala.util.Random(11)
    // repetitive ASCII (many duplicate grams), accents, and an emoji to
    // exercise the UTF8-binary sort order and code-point indexing
    val alphabet = "aab01xé😀"
    val texts = (0 until 80).map(_ =>
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) :+
      "" :+ "a" :+ "aaaa" :+ "😀😀z"
    val df = texts.toDF("text")
    val q = 2
    val prefixLen = 7
    val viaHof = df.selectExpr(
      s"slice(array_sort(array_distinct(transform(" +
        s"sequence(1, length(text) - ${q - 1}), i -> substring(text, i, $q)))), 1, $prefixLen) AS g")
      .collect().map(r => Option(r.getSeq[String](0)).getOrElse(Seq.empty)).toSeq
    val viaKernel = df.select(
      graft.functions.TextExprs.prefixQGrams(col("text"), q, prefixLen).as("g"))
      .collect().map(_.getSeq[String](0)).toSeq
    // compare only in-domain strings (>= q code points): on shorter input
    // the HOF chain's sequence(1, len-q+1) flips to a DESCENDING range and
    // emits junk — the fuzzy join never calls it there; the kernel must
    // return the sane empty array instead
    viaHof.zip(viaKernel).zip(texts).foreach { case ((h, k), t) =>
      if (t.codePointCount(0, t.length) >= q)
        assert(h === k, s"mismatch for '$t': $h vs $k")
      else
        assert(k.isEmpty, s"kernel must be empty for short '$t': $k")
    }
  }

  test("winnow fingerprint: overlap guarantee, short-text empty, sorted distinct") {
    import graft.functions.Winnow
    // any shared substring of length >= k + w - 1 (= 8) must share a hash
    val a = Winnow.winnow("xxxx COMMON-SEGMENT yyyy", 5, 4).toSet
    val b = Winnow.winnow("zz COMMON-SEGMENT qqqqqq", 5, 4).toSet
    assert(a.intersect(b).nonEmpty)
    // disjoint alphabets -> disjoint fingerprints
    val c = Winnow.winnow("aaaaabbbbbccccc", 5, 4).toSet
    val d = Winnow.winnow("111112222233333", 5, 4).toSet
    assert(c.intersect(d).isEmpty)
    // shorter than k -> empty; case-insensitive; output sorted distinct
    assert(Winnow.winnow("abcd", 5, 4).isEmpty)
    assert(Winnow.winnow("HELLO WORLD", 5, 4).toSeq === Winnow.winnow("hello world", 5, 4).toSeq)
    val s = Winnow.winnow("the quick brown fox jumps over the lazy dog", 5, 4).toSeq
    assert(s === s.distinct.sorted)
  }

  test("packSequences: stripe-tiling fill + greedy bound; deterministic under repartitioning") {
    val docs = (1L to 200L).map(i => (i, 10L + i % 37)).toDF("doc_id", "n_tok")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "n_tok", budget = 100L, buckets = 4)
    val bins = packed.groupBy("pack_bucket", "pack_bin")
      .agg(sum("n_tok").as("tot")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    bins.groupBy(_._1).foreach { case (bk, rows) =>
      // stripe-tiling fill guarantee: bins 0..k jointly cover (k+1)·budget
      val sorted = rows.sortBy(_._2)
      val lastBin = sorted.last._2
      var cum = 0L
      sorted.foreach { case (_, bin, tot) =>
        cum += tot
        if (bin != lastBin)
          assert(cum >= (bin + 1) * 100L,
            s"bucket $bk bins 0..$bin cover only $cum tokens")
      }
      // bins are consecutive stripes — no gaps
      assert(sorted.map(_._2).toSeq === (0L to lastBin).toSeq)
    }
    // greedy start-offset bound: a bin never exceeds budget + one doc
    val maxTok = 10L + 36L
    bins.foreach { case (_, _, tot) => assert(tot < 100L + maxTok) }
    // partition-order independence (window order is (hash, id), not input)
    val packed2 = TextAnalysis.packSequences(
      docs.repartition(7), "doc_id", "n_tok", 100L, 4)
    assert(packed.collect().toSet === packed2.collect().toSet)
    // an oversized doc gets a bin of its own; the stream continues after it
    val big = Seq((1L, 500L), (2L, 10L), (3L, 10L)).toDF("doc_id", "n_tok")
    val bp = TextAnalysis.packSequences(big, "doc_id", "n_tok", 100L, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bp.size === 3)
  }

  test("materializePacks: sequences byte-identical under repartition; counts agree") {
    val docs = (1L to 60L).map(i => (i, s"d$i w$i", 2L)).toDF("doc_id", "text", "n_tok")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "n_tok", budget = 10L, buckets = 2)
    val mat = TextAnalysis.materializePacks(packed, "doc_id", "text", "n_tok")
      .orderBy("pack_bucket", "pack_bin").collect()
    // every doc lands in exactly one sequence; token counts add up
    assert(mat.map(_.getLong(2)).sum === 60L)
    assert(mat.map(_.getLong(3)).sum === 120L)
    // each sequence holds exactly its n_docs texts in pack order
    mat.foreach { r =>
      assert(r.getString(4).split(" ").length === r.getLong(2) * 2,
        s"bin (${r.getInt(0)},${r.getLong(1)}) text/count mismatch")
    }
    // the pack order is recomputed from the hash, so ANY input partitioning
    // concatenates byte-identical sequences
    val mat2 = TextAnalysis.materializePacks(
      TextAnalysis.packSequences(docs.repartition(13), "doc_id", "n_tok", 10L, 2),
      "doc_id", "text", "n_tok").orderBy("pack_bucket", "pack_bin").collect()
    assert(mat.map(_.getString(4)).toSeq === mat2.map(_.getString(4)).toSeq)
  }

  test("DistinctWordShingles kernel == HOF composition (incl. edge cases)") {
    val texts = Seq(
      "a b c d e", "a b  c", "a b", "", "x", "  ", "a a a a",
      "the cat the cat the cat", "one two three one two three",
      "tab\tis one token here", "trailing space ")
    val df = texts.toDF("text")
    val viaHof = df.select(col("text"), array_distinct(
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("sh"))
    val viaKernel = df.select(col("text"),
      graft.functions.TextExprs.distinctShingles(col("text"), 3).as("sh"))
    assert(viaHof.collect().toSeq.map(r => (r.getString(0), r.getSeq[String](1))) ===
      viaKernel.collect().toSeq.map(r => (r.getString(0), r.getSeq[String](1))))
  }

  test("segmentsFixed: non-overlapping chunks, ragged tail, empty-safe") {
    val df = Seq("a b c d e f g", "a b", "").toDF("text")
      .select(TextAnalysis.segmentsFixed(TextAnalysis.tokens($"text"), 3).as("seg"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("a b c", "d e f", "g"))
    assert(rows(1) === Seq("a b"))
    assert(rows(2).isEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.segmentsFixed(TextAnalysis.tokens($"text"), 0)
    }
  }

  test("dsirWeights: target-like docs outrank off-target docs; n_feats counts every gram occurrence") {
    // target distribution = cooking text; raw corpus = cooking + legal
    val raw = Seq(
      (1L, "stir the soup then stir again"),
      (2L, "bake the bread and stir the soup"),
      (3L, "the party of the first part hereby agrees"),
      (4L, "whereas the aforementioned party hereby waives")
    ).toDF("doc_id", "text")
    val target = raw.filter($"doc_id" <= 2L)
    val got = TextAnalysis.dsirWeights(raw, target, "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_feats = unigrams + bigrams = (2n - 1) tokens for an n-token doc
    assert(got(1L)._1 === 11L && got(3L)._1 === 15L)
    val cooking = Set(1L, 2L).map(got(_)._2)
    val legal = Set(3L, 4L).map(got(_)._2)
    assert(cooking.min > legal.max,
      s"every cooking doc must outweigh every legal doc: $got")
    // scores are finite (add-1 smoothing covers target-absent buckets)
    assert(got.values.forall(v => !v._2.isNaN && !v._2.isInfinite))
  }

  test("bigramLogProb: repeated transitions score higher than unique ones; short docs drop") {
    val df = Seq(
      (1L, "a b a b a b a b"),    // one dominant transition
      (2L, "c d e f g h i j"),    // all-unique transitions
      (3L, "solo")                // no bigram positions
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(3L), "a one-token doc has no bigram positions")
    assert(got(1L)._1 === 7L && got(2L)._1 === 7L)
    assert(got(1L)._2 > got(2L)._2,
      s"the repeated a->b transition must outscore unique transitions: $got")
    // self-model equals explicit model of the same corpus
    val explicitModel = TextAnalysis.bigramLogProb(df, "doc_id", "text",
      model = Some(df)).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.view.mapValues(_._2).toMap === explicitModel)
  }

  test("bpePairCounts: pair counts weight by word frequency; eow marker closes every word") {
    val df = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low x2: (l o)(o w)(w </w>); lower x1: (l o)(o w)(w e)(e r)(r </w>)
    assert(got("l o") === 3L && got("o w") === 3L)
    assert(got("w </w>") === 2L)
    assert(got("w e") === 1L && got("e r") === 1L && got("r </w>") === 1L)
    // total pairs = freq * char-count per word: 3*2 + 5
    assert(got.values.sum === 11L)
    intercept[IllegalArgumentException] {
      TextAnalysis.bpePairCounts(df, "text", k = 0) }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpePairCounts(df, "text", eow = "a b") }
    // single-char markers collide with corpus chars, making (char, eow)
    // pairs ambiguous (and the oracle hardcodes '</w>')
    intercept[IllegalArgumentException] {
      TextAnalysis.bpePairCounts(df, "text", eow = "a") }
  }

  test("bpeTrainRules: greedy argmax sequence on a hand-checkable corpus; encode reproduces the train fixpoint") {
    // low x3, lowest x1: round 1 pairs — (l o) 4, (o w) 4, (w </w>) 3,
    // (w e) 1, (e s) 1, (s t) 1, (t </w>) 1; argmax ties (l o)/(o w) at
    // 4 -> 'l o' wins the pair-string tiebreak.
    val df = Seq((1L, "low low low lowest")).toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrainRules(df, "text", nMerges = 3)
    assert(rules.map(m => (m.rank, m.left, m.right, m.n)) === Seq(
      (1, "l", "o", 4L),   // low -> [lo w </w>], lowest -> [lo w e s t </w>]
      (2, "lo", "w", 4L),  // -> [low </w>], [low e s t </w>]
      (3, "low", "</w>", 3L)))
    val enc = TextAnalysis.bpeEncode(df, "text", rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc("low") === Seq("low</w>"))
    assert(enc("lowest") === Seq("low", "e", "s", "t", "</w>"))
  }

  test("bpeMergePass via encode: a==b runs merge greedily left-to-right, non-overlapping") {
    // 'aaaa' -> aa aa </w>; 'aaa' -> aa a </w> (3rd a cannot re-pair)
    val df = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val rules = Seq(TextAnalysis.BpeMerge(1, "a", "a", 0L))
    val enc = TextAnalysis.bpeEncode(df, "text", rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(enc("aaaa") === Seq("aa", "aa", "</w>"))
    assert(enc("aaa") === Seq("aa", "a", "</w>"))
    // exhaustion: a corpus whose words fully merge before nMerges rounds
    // stops early instead of erroring
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val r2 = TextAnalysis.bpeTrainRules(tiny, "text", nMerges = 10)
    assert(r2.size < 10 && r2.nonEmpty)
    assert(TextAnalysis.bpeEncode(tiny, "text", r2)
      .head.getSeq[String](2) === Seq("ab</w>"))
  }

  test("chunkTokens: coverage, overlap, tail, and guard laws") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b c d"),                        // exactly chunkSize
      (3L, "a b c d e"),                      // chunkSize + 1
      (4L, " "),                              // zero tokens
      (5L, "solo")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text",
        chunkSize = 4, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // doc 1: step=2, nChunks=ceil((10-2)/2)=4 -> starts 0,2,4,6
    val c1 = byDoc(1L).map(_.getString(2)).toSeq
    assert(c1 === Seq("t1 t2 t3 t4", "t3 t4 t5 t6",
      "t5 t6 t7 t8", "t7 t8 t9 t10"))
    // consecutive chunks share exactly `overlap` tokens
    c1.sliding(2).foreach { w =>
      assert(w(0).split(" ").takeRight(2).toSeq ===
        w(1).split(" ").take(2).toSeq)
    }
    // coverage: chunk 0 + each later chunk minus its overlap == the doc
    val rebuilt = c1.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ").toSeq
      if (i == 0) toks else toks.drop(2)
    }
    assert(rebuilt === (1 to 10).map("t" + _))
    // n == chunkSize -> ONE chunk (the naive start<n rule would emit a
    // redundant second chunk that is a strict suffix of the first)
    assert(byDoc(2L).map(_.getString(2)).toSeq === Seq("a b c d"))
    // one extra token -> short overlap-anchored tail
    assert(byDoc(3L).map(_.getString(2)).toSeq === Seq("a b c d", "c d e"))
    assert(byDoc(3L).last.getInt(3) === 3) // n_chunk_tokens of the tail
    // zero tokens emit nothing; one token is its own chunk
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).map(_.getString(2)).toSeq === Seq("solo"))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, "doc_id", "text", 4, 4) }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, "doc_id", "text", 0, 0) }
  }

  test("nfc_normalize / strip_accents: compose, strip, ASCII fast path, null-safe") {
    import graft.functions.TextExprs
    val df = Seq(
      Tuple1("cafe\u0301"),       // decomposed: NFC must compose
      Tuple1("caf\u00e9"),        // composed: NFC identity, strip decomposes
      Tuple1("man\u0303ana u\u0308ber c\u0327a"), // decomposed tilde/diaeresis/cedilla
      Tuple1("stra\u00dfe \u00f8re"), // eszett and o-slash have no decomposition
      Tuple1("plain ascii"),
      Tuple1(null.asInstanceOf[String])
    ).toDF("s").select(col("s"),
      TextExprs.nfcNormalize(col("s")).as("n"),
      TextExprs.stripAccents(col("s")).as("a"),
      length(col("s")).as("lr"), length(col("n")).as("ln"))
    val r = df.collect()
    assert(r(0).getString(1) === "caf\u00e9" && r(0).getInt(4) === 4
      && r(0).getInt(3) === 5)
    assert(r(1).getString(1) === "caf\u00e9") // already NFC
    // strip works on BOTH forms (NFD internally), composed included
    assert(r(0).getString(2) === "cafe" && r(1).getString(2) === "cafe")
    assert(r(2).getString(1) === "ma\u00f1ana \u00fcber \u00e7a")
    assert(r(2).getString(2) === "manana uber ca")
    // no decomposition -> both kernels pass through
    assert(r(3).getString(1) === "stra\u00dfe \u00f8re"
      && r(3).getString(2) === "stra\u00dfe \u00f8re")
    assert(r(4).getString(1) === "plain ascii"
      && r(4).getString(2) === "plain ascii")
    assert(r(5).isNullAt(1) && r(5).isNullAt(2))
    // idempotence of NFC on every non-null row
    val again = df.filter(col("s").isNotNull)
      .select(TextExprs.nfcNormalize(col("n")) === col("n")).collect()
    assert(again.forall(_.getBoolean(0)))
  }

  test("stripMarkup: blocks eaten whole, tags spaced, entities decoded one level, ws collapsed") {
    def strip(s: String): String =
      Seq(Tuple1(s)).toDF("h")
        .select(TextAnalysis.stripMarkup(col("h"))).head.getString(0)
    // script/style bodies vanish WITH their content — including '<' in code
    assert(strip("""a<script>if (1 < 2) alert("&amp;")</script>b""") === "a b")
    assert(strip("<style>.x{color:red}</style>text") === "text")
    assert(strip("<!-- <p>not text</p> -->only") === "only")
    // tags become separators, never concatenators
    assert(strip("<p>one</p><p>two</p>") === "one two")
    // entities: one decode level; &amp;lt; means the LITERAL string &lt;
    assert(strip("x &lt;tag&gt; &quot;q&quot; &#39;a&#39; &amp; y") ===
      """x <tag> "q" 'a' & y""")
    assert(strip("&amp;lt;") === "&lt;")
    // a decoded '<' is NOT re-parsed as markup (decode runs after strip)
    assert(strip("&lt;script&gt;evil()&lt;/script&gt;") ===
      "<script>evil()</script>")
    // whitespace collapse + trim
    assert(strip("  a\n\n<b>  c\t</b> ") === "a c")
  }
}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val nearDups = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // 1-token diff
    (3L, "completely different words about spark query engines and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup: representative min id + multiplicity") {
    val out = Dedup.exact(nearDups, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(nearDups, "doc_id", "text", minJaccard = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup -> jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashLshAgainst: cross-corpus pairs only, == the self-join restricted to the cut") {
    // new batch = docs 1,3; corpus = docs 2,4. The cross-corpus result must
    // be exactly the self-join pairs that CROSS the cut (reoriented
    // new -> corpus), with the same jaccard values — and never pair two
    // corpus docs (2,4 side) or two new docs with each other.
    val newDocs = nearDups.filter($"doc_id".isin(1L, 3L))
    val corpus = nearDups.filter($"doc_id".isin(2L, 4L))
    val got = Dedup.minhashLshAgainst(newDocs, corpus, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val self = Dedup.minhashLsh(nearDups, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossCut = self.collect {
      case (a, b, j) if Set(1L, 3L)(a) && Set(2L, 4L)(b) => (a, b, j)
      case (a, b, j) if Set(1L, 3L)(b) && Set(2L, 4L)(a) => (b, a, j)
    }.toSet
    assert(got === crossCut)
    assert(got.contains((1L, 4L, 1.0)), "exact dup across the cut")
    assert(got.forall { case (a, b, _) => Set(1L, 3L)(a) && Set(2L, 4L)(b) })
  }

  test("pageRank: hub of a symmetric star outranks leaves; ranks ~sum to 1; partition-invariant") {
    // star: hub 0 <-> leaves 1..6, symmetrized
    val one = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L)))
    val edges = one.toDF("src", "dst").repartition(4)
    val pr = graft.ext.Graph.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(pr(0L) > pr(1L) * 2, s"hub must dominate: $pr")
    assert((1L to 6L).map(pr).distinct.size === 1, "leaves are symmetric")
    val total = pr.values.sum
    assert(math.abs(total - 1.0) < 1e-3, s"no dangling mass -> ranks ~sum to 1: $total")
    val again = graft.ext.Graph.pageRank(edges.repartition(7), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(again === pr, "iterated ranks must be partitioning-invariant")
    intercept[IllegalArgumentException] {
      graft.ext.Graph.pageRank(edges, iters = 0) }
  }

  test("personalizedPageRank: mass stays near the seed; disconnected components score 0; disjoint seeds fail loudly") {
    // two components: seed-side star 0<->1..3, far component 10<->11
    val one = (1L to 3L).flatMap(l => Seq((0L, l), (l, 0L))) ++ Seq((10L, 11L), (11L, 10L))
    val edges = one.toDF("src", "dst").repartition(3)
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val pr = graft.ext.Graph.personalizedPageRank(edges, seeds, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(pr(1L) > 3 * pr(2L),
      s"the seed leaf must far outrank the symmetric non-seed leaves: $pr")
    assert(pr(0L) > pr(1L),
      s"the hub drains every seed round-trip and tops the component: $pr")
    assert(pr(2L) === pr(3L), "non-seed leaves are symmetric")
    assert(pr(10L) === 0.0 && pr(11L) === 0.0,
      s"unreachable component must converge to zero: $pr")
    intercept[IllegalArgumentException] {
      graft.ext.Graph.personalizedPageRank(edges,
        Seq(Tuple1(99L)).toDF("node"), iters = 5) }
  }

  test("triangleCounts: == brute-force enumeration on random graphs; star has zero; orientation-invariant") {
    // K4 plus a pendant: each K4 node sits in C(3,2)=3 triangles, the
    // pendant in none.
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val tri = graft.ext.Graph.triangleCounts(
        (k4 :+ (3L, 9L)).toDF("src", "dst").repartition(3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(tri(_) === 3L), s"K4 nodes: $tri")
    assert(tri(9L) === 0L, "pendant node closes nothing")
    // star: hub never forms a triangle
    val star = (1L to 6L).map(l => (0L, l)).toDF("src", "dst")
    assert(graft.ext.Graph.triangleCounts(star)
      .agg(sum("n_tri")).head.getLong(0) === 0L)
    // random graph vs brute force; duplicate + reversed edges tolerated
    val rnd = new scala.util.Random(7)
    val es = (1 to 120).map(_ => (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    val dfE = (es ++ es.map(_.swap)).toDF("src", "dst").repartition(5)
    val got = graft.ext.Graph.triangleCounts(dfE)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = es.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Set(e._1, e._2))
    val brute = nodes.map { n =>
      n -> nodes.subsets(2).count { s =>
        val Seq(x, y) = s.toSeq
        und(math.min(x, n) -> math.max(x, n)) &&
          und(math.min(y, n) -> math.max(y, n)) &&
          und(math.min(x, y) -> math.max(x, y)) && x != n && y != n
      }.toLong
    }.toMap
    assert(got === brute, "degree-oriented counts must equal brute force")
  }

  test("kCore: cycle survives the 2-core peel, tail chain peels away in cascade; cap contract trips loudly") {
    // triangle 0-1-2 with a pendant chain 2-3-4: the chain must peel in
    // CASCADE (4 first, then 3), proving the iteration, while the
    // triangle survives
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = graft.ext.Graph.kCore(edges.repartition(3), k = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(0L -> true, 1L -> true, 2L -> true,
      3L -> false, 4L -> false), s"2-core of triangle+chain: $got")
    // k=3: the whole graph peels to empty, and every node still reports
    val none = graft.ext.Graph.kCore(edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(none.size === 5 && none.values.forall(_ == false))
    // a long chain needs one peel round per link — cap 1 must trip
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      graft.ext.Graph.kCore(chain, k = 2, maxIters = 1)
    }
  }

  test("allPairsExact property: == brute-force exact join on random corpora; prefix filter prunes") {
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docs = (1 to 60).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(18))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text").repartition(5)
    val got = Dedup.allPairsExact(docs, "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute ground truth: every shingle-sharing pair, exact jaccard
    val sh = Dedup.shingled(docs, "doc_id", "text")
    val brute = Dedup.verifyJaccard(
        sh.select($"doc_id".as("doc_a"), $"sh")
          .join(sh.select($"doc_id".as("doc_b"), $"sh"), "sh")
          .filter($"doc_a" < $"doc_b").select("doc_a", "doc_b").distinct(), sh)
      .filter($"jaccard" >= 0.4)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute, "prefix filtering must be output-invisible")
    intercept[IllegalArgumentException] {
      Dedup.allPairsExact(docs, "doc_id", "text", minJaccard = 1.0) }

    // cross-corpus form == the self-join restricted to the cut
    val newSide = docs.filter($"doc_id" <= 30)
    val corpSide = docs.filter($"doc_id" > 30)
    val against = Dedup.allPairsExactAgainst(newSide, corpSide,
        "doc_id", "text", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val crossCut = brute.collect {
      case (a, b, j) if a <= 30 && b > 30 => (a, b, j)
      case (a, b, j) if b <= 30 && a > 30 => (b, a, j)
    }
    assert(against === crossCut,
      "cross-corpus exact must equal the self-join pairs crossing the cut")
  }

  test("simhash: identical docs get identical signatures; near dups are close") {
    val sig = Dedup.simhash(nearDups, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sig(1L) === sig(4L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
  }

  test("minhash band-key kernel property: matches the aggregation formulation; sub-k docs drop") {
    val rnd = new scala.util.Random(29)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ümlaut")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" "))
    } :+ (99L, "one two") :+ (98L, "") // < k tokens -> no band keys
    val df = docs.toDF("doc_id", "text")
    val direct = Dedup.bandKeysDirect(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaAgg = Dedup.bandKeys(Dedup.minhashSignatures(Dedup.shingled(df, "doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(direct === viaAgg)
    assert(!direct.exists(t => t._1 == 99L || t._1 == 98L))
    assert(direct.exists(_._1 == 1L) || docs(0)._2.split(" ").count(_.nonEmpty) < 3)
  }

  test("simhash kernel property: matches the vote-aggregation reference; token-less docs drop") {
    // Driver-side reference: tf-weighted (equivalently per-occurrence)
    // ±1 votes over h60Local bits, sign readout — the aggregation
    // formulation the kernel replaced.
    def reference(text: String): Option[Long] = {
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) return None
      val votes = new Array[Int](60)
      for (t <- toks; h = TextAnalysis.h60Local(t); j <- 0 until 60)
        votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
      Some((0 until 60).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s))
    }
    val rnd = new scala.util.Random(13)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "Ünïcode", "longish-token")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    } :+ (99L, "") :+ (98L, "   ")
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.flatMap { case (id, t) => reference(t).map(id -> _) }.toMap
    assert(got === want)
    assert(!got.contains(99L) && !got.contains(98L))
  }

  test("simhashNearDup: banded candidates + exact hamming verify == brute force") {
    val got = Dedup.simhashNearDup(nearDups, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference over the signatures
    val sig = Dedup.simhash(nearDups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (ida, sa) <- sig; (idb, sb) <- sig if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ida, idb, h)).toSet
    assert(got === expected)
    assert(got.contains((1L, 4L, 0))) // exact dup: hamming 0
  }

  test("contamination: exact shingle-overlap fraction against the train side") {
    val test = Seq((1L, "the quick brown fox jumps high"), // 4 shingles, 2 in train
      (2L, "totally novel eval content here now")).toDF("doc_id", "text") // 0 hits
    val train = Seq((10L, "the quick brown fox runs away")).toDF("doc_id", "text")
    val got = Dedup.contamination(test, train, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1: shingles {the quick brown, quick brown fox, brown fox jumps,
    // fox jumps high}; train has {the quick brown, quick brown fox, ...}
    assert(got(0) === ((1L, 4L, 2L, 0.5)))
    assert(got(1) === ((2L, 4L, 0L, 0.0)))
  }

  test("contamination hot-shingle guard drops boilerplate above the train-df cap") {
    // Every train doc shares the same license-header shingle chain
    // ("all rights reserved ..."); only doc 20 shares REAL content with the
    // eval doc. Unguarded, the boilerplate counts as contamination for
    // eval doc 2; with maxTrainDf below the boilerplate's df (4 docs), only
    // the genuine overlap remains.
    val boiler = "all rights reserved by owner"
    val train = Seq(
      (10L, s"$boiler alpha beta"), (11L, s"$boiler gamma delta"),
      (12L, s"$boiler epsilon zeta"), (13L, s"$boiler eta theta"),
      (20L, "unique shared payload content here")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "unique shared payload content here"), // 3 shingles, all in doc 20
      (2L, s"$boiler")).toDF("doc_id", "text")    // 3 shingles, boilerplate only
    def run(cap: Option[Long]) = Dedup.contamination(
        test, train, "doc_id", "text", maxTrainDf = cap)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // boilerplate shingles ("all rights reserved" etc.) sit in 4 train docs
    val unguarded = run(None)
    assert(unguarded(0) === ((1L, 3L, 3L, 1.0)))
    assert(unguarded(1) === ((2L, 3L, 3L, 1.0)), "unguarded: boilerplate counts as hits")
    val guarded = run(Some(3L))
    assert(guarded(0) === ((1L, 3L, 3L, 1.0)), "guard must not touch genuine low-df overlap")
    assert(guarded(1) === ((2L, 3L, 0L, 0.0)), "guard must zero out boilerplate-only overlap")
    // cap at exactly the boilerplate df keeps it (guard drops STRICTLY above)
    assert(run(Some(4L))(1) === ((2L, 3L, 3L, 1.0)))

    // RELATIVE cap: 5 train docs, frac 0.6 -> cap ceil(3) == absolute 3;
    // frac 0.8 -> cap 4 keeps the boilerplate. Same rows as the absolute
    // runs, so the cap's meaning tracks corpus size instead of drifting.
    def runFrac(f: Double) = Dedup.contamination(
        test, train, "doc_id", "text", maxTrainDfFrac = Some(f))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(runFrac(0.6).toSeq === guarded.toSeq)
    assert(runFrac(0.8)(1) === ((2L, 3L, 3L, 1.0)))
    val e = intercept[IllegalArgumentException](Dedup.contamination(
      test, train, "doc_id", "text", maxTrainDf = Some(3L), maxTrainDfFrac = Some(0.5)))
    assert(e.getMessage.contains("at most one"))
  }

  test("connectedComponents: min-label over chained pairs, disjoint clusters kept apart") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4 (never a direct 1-4 pair),
    // {7,9}, and node 5 paired with itself-only edge 5-6
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents: reliable checkpointDir variant == localCheckpoint result") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    // maxDriverEdges = 0 forces the distributed loop — the snapshot
    // management under test only exists there.
    val result = Dedup.connectedComponents(pairs, checkpointDir = Some(dir),
      maxDriverEdges = 0L)
    val got = result.as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L, 5L -> 5L, 6L -> 5L))
    // Managed cleanup: a long run must not accumulate one snapshot per
    // round — after the call only the FINAL label snapshot (which backs
    // the returned DataFrame) may remain; edges + intermediate rounds are
    // deleted as soon as their successor materializes.
    val left = new java.io.File(dir).list().toSeq
    assert(left.count(_.startsWith("graft-cc-labels-")) === 1,
      s"exactly the final label snapshot should remain, got: $left")
    assert(!left.exists(_.contains("edges")), s"edge snapshot must be deleted: $left")
    // the survivor still backs the result
    assert(result.count() === 8)
    // The small-graph fast path with a checkpointDir leaves NOTHING behind:
    // its edge snapshot is deleted once union-find has consumed it.
    val dir2 = java.nio.file.Files.createTempDirectory("cc-ckpt-fast").toString
    val fast = Dedup.connectedComponents(pairs, checkpointDir = Some(dir2))
    assert(fast.as[(Long, Long)].collect().toMap === got)
    assert(new java.io.File(dir2).list().toSeq.isEmpty,
      "fast path must clean its edge snapshot")
  }

  test("connectedComponents: driver fast path == distributed loop, all hop widths") {
    // A messy graph: chains (deep paths), a star, singleton-pair edges,
    // duplicate and reversed pairs — seeded, 200 edges over ~120 nodes.
    val rnd = new scala.util.Random(42)
    val edges = Seq.tabulate(200) { i =>
      if (i % 3 == 0) (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      else if (i % 3 == 1) (i.toLong, (i + 1).toLong)           // chain segments
      else (200L + rnd.nextInt(5), 300L + rnd.nextInt(40))      // star-ish bipartite
    }
    val pairs = edges.toDF("doc_a", "doc_b")
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val dist1 = Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    val dist3 = Dedup.connectedComponents(pairs, maxDriverEdges = 0L, hopsPerRound = 3)
      .as[(Long, Long)].collect().toMap
    assert(dist1 === fast)
    assert(dist3 === fast)
  }

  test("lineDedup deletes ALL occurrences of repeated segments, keeps order") {
    // segments are whole-text lines here (split on \n, the real-corpus mode)
    val docs = Seq(
      (1L, "unique alpha\nshared boilerplate\nunique beta"),
      (2L, "shared boilerplate\nunique gamma"),
      (3L, "only unique content here")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", split($"text", "\n"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 3L, 2L, "unique alpha unique beta"))) // both copies of the shared line gone
    assert(out(1) === ((2L, 2L, 1L, "unique gamma")))
    assert(out(2) === ((3L, 1L, 1L, "only unique content here")))
  }

  test("lineDedup: doc of only repeated segments keeps empty text; minCount honored") {
    val docs = Seq(
      (1L, "dup line"), (2L, "dup line"), (3L, "dup line")
    ).toDF("doc_id", "text")
    val all = Dedup.lineDedup(docs, "doc_id", split($"text", "\n"))
      .orderBy("doc_id").collect()
    assert(all.forall(r => r.getLong(2) === 0L && r.getString(3) === ""))
    // minCount=4: tripled line survives
    val loose = Dedup.lineDedup(docs, "doc_id", split($"text", "\n"), minCount = 4)
      .orderBy("doc_id").collect()
    assert(loose.forall(r => r.getLong(2) === 1L && r.getString(3) === "dup line"))
    intercept[IllegalArgumentException] {
      Dedup.lineDedup(docs, "doc_id", split($"text", "\n"), minCount = 1)
    }
  }

  test("duplicatedSpans property: random tiny-alphabet corpora == brute-force reference") {
    import org.scalacheck.Gen
    var seed = org.scalacheck.rng.Seed(11L)
    val k = 2; val minSpan = 3
    val docGen = Gen.listOfN(8,
      Gen.listOfN(10, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    (0 until 25).foreach { _ =>
      docGen.apply(Gen.Parameters.default, seed).foreach { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        // brute force: global k-gram window counts, per-doc maximal runs
        val wins = docs.flatMap { case (id, t) =>
          t.split(" ").filter(_.nonEmpty).sliding(k).filter(_.size == k)
            .zipWithIndex.map { case (w, pos) => (id, pos, w.mkString(" ")) }
        }
        val freq = wins.groupBy(_._3).map { case (w, xs) => w -> xs.size }
        val want = docs.flatMap { case (id, _) =>
          val dupPos = wins.filter(x => x._1 == id && freq(x._3) >= 2).map(_._2).sorted
          if (dupPos.isEmpty) None
          else {
            val runs = dupPos.foldLeft(List.empty[List[Int]]) {
              case (acc @ (h :: rest), p) if h.head == p - 1 => (p :: h) :: rest
              case (acc, p) => List(p) :: acc
            }.map(_.size)
            val span = runs.max + k - 1
            if (span >= minSpan) Some((id, dupPos.size.toLong, span.toLong)) else None
          }
        }.sortBy(_._1)
        val got = Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
            k = k, minSpan = minSpan)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === want, s"texts=$texts")
      }
      seed = seed.next
    }
  }

  test("keepBest: highest priority survives, min id on ties, one keeper per cluster") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_rep")
    val pri = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.keepBest(clusters, pri, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // cluster 1: docs 2 and 3 tie at priority 9 -> min id 2 survives
    assert(got === Map(1L -> false, 2L -> true, 3L -> false,
      10L -> true, 11L -> false))
  }

  test("keepBest: string doc ids work (tie -> lexicographic min id); non-numeric priority is loud") {
    val clusters = Seq(("a", "a"), ("b", "a"), ("c", "a"))
      .toDF("doc_id", "cluster_rep")
    val pri = Seq(("a", 1.5), ("b", 2.5), ("c", 2.5)).toDF("doc_id", "score")
    val got = Dedup.keepBest(clusters, pri, "doc_id", "score")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(got === Map("a" -> false, "b" -> true, "c" -> false))
    val badPri = Seq(("a", "x")).toDF("doc_id", "rank_name")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBest(clusters, badPri, "doc_id", "rank_name") }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("duplicatedSpans finds cross-doc spans, honors minSpan, counts self-repeats") {
    // docs 1 and 2 share the 6-token span "a b c d e f" (4 duplicated
    // 3-gram windows -> span 4 + 2 = 6); doc 3 is clean; doc 4 repeats its
    // own phrase twice (self-repetition counts, as in ExactSubstr)
    val docs = Seq(
      (1L, "a b c d e f x1 y1 z1"),
      (2L, "p q a b c d e f r s"),
      (3L, "one two three four five six seven"),
      (4L, "w1 u v w u v w w2 w3")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3, minSpan = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 4's "u v w" occurs twice -> two duplicated windows, but they are
    // NOT consecutive starts (positions 1 and 4): islands of 1 -> span 3,
    // filtered by minSpan=5
    assert(got.toSeq === Seq((1L, 4L, 6L), (2L, 4L, 6L)))
    // minSpan=3 lets doc 4's isolated windows through
    val loose = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3, minSpan = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(loose.toSeq === Seq((1L, 4L, 6L), (2L, 4L, 6L), (4L, 2L, 3L)))
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3, minSpan = 2) }
  }

  test("connectedComponents: empty pair set -> empty output; long path converges") {
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).isEmpty)
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      maxDriverEdges = 0L).isEmpty)
    // a 12-node path exercises >1 propagate+compress round of the
    // DISTRIBUTED loop (forced — the default would take the driver path)
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(path, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 12 && got.values.forall(_ == 1L))
  }

  test("noveltyScore: boilerplate-heavy docs score high, unique docs zero, short docs drop") {
    val boiler = "click here to subscribe to our newsletter"
    val docs = Seq(
      (1L, s"$boiler and also some words about cats"),
      (2L, s"$boiler and also some words about dogs"),
      (3L, "entirely original prose concerning migratory seabirds today"),
      (4L, "too short")  // < 3 tokens -> no shingles
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(4L), "a doc below the shingle width has no score")
    assert(got(3L)._2 === 0L && got(3L)._3 === 0.0, "unique doc shares nothing")
    // docs 1/2 share the 7-token boilerplate prefix + 'and also some words
    // about' continuation: every shingle up to the last two is shared
    assert(got(1L)._3 > 0.7 && got(2L)._3 > 0.7,
      s"boilerplate docs must flag as mostly-shared: $got")
    assert(got(1L)._2 < got(1L)._1, "the cat/dog tails are NOT shared")
  }

  test("incremental novelty: merged per-batch states == the from-scratch rebuild, any batch split") {
    val boiler = "click here to subscribe to our newsletter"
    val docs = Seq(
      (1L, s"$boiler and also some words about cats"),
      (2L, s"$boiler and also some words about dogs"),
      (3L, "entirely original prose concerning migratory seabirds today"),
      (5L, s"$boiler appears here a third time entirely"),
      (6L, "more unique material on deep sea vents")
    ).toDF("doc_id", "text")
    val rebuild = Dedup.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // two different disjoint splits, including a 3-way one — counters add
    for (splits <- Seq(
      Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 =!= 0)),
      Seq(docs.filter($"doc_id" <= 2), docs.filter($"doc_id" === 3L),
        docs.filter($"doc_id" >= 5)))) {
      val state = Dedup.noveltyMergeState(
        splits.map(Dedup.noveltyState(_, "doc_id", "text")))
      val inc = Dedup.noveltyScoreWith(docs, state, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(inc === rebuild, s"increment must equal rebuild: $inc")
    }
    // the state itself is the df table: boilerplate shingles reach df 3
    val full = Dedup.noveltyState(docs, "doc_id", "text")
    assert(full.agg(max("df")).head.getLong(0) === 3L)
    intercept[IllegalArgumentException] { Dedup.noveltyMergeState(Nil) }
  }

  test("CdcChunks kernel == the cut-rule reference on random and edge-case docs") {
    // driver-side reference of the exact cut rule (h60Local is pinned
    // equal to the engine's h60 expression elsewhere)
    def ref(text: String, k: Int = 3, m: Int = 8): Seq[String] = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val n = toks.length
      if (n == 0) Seq.empty
      else {
        val cuts = (2 to n - k + 1).filter { p =>
          TextAnalysis.h60Local(toks.slice(p - 1, p - 1 + k).mkString(" ")) % m == 0 }
        val starts = 1 +: cuts
        val ends = cuts.map(_ - 1) :+ n
        starts.zip(ends).map { case (s, e) => toks.slice(s - 1, e).mkString(" ") }
      }
    }
    val texts = Seq("", "one", "a b", "a b c", "x  y   z",
      (1 to 200).map(i => "t" + (i * 13 % 89)).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.cdcChunks(df, "doc_id", "text")
      .orderBy("doc_id", "chunk_pos").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = ref(t)
      if (want.isEmpty) assert(!got.contains(i.toLong), s"doc $i ('$t') must emit no chunks")
      else assert(got(i.toLong) === want, s"doc $i ('${t.take(30)}')")
    }
  }

  test("cdcChunks: chunks reassemble the doc; boundaries re-align after an early insertion") {
    val aToks = (1 to 150).map(i => "w" + (i * i % 101))
    val a = Seq((1L, aToks.mkString(" "))).toDF("doc_id", "text")
    val chA = Dedup.cdcChunks(a, "doc_id", "text")
      .orderBy("chunk_pos").collect().map(_.getString(2))
    assert(chA.mkString(" ") === aToks.mkString(" "),
      "chunks must reassemble the document exactly")
    assert(chA.length > 3, s"expected several content-defined cuts, got ${chA.length}")
    // prepend junk: every A-chunk after A's first cut survives verbatim —
    // the re-alignment property fixed-width segmentation lacks (one
    // insertion re-phases every later fixed window)
    val b = Seq((2L, "x1 x2 x3 x4 x5 x6 x7 " + aToks.mkString(" ")))
      .toDF("doc_id", "text")
    val chB = Dedup.cdcChunks(b, "doc_id", "text")
      .orderBy("chunk_pos").collect().map(_.getString(2)).toSet
    assert(chA.drop(1).forall(chB.contains),
      "CDC boundaries must re-align after an early insertion")
    // empty docs yield no chunks; short docs yield one whole-doc chunk
    val edge = Seq((3L, ""), (4L, "just two")).toDF("doc_id", "text")
    val chE = Dedup.cdcChunks(edge, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2))
    assert(chE.toSeq === Seq(4L -> "just two"))
    intercept[IllegalArgumentException] {
      Dedup.cdcChunks(a, "doc_id", "text", modulus = 1) }
    intercept[IllegalArgumentException] {
      Dedup.cdcChunks(a, "doc_id", "text", k = 0) }
  }

  test("cdcDupProfile: a shared block collides chunk-for-chunk despite different prefixes") {
    val shared = (1 to 80).map(i => "s" + (i * 7 % 59)).mkString(" ")
    val df = Seq(
      (1L, "aa bb cc " + shared),
      (2L, "dd ee " + shared),
      (3L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    val got = Dedup.cdcDupProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._2 > 0 && got(2L)._2 > 0,
      s"the shared block must collide chunk-for-chunk: $got")
    assert(got(3L)._2 === 0L && got(3L)._3 === 0.0, "unique doc shares nothing")
    assert(got.values.forall { case (n, d, f) => d <= n && f >= 0.0 && f <= 1.0 })
    // the transform: shared chunks are cut from BOTH carriers despite the
    // different prefixes; the unique doc survives byte-identical
    val ded = Dedup.cdcDedupText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(ded(3L)._3 === "zz yy xx ww vv uu tt ss rr qq",
      s"unique doc must reassemble untouched: ${ded(3L)}")
    assert(ded(1L)._2 < ded(1L)._1 && ded(2L)._2 < ded(2L)._1,
      s"carriers must lose their shared chunks: $ded")
    assert(ded(1L)._3.startsWith("aa bb cc"),
      "each carrier keeps its unique junction prefix")
    intercept[IllegalArgumentException] {
      Dedup.cdcDedupText(df, "doc_id", "text", minDocs = 1) }
  }
}

class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(0.1f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  private val probes = corpus.filter($"vec_id" === 0L)
    .select($"vec_id".as("probe_id"), $"embedding".as("p_embedding"))

  test("mutualKnnCells: symmetric filter drops one-way hub links; cell-local; partition-invariant") {
    val vs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.99f, 0.1f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(0.1f, 0.99f), 0),
      (4L, Array(0.7f, 0.7f), 0)
    ).toDF("vec_id", "embedding", "cell")
    def edges(df: org.apache.spark.sql.DataFrame, k: Int) =
      SimSearch.mutualKnnCells(df, k).select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k=1: the tight pairs are mutual; the hub's one-way link to v1 is not
    assert(edges(vs, 1) === Set((0L, 1L), (2L, 3L)))
    // k=2: v4 enters everyone's second slot and its own top-2 reciprocate
    assert(edges(vs, 2).contains((1L, 4L)) || edges(vs, 2).contains((3L, 4L)))
    assert(edges(vs.repartition(7), 1) === edges(vs, 1),
      "heap ranking must be partition-invariant")
    // cells bound the candidate set: splitting the pairs into different
    // cells leaves pair edges intact and keeps cross-cell pairs invisible
    val split = vs.withColumn("cell", when(col("vec_id") < 2, 0).otherwise(1))
    assert(edges(split, 1) === Set((0L, 1L), (2L, 3L)))
    intercept[IllegalArgumentException] { SimSearch.mutualKnnCells(vs, 0) }
  }

  test("IVF index persistence: search against the written index == direct knnIvf; assignNew ties to smallest cell") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    try {
      val big = (0 until 40).map { i =>
        val base = if (i % 2 == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
        (i.toLong, Array(base(0) + i * 0.001f, base(1)), i % 2)
      }.toDF("vec_id", "embedding", "label")
      SimSearch.writeIvfIndex(big, dir, cells = 2, iters = 2)
      // cell-partitioned layout on disk
      assert(new java.io.File(s"$dir/vectors").listFiles()
        .count(_.getName.startsWith("cell=")) === 2)
      val (vecs, cents) = SimSearch.readIvfIndex(spark, dir)
      val p = big.filter($"vec_id" === 0L)
        .select($"vec_id".as("probe_id"), $"embedding".as("p_embedding"))
      val viaIndex = SimSearch.knnIvfWith(p, vecs, cents, k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      val assigned = SimSearch.kmeansAssign(big, k = 2, iters = 2).select("vec_id", "cell")
      val direct = SimSearch.knnIvf(p, big.select("vec_id", "embedding")
        .join(assigned, "vec_id"), "cell", k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      assert(viaIndex.toSet === direct.toSet)
      // assignNew: an equidistant vector ties to the SMALLEST cell
      val tied = Seq((99L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
      val twoCells = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cell", "centroid")
      val got = SimSearch.assignNew(tied, twoCells).head()
      assert(got.getInt(1) === 0, "cos tie must break to the smallest cell")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("int8 quantization: codes bounded, roundtrip error within half a step, exhaustive refine == brute") {
    import org.apache.spark.sql.functions._
    val big = (0 until 40).map { i =>
      (i.toLong, Array(math.sin(i * 0.7).toFloat, math.cos(i * 1.3).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val (mins, maxs) = SimSearch.quantizeStats(big)
    assert(mins.length === 2 && (0 until 2).forall(i => mins(i) <= maxs(i)))
    val q = SimSearch.quantizeVectors(big, mins, maxs)
    assert(q.schema("qcode").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    // every code in [-127, 127]; dequantized value within half a
    // quantization step of the original
    val steps = (0 until 2).map(i => (maxs(i) - mins(i)) / 254.0)
    val codes = q.join(big, "vec_id").select("vec_id", "qcode", "embedding")
      .collect().map(r => (r.getSeq[Byte](1), r.getSeq[Float](2)))
    codes.foreach { case (cs, xs) =>
      cs.indices.foreach { i =>
        assert(math.abs(cs(i)) <= 127)
        val dq = mins(i) + (cs(i) + 127.0) * (maxs(i) - mins(i)) / 254.0
        assert(math.abs(dq - xs(i)) <= steps(i) / 2 + 1e-9,
          s"dim $i: dequant $dq vs ${xs(i)} exceeds half-step ${steps(i) / 2}")
      }
    }
    // exhaustive refine (k*refine >= corpus) makes the approx scan a
    // pass-through: quantized search == brute force exactly
    val p = big.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_embedding"))
    val brute = SimSearch.knnBrute(p, big, k = 5).collect().toSeq
    val quant = SimSearch.knnQuantized(p, big, k = 5, refine = 8).collect().toSeq
    assert(quant.toSet === brute.toSet,
      s"exhaustive-refine quantized search must equal brute (steps=$steps)")
    // modest refine still recovers top-1 on this well-separated corpus
    val top1 = SimSearch.knnQuantized(p, big, k = 1, refine = 2).collect()
    val bruteTop1 = SimSearch.knnBrute(p, big, k = 1).collect()
    assert(top1.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      bruteTop1.map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("random projection: ±1 planes deterministic, exhaustive refine == brute, self-match survives compression") {
    import org.apache.spark.sql.functions._
    val big = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d * 1.1).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    // planes are ±1, deterministic, and salt-sensitive
    val planes = SimSearch.rpPlanes(4, 8)
    assert(planes.length === 4 && planes.forall(_.length === 8))
    assert(planes.flatten.forall(c => c == 1.0 || c == -1.0))
    assert(planes.map(_.toSeq) === SimSearch.rpPlanes(4, 8).map(_.toSeq))
    assert(planes.map(_.toSeq) !== SimSearch.rpPlanes(4, 8, "other").map(_.toSeq))
    val p = big.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_embedding"))
    // exhaustive refine (k*refine >= corpus): the projected scan is a
    // pass-through shortlist, so RP search == brute force exactly
    val brute = SimSearch.knnBrute(p, big, k = 5).collect().toSeq
    val rp = SimSearch.knnRandomProjection(p, big, k = 5, rDim = 4, refine = 8)
      .collect().toSeq
    assert(rp.toSet === brute.toSet,
      "exhaustive-refine RP search must equal brute")
    // identical vectors project identically: every probe's top-1 is itself
    // even at modest refine
    val top1 = SimSearch.knnRandomProjection(p, big, k = 1, rDim = 4, refine = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(top1.forall { case (pid, vid) => pid === vid }, top1.toSeq.toString)
    intercept[IllegalArgumentException] {
      SimSearch.knnRandomProjection(p, big, k = 5, rDim = 9) }
    intercept[IllegalArgumentException] {
      SimSearch.knnRandomProjection(p, big, k = 0) }
    // the COMPOSED tier (project then quantize the projection) has the
    // same exhaustive-refine == brute and self-top-1 guarantees
    val rpq = SimSearch.knnRpQuantized(p, big, k = 5, rDim = 4, refine = 8)
      .collect().toSeq
    assert(rpq.toSet === brute.toSet,
      "exhaustive-refine RP+int8 search must equal brute")
    val rpqTop1 = SimSearch.knnRpQuantized(p, big, k = 1, rDim = 4, refine = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rpqTop1.forall { case (pid, vid) => pid === vid }, rpqTop1.toSeq.toString)
  }

  test("product quantization: valid codes, reconstruction in-span, exhaustive refine == brute") {
    import org.apache.spark.sql.functions._
    val big = (0 until 40).map { i =>
      (i.toLong, Array(
        math.sin(i * 0.7).toFloat, math.cos(i * 1.3).toFloat,
        math.sin(i * 0.3).toFloat, math.cos(i * 0.9).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val (codes, books) = SimSearch.pqFit(big, m = 2, kCent = 4, iters = 2)
    assert(books.length === 2 && books.forall(_.forall(_._2.length === 2)))
    val codeRows = codes.collect()
    assert(codeRows.length === 40)
    assert(codeRows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4 &&
      r.getInt(2) >= 0 && r.getInt(2) < 4))
    // reconstruction: every vector maps to one of the <= 4x4 codebook
    // concatenations, 4 doubles wide
    val rec = SimSearch.pqReconstruct(codes, books).collect()
    assert(rec.forall(_.getSeq[Double](1).length === 4))
    assert(rec.map(_.getSeq[Double](1)).distinct.length <= 16)
    // dim not divisible by m is a loud error
    val e = intercept[IllegalArgumentException] {
      SimSearch.pqFit(big, m = 3, kCent = 4)
    }
    assert(e.getMessage.contains("not divisible"))
    // exhaustive refine makes the PQ scan a pass-through: == brute exactly
    val p = big.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_embedding"))
    val brute = SimSearch.knnBrute(p, big, k = 5).collect().toSeq
    val pq = SimSearch.knnPq(p, big, k = 5, m = 2, kCent = 4, refine = 8)
      .collect().toSeq
    assert(pq.toSet === brute.toSet)
  }

  test("assignLiteral == assignNew values; literal cap trips loudly") {
    import org.apache.spark.sql.functions._
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array((1.0 + i * 0.01).toFloat, (0.5 - i * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)), (2, Seq(0.7, 0.7)))
      .toDF("cell", "centroid")
    val viaJoin = SimSearch.assignNew(vecs, cents).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val viaLit = SimSearch.assignLiteral(vecs, SimSearch.collectCentroids(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaLit === viaJoin, "literal argmax must be bit-equal to the broadcast-join path")
    val tooMany = (0 to SimSearch.maxLiteralCentroids)
      .map(i => i -> Array(i.toDouble, 0.0)).toSeq
    val e = intercept[IllegalArgumentException] {
      SimSearch.assignLiteral(vecs, tooMany)
    }
    assert(e.getMessage.contains("assignNew"))
  }

  test("nearDupPairs size guard trips loudly past maxRows; dim mismatch errors loudly") {
    val e1 = intercept[IllegalArgumentException] {
      SimSearch.nearDupPairs(corpus, minCos = 0.5, maxRows = 3)
    }
    assert(e1.getMessage.contains("nearDupPairsBlocked"))
    val e2 = intercept[IllegalArgumentException] {
      SimSearch.knnLsh(probes, corpus, k = 2, dim = Some(64)) // data is dim 2
    }
    assert(e2.getMessage.contains("dim=64"))
    // matching explicit dim and empty-corpus-with-dim both work
    assert(SimSearch.knnLsh(probes, corpus, k = 2, dim = Some(2)).count() > 0)
    assert(SimSearch.nearDupPairsBlocked(corpus.limit(0), minCos = 0.5, dim = Some(2)).count() === 0)
  }

  test("cosine expression computes the expected value") {
    val c = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(SimSearch.cosine($"a", $"b")).head.getDouble(0)
    assert(math.abs(c) < 1e-12)
  }

  test("fused vector expressions == HOF formulation, bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val pairs = df.crossJoin(df.select($"id".as("id2"), $"v".as("v2")))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val rows = pairs.select(
      SimSearch.dot($"v", $"v2").as("d1"), hofDot($"v", $"v2").as("d2"),
      SimSearch.cosine($"v", $"v2").as("c1"),
      (hofDot($"v", $"v2") / (sqrt(hofDot($"v", $"v")) * sqrt(hofDot($"v2", $"v2")))).as("c2"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("kmeansAssign separates two obvious clusters; cells cover all rows") {
    // two tight direction clusters: x-axis-ish (0,1) and y-axis-ish (2,3)
    val got = SimSearch.kmeansAssign(corpus, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(0L) === got(1L), "x-axis vectors must share a cell")
    assert(got(2L) === got(3L), "y-axis vectors must share a cell")
    assert(got(0L) !== got(2L), "the two direction clusters must separate")
  }

  test("recallAtK: identical results score 1.0, disjoint score 0.0, partial counts hits") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)).toDF("probe_id", "vec_id")
    val same = SimSearch.recallAtK(exact, exact).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(same === Map(1L -> 1.0, 2L -> 1.0))
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 97L)).toDF("probe_id", "vec_id")
    val got = SimSearch.recallAtK(approx, exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }

  test("semDedup: min-id survives within a cell; cross-cell twins both survive") {
    // cell X: 0 and 1 are near-twins (cos ~ 0.994) -> 1 removed, 0 kept;
    // cell Y: 2 and 3 likewise -> 3 removed. tau=0.9 keeps the orthogonal
    // cross-cell pairs irrelevant.
    val got = SimSearch.semDedup(corpus, k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
    // at an unreachable threshold nothing is removed
    val none = SimSearch.semDedup(corpus, k = 2, tau = 0.9999)
    assert(none.filter(!col("kept")).count() === 0)
    intercept[IllegalArgumentException] { SimSearch.semDedup(corpus, k = 2, tau = 0.0) }
  }

  test("kmeansAssign is deterministic across runs and robust to cluster collapse") {
    val a = SimSearch.kmeansAssign(corpus, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val b = SimSearch.kmeansAssign(corpus, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(a === b)
    // identical vectors: every row lands in one surviving cell, no crash
    // even though the other seeds' cells empty out after round 1
    val same = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val collapsed = SimSearch.kmeansAssign(same, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(collapsed.length === 3)
    assert(collapsed.map(_._2).distinct.length === 1, "all rows share the one surviving cell")
    assert(collapsed.forall(_._3 === 1.0), "cosine to the collapsed centroid is 1")
  }

  test("kmeansAssign cells feed knnIvf: search stays within the probe's cell") {
    val cells = SimSearch.kmeansAssign(corpus, k = 2, iters = 2).select("vec_id", "cell")
    val withCells = corpus.drop("label").join(cells, "vec_id")
    val out = SimSearch.knnIvf(probes, withCells, "cell", k = 2)
      .orderBy("rnk").collect()
    // probe 0 lives in the x-axis cell {0, 1}: exactly those two, self first
    assert(out.map(_.getLong(3)).toSeq === Seq(0L, 1L))
  }

  test("knnBrute: correct order, self first") {
    val out = SimSearch.knnBrute(probes, corpus, k = 3)
      .orderBy("rnk").collect().map(_.getLong(2)).toSeq
    assert(out === Seq(0L, 1L, 3L)) // self, near, then the closer of the y-axis pair
  }

  test("knnBrute two-phase equals a global window rank") {
    val full = corpus.crossJoin(broadcast(probes))
      .select($"probe_id", $"vec_id",
        SimSearch.cosine($"p_embedding", $"embedding").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(desc("cos"), $"vec_id")
    val expected = full.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"probe_id", $"rnk", $"vec_id").collect().toSet
    val got = SimSearch.knnBrute(probes, corpus, k = 3)
      .select($"probe_id", $"rnk", $"vec_id").collect().toSet
    assert(got === expected)
  }

  test("knnIvf searches only the probe's cell") {
    val out = SimSearch.knnIvf(probes, corpus, "label", k = 3).collect()
    assert(out.forall(_.getInt(1) === 0)) // probe 0's cell is label 0
    assert(out.map(_.getLong(3)).toSet === Set(0L, 1L)) // only cell-0 vectors
  }

  test("nearDupPairsBlocked: subset of exact pairs; identical duplicates always collide") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(8)(rnd.nextFloat())
    val rows = (0L until 40L).map { i =>
      if (i == 1L) (i, base.clone) // exact duplicate of vec 0
      else if (i == 0L) (i, base)
      else (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val c = rows.toDF("vec_id", "embedding")
    val exact = SimSearch.nearDupPairs(c, minCos = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val blocked = SimSearch.nearDupPairsBlocked(c, minCos = 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "LSH blocking must never invent pairs")
    assert(blocked.contains((0L, 1L)), "identical vectors share every bucket")
  }

  test("kmeansAssign: broadcast-join argmax == fused literal argmax, bit-for-bit") {
    // 60 random dim-8 vectors, k = 5: enough cells/rows that a tiebreak or
    // numeric divergence between the two strategies would surface
    val rnd = new scala.util.Random(23)
    val big = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    for (c <- Seq(corpus.drop("label"), big)) {
      val lit_ = SimSearch.kmeansAssign(c, k = if (c eq big) 5 else 2, iters = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val join = SimSearch.kmeansAssign(c, k = if (c eq big) 5 else 2, iters = 2,
          maxLiteralK = 0)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(join === lit_, "assignment strategies must be result-identical")
    }
  }

  test("kmeansAssign fails loudly on an empty corpus") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimSearch.kmeansAssign(empty, k = 2)
    }
    assert(e.getMessage.contains("non-empty corpus"))
  }

  test("knnIvf multi-probe recovers the boundary neighbor nprobe=1 misses") {
    // cell 0 hugs the x-axis, cell 1 the diagonal; the probe sits between:
    // its best cell is 1, but the TRUE 2nd-nearest vector (0.95, 0.05)
    // lives in cell 0 — invisible at nprobe=1, recovered at nprobe=2.
    val c = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.95f, 0.05f), 0),
      (2L, Array(0.7f, 0.7f), 1), (3L, Array(0.72f, 0.68f), 1)
    ).toDF("vec_id", "embedding", "label")
    val p = Seq((100L, Array(0.9f, 0.4f))).toDF("probe_id", "p_embedding")
    val brute = SimSearch.knnBrute(p, c, k = 2)
      .collect().map(_.getLong(2)).toSet
    val one = SimSearch.knnIvf(p, c, "label", k = 2, nprobe = 1)
      .collect().map(_.getLong(3)).toSet
    val two = SimSearch.knnIvf(p, c, "label", k = 2, nprobe = 2)
      .collect().map(_.getLong(3)).toSet
    assert(brute === Set(3L, 1L))
    assert(one === Set(3L, 2L), "single-probe stays inside cell 1")
    assert(two === brute, "two probes recover the exact top-2")
    assert((two & brute).size >= (one & brute).size, "recall never degrades with nprobe")
  }

  test("knnIvfAuto == manual kmeansAssign -> join -> knnIvf composition") {
    val auto = SimSearch.knnIvfAuto(probes, corpus, k = 2, cells = 2)
      .select($"probe_id", $"rnk", $"vec_id").collect().toSet
    val cells = SimSearch.kmeansAssign(corpus, k = 2, iters = 2).select("vec_id", "cell")
    val manual = SimSearch.knnIvf(probes,
        corpus.drop("label").join(cells, "vec_id"), "cell", k = 2)
      .select($"probe_id", $"rnk", $"vec_id").collect().toSet
    assert(auto === manual)
  }

  test("kNN probe-side broadcast guard trips loudly, naming the self-join alternative") {
    for (f <- Seq[() => org.apache.spark.sql.DataFrame](
      () => SimSearch.knnBrute(probes, corpus, k = 2, maxProbeRows = 0),
      () => SimSearch.knnIvf(probes, corpus, "label", k = 2, maxProbeRows = 0),
      () => SimSearch.knnLsh(probes, corpus, k = 2, maxProbeRows = 0))) {
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("nearDupPairsBlocked"))
    }
    // at the default ceiling the small probe set passes untouched
    assert(SimSearch.knnBrute(probes, corpus, k = 2).count() === 2)
  }

  test("knnLsh: probe searches only its own hyperplane bucket; self ranks first") {
    val out = SimSearch.knnLsh(probes, corpus, k = 4, nPlanes = 4).collect()
    assert(out.nonEmpty)
    val probeBucket = out.head.getInt(1)
    assert(out.forall(_.getInt(1) === probeBucket))
    // every returned vector must really be in the probe's bucket
    val planes = SimSearch.lshPlanes(4, 2)
    val buckets = corpus.withColumn("b", SimSearch.lshBucket($"embedding", planes))
      .select("vec_id", "b").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out.map(_.getLong(3)).forall(v => buckets(v) === probeBucket))
    assert(out.minBy(_.getInt(2)).getLong(3) === 0L) // self is rank 1
  }
}

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL approx distinct: raw branch within 10% at 5k, linear branch within 15% at 40") {
    val big = (1 to 5000).map(i => ("g1", s"value_$i")).toDF("g", "v")
    val small = (1 to 40).map(i => ("g2", s"tiny_$i")).toDF("g", "v")
    val got = Sketches.approxDistinct(big.union(small), Seq("g"), $"v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // deterministic hash -> these are fixed values (g1 estimates 4618.41,
    // 7.6% low = 1.7 sigma at m=512's ~4.6% stderr); the bounds just
    // document the accuracy regime
    assert(math.abs(got("g1") - 5000) / 5000.0 < 0.10, s"raw-branch estimate off: ${got("g1")}")
    assert(math.abs(got("g2") - 40) / 40.0 < 0.15, s"linear-branch estimate off: ${got("g2")}")
  }

  test("HLL estimate is insensitive to duplication and partitioning") {
    val base = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "v")
    val dup = base.union(base).repartition(7)
    val a = Sketches.approxDistinct(base, Seq("g"), $"v").head.getDouble(1)
    val b = Sketches.approxDistinct(dup, Seq("g"), $"v").head.getDouble(1)
    assert(a === b)
  }

  test("register vectors merge EXACTLY: merge(regs(A), regs(B)) == regs(A ∪ B)") {
    val a = (1 to 600).map(i => ("g", s"v$i")).toDF("g", "v")
    val b = (400 to 1000).map(i => ("g", s"v$i")).toDF("g", "v") // overlaps A
    val regA = Sketches.hllRegisters(a, Seq("g"), $"v")
    val regB = Sketches.hllRegisters(b, Seq("g"), $"v")
    val regU = Sketches.hllRegisters(a.union(b), Seq("g"), $"v")
      .head.getSeq[Int](1)
    // column-form merge of the two vectors
    val merged = regA.join(regB.withColumnRenamed("hll_registers", "r2"), "g")
      .select(Sketches.hllMerge($"hll_registers", $"r2").as("m"))
      .head.getSeq[Int](0)
    assert(merged === regU, "element-wise max must equal the union's registers")
    // aggregate-form merge across rows (sharded sketches -> one)
    val aggMerged = Sketches.hllMergeAgg(regA.unionByName(regB), Seq("g"))
      .head.getSeq[Int](1)
    assert(aggMerged === regU)
    // and the estimate over merged registers == the single-shot estimate
    val est = a.union(b).select(lit("g").as("g"), $"v")
    val oneShot = Sketches.approxDistinct(est, Seq("g"), $"v").head.getDouble(1)
    val viaReg = regU match { case r =>
      Seq(Tuple1(r)).toDF("hll_registers")
        .select(Sketches.hllEstimate("hll_registers")).head.getDouble(0)
    }
    assert(viaReg === oneShot, "register-vector estimate must match the grouped path")
  }

  test("count-min: never underestimates; exact for frequent items at this load; merge == union") {
    // 200 distinct words, zipf-ish: word w_i appears i times (N = 20100
    // occurrences over width 1024 -> expected row collision load ~20/cell)
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"w$i")).map(Tuple1(_))
    val df = rows.toDF("v")
    val counters = Sketches.cmsCounters(df, Nil, $"v")
    val exact = df.groupBy("v").agg(count(lit(1)).as("cnt"))
    val est = Sketches.cmsEstimate(exact, counters, $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length === 200)
    assert(est.forall { case (_, cnt, e) => e >= cnt },
      "a count-min estimate can never be below the true count")
    // the heaviest item's estimate is tight here (collision mass is small)
    val heavy = est.find(_._1 === "w200").get
    assert(heavy._3 - heavy._2 <= 25, s"w200 overestimate too large: $heavy")

    // merging two shards' counters by sum == counters over the union
    val (sh1, sh2) = (rows.take(10000).toDF("v"), rows.drop(10000).toDF("v"))
    val merged = Sketches.cmsMergeAgg(
      Sketches.cmsCounters(sh1, Nil, $"v").unionByName(Sketches.cmsCounters(sh2, Nil, $"v")),
      Nil).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = counters.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === whole, "counter sum across shards must equal the union's counters")
  }

  test("cmsJoinSize: sound, exact without collisions, shard-merge law") {
    // A: k1 x3; B: k1 x5 + k2 x2 -> true join size 15. With two values
    // the only way the estimate exceeds 15 is k1/k2 colliding in ALL
    // four depth rows (deterministic h60 — verified not to happen).
    val a = Seq.fill(3)("k1").toDF("v")
    val b = (Seq.fill(5)("k1") ++ Seq.fill(2)("k2")).toDF("v")
    val ca = Sketches.cmsCounters(a, Nil, $"v")
    val cb = Sketches.cmsCounters(b, Nil, $"v")
    assert(Sketches.cmsJoinSize(ca, cb).head.getLong(0) === 15L)

    // zipf-ish load: estimate never below the exact equi-join size
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"w$i")).map(Tuple1(_))
    val big = rows.toDF("v")
    val half = rows.take(10000).toDF("v")
    val exact = big.join(half.withColumnRenamed("v", "w"), $"v" === $"w")
      .count()
    val cBig = Sketches.cmsCounters(big, Nil, $"v")
    val cHalf = Sketches.cmsCounters(half, Nil, $"v")
    val est = Sketches.cmsJoinSize(cBig, cHalf).head.getLong(0)
    assert(est >= exact, s"join-size estimate $est below exact $exact")

    // sizing from per-shard sketches merged later == sizing the union
    val (sh1, sh2) = (rows.take(7000).toDF("v"), rows.drop(7000).toDF("v"))
    val merged = Sketches.cmsMergeAgg(
      Sketches.cmsCounters(sh1, Nil, $"v")
        .unionByName(Sketches.cmsCounters(sh2, Nil, $"v")), Nil)
    assert(Sketches.cmsJoinSize(merged, cHalf).head.getLong(0) === est,
      "merged-shard sketch must size the join exactly like the union's")
  }

  test("tukeyOutliers: hand-computed order statistics; fat tail flags only in its own group") {
    // g1: 1..8 plus a 100-outlier -> n=9, q1=rank ceil(2.25)=3 -> 3,
    // q3=rank ceil(6.75)=7 -> 7, iqr=4, high fence 13 -> one outlier.
    // g2: constant 5s -> iqr=0, no outliers.
    val df = ((1L to 8L).map(("g1", _)) :+ ("g1", 100L)) ++
      (1 to 4).map(_ => ("g2", 5L)) match { case rows => rows.toDF("g", "x") }
    val got = graft.ext.Profile.tukeyOutliers(df.repartition(3), "x", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("g1") === ((9L, 3L, 7L, 4L, 0L, 1L)), s"g1: ${got("g1")}")
    assert(got("g2") === ((4L, 5L, 5L, 0L, 0L, 0L)), s"g2: ${got("g2")}")
  }

  test("profile states: merge == rebuild exactly, nulls and bounds included; finalize == profileColumns") {
    val df = (1 to 300).map(i =>
      (i.toLong, if (i % 7 == 0) null else s"v${i % 40}")).toDF("id", "s")
    val cols = Seq("id", "s")
    val whole = graft.ext.Profile.profileColumns(df, cols)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val merged = graft.ext.Profile.profileFinalize(
        graft.ext.Profile.profileMerge(
          (0 to 2).map(k =>
            graft.ext.Profile.profileColumnsState(
              df.filter(col("id") % 3 === k), cols))
            .reduce(_.unionByName(_))))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged === whole,
      s"merged per-shard states must equal the from-scratch profile:\n$merged\n$whole")
  }

  test("tukeyOutliersSketch: flags the fat tail like the exact form; estimates within one bin; partition-invariant") {
    val df = (((1L to 8L).map(("g1", _)) :+ ("g1", 100L)) ++
      (1 to 4).map(_ => ("g2", 5L))).toDF("g", "x")
    val got = graft.ext.Profile.tukeyOutliersSketch(df.repartition(3),
        col("x"), Seq("g"), lo = 0.0, hi = 128.0, buckets = 128)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getLong(6), r.getLong(7))).toMap
    val (n1, q1, q3, lo1, hi1) = got("g1")
    assert(n1 === 9L && lo1 === 0L && hi1 === 1L,
      s"sketch fences must flag exactly the 100-outlier: ${got("g1")}")
    // exact quartiles are 3 and 7; bin-width-1 estimates land within one
    assert(math.abs(q1 - 3.0) <= 1.0 && math.abs(q3 - 7.0) <= 1.0,
      s"estimates within one bin of the exact quartiles: ${got("g1")}")
    assert(got("g2")._4 === 0L && got("g2")._5 === 0L,
      s"constant group has no outliers: ${got("g2")}")
    val again = graft.ext.Profile.tukeyOutliersSketch(df.repartition(7),
        col("x"), Seq("g"), lo = 0.0, hi = 128.0, buckets = 128)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getLong(6), r.getLong(7))).toMap
    assert(again === got, "sketch quantiles must be partitioning-invariant")
  }

  test("corpusDiff: statuses partition the id union; null vs empty distinguished; duplicate ids fail loudly") {
    // id 6 is the cross-column boundary shift of ADVICE r10: a tag-only
    // "v:"+value concat folds ("1v:2","3") and ("1","2v:3") to the same
    // "v:1v:2v:3" bytes and reports 'unchanged' — the length-prefixed
    // encoding must report 'changed'
    val oldDf = Seq((1L, Some("a"), "s"), (2L, Some("b"), "s"),
      (3L, Some(""), "s"), (4L, None, "s"),
      (6L, Some("1v:2"), "3")).toDF("id", "text", "src")
    val newDf = Seq((2L, Some("b"), "s"), (3L, Option.empty[String], "s"),
      (4L, None, "s"), (5L, Some("e"), "s"),
      (6L, Some("1"), "2v:3")).toDF("id", "text", "src")
    val got = graft.ext.Profile.corpusDiff(oldDf, newDf, "id",
        Seq("text", "src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 5L -> "added", 6L -> "changed"),
      s"empty-string -> NULL must read as changed, NULL==NULL unchanged, " +
        s"cross-column shifts changed: $got")
    val dup = Seq((1L, Some("a"), "s"), (1L, Some("z"), "s"))
      .toDF("id", "text", "src")
    val ex = intercept[Exception] {
      graft.ext.Profile.corpusDiff(dup, newDf, "id", Seq("text", "src"))
        .collect()
    }
    assert(ex.getMessage.contains("duplicate") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate")))
  }

  test("kAnonymity: class sizes, violation flags, guards") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"),
      ("fr", "b")).toDF("lang", "src")
    val got = graft.ext.Profile.kAnonymity(df, Seq("lang", "src"), k = 2)
      .orderBy("lang", "src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(("en", "a", 3L, false), ("en", "b", 1L, true),
      ("fr", "b", 1L, true)))
    intercept[IllegalArgumentException] {
      graft.ext.Profile.kAnonymity(df, Seq(), 2) }
    intercept[IllegalArgumentException] {
      graft.ext.Profile.kAnonymity(df, Seq("lang"), 1) }
  }

  test("tableFingerprint: layout-invariant, ledger folds to direct, swap-and-encode traps") {
    val df = Seq.tabulate(40)(i => (i.toLong, s"v$i", i % 4))
      .toDF("id", "s", "grp")
    val cols = Seq("id", "s")
    def row(d: org.apache.spark.sql.DataFrame) = {
      val r = d.collect()(0); (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val direct = row(graft.ext.Profile.tableFingerprint(df, cols, "x"))
    assert(row(graft.ext.Profile.tableFingerprint(
      df.repartition(7).sortWithinPartitions("s"), cols, "x")) === direct,
      "fingerprint must not depend on layout")
    val merged = row(graft.ext.Profile.mergeFingerprints(
      graft.ext.Profile.groupedFingerprint(df, cols, "grp"), "x"))
    assert(merged === direct, "ledger fold must equal the direct fingerprint")
    // duplicate one row, drop another: count matches, sum_mod catches it
    val swapped = df.filter(col("id") =!= 3L)
      .unionByName(df.filter(col("id") === 5L))
    val sw = row(graft.ext.Profile.tableFingerprint(swapped, cols, "x"))
    assert(sw._1 == direct._1 && sw._2 != direct._2,
      "a dropped+duplicated pair must move sum_mod")
    // length-prefixed encoding: shifting bytes across the column boundary
    // must change the fingerprint
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    assert(row(graft.ext.Profile.tableFingerprint(a, Seq("x", "y"), "x"))
      !== row(graft.ext.Profile.tableFingerprint(b, Seq("x", "y"), "x")))
  }

  test("chiSquare: textbook 2x2 value; empty cells contribute their expected counts") {
    val sym = (Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val r1 = graft.ext.Profile.chiSquare(sym, "a", "b").collect()(0)
    assert((r1.getLong(0), r1.getLong(3)) === (60L, 1L))
    assert(r1.getDouble(4) === 6.666668) // 4 * round6(25/15)
    // zero cell (y,q): term (0*N - ra*cb)^2/(ra*cb*N) must still count
    val hole = (Seq.fill(3)(("x", "p")) ++ Seq(("x", "q")) ++
      Seq.fill(2)(("y", "p"))).toDF("a", "b")
    val r2 = graft.ext.Profile.chiSquare(hole, "a", "b").collect()(0)
    assert(r2.getDouble(4) === 0.6 && r2.getLong(3) === 1L)
  }

  test("rocAuc: perfect=1, inverted=0, all-ties=0.5, and the tie-averaged hand case") {
    def auc(rows: Seq[(Long, Boolean)]): Double = {
      val df = rows.toDF("s", "y")
      graft.ext.Profile.rocAuc(df, "s", col("y")).collect()(0).getDouble(4)
    }
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true))) === 1.0)
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false))) === 0.0)
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false))) === 0.5)
    // ranks: 1 -> 1; {2,2} -> 2.5 each; 3 -> 4. AUC = (6.5 - 3)/4
    assert(auc(Seq((1L, false), (2L, true), (2L, false), (3L, true))) === 0.875)
  }

  test("calibration: bin edges close into the last bin; per-bin means and brier") {
    val df = Seq((0.05, false), (0.15, true), (0.95, true), (1.0, true))
      .toDF("p", "y")
    val got = graft.ext.Profile.calibration(df, col("p"), col("y"), 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (0, 1L, 0L, 0.0, 0.05, 0.0025),
      (1, 1L, 1L, 1.0, 0.15, 0.7225),
      (9, 2L, 2L, 1.0, 0.975, 0.00125)))
  }

  test("cohenKappa: hand-computed 0.4; degenerate single-class pair yields null kappa") {
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(15)(("b", "b")) ++
      Seq.fill(10)(("a", "b")) ++ Seq.fill(5)(("b", "a"))
    val r = graft.ext.Profile.cohenKappa(rows.toDF("ra", "rb"),
      col("ra"), col("rb")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (50L, 35L))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) === (0.7, 0.5, 0.4))
    val degen = graft.ext.Profile.cohenKappa(
      Seq.fill(4)(("a", "a")).toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0)
    assert(degen.isNullAt(4), "p_e = 1 must yield null kappa, not a crash")
    // NULL rater classes: agree counts null<=>null, so the chance term
    // must include the null marginal product too (null-safe join).
    // ra: a×3, null×2; rb: a×2, null×3 → s_e = 3·2 + 2·3 = 12,
    // agree = 4, N = 5 → κ = (4·5 − 12)/(25 − 12) = 8/13
    val nr = Seq((Some("a"), Some("a")), (Some("a"), Some("a")),
      (None: Option[String], None: Option[String]),
      (None: Option[String], None: Option[String]),
      (Some("a"), None: Option[String])).toDF("ra", "rb")
    val nk = graft.ext.Profile.cohenKappa(nr, col("ra"), col("rb"))
      .collect()(0)
    assert(nk.getDouble(3) === 0.48, "p_e must include the null marginal")
    assert(nk.getDouble(4) === 0.615385)
  }

  test("snapshotDiff: added/removed/changed/unchanged with null-safe column compares") {
    val oldDf = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, None: Option[String], 30L), (4L, Option("d"), 40L),
      (5L, Option("e"), 50L)).toDF("id", "s", "v")
    val newDf = Seq((1L, Option("a"), 10L),          // unchanged
      (2L, None: Option[String], 20L),               // s: value -> null
      (3L, Option("c"), 30L),                        // s: null -> value
      (4L, Option("d"), 41L),                        // v changed
      (6L, Option("f"), 60L)).toDF("id", "s", "v")   // added; 5 removed
    val got = graft.ext.Profile.snapshotDiff(oldDf, newDf, Seq("id"),
        Seq("s", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("chg_s" -> 2L, "chg_v" -> 1L, "zz_added" -> 1L,
      "zz_removed" -> 1L, "zz_changed" -> 3L, "zz_unchanged" -> 1L))
    intercept[IllegalArgumentException] {
      graft.ext.Profile.snapshotDiff(oldDf, newDf, Seq("id"), Seq()) }
  }

  test("histogramDrift: identical snapshots score zero; a shifted bin raises every score") {
    val a = Seq.tabulate(64)(i => (i.toLong, (i % 8) * 100L)).toDF("id", "v")
    val zero = graft.ext.Profile.histogramDrift(a, a, col("v"), 0.0, 1024.0, 16)
      .collect()(0)
    assert(zero.getAs[Long]("n_a") === 64L && zero.getAs[Long]("n_b") === 64L)
    assert(zero.getAs[Double]("tv") === 0.0)
    assert(zero.getAs[Double]("max_bin_gap") === 0.0)
    assert(zero.getAs[Double]("psi") === 0.0)
    // shift half the mass one bin up: tv > 0, psi > 0, and the gap names it
    val b = a.withColumn("v", when(col("id") % 2 === 0, col("v") + 100)
      .otherwise(col("v")))
    val d = graft.ext.Profile.histogramDrift(a, b, col("v"), 0.0, 1024.0, 16)
      .collect()(0)
    assert(d.getAs[Double]("tv") > 0.0 && d.getAs[Double]("psi") > 0.0)
    assert(d.getAs[Double]("max_bin_gap") >= d.getAs[Double]("tv") / 16)
    // out-of-range values clamp instead of vanishing: row counts hold
    val c = a.withColumn("v", col("v") * 100 - 5000)
    val e = graft.ext.Profile.histogramDrift(a, c, col("v"), 0.0, 1024.0, 16)
      .collect()(0)
    assert(e.getAs[Long]("n_b") === 64L)
    // NULL features are excluded, not binned into bin 0: padding one
    // side with nulls must change neither the totals nor any score
    val an = a.select(when(col("id") >= 0, col("v")).as("v"))
      .union(Seq.fill(10)(Tuple1(null.asInstanceOf[java.lang.Long]))
        .toDF("v"))
    val f = graft.ext.Profile.histogramDrift(an, a, col("v"), 0.0, 1024.0, 16)
      .collect()(0)
    assert(f.getAs[Long]("n_a") === 64L, "nulls must not inflate n_a")
    assert(f.getAs[Double]("tv") === 0.0 && f.getAs[Double]("psi") === 0.0)
  }

  test("bootstrapCI: interval brackets the mean, tightens with lower variance, partition-invariant") {
    val tight = (1L to 400L).map(i => (i, 100L + (i % 3))).toDF("id", "x")
    val loose = (1L to 400L).map(i => (i, (i % 200) * 2)).toDF("id", "x")
    def ci(df: org.apache.spark.sql.DataFrame) = {
      val r = graft.ext.Profile.bootstrapCI(df, $"x", "id").head()
      (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    val (n1, p1, lo1, hi1) = ci(tight)
    assert(n1 === 400L && lo1 <= p1 && p1 <= hi1, s"CI must bracket: $p1 in [$lo1, $hi1]")
    val (_, p2, lo2, hi2) = ci(loose)
    assert(lo2 <= p2 && p2 <= hi2)
    assert(hi1 - lo1 < hi2 - lo2,
      s"lower-variance data must give a tighter interval: ${hi1 - lo1} vs ${hi2 - lo2}")
    val again = ci(tight.repartition(7))
    assert(again === ((n1, p1, lo1, hi1)), "hash-derived draws must be partition-invariant")
    intercept[IllegalArgumentException] {
      graft.ext.Profile.bootstrapCI(tight, $"x", "id", reps = 5) }

    // grouped form: each group's row equals the global form run on that
    // group alone (draws key on (rep, id), not the group)
    val mixed = tight.withColumn("g", $"id" % 2)
    val grouped = graft.ext.Profile.bootstrapCI(mixed, $"x", "id", keys = Seq("g"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val solo0 = ci(mixed.filter($"g" === 0))
    assert(grouped(0L) === ((solo0._1, solo0._2, solo0._3, solo0._4)),
      "a group's CI must equal the global bootstrap over that group alone")
  }

  test("bootstrapDiffCI: a real shift flags significant; identical groups do not") {
    // group A: values ~100, group B: values ~90 — a 10-point true shift
    // far beyond the resampling noise of 200 rows each
    val shifted = ((1L to 200L).map(i => ("A", i, 100L + i % 3)) ++
      (201L to 400L).map(i => ("B", i, 90L + i % 3)))
      .toDF("g", "id", "x")
    val r = graft.ext.Profile.bootstrapDiffCI(shifted, $"x", "id", "g", "A", "B").head()
    assert(r.getLong(0) === 200L && r.getLong(1) === 200L)
    assert(r.getDouble(2) > 9.0 && r.getDouble(2) < 11.0, s"point diff ~10: $r")
    assert(r.getBoolean(5) && r.getDouble(3) > 0, s"true shift must flag significant: $r")
    // identical distributions: point diff 0, interval straddles 0
    val same = ((1L to 200L).map(i => ("A", i, 50L + i % 5)) ++
      (201L to 400L).map(i => ("B", i, 50L + i % 5)))
      .toDF("g", "id", "x")
    val r2 = graft.ext.Profile.bootstrapDiffCI(same, $"x", "id", "g", "A", "B").head()
    assert(r2.getDouble(2) === 0.0 && !r2.getBoolean(5),
      s"identical groups must not flag: $r2")
    intercept[IllegalArgumentException] {
      graft.ext.Profile.bootstrapDiffCI(same, $"x", "id", "g", "A", "A") }
  }

  test("embeddingDrift: identical slices score cos=1/l2=0; a shifted label flags; one-sided labels drop") {
    val base = (1 to 40).map(i => (i % 2, Array(1.0f, 2.0f, 3.0f + (i % 4))))
    val a = base.toDF("label", "embedding")
    val same = graft.ext.Profile.embeddingDrift(a, a)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(same.forall { case (_, c, l) => c == 1.0 && l == 0.0 },
      s"identical slices must show zero drift: ${same.toSeq}")
    // shift label 1's vectors in slice b; add a label 9 present only in b
    val b = (base.map { case (lb, v) =>
      (lb, if (lb == 1) v.map(_ + 5.0f) else v)
    } ++ Seq((9, Array(1.0f, 1.0f, 1.0f)))).toDF("label", "embedding")
    val got = graft.ext.Profile.embeddingDrift(a, b)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(0, 1), "label 9 exists in one slice only -> absent")
    assert(got(0)._1 == 1.0 && got(0)._2 == 0.0)
    assert(got(1)._1 < 1.0 && got(1)._2 > 5.0, s"shifted label must flag: ${got(1)}")
  }

  test("profileColumns: null counts, lexicographic ranges, HLL cardinality, all-null column") {
    val df = Seq(
      (1L, Some("b"), Option.empty[String]),
      (2L, Some("a"), None),
      (2L, None, None),
      (3L, Some("c"), None)
    ).toDF("id", "tag", "dead")
    val got = graft.ext.Profile.profileColumns(df, Seq("id", "tag", "dead"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.getString(4)), Option(r.getString(5))))).toMap
    val (idN, idNull, idAd, idMin, idMax) = got("id")
    assert(idN === 4L && idNull === 0L && idMin === Some("1") && idMax === Some("3"))
    assert(math.abs(idAd - 3.0) < 0.5, s"id has 3 distinct values: $idAd")
    val (_, tagNull, tagAd, tagMin, tagMax) = got("tag")
    assert(tagNull === 1L && tagMin === Some("a") && tagMax === Some("c"))
    assert(math.abs(tagAd - 3.0) < 0.5)
    val (deadN, deadNull, deadAd, deadMin, deadMax) = got("dead")
    assert(deadN === 4L && deadNull === 4L && deadAd === 0.0)
    assert(deadMin.isEmpty && deadMax.isEmpty)
    intercept[IllegalArgumentException] {
      graft.ext.Profile.profileColumns(df, Nil) }
  }

  test("equiDepthBucketFrom: merged per-batch states == from-scratch bucketing; new slices bucket against standing state") {
    val df = (1 to 3000).map(i => (i.toLong, (i * i % 997).toDouble))
      .toDF("id", "v").repartition(6)
    val (lo, hi) = Sketches.valueBounds(df, $"v")
    val rebuild = Sketches.equiDepthBucket(df, $"v", k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // three disjoint batches, sketched independently, merged by SUM
    val merged = Sketches.histMergeAgg(
      (0 to 2).map(i => Sketches.histCounts(
        df.filter($"id" % 3 === i), Nil, $"v", lo, hi))
        .reduce(_ unionByName _), Nil)
    val incr = Sketches.equiDepthBucketFrom(df, merged, $"v", lo, hi, k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(incr === rebuild, "merged states must bucket exactly like a rebuild")
    // a NEW slice buckets against the standing state (clamped at edges)
    val newDay = Seq((9001L, -5.0), (9002L, (hi + lo) / 2), (9003L, hi + 99.0))
      .toDF("id", "v")
    val b = Sketches.equiDepthBucketFrom(newDay, merged, $"v", lo, hi, k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(b(9001L) === 0 && b(9003L) === 3, "out-of-range must clamp to edge buckets")
    assert(b(9002L) >= 0 && b(9002L) <= 3)
  }

  test("heavyHitters: == unscreened HAVING exactly; the screen actually screens") {
    // zipf-ish: w_i appears i times -> heavy hitters at minCount=120 are
    // w120..w200 (81 values) out of a 200-value domain
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"w$i")).map(Tuple1(_))
    val df = rows.toDF("v").repartition(5)
    val got = Sketches.heavyHitters(df, $"v", minCount = 120L, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = (120 to 200).map(i => (s"w$i", i.toLong)).toSet
    assert(got === want, "screened result must equal the plain HAVING mirror")

    // supersetness + selectivity of the screen itself: every true hitter
    // survives (no false negatives), and the candidate set is genuinely
    // smaller than the domain (the screen screens at this width/threshold)
    val counters = Sketches.cmsCounters(df, Nil, $"v", width = 4096)
    val screened = Sketches.cmsEstimate(df.distinct(), counters, $"v", width = 4096)
      .filter($"cms_est" >= 120L)
    val candidates = screened.collect().map(_.getString(0)).toSet
    assert(want.map(_._1).subsetOf(candidates), "screen dropped a true hitter")
    assert(candidates.size < 200, s"screen passed the whole domain (${candidates.size})")

    // a vocabulary-table candidate domain gives the same answer
    val viaVocab = Sketches.heavyHitters(df, $"v", minCount = 120L,
        candidates = Some(df.distinct()), width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaVocab === want)
  }

  test("bloom: no false negatives ever; merge by union == filter over the union") {
    val members = (1 to 2000).map(i => Tuple1(s"m$i")).toDF("v")
    val bits = Sketches.bloomBits(members, Nil, $"v")
    // every member tests positive
    val memberHits = Sketches.bloomMightContain(members, bits, $"v")
    assert(memberHits.filter(!$"bloom_might_contain").count() === 0,
      "a Bloom filter can never reject a member")
    // non-members mostly test negative (fp rate ~(1-e^-kn/m)^k ~ 1e-6 here)
    val others = (1 to 2000).map(i => Tuple1(s"x$i")).toDF("v")
    val fp = Sketches.bloomMightContain(others, bits, $"v")
      .filter($"bloom_might_contain").count()
    assert(fp <= 5, s"false-positive count implausibly high: $fp")
    // sharded build: union of the shards' bit tables == whole filter
    val (s1, s2) = ((1 to 1000).map(i => Tuple1(s"m$i")).toDF("v"),
      (1001 to 2000).map(i => Tuple1(s"m$i")).toDF("v"))
    val mergedBits = Sketches.bloomBits(s1, Nil, $"v")
      .unionByName(Sketches.bloomBits(s2, Nil, $"v")).distinct()
    assert(mergedBits.collect().map(_.getLong(0)).toSet ===
      bits.collect().map(_.getLong(0)).toSet)
  }

  test("histogram sketch: shard-merge == whole; quantile within one bucket width; clamped edges") {
    val vals = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val (lo, hi) = (0.0, 10000.0)
    val whole = Sketches.histCounts(vals, Seq("g"), $"v", lo, hi)
    // counters add: per-shard sketches summed == the union's sketch
    val sharded = vals.withColumn("shard", ($"v".cast("long") % 3).cast("int"))
    val merged = Sketches.histMergeAgg(
      Sketches.histCounts(sharded, Seq("g", "shard"), $"v", lo, hi), Seq("g"))
    assert(merged.collect().map(r => (r.getInt(1), r.getLong(2))).toSet ===
      whole.collect().map(r => (r.getInt(1), r.getLong(2))).toSet)
    // estimates land within one bucket width (10000/128 ~ 78.1) of exact
    val qs = Seq(0.25, 0.5, 0.75, 0.99)
    val est = Sketches.histQuantiles(whole, Seq("g"), lo, hi, qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val w = (hi - lo) / Sketches.HIST_BUCKETS
    qs.foreach { q =>
      val exact = q * 10000 // uniform 1..10000
      assert(math.abs(est(q) - exact) <= w, s"q=$q est=${est(q)} exact=$exact")
    }
    // out-of-range values are clamped into the edge buckets, never dropped
    val wild = Seq(("g", -50.0), ("g", 1e9)).toDF("g", "v")
    val h = Sketches.histCounts(wild, Seq("g"), $"v", lo, hi)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(h === Map(0 -> 1L, (Sketches.HIST_BUCKETS - 1) -> 1L))
  }

  test("histogram quantile error bounded by one bucket width on random data (seeded)") {
    // the rank-r element and the interpolated estimate share the chosen
    // bucket, so |est - exact| < bucket width always — not just on the
    // uniform fixture above
    val rnd = new scala.util.Random(42)
    val (lo, hi) = (-50.0, 150.0)
    val w = (hi - lo) / Sketches.HIST_BUCKETS
    (1 to 6).foreach { round_ =>
      val n = 200 + rnd.nextInt(800)
      // mix of uniform and clumped mass so buckets are non-uniform
      val vals = Seq.fill(n)(if (rnd.nextBoolean()) lo + rnd.nextDouble() * (hi - lo)
        else 42.0 + rnd.nextDouble())
      val hist = Sketches.histCounts(vals.map(("g", _)).toDF("g", "v"), Seq("g"), $"v", lo, hi)
      val qs = Seq(0.1, 0.5, 0.9)
      val est = Sketches.histQuantiles(hist, Seq("g"), lo, hi, qs).collect()
        .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      val sorted = vals.sorted
      qs.foreach { q =>
        val exact = sorted(math.ceil(q * n).toInt - 1)
        assert(math.abs(est(q) - exact) <= w + 1e-9,
          s"round=$round_ n=$n q=$q est=${est(q)} exact=$exact")
      }
    }
  }

  test("internal-name collisions: caller columns named like HLL internals survive") {
    // a KEY literally named __h / max_rho and a data column named __rho
    // previously risked being clobbered by withColumn internals
    val df = (1 to 500).map(i => ("k1", i.toDouble, s"v$i")).toDF("__h", "max_rho", "v")
    val got = Sketches.approxDistinct(df, Seq("__h"), $"v").collect()
    assert(got.map(_.getString(0)).toSeq === Seq("k1"))
    val clean = (1 to 500).map(i => ("k1", s"v$i")).toDF("g", "v")
    val want = Sketches.approxDistinct(clean, Seq("g"), $"v").head.getDouble(1)
    assert(got.head.getDouble(1) === want)
    // same via the register path
    val reg = Sketches.hllRegisters(df, Seq("__h"), $"v")
      .select(Sketches.hllEstimate("hll_registers")).head.getDouble(0)
    assert(reg === want)
  }

  test("HLL intersection: inclusion-exclusion from sketches tracks the true overlap") {
    // A = 1..3000, B = 2001..5000 -> |A| = |B| = 3000, |A ∩ B| = 1000
    val rows = ((1 to 3000).map(i => ("A", s"u$i")) ++
      (2001 to 5000).map(i => ("B", s"u$i"))).toDF("g", "v")
    val regs = Sketches.hllRegisters(rows, Seq("g"), $"v")
    val got = Sketches.hllIntersectEstimate(regs, "g").collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("key_a") === "A" && r.getAs[String]("key_b") === "B")
    val est = r.getAs[Double]("est_intersect")
    // inclusion-exclusion compounds three ~3% errors; 25% is a loose pin
    assert(math.abs(est - 1000.0) <= 250.0, s"intersection estimate $est vs 1000")
    assert(math.abs(r.getAs[Double]("est_union") - 5000.0) <= 500.0)
    // pure sketch arithmetic: recomputing from the same registers is exact
    val again = Sketches.hllIntersectEstimate(regs, "g").head.getAs[Double]("est_intersect")
    assert(again === est)
  }

  test("hllIntersectEstimate: the all-pairs key guard fails loudly above maxKeys") {
    // 5 key groups vs a cap of 4: the quadratic theta-join must refuse up
    // front (bounded limit(max+1) probe), naming the escape hatches.
    val rows = (1 to 50).map(i => (s"g${i % 5}", s"u$i")).toDF("g", "v")
    val regs = Sketches.hllRegisters(rows, Seq("g"), $"v")
    val e = intercept[IllegalArgumentException] {
      Sketches.hllIntersectEstimate(regs, "g", maxKeys = 4) }
    assert(e.getMessage.contains("all-pairs"))
    // at the cap it runs: 5 keys -> 10 pairs
    assert(Sketches.hllIntersectEstimate(regs, "g", maxKeys = 5).count() === 10L)
    intercept[IllegalArgumentException] {
      Sketches.hllIntersectEstimate(regs, "g", maxKeys = 1) }
  }

  test("percentileNormalize: monotone in value, midpoint convention, partitioning-invariant") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val got = Sketches.percentileNormalize(df, $"v", lo = 0.0, hi = 1000.0,
      buckets = 100)
      .select("id", "pct").as[(Long, Double)].collect().toMap
    // monotone: higher value never maps to a lower percentile
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // w = 10: bin 0 holds 1..9 (9 rows), bin 1 holds 10..19 (10 rows),
    // bin 99 holds 990..999 plus the clamped 1000 (11 rows)
    assert(got(1L) === 0.0045 && got(9L) === 0.0045, "bin-0 midpoint = 4.5/1000")
    assert(got(10L) === 0.014, "bin-1 midpoint = (9 + 5)/1000")
    assert(got(1000L) === 0.9945, "last-bin midpoint = (989 + 5.5)/1000")
    // same result under a different input partitioning
    val again = Sketches.percentileNormalize(df.repartition(7), $"v", 0.0, 1000.0, 100)
      .select("id", "pct").as[(Long, Double)].collect().toMap
    assert(again === got)
  }

  test("percentileNormalizeAuto: corpus-derived bounds; oob flag marks exactly the clamped rows") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // auto == explicit call with the corpus min/max
    val auto = Sketches.percentileNormalizeAuto(df, $"v", buckets = 100)
      .select("id", "pct").as[(Long, Double)].collect().toMap
    val manual = Sketches.percentileNormalize(df, $"v", lo = 1.0, hi = 1000.0,
      buckets = 100).select("id", "pct").as[(Long, Double)].collect().toMap
    assert(auto === manual)
    assert(Sketches.valueBounds(df, $"v") === (1.0, 1000.0))
    // out-of-range rows CLAMP into the edge bins (documented behavior) and
    // the oob flag marks exactly them — nothing else
    val flagged = Sketches.percentileNormalize(df, $"v", lo = 100.0, hi = 900.0,
      buckets = 100, oobCol = Some("oob"))
      .select("id", "pct", "oob").as[(Long, Double, Boolean)].collect()
    val oobIds = flagged.filter(_._3).map(_._1).toSet
    assert(oobIds === ((1L until 100L) ++ (901L to 1000L)).toSet)
    val byId = flagged.map(r => r._1 -> r._2).toMap
    assert(byId(1L) === byId(50L) && byId(50L) === byId(100L),
      "below-range values must clamp into bin 0")
    assert(byId(950L) === byId(899L),
      "above-range values must clamp into the top bin")
    // degenerate corpora refuse loudly
    intercept[IllegalArgumentException] {
      Sketches.percentileNormalizeAuto(Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v"), $"v") }
    intercept[IllegalArgumentException] {
      Sketches.valueBounds(Seq.empty[(Long, Double)].toDF("id", "v"), $"v") }
  }

  test("equiDepthBucket: near-equal populations on skewed data, contiguous non-overlapping ranges") {
    // heavily skewed signal (quadratic): an equi-WIDTH layout would pile
    // most rows into the low buckets; equi-depth must stay balanced
    val df = (1 to 4000).map(i => (i.toLong, (i.toDouble * i))).toDF("id", "v")
    val got = Sketches.equiDepthBucket(df, $"v", k = 8)
      .groupBy("depth_bucket")
      .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      .orderBy("depth_bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === (0 until 8), s"all 8 buckets present: ${got.toSeq}")
    // balance within one-bin resolution: 4000/8 = 500 ± a few percent
    assert(got.forall(b => b._2 > 400 && b._2 < 600),
      s"bucket populations must be near-equal: ${got.map(_._2).toSeq}")
    // contiguity: ranges ordered and non-overlapping
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"bucket ${a._1} range must end before ${b._1} starts")
    }
    // deterministic under repartition (no sampling involved)
    val again = Sketches.equiDepthBucket(df.repartition(13), $"v", k = 8)
      .select("id", "depth_bucket").as[(Long, Int)].collect().toMap
    val first = Sketches.equiDepthBucket(df, $"v", k = 8)
      .select("id", "depth_bucket").as[(Long, Int)].collect().toMap
    assert(again === first)
    intercept[IllegalArgumentException] { Sketches.equiDepthBucket(df, $"v", k = 1) }
    intercept[IllegalArgumentException] {
      Sketches.equiDepthBucket(df, $"v", k = 8, buckets = 4) }
    intercept[IllegalArgumentException] {
      Sketches.equiDepthBucket(Seq((1L, 5.0)).toDF("id", "v"), $"v", k = 2) }
  }

  test("kmvSketch: EXACT merge law — merge(per-shard sketches) == sketch(union)") {
    val rows = (1L to 500L).map(i => (i, i % 7, (i * 37) % 1000))
      .toDF("id", "shard", "v")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(explode(expr("transform(sample, x -> concat(x.h, ':', x.v))"))
        .as("e")).as[String].collect().toSeq
    val direct = Sketches.kmvSketch(rows.withColumn("g", lit(1)),
      Seq("g"), col("id"), col("v"), k = 64)
    val merged = Sketches.kmvMergeAgg(
      Sketches.kmvSketch(rows, Seq("shard"), col("id"), col("v"), k = 64),
      Nil, k = 64)
    assert(canon(direct) === canon(merged),
      "KMV must merge EXACTLY (min-k of union == min-k of min-k's)")
    assert(merged.select("n").as[Long].collect()(0) === 500L)
    // determinism under physical repartition: the sample is a function
    // of the row SET, never of arrival order
    val re = Sketches.kmvMergeAgg(
      Sketches.kmvSketch(rows.repartition(13), Seq("shard"), col("id"),
        col("v"), k = 64), Nil, k = 64)
    assert(canon(re) === canon(merged))
  }

  test("kmvQuantiles: exhaustive sample (k >= n) reproduces exact type-1 quantiles") {
    val rows = (1L to 100L).map(i => (i, i)).toDF("id", "v")
      .withColumn("g", lit(1))
    val q = Sketches.kmvQuantiles(
      Sketches.kmvSketch(rows, Seq("g"), col("id"), col("v"), k = 256),
      Seq("g"), Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(q.getAs[Long]("m") === 100L)
    assert(q.getAs[Long]("p50") === 50L)
    assert(q.getAs[Long]("p90") === 90L)
    assert(q.getAs[Long]("p99") === 99L)
  }

  test("kmvQuantiles: fractional percents keep distinct names; collisions fail loudly (ADVICE r15)") {
    val rows = (1L to 100L).map(i => (i, i)).toDF("id", "v")
      .withColumn("g", lit(1))
    val sk = Sketches.kmvSketch(rows, Seq("g"), col("id"), col("v"), k = 256)
    // 0.995 and 1.0 used to BOTH round to "p100"; 0.549/0.551 both to
    // "p55" — fractional percents now encode the fraction instead
    val q = Sketches.kmvQuantiles(sk, Seq("g"),
      Seq(0.549, 0.551, 0.995, 1.0)).collect()(0)
    assert(q.getAs[Long]("p54_9") === 55L)  // ceil(0.549*100) = 55
    assert(q.getAs[Long]("p55_1") === 56L)
    assert(q.getAs[Long]("p99_5") === 100L) // ceil(99.5) = 100
    assert(q.getAs[Long]("p100") === 100L)
    // a genuine name collision (indistinguishable at 4 dp) fails loudly
    // instead of emitting a duplicate-named ambiguous schema
    intercept[IllegalArgumentException] {
      Sketches.kmvQuantiles(sk, Seq("g"), Seq(0.5500001, 0.55000011)) }
  }

  test("wkmvSketch: weighted merge law — merge(shards) == sketch(union); repartition-invariant") {
    val rows = (1L to 300L).map(i => (i, (i * 13) % 97 + 1, i % 5))
      .toDF("id", "v", "shard")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(explode(expr(
        "transform(sample, x -> concat(x.p, ':', x.id, ':', x.v, ':', x.w))"))
        .as("e")).as[String].collect().toSeq
    val direct = Sketches.wkmvSketch(rows.withColumn("g", lit(1)),
      Seq("g"), col("id"), col("v"), col("v"), k = 64)
    val merged = Sketches.wkmvMergeAgg(
      Sketches.wkmvSketch(rows, Seq("shard"), col("id"), col("v"),
        col("v"), k = 64), Nil, k = 64)
    assert(canon(direct) === canon(merged),
      "weighted priority sampling must merge EXACTLY (top-m of union)")
    assert(merged.select("wtot").as[Long].collect()(0) ===
      rows.agg(sum("v")).collect()(0).getLong(0))
    assert(merged.select("n").as[Long].collect()(0) === 300L)
    val re = Sketches.wkmvMergeAgg(
      Sketches.wkmvSketch(rows.repartition(13), Seq("shard"), col("id"),
        col("v"), col("v"), k = 64), Nil, k = 64)
    assert(canon(re) === canon(merged))
  }

  test("wkmvQuantiles: exhaustive sample == exact weighted quantiles; tau branch sane") {
    // weights = values, 1..100: W = 5050. The weighted median ("where
    // does the median unit of MASS live") is 71 (71·72/2 = 2556 ≥
    // 2525), NOT the unweighted 50 — the question this sketch answers.
    val rows = (1L to 100L).map(i => (i, i)).toDF("id", "v")
      .withColumn("g", lit(1))
    val q = Sketches.wkmvQuantiles(
      Sketches.wkmvSketch(rows, Seq("g"), col("id"), col("v"), col("v"),
        k = 128),
      Seq("g"), 128, Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(q.getAs[Long]("n") === 100L)
    assert(q.getAs[Long]("wtot") === 5050L)
    assert(q.getAs[Long]("m") === 100L) // exhaustive: tau = 0, exact
    assert(q.getAs[Long]("p50") === 71L)
    assert(q.getAs[Long]("p90") === 95L)  // 95·96/2 = 4560 ≥ 4545
    assert(q.getAs[Long]("p99") === 100L)
    // tau-ACTIVE branch (k = 16 < n): estimates stay monotone, in
    // range, and m pins the kept-row count; n/wtot stay exact
    val e = Sketches.wkmvQuantiles(
      Sketches.wkmvSketch(rows, Seq("g"), col("id"), col("v"), col("v"),
        k = 16),
      Seq("g"), 16, Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(e.getAs[Long]("m") === 16L)
    assert(e.getAs[Long]("n") === 100L && e.getAs[Long]("wtot") === 5050L)
    val (a, b, c) = (e.getAs[Long]("p50"), e.getAs[Long]("p90"),
      e.getAs[Long]("p99"))
    assert(a >= 1L && c <= 100L && a <= b && b <= c)
  }

  test("wkmvSketch population: null ids/values and weights < 1 are outside the sketch") {
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 5L), (2L, 20L, 0L),   // zero weight: no mass, excluded
      (3L, 30L, null),                // null weight
      (null, 40L, 2L),                // null id cannot hash
      (4L, null, 7L),                 // null value cannot rank
      (5L, 50L, 3L)
    ).toDF("id", "v", "w").withColumn("g", lit(1))
    val sk = Sketches.wkmvSketch(rows, Seq("g"), col("id"), col("v"),
      col("w"), k = 16).collect()(0)
    assert(sk.getAs[Long]("n") === 2L)     // rows 1 and 5 only
    assert(sk.getAs[Long]("wtot") === 8L)  // 5 + 3
    assert(sk.getAs[Seq[org.apache.spark.sql.Row]]("sample").map(
      _.getAs[Long]("id")).toSet === Set(1L, 5L))
  }

  test("sketches are self-describing: reader/merge k mismatch fails loudly (VERDICT r16 #2)") {
    def loud(body: => Unit, frag: String): Unit = {
      val ex = intercept[Exception] { body }
      def chain(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains(frag)) || chain(t.getCause))
      assert(chain(ex), s"expected '$frag' in: ${ex.getMessage}")
    }
    val rows = (1L to 200L).map(i => (i, i % 31, i % 4))
      .toDF("id", "v", "shard")
    val sk = Sketches.kmvSketch(rows, Seq("shard"), col("id"), col("v"),
      k = 64)
    // the silent-wrong path of r16: merging with a LARGER k than the
    // build k used to read truncated samples as exhaustive
    loud(Sketches.kmvMergeAgg(sk, Nil, k = 128).collect(), "build k")
    val wsk = Sketches.wkmvSketch(rows, Seq("shard"), col("id"), col("v"),
      col("v"), k = 64)
    loud(Sketches.wkmvMergeAgg(wsk, Nil, k = 128).collect(), "build k")
    loud(Sketches.wkmvQuantiles(
      Sketches.wkmvMergeAgg(wsk, Nil, k = 64), Nil, 128, Seq(0.5))
      .collect(), "build k")
    // a sketch stripped of its k column is refused up front
    intercept[IllegalArgumentException] {
      Sketches.kmvMergeAgg(sk.drop("k"), Nil, k = 64) }
    intercept[IllegalArgumentException] {
      Sketches.wkmvQuantiles(wsk.drop("k"), Seq("shard"), 64, Seq(0.5)) }
    // matched k still merges and reads fine
    assert(Sketches.kmvMergeAgg(sk, Nil, k = 64).count() === 1L)
    assert(Sketches.wkmvQuantiles(wsk, Seq("shard"), 64, Seq(0.5))
      .count() === 4L)
  }

  test("merge/reader k SMALLER than build k is legal and exact (prefix property, ADVICE r17)") {
    val rows = (1L to 300L).map(i => (i, (i * 17) % 101, i % 4))
      .toDF("id", "v", "shard")
    // kmv: merging 64-sketches down at k = 32 == sketching at 32 directly
    val sk64 = Sketches.kmvSketch(rows, Seq("shard"), col("id"), col("v"),
      k = 64)
    val down = Sketches.kmvMergeAgg(sk64, Nil, k = 32).collect()(0)
    val direct = Sketches.kmvMergeAgg(
      Sketches.kmvSketch(rows, Seq("shard"), col("id"), col("v"), k = 32),
      Nil, k = 32).collect()(0)
    assert(down.getAs[Int]("k") === 32)   // restamped to the merge k
    assert(down.getAs[Long]("n") === direct.getAs[Long]("n"))
    assert(down.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "sample").toSeq ===
      direct.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
        "sample").toSeq)
    // wkmv: reading a 64-sketch at k = 32 == quantiles of a 32-sketch
    val wsk64 = Sketches.wkmvSketch(rows, Seq("shard"), col("id"),
      col("v"), col("v") + 1, k = 64)
    val wsk32 = Sketches.wkmvSketch(rows, Seq("shard"), col("id"),
      col("v"), col("v") + 1, k = 32)
    val qDown = Sketches.wkmvQuantiles(wsk64, Seq("shard"), 32,
      Seq(0.5, 0.9)).orderBy("shard").collect()
    val qDirect = Sketches.wkmvQuantiles(wsk32, Seq("shard"), 32,
      Seq(0.5, 0.9)).orderBy("shard").collect()
    assert(qDown.toSeq === qDirect.toSeq)
    // and the weighted MERGE downsizes exactly too
    val wDown = Sketches.wkmvMergeAgg(wsk64, Nil, k = 32).collect()(0)
    val wDirect = Sketches.wkmvMergeAgg(wsk32, Nil, k = 32).collect()(0)
    assert(wDown.getAs[Int]("k") === 32)
    assert(wDown.getAs[Long]("wtot") === wDirect.getAs[Long]("wtot"))
    assert(wDown.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "sample").toSeq ===
      wDirect.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
        "sample").toSeq)
  }

  test("sketch APIs refuse grouping keys named after reserved outputs (ADVICE r17)") {
    val rows = (1L to 40L).map(i => (i, i % 7, i % 2)).toDF("id", "v", "k")
    def refused(body: => Any): Unit = {
      val ex = intercept[IllegalArgumentException] { body }
      assert(ex.getMessage.contains("reserved"), ex.getMessage)
    }
    refused(Sketches.kmvSketch(rows, Seq("k"), col("id"), col("v"), k = 16))
    refused(Sketches.wkmvSketch(rows, Seq("k"), col("id"), col("v"),
      col("v") + 1, k = 16))
    val ok = Sketches.kmvSketch(rows.withColumnRenamed("k", "shard"),
      Seq("shard"), col("id"), col("v"), k = 16)
    refused(Sketches.kmvMergeAgg(ok, Seq("sample"), k = 16))
    refused(Sketches.kmvQuantiles(ok, Seq("m"), Seq(0.5)))
    val wok = Sketches.wkmvSketch(rows.withColumnRenamed("k", "shard"),
      Seq("shard"), col("id"), col("v"), col("v") + 1, k = 16)
    refused(Sketches.wkmvMergeAgg(wok, Seq("wtot"), k = 16))
    refused(Sketches.wkmvQuantiles(wok, Seq("p50"), 16, Seq(0.5)))
  }

  test("mergeAgg: a hand-built EMPTY sample row fails loudly instead of vanishing (ADVICE r16)") {
    val rows = (1L to 50L).map(i => (i, i % 7, i % 2)).toDF("id", "v", "shard")
    val sk = Sketches.kmvSketch(rows, Seq("shard"), col("id"), col("v"),
      k = 16)
    // empty one shard's sample by hand — kmvSketch itself never emits
    // one; the old posexplode silently dropped the row's n
    val broken = sk.withColumn("sample",
      when(col("shard") === 0, expr("slice(sample, 1, 0)"))
        .otherwise(col("sample")))
    val ex = intercept[Exception] {
      Sketches.kmvMergeAgg(broken, Nil, k = 16).collect() }
    def chain(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("EMPTY sample")) ||
        chain(t.getCause))
    assert(chain(ex), s"expected EMPTY-sample raise, got: ${ex.getMessage}")
    val wsk = Sketches.wkmvSketch(rows, Seq("shard"), col("id"), col("v"),
      col("v"), k = 16)
    val wbroken = wsk.withColumn("sample",
      when(col("shard") === 0, expr("slice(sample, 1, 0)"))
        .otherwise(col("sample")))
    val wex = intercept[Exception] {
      Sketches.wkmvMergeAgg(wbroken, Nil, k = 16).collect() }
    assert(chain(wex), s"expected EMPTY-sample raise, got: ${wex.getMessage}")
  }

  test("wkmvQuantiles: relative grid is overflow-free far beyond the old ~9.2e12 weight bound (ADVICE r16)") {
    // w = v·1e12 → group weight 5.05e15; the old ABSOLUTE 1e-6 grid
    // summed ŵ·1e6 ≈ 1e20 into a long — silent wraparound in Spark
    // (non-ANSI), an engine-divergent error in DuckDB. The relative
    // grid caps per-row terms at 1e12, so the walk is exact at any
    // weight scale; weighted quantiles scale-invariantly match the
    // w = v fixture (median mass at 71).
    val rows = (1L to 100L).map(i => (i, i, i * 1000000000000L))
      .toDF("id", "v", "w").withColumn("g", lit(1))
    val q = Sketches.wkmvQuantiles(
      Sketches.wkmvSketch(rows, Seq("g"), col("id"), col("v"), col("w"),
        k = 128),
      Seq("g"), 128, Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(q.getAs[Long]("wtot") === 5050000000000000L)
    assert(q.getAs[Long]("p50") === 71L)
    assert(q.getAs[Long]("p90") === 95L)
    assert(q.getAs[Long]("p99") === 100L)
  }

  test("wkmvQuantiles: weight-scale invariance — w and w·2^20 give identical quantiles (tau active)") {
    // the relative grid's defining law: a uniform power-of-two weight
    // scale multiplies every priority, tau, and hat-w EXACTLY (mantissas
    // untouched), so the kept set, the hw/max-hw ratios, and the whole
    // quantized walk are bit-identical — only wtot changes. k = 16 < n
    // keeps tau ACTIVE so the estimator branch (not just exact weights)
    // is under test.
    def quants(scale: Long) = Sketches.wkmvQuantiles(
        Sketches.wkmvSketch(
          (1L to 100L).map(i => (i, i, ((i * 13) % 97 + 1) * scale))
            .toDF("id", "v", "w").withColumn("g", lit(1)),
          Seq("g"), col("id"), col("v"), col("w"), k = 16),
        Seq("g"), 16, Seq(0.5, 0.9, 0.99)).collect()(0)
    val base = quants(1L)
    val scaled = quants(1L << 20)
    assert(base.getAs[Long]("m") === 16L)
    for (c <- Seq("m", "n", "p50", "p90", "p99"))
      assert(base.getAs[Long](c) === scaled.getAs[Long](c),
        s"column $c must be scale-invariant")
    assert(scaled.getAs[Long]("wtot") === base.getAs[Long]("wtot") * (1L << 20))
  }
}

class JoinOpsSpec extends SparkTestBase {
  import spark.implicits._
  import graft.ops.JoinOps

  // heavy skew: key 1 owns 5000 of 5100 big-side rows
  private val big = ((1 to 5000).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => ((i % 10 + 2).toLong, 10000L + i))).toDF("k", "row_id")
  private val small = (1L to 12L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("saltedEquiJoin == plain join on a skewed key; salt spreads the hot key") {
    val plain = big.join(small, "k")
    val salted = JoinOps.saltedEquiJoin(big, small, "k", $"row_id", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.columns.sorted === plain.columns.sorted)
    val a = salted.select("k", "row_id", "name").collect().map(_.toSeq).toSet
    assert(a === plain.select("k", "row_id", "name").collect().map(_.toSeq).toSet)
    // the hot key's rows really do land in multiple shards
    val shards = big.filter($"k" === 1L)
      .select(pmod(graft.ext.TextAnalysis.h60($"row_id".cast("string")), lit(8)))
      .distinct().count()
    assert(shards === 8L, "h60 salting must spread the hot key across all shards")
    intercept[IllegalArgumentException] {
      JoinOps.saltedEquiJoin(big, small, "k", $"row_id", salts = 1) }
    // a null rowKey must not lose the row (the plain join keeps it)
    val withNull = Seq((1L, Some(7L)), (1L, None)).toDF("k", "row_id")
    assert(JoinOps.saltedEquiJoin(withNull, small, "k", $"row_id", 4).count() === 2)
  }

  test("bloomKeep: zero false negatives; bloomFilteredJoin == plain join") {
    val build = small.filter($"k" <= 4L)
    val mask = JoinOps.bloomMask(build, $"k")
    // every matching probe row survives the mask
    val matching = big.filter($"k" <= 4L)
    assert(matching.filter(!JoinOps.bloomKeep($"k", mask)).count() === 0,
      "a Bloom mask can never reject a true member")
    // end-to-end equality with the plain join
    val plain = big.join(build, "k").select("k", "row_id", "name")
      .collect().map(_.toSeq).toSet
    val filtered = JoinOps.bloomFilteredJoin(big, build, "k")
      .select("k", "row_id", "name").collect().map(_.toSeq).toSet
    assert(filtered === plain)
    // and the mask genuinely filters: keys far outside the build set die
    val misses = (100L to 1099L).toDF("k")
      .filter(JoinOps.bloomKeep($"k", mask)).count()
    assert(misses <= 5, s"false-positive rate implausibly high: $misses/1000")
  }

  test("rangeJoinBinned == naive range join: negatives, multi-bin spans, boundary hits, equi keys") {
    // intervals straddle zero, span 1-40 bins (width 10), and overlap
    val ivals = Seq((0, -25L, 5L), (1, -3L, 370L), (2, 10L, 10L), (3, 5L, 45L))
      .toDF("iv_id", "lo", "hi")
    val pts = (-40L to 400L by 3L).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pt_id", "p")
    val naive = pts.crossJoin(ivals).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("pt_id", "iv_id").collect().map(_.toSeq).toSet
    val binned = JoinOps.rangeJoinBinned(pts, "p", ivals, "lo", "hi", binWidth = 10L)
      .select("pt_id", "iv_id").collect().map(_.toSeq).toSet
    assert(binned === naive, "bin decomposition must be exactly the range join")
    // inclusive boundaries: a point AT lo and AT hi both match
    val edge = Seq((0L, -25L), (1L, 5L)).toDF("pt_id", "p")
    assert(JoinOps.rangeJoinBinned(edge, "p",
      ivals.filter($"iv_id" === 0), "lo", "hi", 10L).count() === 2)
    // per-user windows: the equi key confines matches to the same user
    val uIvals = Seq((1L, 0L, 100L), (2L, 0L, 100L)).toDF("user", "lo", "hi")
    val uPts = Seq((1L, 50L, "a"), (2L, 50L, "b"), (3L, 50L, "c")).toDF("user", "p", "tag")
    val byUser = JoinOps.rangeJoinBinned(uPts, "p", uIvals, "lo", "hi", 10L,
      equiKeys = Seq("user"))
    assert(byUser.select("tag").as[String].collect().sorted === Array("a", "b"))
    intercept[IllegalArgumentException] {
      JoinOps.rangeJoinBinned(pts, "p", ivals, "lo", "hi", 0L) }
  }

  test("rangeJoinBinned: a crafted hot bin actually fires AQE skew-split (VERDICT r10 #8)") {
    // The scaladoc claims a hot bin "is AQE-skew-splittable because the
    // join is a plain equi-join" — pin it: one bin holds 20k padded
    // points (~2 MB of shuffle bytes), the rest are sparse; with the
    // skew thresholds tuned to test scale, the executed plan must show
    // the skew=true SMJ marker AND return exactly the unsplit answer.
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.shuffle.partitions" -> "4") {
      val binW = 1000L
      // skew detection reads COMPRESSED map-output sizes, so the padding
      // must be high-entropy (constant strings compress below any
      // threshold): 3 chained md5s ≈ 96 hex chars per row
      def pad(seed: String) = concat(md5(concat(lit(seed), col("id"))),
        md5(concat(lit(seed), col("id") * 31)),
        md5(concat(lit(seed), col("id") + 1000000)))
      val hot = spark.range(20000)
        .select(lit(500L).as("p"), pad("x").as("pad"))
      val sparse = spark.range(2000)
        .select(((col("id") % 1000L + 1L) * binW + 7L).as("p"),
          pad("y").as("pad"))
      val pts2 = hot.unionByName(sparse)
      val ivs = spark.range(1001)
        .select(col("id").as("iv_id"), (col("id") * binW).as("lo"),
          (col("id") * binW + binW - 1).as("hi"))
      val out = JoinOps.rangeJoinBinned(pts2, "p", ivs, "lo", "hi", binW)
      // every point sits in exactly one interval
      assert(out.count() === 22000L)
      val mat = JoinOps.rangeJoinBinned(pts2, "p", ivs, "lo", "hi", binW)
      mat.collect() // materialize THIS QueryExecution for the final AQE plan
      val plan = mat.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"the hot bin must be skew-split at these thresholds:\n$plan")
    }
  }
}

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark query"),      // heavy on a rare-ish term
    (2L, "the the the the the the spark"),// long doc, one hit
    (3L, "query window"),                 // short doc, two distinct hits
    (4L, "the and of")                    // no query terms
  ).toDF("doc_id", "text")

  test("bm25: no-hit docs absent; rarity and tf both push scores the right way") {
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "query", "window"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(got.keySet === Set(1L, 2L, 3L), "doc 4 has no query term")
    assert(got(1L) > got(2L), "tf=3 short doc must outscore tf=1 long doc")
    assert(got(3L) > got(2L), "two distinct rare terms beat one hit in a long doc")
    assert(got.values.forall(_ > 0))
  }

  test("bm25 score is partitioning-invariant (decimal contribution sum)") {
    val a = Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val b = Retrieval.bm25(docs.repartition(7), "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(a === b)
    intercept[IllegalArgumentException] { Retrieval.bm25(docs, "doc_id", "text", Nil) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25(docs, "doc_id", "text", Seq("a", "a")) }
  }

  test("inverted index: df/cf exact, postings sorted, minDf prunes the hapax tail") {
    val got = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toList
      .sortBy(_._1)
    val byTerm = got.map(t => t._1 -> t).toMap
    assert(byTerm("spark") === ("spark", 2L, 4L, md5Hex("1,2")))
    assert(byTerm("query") === ("query", 2L, 2L, md5Hex("1,3")))
    assert(byTerm("the")   === ("the", 2L, 7L, md5Hex("2,4")))
    assert(byTerm("window")._2 === 1L)
    // minDf=2 drops the df=1 tail (window, and, of)
    val pruned = Retrieval.invertedIndex(docs, "doc_id", "text", minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(pruned === Set("spark", "query", "the"))
  }

  test("inverted index: maxDf cuts hot terms before postings; survivors identical to unguarded") {
    // 'the' (df=2) is the hot term at cap 1; the guard must drop it while
    // every surviving term's row (df, cf, postings) is bit-identical to
    // the unguarded index — the pre-pass prunes, never perturbs.
    val guarded = Retrieval.invertedIndex(docs, "doc_id", "text", maxDf = Some(1L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(guarded.forall(_._2 <= 1L), s"df above cap survived: ${guarded.toList}")
    assert(guarded.map(_._1).toSet === Set("window", "and", "of"))
    val full = Retrieval.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter(_._2 <= 1L).toSet
    assert(guarded.toSet === full)
    // the relative cap resolves in-plan: frac 0.25 of 4 docs == maxDf 1
    val frac = Retrieval.invertedIndex(docs, "doc_id", "text",
      maxDfFrac = Some(0.25))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(frac.toSet === guarded.toSet,
      "maxDfFrac = 0.25 over 4 docs must equal maxDf = 1 exactly")
    intercept[IllegalArgumentException] {
      Retrieval.invertedIndex(docs, "doc_id", "text", minDf = 3L, maxDf = Some(2L)) }
    intercept[IllegalArgumentException] {
      Retrieval.invertedIndex(docs, "doc_id", "text",
        maxDf = Some(2L), maxDfFrac = Some(0.5)) }
    intercept[IllegalArgumentException] {
      Retrieval.invertedIndex(docs, "doc_id", "text", maxDfFrac = Some(1.5)) }
  }

  test("rrfFuse: sums 1/(c+rank) per id; single-list ids score once") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rnk")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rnk", c = 60)
      .collect().map(r => r.getLong(0) ->
        (r.getDecimal(1).doubleValue(), r.getLong(2))).toMap
    // 11 appears in both lists: round(1/62,6) + round(1/61,6)
    assert(got(11L) === ((0.016129 + 0.016393, 2L)))
    assert(got(10L) === ((0.016393, 1L)))
    assert(got(12L) === ((0.015873, 1L)))
    assert(got(13L) === ((0.016129, 1L)))
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil, "id", "rnk") }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), "id", "rnk", c = 0) }
  }

  test("index segments: merge of disjoint segments == from-scratch build, any split, any merge order") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy dog and the quick cat"),
      (3L, "brown dog brown fox"),
      (4L, "entirely different words here")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[org.apache.spark.sql.Row](3).map(p => (p.getLong(0), p.getLong(1))))).toSet
    val whole = canon(Retrieval.indexSegment(docs, "doc_id", "text"))
    val evens = Retrieval.indexSegment(docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val odds = Retrieval.indexSegment(docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text")
    assert(canon(Retrieval.mergeSegments(Seq(evens, odds))) === whole)
    assert(canon(Retrieval.mergeSegments(Seq(odds, evens))) === whole,
      "merge must be order-independent")
    // 4-way split, including an empty segment
    val four = (0 until 4).map(i =>
      Retrieval.indexSegment(docs.filter($"doc_id" % 4 === i), "doc_id", "text"))
    assert(canon(Retrieval.mergeSegments(four)) === whole)
    intercept[IllegalArgumentException] { Retrieval.mergeSegments(Nil) }
  }

  private def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  test("transitionMatrix: adjacency in (ts, id) order, per-key boundaries, rows normalize to 1") {
    val ev = Seq(
      (1L, 100L, 0L, "a"), (2L, 100L, 10L, "b"), (3L, 100L, 20L, "a"),
      // a ts tie: event_id breaks it (4 before 5)
      (4L, 100L, 30L, "c"), (5L, 100L, 30L, "a"),
      // user 200's stream never chains into user 100's
      (6L, 200L, 5L, "b")
    ).toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = Events.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
    assert(got(("a", "b")) === ((1L, 2L, 0.5)))
    assert(got(("a", "c")) === ((1L, 2L, 0.5)))
    assert(got(("b", "a")) === ((1L, 1L, 1.0)))
    // single-event user contributes no adjacency
    assert(got.values.map(_._1).sum === 4L)
    // partition-layout invariance
    val again = Events.transitionMatrix(ev.repartition(7)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again === got.map { case (k, v) => k -> v._1 })
  }

  test("decayedEngagement: dyadic weights, horizon zeroing, exact order-free sums") {
    val day = 86400000L
    val ref = 1000L * day
    val ev = Seq(
      (1L, 7L, ref),             // age 0   -> weight 1
      (2L, 7L, ref - 7 * day),   // 1 half-life -> 0.5
      (3L, 7L, ref - 14 * day),  // 2 -> 0.25
      (4L, 7L, ref - 300 * day), // beyond 20 half-lives -> exactly 0
      (5L, 8L, ref - 6 * day)    // age < halfLife -> still weight 1
    ).toDF("event_id", "user_id", "ts_ms")
    val got = Events.decayedEngagement(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(7L) === ((4L, 1.75)))
    assert(got(8L) === ((1L, 1.0)))
    val again = Events.decayedEngagement(ev.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again === got, "dyadic sums must be bit-identical under any layout")
    intercept[IllegalArgumentException] { Events.decayedEngagement(ev, halfLifeDays = 0) }
    intercept[IllegalArgumentException] { Events.decayedEngagement(ev, horizonHalfLives = 60) }
  }

  test("gap sessionization: 30-min gap starts a new session") {
    val min = 60000L
    val ev = Seq(
      (1L, 100L, 0L * min), (2L, 100L, 10L * min), (3L, 100L, 50L * min),
      (4L, 200L, 0L * min)
    ).toDF("event_id", "user_id", "ts_ms")
    val stats = Events.sessionStats(ev).orderBy("user_id").collect()
    assert(stats(0).getLong(1) === 2L) // user 100: sessions {0,10} and {50}
    assert(stats(0).getLong(2) === 3L)
    assert(stats(0).getLong(3) === 10L * min) // longest = first session
    assert(stats(1).getLong(1) === 1L)
  }

  test("rateAnomalies: engineered spike flags; constant history scores z=0; partial windows emit nothing") {
    val hour = 3600000L
    // type "a": 24 alternating 9/11-count hours, then one 100-event hour
    val ev = ((0 until 24).flatMap { h =>
      val n = if (h % 2 == 0) 9 else 11
      (0 until n).map(i => ("a", h * hour + i))
    } ++ (0 until 100).map(i => ("a", 24 * hour + i)) ++
      // type "b": 25 perfectly constant hours -> sigma=0 -> z=0, no flag
      (0 until 25).flatMap(h => (0 until 5).map(i => ("b", h * hour + i))))
      .map { case (t, ts) => (t, ts.toLong) }.toDF("event_type", "ts_ms")
    val got = Events.rateAnomalies(ev, trailing = 24, zThresh = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    // only buckets 24 (one per type) have a full 24-bucket history
    assert(got.length === 2)
    val a = got.find(_._1 == "a").get
    assert(a._3 === 100L && a._5, s"the 10x spike must flag: $a")
    assert(a._4 > 50, s"z should be huge against sigma=1 history: $a")
    val b = got.find(_._1 == "b").get
    assert(b._4 === 0.0 && !b._5, s"constant history must score z=0: $b")
  }

  test("rateSeriesFilled: gaps become explicit zeros on one shared grid; span guard trips loudly") {
    val hour = 3600000L
    // "a" observed hours 0 and 3; "b" only hour 1 — the shared grid is
    // hours 0..3 for BOTH types
    val ev = Seq(("a", 0L), ("a", 1L), ("a", 3 * hour),
      ("b", hour)).toDF("event_type", "ts_ms")
    val got = Events.rateSeriesFilled(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("a", 0L, 2L), ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 0L, 0L), ("b", 1L, 1L), ("b", 2L, 0L), ("b", 3L, 0L)),
      s"zero-filled shared grid: $got")
    assert(Events.rateSeriesFilled(ev.limit(0)).count() === 0L,
      "empty input -> empty grid, no null explosion")
    val ex = intercept[Exception] {
      Events.rateSeriesFilled(ev, bucketMs = 1L, maxGridBuckets = 100L)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("grid span exceeds")))
  }

  test("retentionCohorts: triangular matrix; pre-anchor activity excluded; hot users count once per period") {
    val day = 86400000L
    val ev = Seq(
      // u1: signs up day 0, active days 0, 1, 3 (day-2 gap)
      (100L, "signup", 0L), (100L, "click", day + 5L), (100L, "view", 3 * day),
      // u2: signs up day 1, active day 1 only — but a HOT day (3 events)
      (200L, "signup", day), (200L, "click", day + 1L), (200L, "click", day + 2L),
      // u3: browses day 0 (pre-anchor — must NOT count), signs up day 2
      (300L, "view", 5L), (300L, "signup", 2 * day),
      // u4: never signs up — excluded entirely
      (400L, "view", day)
    ).toDF("user_id", "event_type", "ts_ms")
    val got = Events.retentionCohorts(ev, "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L), // u1's days 0/1/3
      (1L, 0L, 1L),                             // u2 once despite 3 events
      (2L, 0L, 1L)))                            // u3's day-0 view dropped
    intercept[IllegalArgumentException] {
      Events.retentionCohorts(ev, "signup", periodMs = 0L) }
  }

  test("funnel: in-order users advance, out-of-order and stalled users stop at their last ordered step") {
    val ev = Seq(
      // u1: full ordered funnel
      (100L, "view", 10L), (100L, "click", 20L), (100L, "buy", 30L),
      // u2: clicked BEFORE viewing -> stops at view
      (200L, "click", 5L), (200L, "view", 10L),
      // u3: view + click same ms -> strict > stops at view
      (300L, "view", 10L), (300L, "click", 10L),
      // u4: view then click, no buy
      (400L, "view", 1L), (400L, "click", 2L),
      // u5: never viewed
      (500L, "click", 1L), (500L, "buy", 2L)
    ).toDF("user_id", "event_type", "ts_ms")
    val got = Events.funnel(ev, Seq("view", "click", "buy"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((0, "view", 4L), (1, "click", 2L), (2, "buy", 1L)))
    intercept[IllegalArgumentException] { Events.funnel(ev, Nil) }
  }

  test("funnel with conversion window: late conversions drop; boundary is inclusive; greedy earliest entry") {
    val ev = Seq(
      // u1: click 5ms after view (inside w=10), buy 10ms after click
      // (exactly AT the boundary -> inclusive, converts)
      (100L, "view", 10L), (100L, "click", 15L), (100L, "buy", 25L),
      // u2: click 11ms after view -> outside w=10, stops at view
      (200L, "view", 10L), (200L, "click", 21L),
      // u3: GREEDY earliest entry: first click at 15 is taken even though
      // the later click at 30 would have put the buy at 35 in window —
      // so u3 stops at click (35 > 15 + 10)
      (300L, "view", 10L), (300L, "click", 15L), (300L, "click", 30L),
      (300L, "buy", 35L)
    ).toDF("user_id", "event_type", "ts_ms")
    val got = Events.funnel(ev, Seq("view", "click", "buy"),
        windowMs = Some(10L))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq === Seq((0, 3L), (1, 2L), (2, 1L)))
    // unwindowed on the same data: u2's late click now counts (no buy
    // event, so u2 still stops there) and u3's buy converts off the
    // earliest click — only the window separates the two runs
    val open = Events.funnel(ev, Seq("view", "click", "buy"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(open.toSeq === Seq(3L, 3L, 2L))
    intercept[IllegalArgumentException] {
      Events.funnel(ev, Seq("view"), windowMs = Some(0L)) }
  }

  test("scd2History: runs fold to intervals, ties break on tieCol, NULL is a real state") {
    val log = Seq(
      // user 100: A A B B A -> three versions
      (100L, 1L, 1L, Some("A")), (100L, 2L, 2L, Some("A")),
      (100L, 3L, 3L, Some("B")), (100L, 4L, 4L, Some("B")),
      (100L, 5L, 5L, Some("A")),
      // user 200: two DIFFERENT states at ts=1 — event_id orders them, so
      // X opens a zero-width interval closed by Y at the same instant
      (200L, 1L, 10L, Some("X")), (200L, 1L, 11L, Some("Y")),
      (200L, 2L, 12L, Some("Y")),
      // user 300: NULL state between two As is its own version (struct
      // equality is null-safe — a null run folds like any other)
      (300L, 1L, 20L, Some("A")), (300L, 2L, 21L, None),
      (300L, 3L, 22L, Some("A"))
    ).toDF("user_id", "ts_ms", "event_id", "state")
    val h = Events.scd2History(log, "user_id", "ts_ms", "event_id",
        Seq("state"))
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getInt(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(h.toSeq === Seq(
      (100L, "A", 1, 1L, 3L, false),
      (100L, "B", 2, 3L, 5L, false),
      (100L, "A", 3, 5L, -1L, true),
      (200L, "X", 1, 1L, 1L, false),
      (200L, "Y", 2, 1L, -1L, true),
      (300L, "A", 1, 1L, 2L, false),
      (300L, null, 2, 2L, 3L, false),
      (300L, "A", 3, 3L, -1L, true)))
    // exactly one current version per key
    assert(h.filter(_._6).map(_._1).toSeq === Seq(100L, 200L, 300L))
    intercept[IllegalArgumentException] {
      Events.scd2History(log, "user_id", "ts_ms", "event_id", Seq()) }
  }

  test("scd2History: multi-column state changes when ANY field differs") {
    val log = Seq(
      (1L, 1L, 1L, "gold", "eu"), (1L, 2L, 2L, "gold", "us"), // region flips
      (1L, 3L, 3L, "gold", "us"), (1L, 4L, 4L, "pro", "us")   // tier flips
    ).toDF("id", "ts_ms", "seq", "tier", "region")
    val h = Events.scd2History(log, "id", "ts_ms", "seq",
        Seq("tier", "region"))
      .orderBy("version").collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(3)))
    assert(h.toSeq === Seq(("gold", "eu", 1), ("gold", "us", 2),
      ("pro", "us", 3)))
  }

  test("forwardFill: carries last non-null per key in order; obs_seen 0 before first") {
    val ev = Seq(
      (1L, 1L, 100L, None: Option[Double]),
      (2L, 1L, 200L, Some(5.0)),
      (3L, 1L, 300L, None: Option[Double]),
      (4L, 1L, 400L, Some(7.0)),
      (5L, 2L, 100L, None: Option[Double]),
      (6L, 2L, 200L, None: Option[Double]))
      .toDF("event_id", "user_id", "ts_ms", "v")
    val got = Events.forwardFill(ev, "user_id", "v",
        Seq("ts_ms", "event_id"), "f")
      .orderBy("event_id")
      .collect().map(r => (Option(r.get(4)), r.getLong(5)))
    assert(got.toSeq === Seq((None, 0L), (Some(5.0), 1L), (Some(5.0), 1L),
      (Some(7.0), 2L), (None, 0L), (None, 0L)))
    // layout-invariant: the running frame sorts inside the key
    val again = Events.forwardFill(ev.repartition(5), "user_id", "v",
        Seq("ts_ms", "event_id"), "f")
      .orderBy("event_id").collect().map(r => (Option(r.get(4)), r.getLong(5)))
    assert(again.toSeq === got.toSeq)
  }

  test("mergeIntervals: overlapping/nested/touching merge; disjoint split; per-key isolation") {
    val iv = Seq(
      (1L, 0L, 10L),   // island 1: [0,10]
      (1L, 5L, 7L),    //   nested
      (1L, 10L, 20L),  //   touching (closed ends merge)
      (1L, 25L, 30L),  // island 2
      (2L, 0L, 100L))  // other key untouched
      .toDF("k", "s", "e")
    val got = graft.ext.Events.mergeIntervals(iv, "k", "s", "e")
      .orderBy("k", "island_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq((1L, 1L, 0L, 20L, 3L), (1L, 2L, 25L, 30L, 1L),
      (2L, 1L, 0L, 100L, 1L)))
    // an interval swallowed by a PREDECESSOR'S reach (not its immediate
    // neighbor) must still merge: running max, not lag
    val reach = Seq((1L, 0L, 50L), (1L, 10L, 20L), (1L, 30L, 40L))
      .toDF("k", "s", "e")
    assert(graft.ext.Events.mergeIntervals(reach, "k", "s", "e").count() === 1)
  }

  test("ewmaDyadic: exact dyadic weights, short-history renormalization, horizon cutoff") {
    val ev = Seq((1L, 1L, 1L, 8.0), (2L, 1L, 2L, 4.0), (3L, 1L, 3L, 2.0))
      .toDF("event_id", "k", "ts", "v")
    val got = graft.ext.Events.ewmaDyadic(ev, "k", "v", Seq("ts", "event_id"),
        horizon = 2)
      .orderBy("event_id").collect().map(_.getAs[Double]("ewma"))
    // row1: 8; row2: (4*4 + 8*2)/6 = 5.333333; row3: (2*4+4*2+8*1)/7 = 24/7
    assert(got.toSeq === Seq(8.0, 5.333333, 3.428571))
    // beyond the horizon the old value drops out entirely
    val ev4 = Seq((1L, 1L, 1L, 800.0), (2L, 1L, 2L, 4.0), (3L, 1L, 3L, 2.0),
      (4L, 1L, 4L, 2.0)).toDF("event_id", "k", "ts", "v")
    val last = graft.ext.Events.ewmaDyadic(ev4, "k", "v",
        Seq("ts", "event_id"), horizon = 2)
      .orderBy("event_id").collect().last.getAs[Double]("ewma")
    assert(last === 2.285714) // round6 of 16/7: the 800 fell off entirely
    // DECIMAL accumulator: horizon=40 with |v| = 10⁶ makes each term
    // v6·2^40 ≈ 1.1·10²⁴ — far past Long — yet a constant series must
    // still return exactly the constant (a wrapped Long would not)
    val big = Seq.tabulate(3)(i => (i.toLong, 1L, i.toLong, 1000000.0))
      .toDF("event_id", "k", "ts", "v")
    val bigGot = graft.ext.Events.ewmaDyadic(big, "k", "v",
        Seq("ts", "event_id"), horizon = 40)
      .collect().map(_.getAs[Double]("ewma"))
    assert(bigGot.forall(_ === 1000000.0),
      s"horizon-40 large-value EWMA wrapped: ${bigGot.toSeq}")
  }

  test("cusumShift: flat series never alarms; a step shift alarms at the right instant") {
    val flat = Seq.tabulate(20)(i => (i.toLong, 1L, i.toLong, 10.0))
      .toDF("event_id", "k", "ts", "v")
    val r1 = graft.ext.Events.cusumShift(flat, "k", "v",
      Seq("ts", "event_id"), threshold = 0.5).collect()(0)
    assert(r1.isNullAt(2) && r1.getDouble(4) === 0.0)
    // 10 rows at 0 then 10 rows at 10: mean 5; |D_t|/n peaks mid-series
    val step = Seq.tabulate(20)(i =>
      (i.toLong, 1L, i.toLong, if (i < 10) 0.0 else 10.0))
      .toDF("event_id", "k", "ts", "v")
    val r2 = graft.ext.Events.cusumShift(step, "k", "v",
      Seq("ts", "event_id"), threshold = 20.0).collect()(0)
    // cum deviation after t rows of zeros = 5t; crosses 20 at t=5 (ts 4)
    assert(r2.getLong(2) === 4L && r2.getDouble(4) === 50.0)
  }

  test("funnelWithExclusion: error between blocks; error outside does not; no-end is unconverted") {
    val ev = Seq(
      // user 1: signup(1) -> error(2) -> purchase(3): blocked
      (1L, 1L, 1L, "signup"), (2L, 1L, 2L, "error"), (3L, 1L, 3L, "purchase"),
      // user 2: error(0) -> signup(1) -> purchase(2) -> error(3): converts
      (4L, 2L, 0L, "error"), (5L, 2L, 1L, "signup"),
      (6L, 2L, 2L, "purchase"), (7L, 2L, 3L, "error"),
      // user 3: signup, no purchase
      (8L, 3L, 1L, "signup"),
      // user 4: purchase BEFORE signup only: not converted
      (9L, 4L, 0L, "purchase"), (10L, 4L, 1L, "signup"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = graft.ext.Events.funnelWithExclusion(ev, "signup", "purchase",
        "error")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(5)), r.getBoolean(6)))
    assert(got.toSeq === Seq((1L, Some(1L), false), (2L, Some(0L), true),
      (3L, None, false), (4L, None, false)))
  }

  test("trailingWindowFeatures: RANGE frame includes tie peers and the exact window edge") {
    val ev = Seq(
      (1L, 1L, 1000L, "view", 1.0),
      (2L, 1L, 1000L, "purchase", 9.0),   // tie with event 1: peers see each other
      (3L, 1L, 1500L, "view", 2.0),
      (4L, 1L, 2000L, "view", 3.0),       // window 1000: includes ts>=1000 (edge)
      (5L, 1L, 5000L, "purchase", 4.0),   // far: only itself
      (6L, 2L, 1000L, "view", 7.0))
      .toDF("event_id", "user_id", "ts_ms", "event_type", "value")
    val got = Events.trailingWindowFeatures(ev, "user_id", "ts_ms",
        1000L, "purchase")
      .orderBy("event_id")
      .select("n_window", "n_marked", "max_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, 1L, 9.0), (2L, 1L, 9.0), (3L, 1L, 9.0),
      (4L, 1L, 9.0), (1L, 1L, 4.0), (1L, 0L, 7.0)))
  }

  test("applyChangelog: latest op wins, D deletes, I inserts new keys, untouched base survives") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val log = Seq(
      (2L, 1L, "U", "b2", 21.0), (2L, 2L, "U", "b3", 22.0), // last wins
      (3L, 1L, "D", null.asInstanceOf[String], 0.0),        // delete
      (4L, 1L, "I", "d", 40.0),                             // insert
      (5L, 1L, "I", "e", 50.0), (5L, 2L, "D", null.asInstanceOf[String], 0.0))
      .toDF("k", "seq", "op", "s", "v")
    val got = graft.ops.Resolve.applyChangelog(base, log, "k",
        Seq("seq"), "op", Seq("s", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b3", 22.0),
      (4L, "d", 40.0)))
  }

  test("twoProportionTest: hand z; zero-variance pooled rate yields null, not a crash") {
    // A: 30/100, B: 10/100 -> pooled 0.2; se = sqrt(.2*.8*.02) = .056569
    // z = .2/.056569 = 3.535534 -> significant
    val rows = Seq.fill(30)(("a", true)) ++ Seq.fill(70)(("a", false)) ++
      Seq.fill(10)(("b", true)) ++ Seq.fill(90)(("b", false))
    val r = graft.ext.Profile.twoProportionTest(rows.toDF("g", "y"),
      col("g") === "a", col("g") === "b", col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (100L, 30L, 100L, 10L))
    assert(r.getDouble(6) === 3.535534 && r.getBoolean(7))
    val degen = Seq(("a", false), ("b", false)).toDF("g", "y")
    val d = graft.ext.Profile.twoProportionTest(degen,
      col("g") === "a", col("g") === "b", col("y")).collect()(0)
    assert(d.isNullAt(6), "pooled rate 0 has zero variance: z must be null")
  }

  test("interArrivalStats: gaps are same-type per-user; exact rank percentiles") {
    val ev = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "a"), (3L, 1L, 40L, "a"),
      (4L, 1L, 5L, "b"),                      // other type: no a-gap
      (5L, 2L, 100L, "a"), (6L, 2L, 110L, "a"))
      .toDF("event_id", "user_id", "ts_ms", "event_type")
    val got = graft.ext.Events.interArrivalStats(ev).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // type a gaps: 10, 30 (user1), 10 (user2): p50 = 10, p95 = 30
    assert(got.toSeq === Seq(("a", 3L, 10L, 30L, 30L)))
  }

  test("concentration + coverageCurve: hand-computed gini/entropy/k; uniform gini is 0") {
    val df = (Seq.fill(1)("a") ++ Seq.fill(3)("b")).map(g => (g, 0))
      .toDF("g", "x")
    val c = graft.ext.Profile.concentration(df, "g").collect()(0)
    // ranks asc: (a,1),(b,3): sum (2i-n-1)x = -1 + 3 = 2; / (2*4) = 0.25
    assert((c.getLong(0), c.getLong(1), c.getDouble(2)) === (2L, 4L, 0.25))
    assert(c.getDouble(3) === 0.562336) // round6(.25 ln4) + round6(.75 ln(4/3))
    val uni = Seq(("a", 0), ("b", 0)).toDF("g", "x")
    assert(graft.ext.Profile.concentration(uni, "g").collect()(0)
      .getDouble(2) === 0.0, "uniform sizes mean zero gini")
    val k = graft.ext.Profile.coverageCurve(df, "g").collect()(0)
    assert((k.getLong(0), k.getLong(1), k.getLong(2), k.getLong(3)) ===
      (2L, 1L, 2L, 2L))
  }

  test("apportion: quotas sum to the budget exactly; remainder ties break by group value") {
    // sizes 1/1/1: budget 4 -> floors 1 each, one seat left, tie on
    // remainder 1/3 -> lexicographically first group gets it
    val df = Seq("a", "b", "c").map(g => (g, 0)).toDF("g", "x")
    val got = graft.ext.TextAnalysis.apportion(df, "g", 4L)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 2L), ("b", 1L), ("c", 1L)))
    // skewed sizes: proportionality + exact-sum invariant
    val big = (Seq.fill(70)("w") ++ Seq.fill(20)("x") ++ Seq.fill(7)("y") ++
      Seq.fill(3)("z")).map(g => (g, 0)).toDF("g", "x")
    val q = graft.ext.TextAnalysis.apportion(big, "g", 37L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q.values.sum === 37L, "quotas must sum to the budget EXACTLY")
    assert(q("w") >= 25L && q("z") >= 1L,
      "proportionality: the 70% group dominates, the 3% group still seats")
  }

  test("skewReport: exact rank percentiles from counts-of-counts; top-1 share") {
    val rows = Seq.tabulate(4)(i => (s"k$i", 0)) ++
      Seq.fill(97)(("hot", 0))
    val r = graft.ops.JoinOps.skewReport(rows.toDF("k", "x"), "k")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (101L, 5L, 97L, 1L, 97L))
    assert(r.getDouble(5) === 0.960396) // round6(97/101)
  }

  test("bucketDiff: identical replicas are silent; one perturbed row dirties its bucket only") {
    val a = Seq.tabulate(200)(i => (i.toLong, s"v$i")).toDF("id", "s")
    assert(graft.ext.Profile.bucketDiff(a, a, Seq("id"), Seq("id", "s"),
      16).count() === 0L, "clean replicas must exchange zero dirty buckets")
    val b = a.withColumn("s",
      when(col("id") === 42L, lit("changed")).otherwise(col("s")))
    val dirty = graft.ext.Profile.bucketDiff(a, b, Seq("id"),
      Seq("id", "s"), 16).collect()
    assert(dirty.length === 1, "one changed row must dirty exactly one bucket")
    val d = dirty(0)
    assert(d.getLong(1) === d.getLong(4),
      "a value change keeps the bucket's row count")
    assert(d.getLong(2) !== d.getLong(5),
      "sum_mod must catch the changed value")
  }

  test("ancestorRoots: chains, singleton roots, forest isolation; cycle throws loudly") {
    // two trees: 1 <- 2 <- 4 <- 8 (depth 3) and 3 <- 6; singleton 5
    val nodes = Seq((1L, None), (2L, Some(1L)), (4L, Some(2L)),
      (8L, Some(4L)), (3L, None), (6L, Some(3L)), (5L, None))
      .toDF("id", "parent")
    val got = graft.ext.Graph.ancestorRoots(nodes, "id", "parent", rounds = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 3L, 0L),
      (4L, 1L, 2L), (5L, 5L, 0L), (6L, 3L, 1L), (8L, 1L, 3L)))
    // a cycle can never resolve to a fixed point: the audit throws
    val cyc = Seq((1L, Some(2L)), (2L, Some(1L))).toDF("id", "parent")
    intercept[IllegalArgumentException] {
      graft.ext.Graph.ancestorRoots(cyc, "id", "parent", rounds = 3) }
    // a parent id absent from the id column is a LOUD failure, not a
    // silently dropped subtree (the doubling join is inner)
    val dangling = Seq((2L, Some(1L)), (3L, Some(2L))).toDF("id", "parent")
    val ex = intercept[IllegalArgumentException] {
      graft.ext.Graph.ancestorRoots(dangling, "id", "parent", rounds = 3) }
    assert(ex.getMessage.contains("dangling"))
  }

  test("confusionStats: per-class integer PRF; never-predicted class has null precision") {
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "a"),
      ("a", "c")).toDF("p", "a")
    val got = graft.ext.Profile.confusionStats(df, col("p"), col("a"))
      .orderBy("clazz").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
    assert(got.toSeq === Seq(
      ("a", 4L, 3L, 2L, Some(0.5), Some(0.666667), Some(0.571429)),
      ("b", 1L, 1L, 0L, Some(0.0), Some(0.0), Some(0.0)),
      ("c", 0L, 1L, 0L, None, Some(0.0), Some(0.0))))
  }

  test("fdViolations: holding dependencies are silent; violations carry the witness pair") {
    val df = Seq(("s1", "en"), ("s1", "en"), ("s2", "en"), ("s2", "fr"),
      ("s2", "de")).toDF("src", "lg")
    val got = graft.ext.Contract.fdViolations(df, Seq("src"), "lg").collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getString(4)) === ("s2", 3L, 3L, "de", "fr"))
  }

  test("dictionary: frequency-then-value order, NULL encodable, decode∘encode == id") {
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), Some("c"),
      None).toDF("v")
    val dict = graft.ext.Features.dictionary(df, "v")
    val ids = dict.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    // freq 2 ties a<b; then c; NULL sorts first among freq-1? No: 'a'/'b'
    // have freq 2; NULL and 'c' freq 1 with NULL first (asc_nulls_first)
    assert(ids.toSeq === Seq((1L, Some("a"), 2L), (2L, Some("b"), 2L),
      (3L, None, 1L), (4L, Some("c"), 1L)))
    val enc = graft.ext.Features.dictEncode(df, "v", dict)
    assert(enc.filter(col("v_id").isNull).count() === 0,
      "every category incl. NULL must encode")
    val back = graft.ext.Features.dictDecode(enc.drop("v"), "v", dict)
    val orig = df.groupBy("v").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val rest = back.groupBy("v").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(rest === orig, "decode(encode(x)) must restore the column")
  }

  test("targetEncodeLoo: peers-only rate, singleton null") {
    val df = Seq(("A", true), ("A", false), ("A", true), ("B", true))
      .toDF("cat", "y")
    val got = graft.ext.Features.targetEncodeLoo(df, "cat", col("y"))
      .orderBy("cat", "y").collect()
      .map(r => (r.getString(0), Option(r.get(2))))
    assert(got.toSeq === Seq(("A", Some(1.0)), ("A", Some(0.5)),
      ("A", Some(0.5)), ("B", None)))
  }

  test("ivmCounts: deltas fold to exactly the recount of the materialized state") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "g")
    val log = Seq(
      (2L, 1L, "U", "g2"),                  // b -> g2
      (3L, 1L, "D", null.asInstanceOf[String]),
      (4L, 1L, "I", "a"),                   // new key into a
      (5L, 1L, "I", "e"), (5L, 2L, "D", null.asInstanceOf[String]))
      .toDF("k", "seq", "op", "g")
    val ivm = graft.ops.Resolve.ivmCounts(base, log, "k", Seq("seq"),
        "op", "g").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ivm === Map("a" -> 2L, "g2" -> 1L))
    val recount = graft.ops.Resolve.applyChangelog(
        base.withColumn("v", lit(0)),
        log.withColumn("v", lit(0)), "k", Seq("seq"), "op", Seq("g", "v"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ivm === recount, "IVM law: maintained == recount")
  }

  test("goldenRecord: each column survives independently from first non-null precedence row") {
    val recs = Seq(
      (1L, 0L, 10L, None: Option[String], Some(100L)),  // top pri: name null
      (1L, 1L, 11L, Some("alice"), None: Option[Long]), // name from here
      (1L, 2L, 12L, Some("alicia"), Some(200L)),
      (2L, 0L, 20L, None: Option[String], None: Option[Long]))
      .toDF("entity_id", "pri", "rid", "name", "size")
    val got = graft.ext.Blocking.goldenRecord(recs, "entity_id",
        Seq("pri", "rid"), Seq("name", "size"))
      .orderBy("entity_id").collect()
    val e1 = got(0)
    assert((e1.getLong(1), e1.getString(2), e1.getLong(3),
      e1.getLong(4), e1.getLong(5)) === (3L, "alice", 1L, 100L, 0L))
    val e2 = got(1) // all-null entity: null survivors, null provenance
    assert(e2.getLong(1) === 1L && e2.isNullAt(2) && e2.isNullAt(3) &&
      e2.isNullAt(4) && e2.isNullAt(5))
  }
}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("decodeStub is deterministic and total") {
    val a = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert(a === b)
    assert(Multimodal.decodeStub(Array.emptyByteArray)._1 === 0)
  }

  test("batched mapPartitions feature extraction plumbs binary -> typed rows") {
    val docs = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text")
      .as[Multimodal.MediaRow]
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(out(0).byte_len === 5 && out(0).head_byte === 'h'.toInt)
    assert(out(1).byte_len === 0 && out(1).head_byte === 0)
  }

  test("decode is REAL for actual image bytes: a generated PNG yields its true dimensions (VERDICT r11 #5)") {
    // generate a 37x23 PNG with the JDK's own encoder — no fixtures, no
    // external codecs — and push it through the full Dataset path
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 23).foreach(y => (0 until 37).foreach(x =>
      img.setRGB(x, y, (x * 7919 + y * 104729) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    // direct: true pixel dimensions, not the stub's length-derived fakes
    val (len, head, _, w, h) = Multimodal.decode(png)
    assert((w, h) === (37, 23))
    assert(len === png.length && head === 0x89)
    // non-image bytes still take the deterministic stub fallback
    assert(Multimodal.decode("not an image".getBytes("UTF-8")) ===
      Multimodal.decodeStub("not an image".getBytes("UTF-8")))
    // and the Dataset path carries both kinds side by side
    val media = Seq(Multimodal.MediaRow(1L, png),
      Multimodal.MediaRow(2L, "plain text".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(out(0).width === 37 && out(0).height === 23)
    assert(out(1).width === ("plain text".length % 640) + 1, "stub fallback shape")
  }

  test("wavEncode golden bytes: the exact RIFF/PCM16LE layout, pinned byte-for-byte") {
    // samples 1 and -2 -> little-endian 01 00, FE FF; every header field
    // at its spec offset. This is the pin that stops a matched
    // encoder/decoder bug (e.g. both big-endian) from canceling out in
    // q177's formula oracle.
    val b = Multimodal.wavEncode(8000, Array[Short](1, -2))
    assert(b.length === 48)
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    def le32(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int) = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    assert(ascii(0, 4) === "RIFF" && le32(4) === 40 && ascii(8, 4) === "WAVE")
    assert(ascii(12, 4) === "fmt " && le32(16) === 16)
    assert(le16(20) === 1 && le16(22) === 1, "PCM, mono")
    assert(le32(24) === 8000 && le32(28) === 16000, "rate, byte rate")
    assert(le16(32) === 2 && le16(34) === 16, "block align, bits")
    assert(ascii(36, 4) === "data" && le32(40) === 4)
    assert((b(44), b(45), b(46), b(47)) ===
      ((1.toByte, 0.toByte, 0xFE.toByte, 0xFF.toByte)))
  }

  test("wavDecode inverts wavEncode; walks interposed chunks; rejects non-WAV") {
    val samples = Array.tabulate(300)(i => ((i * 37) % 4096 - 2048).toShort)
    val Some((rate, ch, n, peak, sumSq, durMs)) =
      Multimodal.wavDecode(Multimodal.wavEncode(11025, samples))
    assert((rate, ch, n) === ((11025, 1, 300L)))
    assert(peak === samples.map(s => math.abs(s.toInt)).max)
    assert(sumSq === samples.map(s => s.toLong * s).sum)
    assert(durMs === 300L * 1000 / 11025)

    // real encoders interpose LIST/fact chunks (odd lengths word-pad):
    // splice a 5-byte LIST chunk between fmt and data and re-parse
    val plain = Multimodal.wavEncode(8000, Array[Short](5, -5, 1000))
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = plain.slice(0, 36) ++ extra ++ plain.drop(36)
    // RIFF size field must cover the new chunk for a well-formed file
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    val Some((_, _, n2, _, sumSq2, _)) = Multimodal.wavDecode(spliced)
    assert(n2 === 3L && sumSq2 === (25L + 25 + 1000000))

    assert(Multimodal.wavDecode("RIFFnot really".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.wavDecode("plain text".getBytes("US-ASCII")).isEmpty)

    // dataset path: decodable and undecodable side by side, nothing dropped
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.synthWav(1L)),
      Multimodal.MediaRow(2L, "corrupt".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.audioFeatures(media).orderBy("doc_id").collect()
    assert(out(0).ok && out(0).n_samples === 256L &&
      out(0).sample_rate === 8000)
    assert(!out(1).ok && out(1).n_samples === 0L)
  }

  test("wav roundtrip property: decode(encode(s)) recovers exact features for arbitrary PCM") {
    // deterministic scalacheck sweep (DistanceSpec convention): arbitrary
    // sample vectors including the Short extremes and empty audio
    var seed = org.scalacheck.rng.Seed(7L)
    val gen = for {
      n <- org.scalacheck.Gen.choose(0, 400)
      rate <- org.scalacheck.Gen.oneOf(8000, 11025, 16000, 44100)
      s <- org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.chooseNum(
        Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, s.map(_.toShort).toArray)
    (1 to 80).foreach { _ =>
      gen.apply(org.scalacheck.Gen.Parameters.default, seed).foreach {
        case (rate, samples) =>
          val Some((r, ch, n, peak, sumSq, durMs)) =
            Multimodal.wavDecode(Multimodal.wavEncode(rate, samples))
          assert(r === rate && ch === 1 && n === samples.length.toLong)
          assert(peak === (if (samples.isEmpty) 0
            else samples.map(s => math.abs(s.toInt)).max))
          assert(sumSq === samples.map(s => s.toLong * s).sum)
          assert(durMs === samples.length.toLong * 1000 / rate)
      }
      seed = seed.next
    }
  }

  test("resize plumbing: fixed-size thumbnails, deterministic, empty-safe") {
    val docs = Seq((1L, "payload-bytes"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text").as[Multimodal.MediaRow]
    val out = Multimodal.resize(media, 64, 48).orderBy("doc_id").collect()
    assert(out.forall(r => r.width === 64 && r.height === 48))
    assert(out.forall(_.thumb.length === 64 * 48 / 64))
    val again = Multimodal.resize(media, 64, 48).orderBy("doc_id").collect()
    assert(out.map(_.thumb.toSeq).toSeq === again.map(_.thumb.toSeq).toSeq)
  }

  test("frame sampling fans one row out to every stride-th frame") {
    val payload = ("x" * 640) // 10 frames of 64 bytes
    val media = Seq((7L, payload)).toDF("doc_id", "text")
    val rows = Multimodal.withPayload(media, "doc_id", "text").as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(rows, frameBytes = 64, stride = 4).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 4, 8))
    assert(frames.forall(_.frame.length === 64))
  }
}

/** Wave-13 linkage + split + profile operators: Fellegi–Sunter weights,
  * sorted-neighborhood candidates, stratified split, source-signature
  * merge law, per-dimension embedding profile. */
class LinkageSplitSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.ext.{Blocking, Dedup, Profile, TextAnalysis}

  test("sortedNeighborhood: exactly the rank-window pairs, count law n·w − w(w+1)/2") {
    import spark.implicits._
    val df = Seq((1L, "apple"), (2L, "apricot"), (3L, "banana"), (4L, "band"),
      (5L, "bandana"), (6L, "cherry"), (7L, "citrus"), (8L, "date"))
      .toDF("id", "k")
    val got = Blocking.sortedNeighborhood(df, "k", "id", w = 3).collect()
    val n = 8; val w = 3
    val expect = (for { a <- 1 to n; b <- a + 1 to math.min(a + w, n) }
      yield (a.toLong, b.toLong, (b - a).toLong)).toSet
    assert(got.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("gap"))).toSet === expect)
    assert(got.length === n * w - w * (w + 1) / 2)
  }

  test("sortedNeighborhood: key ties break by id; the window crosses bucket boundaries") {
    import spark.implicits._
    // rank order by (k, id): (alpha,2), (alpha,7), (mid,4), (zeta,10) —
    // pairs must cross the first-char buckets a→m→z
    val df = Seq((10L, "zeta"), (2L, "alpha"), (7L, "alpha"), (4L, "mid"))
      .toDF("id", "k")
    val got = Blocking.sortedNeighborhood(df, "k", "id", w = 2).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got === Set((2L, 7L), (2L, 4L), (7L, 4L), (7L, 10L), (4L, 10L)))
  }

  test("fsWeights: hand-computed Laplace m/u and log2 weights") {
    import spark.implicits._
    val pairs = Seq(
      (true, true, true), (true, true, false), (true, false, true),
      (false, false, true), (false, true, false), (false, false, false))
      .toDF("m", "f1", "f2")
    val got = Blocking.fsWeights(pairs, col("m"),
      Seq("f1" -> col("f1"), "f2" -> col("f2"))).collect()
    val f1 = got.find(_.getAs[String]("field") == "f1").get
    // n_m = n_u = 3; f1 agrees on 2 matches, 1 non-match:
    // m = 3/5, u = 2/5 → w_agree = log2(1.5), w_disagree = log2(2/3)
    assert(f1.getAs[Long]("n_m") === 3L && f1.getAs[Long]("n_u") === 3L)
    assert(f1.getAs[Long]("n_m_agree") === 2L && f1.getAs[Long]("n_u_agree") === 1L)
    assert(math.abs(f1.getAs[Double]("w_agree") - math.log(1.5) / math.log(2)) < 2e-6)
    assert(math.abs(f1.getAs[Double]("w_disagree") - math.log(2.0 / 3) / math.log(2)) < 2e-6)
    assert(math.abs(f1.getAs[Double]("m_prob") - 0.6) < 2e-6)
    assert(math.abs(f1.getAs[Double]("u_prob") - 0.4) < 2e-6)
  }

  test("stratifiedSplit: exact integer cutoffs per stratum, total cover, deterministic") {
    import spark.implicits._
    val df = (1 to 37).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val s1 = TextAnalysis.stratifiedSplit(df, "g", "id", 800, 100, "s")
    val counts = s1.groupBy("g", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a: n=12 → train (800·12) div 1000 = 9, val through rank 10 → 1, test 2
    assert(counts(("a", "train")) === 9L && counts(("a", "val")) === 1L &&
      counts(("a", "test")) === 2L)
    // b: n=25 → train 20, val through rank 22 → 2, test 3
    assert(counts(("b", "train")) === 20L && counts(("b", "val")) === 2L &&
      counts(("b", "test")) === 3L)
    assert(s1.count() === 37L)
    val s2 = TextAnalysis.stratifiedSplit(df, "g", "id", 800, 100, "s")
    assert(s1.orderBy("id").collect().toSeq === s2.orderBy("id").collect().toSeq)
  }

  test("sourceSignatures: min-merge law — folded doc sigs equal sigs of the union shingle set") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1"),
      (2L, "the quick brown cat naps under the warm sun", "s1"),
      (3L, "a completely different corpus of words entirely here", "s2"),
      (4L, "the quick brown fox jumps over the lazy dog again today", "s2"))
      .toDF("doc_id", "text", "source")
    val merged = Dedup.sourceSignatures(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
    // the other path: signature computed DIRECTLY on each source's union
    // of distinct shingles (source plays the doc_id role)
    val unionSh = Dedup.shingled(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source").as("doc_id"), col("sh")).distinct()
    val direct = Dedup.minhashSignatures(unionSh)
      .withColumnRenamed("doc_id", "source").orderBy("source").collect()
    assert(merged.toSeq === direct.toSeq)
  }

  test("robustOutliers: hand-computed median/MAD; boundary dev == k*mad is NOT flagged") {
    import spark.implicits._
    // values: 1,2,3,4,100 -> median 3, devs 2,1,0,1,97 -> MAD 1
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 100L))
      .toDF("id", "v")
    val got = Profile.robustOutliers(df, col("v"), k = 3)
      .select("id", "v", "dev", "median", "mad", "is_outlier")
      .orderBy("id").collect()
    assert(got.map(_.getAs[Long]("median")).distinct.toSeq === Seq(3L))
    assert(got.map(_.getAs[Long]("mad")).distinct.toSeq === Seq(1L))
    assert(got.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Long]("id")).toSeq === Seq(5L))
    // boundary: dev exactly k*mad must NOT flag (strict >)
    val c = Seq((1L, 7L), (2L, 9L), (3L, 10L), (4L, 11L), (5L, 13L)).toDF("id", "v")
    // median 10, devs 3,1,0,1,3 -> MAD 1; k=3 -> dev 3 == 3*1 not flagged
    val gc = Profile.robustOutliers(c, col("v"), k = 3).collect()
    assert(!gc.exists(_.getAs[Boolean]("is_outlier")))
    // degenerate MAD = 0 (majority at one value): ANY deviation flags
    val b = Seq((1L, 0L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 13L)).toDF("id", "v")
    // median 10, devs 10,0,0,0,3 -> MAD 0
    val gb = Profile.robustOutliers(b, col("v"), k = 3).collect()
    assert(gb.filter(_.getAs[Boolean]("is_outlier")).map(_.getAs[Long]("id"))
      .sorted.toSeq === Seq(1L, 5L))
  }

  test("exactMedian: lower-median convention on even n; counts-of-counts path") {
    import spark.implicits._
    val even = Seq(1L, 2L, 3L, 4L).toDF("v")
    val r = Profile.exactMedian(even, col("v")).collect()
    assert(r.length === 1 && r(0).getAs[Long]("n") === 4L &&
      r(0).getAs[Long]("median") === 2L)
    val odd = Seq(5L, 1L, 9L).toDF("v")
    assert(Profile.exactMedian(odd, col("v")).collect()(0)
      .getAs[Long]("median") === 5L)
  }

  test("rboTruncated: identical rankings score 1 - 2^-depth (rounded); hand case; disjoint is silent") {
    import spark.implicits._
    val a = Seq((1, 101L, 1), (1, 102L, 2), (1, 103L, 3))
      .toDF("q", "doc", "rnk")
    val same = graft.ext.Retrieval
      .rboTruncated(a, a, "q", "doc", "rnk", depth = 3).collect()
    // full-depth identical rankings: sum of 2^-d, d=1..3 = 1 - 2^-3
    assert(same.length === 1 && same(0).getAs[Double]("rbo") === 0.875)
    assert(same(0).getAs[Long]("overlap_3") === 3L)
    // A=[1,2,3], B=[2,1,4]: overlaps 0,2,2 -> 0 + 2/8 + round6(2/24)
    val b = Seq((1, 102L, 1), (1, 101L, 2), (1, 104L, 3)).toDF("q", "doc", "rnk")
    val mixed = graft.ext.Retrieval
      .rboTruncated(a, b, "q", "doc", "rnk", depth = 3).collect()
    assert(mixed(0).getAs[Double]("rbo") === 0.333333)
    assert(mixed(0).getAs[Long]("overlap_3") === 2L)
    // no shared docs -> no row
    val c = Seq((1, 201L, 1)).toDF("q", "doc", "rnk")
    assert(graft.ext.Retrieval
      .rboTruncated(a, c, "q", "doc", "rnk", depth = 3).count() === 0L)
  }

  test("leaveOneOutMeans: jackknife identity by hand; whole-corpus group nulls") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 20L), ("b", 60L)).toDF("g", "v")
    val got = Profile.leaveOneOutMeans(df, "g", col("v")).orderBy("g").collect()
    // overall mean 30; drop a -> 60; drop b -> 15
    assert(got(0).getAs[Double]("mean_all") === 30.0)
    assert(got(0).getAs[Double]("mean_loo") === 60.0 &&
      got(0).getAs[Double]("influence") === 30.0)
    assert(got(1).getAs[Double]("mean_loo") === 15.0 &&
      got(1).getAs[Double]("influence") === -15.0)
    val solo = Profile.leaveOneOutMeans(
      Seq(("a", 1L)).toDF("g", "v"), "g", col("v")).collect()
    assert(solo(0).isNullAt(solo(0).fieldIndex("mean_loo")))
  }

  test("operatingPoint: largest threshold meeting recall; exact boundary; zero-positive silent") {
    import spark.implicits._
    // scores: pos at 5,4,3; neg at 5,1. recall 2/3 at t=4, 3/3 at t=3.
    val df = Seq((5L, true), (4L, true), (3L, true), (5L, false), (1L, false))
      .toDF("s", "y")
    val r800 = Profile.operatingPoint(df, col("s"), col("y"), 800).collect()
    assert(r800(0).getAs[Long]("threshold") === 3L &&
      r800(0).getAs[Long]("n_flagged") === 4L &&
      r800(0).getAs[Double]("recall") === 1.0 &&
      r800(0).getAs[Double]("precision") === 0.75)
    // boundary: recall target exactly met (2/3 >= 666 per-mille fails at
    // integer compare 2000 >= 666*3=1998 -> passes; 667 -> 2001 fails)
    val r666 = Profile.operatingPoint(df, col("s"), col("y"), 666).collect()
    assert(r666(0).getAs[Long]("threshold") === 4L)
    val r667 = Profile.operatingPoint(df, col("s"), col("y"), 667).collect()
    assert(r667(0).getAs[Long]("threshold") === 3L)
    // no positives -> no row
    assert(Profile.operatingPoint(
      Seq((1L, false)).toDF("s", "y"), col("s"), col("y"), 800).count() === 0L)
  }

  test("dimProfile: exact moments on a tiny matrix; var shares sum to 1") {
    import spark.implicits._
    val rows = Seq(Array(1.0f, 2.0f), Array(3.0f, 6.0f), Array(5.0f, 10.0f))
      .toDF("embedding")
    val got = Profile.dimProfile(rows).orderBy("dim").collect()
    // dim0 = (1,3,5): mean 3, population var 8/3; dim1 = 2·dim0 → var ×4,
    // so shares are 24e12/120e12 = 0.2 and 0.8
    assert(got(0).getAs[Double]("mean") === 3.0)
    assert(math.abs(got(0).getAs[Double]("variance") - 8.0 / 3) < 2e-6)
    assert(got(0).getAs[Double]("min_v") === 1.0 && got(0).getAs[Double]("max_v") === 5.0)
    assert(math.abs(got(0).getAs[Double]("var_share") - 0.2) < 2e-6)
    assert(math.abs(got(1).getAs[Double]("var_share") - 0.8) < 2e-6)
    assert(got.map(_.getAs[Long]("n")).toSeq === Seq(3L, 3L))
  }

  test("ksTwoSample: hand-computed sup; tie in the gap names the smallest value") {
    import spark.implicits._
    // A = {1,2,3}, B = {3,4,5}: gaps (x9) are 3,6,6,3,0 -> sup 6/9 at v=2
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (3L, "b"), (4L, "b"), (5L, "b"))
      .toDF("v", "g")
    val r = Profile.ksTwoSample(df, col("v"), col("g") === "a", col("g") === "b")
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_a") === 3L && r(0).getAs[Long]("n_b") === 3L)
    assert(r(0).getAs[Double]("d_stat") === 0.666667)
    assert(r(0).getAs[Long]("at_v") === 2L)
    // identical samples -> D = 0
    val same = Seq((1L, true), (1L, false), (7L, true), (7L, false)).toDF("v", "a")
    assert(Profile.ksTwoSample(same, col("v"), col("a"), !col("a"))
      .collect()(0).getAs[Double]("d_stat") === 0.0)
  }

  test("benfordDigits: string first digit, nonpositives excluded, exact dev_num") {
    import spark.implicits._
    val df = (1L to 9L).map(identity).toDF("v")
      .union(Seq(10L, 95L, -5L, 0L).toDF("v"))
    val got = Profile.benfordDigits(df, col("v")).orderBy("digit").collect()
    assert(got.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    assert(got.map(_.getAs[Long]("n")).distinct.toSeq === Seq(11L))
    assert(got(0).getAs[Long]("n_obs") === 2L) // 1 and 10
    assert(got(8).getAs[Long]("n_obs") === 2L) // 9 and 95
    // digit 1: |2*1e6 - 11*301030| = 1311330, exact
    assert(got(0).getAs[Long]("dev_num") === 1311330L)
    assert(got(0).getAs[Double]("exp_share") === 0.30103)
  }

  test("heavyHittersExact: MG candidates lose no heavy hitter; threshold is strict") {
    import spark.implicits._
    // 60 a's + 25 b's + 15 singletons, n = 100, k = 3 -> threshold n/4 = 25:
    // a (60 > 25) is a hitter, b (25 > 25 is FALSE) is not
    val items = (Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"s$i"))
    val df = items.toDF("w").repartition(4) // exercise per-partition MG + union
    val got = Sketches.heavyHittersExact(df, col("w"), k = 3).collect()
    assert(got.map(_.getAs[String]("item")).toSeq === Seq("a"))
    assert(got(0).getAs[Long]("freq") === 60L && got(0).getAs[Long]("n") === 100L)
    assert(got(0).getAs[Double]("share") === 0.6)
  }

  test("rendezvousShard: deterministic, and removing the last shard moves ONLY its keys") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("doc_id")
    val a = graft.ops.Partitioning.rendezvousShard(ids, "doc_id", 8)
    val b = graft.ops.Partitioning.rendezvousShard(a, "doc_id", 7, "shard7")
    val moved = b.filter(col("shard") =!= col("shard7"))
    assert(moved.filter(col("shard") =!= 7).count() === 0L,
      "a key not on the removed shard must keep its assignment")
    assert(b.filter(col("shard") === 7).count() === moved.count())
    // every shard id in range; 1-shard degenerate case pins to 0
    assert(b.agg(min("shard"), max("shard")).collect()(0).toSeq === Seq(0, 7))
    assert(graft.ops.Partitioning.rendezvousShard(ids, "doc_id", 1)
      .agg(max("shard")).collect()(0).getInt(0) === 0)
  }

  test("quantileBins: type-1 edges; all ties of a value land in one bin") {
    import spark.implicits._
    val df = (1L to 8L).toDF("v")
    val got = Profile.quantileBins(df, col("v"), bins = 4)
      .groupBy("bin").agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq === Seq(1, 2, 3, 4))
    assert(got.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(got.map(_.getAs[Long]("mx")).toSeq === Seq(2L, 4L, 6L, 8L))
    // massive tie at one value: the tied value occupies ONE bin
    val tied = (Seq.fill(10)(5L) ++ Seq(1L, 9L)).toDF("v")
    val bins = Profile.quantileBins(tied, col("v"), bins = 4)
      .filter(col("v") === 5L).select("bin").distinct().collect()
    assert(bins.length === 1)
  }

  test("paretoFront: strict domination; duplicates of a frontier point all survive") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (1L, 5L), (2L, 3L), (3L, 3L), (2L, 7L), (5L, 1L))
      .toDF("x", "y")
    val got = Profile.paretoFront(pts, col("x"), col("y"))
      .orderBy("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    // (3,3) dominated by (2,3); (2,7) dominated by (1,5); dup (1,5) kept twice
    assert(got.toSeq === Seq((1L, 5L), (1L, 5L), (2L, 3L), (5L, 1L)))
    // a single point is its own frontier
    assert(Profile.paretoFront(Seq((9L, 9L)).toDF("x", "y"),
      col("x"), col("y")).count() === 1L)
  }

  test("hilbertValue: known order-2 sequence; unit-step + bijection laws at order 3") {
    import spark.implicits._
    // the canonical 4x4 Hilbert walk, positions 0..15
    val walk = Seq((0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
      (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0))
    val df = walk.zipWithIndex.map { case ((x, y), i) => (x.toLong, y.toLong, i.toLong) }
      .toDF("x", "y", "expected")
    val got = graft.ops.Partitioning.hilbertValue(df, "x", "y", 2, "h")
      .filter(col("h") =!= col("expected")).count()
    assert(got === 0L, "order-2 indices must match the canonical walk")
    // order 3: bijection on 0..63 and every consecutive step a grid neighbor
    val grid = (for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)).toDF("x", "y")
    val h3 = graft.ops.Partitioning.hilbertValue(grid, "x", "y", 3, "h")
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(h3.map(_._3).toSeq === (0L until 64L))
    val steps = h3.sliding(2).map { case Array((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }
    assert(steps.forall(_ === 1L), "consecutive Hilbert cells must be neighbors")
  }

  test("resampleFfill: grid to global max, fill carries, in-bucket argmax by (ts, tie)") {
    import spark.implicits._
    val b = 10L // bucketMs
    val ev = Seq(
      ("u1", 1L, 1L, 1.0), ("u1", 25L, 2L, 2.0),
      // u2: two events in bucket 1 — later ts wins; then same-ts tie
      ("u2", 12L, 3L, 5.0), ("u2", 15L, 4L, 6.0), ("u2", 15L, 1L, 7.0))
      .toDF("user_id", "ts_ms", "event_id", "value")
    val got = Events.resampleFfill(ev, "user_id", "ts_ms", col("value"),
        "event_id", bucketMs = b)
      .orderBy("key", "bucket").collect()
    val u1 = got.filter(_.getString(0) == "u1")
    assert(u1.map(_.getAs[Long]("bucket")).toSeq === Seq(0L, 1L, 2L))
    assert(u1.map(_.getAs[Long]("filled_v6")).toSeq ===
      Seq(1000000L, 1000000L, 2000000L))
    assert(u1.map(_.getAs[Boolean]("is_observed")).toSeq ===
      Seq(true, false, true))
    val u2 = got.filter(_.getString(0) == "u2")
    // bucket 1 representative: ts 15 beats 12; at ts 15, tie 4 beats 1 -> 6.0
    assert(u2.map(_.getAs[Long]("bucket")).toSeq === Seq(1L, 2L))
    assert(u2.map(_.getAs[Long]("filled_v6")).toSeq === Seq(6000000L, 6000000L))
  }

  test("containmentPairs: asymmetric scores; prefix candidates lose nothing") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e f g"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", 0.6)
      .orderBy("doc_a", "doc_b").collect()
    // S(1) = {abc,bcd,cde} subset of S(2) (5 shingles): C(1,2)=1, C(2,1)=0.6
    assert(got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Double]("containment"))).toSeq ===
      Seq((1L, 2L, 1.0), (2L, 1L, 0.6)))
    assert(got.map(_.getAs[Long]("n_inter")).toSeq === Seq(3L, 3L))
    // tighter threshold drops the asymmetric partner
    assert(Dedup.containmentPairs(d, "doc_id", "text", 0.7)
      .collect().map(_.getAs[Long]("doc_a")).toSeq === Seq(1L))
  }

  test("prCurve: hand-computed sweep; one row per distinct score") {
    import spark.implicits._
    val df = Seq((3L, true), (2L, false), (2L, true), (1L, false))
      .toDF("s", "y")
    val got = Profile.prCurve(df, col("s"), col("y"))
      .orderBy("threshold").collect()
    assert(got.map(_.getAs[Long]("threshold")).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Long]("n_flagged")).toSeq === Seq(4L, 3L, 1L))
    assert(got.map(_.getAs[Long]("tp")).toSeq === Seq(2L, 2L, 1L))
    assert(got.map(_.getAs[Double]("precision")).toSeq ===
      Seq(0.5, 0.666667, 1.0))
    assert(got.map(_.getAs[Double]("recall")).toSeq === Seq(1.0, 1.0, 0.5))
    assert(got.map(_.getAs[Double]("f1")).toSeq ===
      Seq(0.666667, 0.8, 0.666667))
  }

  test("rankMetrics: DCG/IDCG/MRR hand-checked; no-relevant query nulls ndcg") {
    import spark.implicits._
    val ranked = Seq(("q1", 1, 1L), ("q1", 2, 2L), ("q1", 3, 3L),
      ("q2", 1, 9L)).toDF("query_id", "rnk", "doc_id")
    val gains = Seq(("q1", 2L, 2L), ("q1", 3L, 1L), ("q1", 7L, 3L))
      .toDF("query_id", "doc_id", "gain")
    val got = Retrieval.rankMetrics(ranked, gains, k = 10)
      .orderBy("query_id").collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ln2 = 0.6931471805599453
    def t(g: Double, i: Int) = r6(g / (math.log(i + 1.0) / ln2))
    // q1 DCG: rank1 gain 0, rank2 gain 2, rank3 gain 1
    val dcg = t(2, 2) + t(1, 3)
    // ideal: gains (3, 2, 1) at positions 1, 2, 3 (doc 7 unranked but graded)
    val idcg = t(3, 1) + t(2, 2) + t(1, 3)
    assert(got(0).getAs[Double]("dcg") === r6(dcg))
    assert(got(0).getAs[Double]("idcg") === r6(idcg))
    assert(got(0).getAs[Double]("ndcg") === r6(dcg / idcg))
    assert(got(0).getAs[Double]("mrr") === 0.5) // first hit at rank 2
    assert(got(0).getAs[Long]("n_rel") === 3L)
    // q2: nothing graded -> null ndcg, mrr 0
    assert(got(1).isNullAt(got(1).fieldIndex("ndcg")))
    assert(got(1).getAs[Double]("mrr") === 0.0)
    assert(got(1).getAs[Long]("n_rel") === 0L)
  }

  test("centroidSilhouette: tight separated clusters score 1; single cell is null") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = SimSearch.centroidSilhouette(e, "label")
      .orderBy("cell").collect()
    assert(got.map(_.getAs[Long]("n")).toSeq === Seq(2L, 2L))
    // a = 0 (on centroid), b = 1 (orthogonal) -> s = 1 for every point
    assert(got.map(_.getAs[Double]("mean_sil")).toSeq === Seq(1.0, 1.0))
    val one = SimSearch.centroidSilhouette(e.filter(col("label") === 0), "label")
      .collect()
    assert(one.length === 1 && one(0).isNullAt(one(0).fieldIndex("mean_sil")))
  }

  test("confusableSkeleton: homoglyph + case fold; raw bytes stay distinct") {
    import spark.implicits._
    val df = Seq(("Sample text", "Sаmple text"), ("ПРИВЕТ", "ПРИВЕТ"))
      .toDF("a", "b")
    val r = df.select(
      (TextAnalysis.confusableSkeleton(col("a")) ===
        TextAnalysis.confusableSkeleton(col("b"))).as("skel_eq"),
      (col("a") === col("b")).as("raw_eq")).collect()
    assert(r(0).getBoolean(0) && !r(0).getBoolean(1),
      "Cyrillic а must fold onto latin a while raw text differs")
    assert(r(1).getBoolean(0) && r(1).getBoolean(1))
  }

  test("exactMedianBy: per-key lower medians from one partitioned fold") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 9L), ("b", 5L), ("b", 7L))
      .toDF("k", "v")
    val got = Profile.exactMedianBy(df, col("k"), col("v"))
      .orderBy("key").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 3L, 2L), ("b", 2L, 5L)))
  }

  test("delete1Keys covers DL<=1; delete1SelfJoin finds sub/del/transposition, not DL2") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "acb"), (4L, "ab"),
      (5L, "xyz"), (6L, "")).toDF("id", "s")
    val keys = df.filter(col("id") === 1)
      .select(explode(graft.ext.Blocking.delete1Keys(col("s"))).as("k"))
      .collect().map(_.getString(0)).sorted
    assert(keys.toSeq === Seq("ab", "abc", "ac", "bc"))
    val got = graft.ext.Blocking.delete1SelfJoin(df, "id", "s")
      .select("id_a", "id_b", "dl").orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // abc~abd (sub), abc~acb (transposition), abc~ab (del), abd~ab (del),
    // acb~ab (del); abd~acb is DL 2 and must NOT appear
    assert(got.toSeq === Seq((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1),
      (2L, 4L, 1), (3L, 4L, 1)))
    // empty string keeps only itself as key
    assert(df.filter(col("id") === 6)
      .select(graft.ext.Blocking.delete1Keys(col("s"))).collect()(0)
      .getSeq[String](0) === Seq(""))
  }

  test("inclusionRatio: partial overlap, true inclusion, empty child") {
    import spark.implicits._
    val child = Seq(1L, 2L, 3L, 3L).toDF("c")
    val parent = Seq(1L, 2L, 9L).toDF("p")
    val r = Profile.inclusionRatio(child, "c", parent, "p", "t").collect()(0)
    assert(r.getAs[Long]("n_child_distinct") === 3L)
    assert(r.getAs[Long]("n_missing") === 1L)
    assert(r.getAs[Double]("containment") === 0.666667)
    assert(!r.getAs[Boolean]("is_inclusion"))
    val full = Profile.inclusionRatio(
      Seq(1L, 2L).toDF("c"), "c", parent, "p", "t").collect()(0)
    assert(full.getAs[Boolean]("is_inclusion"))
    val empty = Profile.inclusionRatio(
      child.filter(col("c") > 99), "c", parent, "p", "t").collect()(0)
    assert(empty.isNullAt(empty.fieldIndex("containment")) &&
      !empty.getAs[Boolean]("is_inclusion"))
  }

  test("olsBy: exact line recovered; constant x nulls the fit; r signs") {
    import spark.implicits._
    // key a: y = 2x + 3 exactly; key b: y = -x (r = -1); key c: constant x
    val df = (Seq(("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L)) ++
      Seq(("b", 1L, -1L), ("b", 2L, -2L), ("b", 3L, -3L)) ++
      Seq(("c", 4L, 1L), ("c", 4L, 9L))).toDF("k", "x", "y")
    val got = Profile.olsBy(df, col("k"), col("x"), col("y"))
      .orderBy("key").collect()
    assert(got(0).getAs[Double]("slope") === 2.0)
    assert(got(0).getAs[Double]("intercept") === 3.0)
    assert(got(0).getAs[Double]("r") === 1.0 && got(0).getAs[Double]("r2") === 1.0)
    assert(got(1).getAs[Double]("r") === -1.0 && got(1).getAs[Double]("r2") === 1.0)
    assert(got(2).isNullAt(got(2).fieldIndex("slope")) &&
      got(2).isNullAt(got(2).fieldIndex("r")))
  }

  test("exactWeightedMedian: weight mass decides; lower-median ties; nonpositive weights drop") {
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 1L), (3L, 10L)).toDF("v", "w")
    val r = Profile.exactWeightedMedian(df, col("v"), col("w")).collect()(0)
    assert(r.getAs[Long]("total_w") === 12L && r.getAs[Long]("wmedian") === 3L)
    val even = Seq((1L, 1L), (2L, 1L), (9L, 0L), (9L, -5L)).toDF("v", "w")
    val e = Profile.exactWeightedMedian(even, col("v"), col("w")).collect()(0)
    assert(e.getAs[Long]("total_w") === 2L && e.getAs[Long]("wmedian") === 1L)
  }

  test("phraseMatches: token-aligned, overlapping starts, no substring false positive") {
    import spark.implicits._
    val d = Seq((1L, "a a a b"), (2L, "rehash join only"), (3L, "hash join x hash join"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseMatches(d, "doc_id", "text",
      Seq("a a", "hash join")).orderBy("phrase").collect()
    // "a a" occurs at positions 1 and 2 of doc 1 (overlap counts both)
    assert(got(0).getAs[String]("phrase") === "a a" &&
      got(0).getAs[Long]("n_docs") === 1L && got(0).getAs[Long]("n_hits") === 2L)
    // "rehash join" must NOT match "hash join"; doc 3 has two hits
    assert(got(1).getAs[String]("phrase") === "hash join" &&
      got(1).getAs[Long]("n_docs") === 1L && got(1).getAs[Long]("n_hits") === 2L)
  }

  test("majorityVote: majority wins, ties break to largest value, nulls don't vote") {
    import spark.implicits._
    val rep = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, null), (3L, null)).toDF("k", "v")
    val got = graft.ext.Blocking.majorityVote(rep, "k", Seq("v"))
      .orderBy("key").collect()
    assert(got.map(r => (r.getLong(0), r.getAs[String]("resolved"),
      r.getAs[Long]("n_top"), r.getAs[Long]("n_distinct"))).toSeq ===
      Seq((1L, "a", 2L, 2L), (2L, "c", 1L, 3L), (3L, "a", 1L, 1L)))
  }

  test("rollingDistinct: trailing-window membership over active anchors only") {
    import spark.implicits._
    val ev = Seq((10L, 0L), (20L, 3600000L), (10L, 25L * 3600000L))
      .toDF("user_id", "ts_ms")
    val got = Events.rollingDistinct(ev, "ts_ms", "user_id", 24, 3600000L)
      .orderBy("anchor").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // anchors are the three active hours; hour 1 sees both users,
    // hour 25 sees only u1's second visit (hour 1 fell out of window)
    assert(got.toSeq === Seq((0L, 1L), (1L, 2L), (25L, 1L)))
  }

  test("trimmedMean: exact rank-interval trimming kills the tail") {
    import spark.implicits._
    val df = ((1L to 10L) :+ 1000L).toDF("v")
    val r = Profile.trimmedMean(df, col("v"), trimPm = 100).collect()(0)
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Long]("k_trimmed_each") === 1L)
    assert(r.getAs[Long]("n_kept") === 9L)
    assert(r.getAs[Double]("trimmed_mean") === 6.0) // mean of 2..10
    assert(r.getAs[Double]("mean") === 95.909091)
    // trimPm 0 degenerates to the plain mean
    val z = Profile.trimmedMean(df, col("v"), trimPm = 0).collect()(0)
    assert(z.getAs[Double]("trimmed_mean") === z.getAs[Double]("mean"))
  }

  test("winsorizedMean: tails clamp to the rank bounds, rows keep their vote") {
    import spark.implicits._
    val df = ((1L to 10L) :+ 1000L).toDF("v")
    val r = Profile.winsorizedMean(df, col("v"), trimPm = 100).collect()(0)
    // k = 1: clamp 1 -> 2 and 1000 -> 10; sum = 2 + 2..10 + 10 = 66
    assert(r.getAs[Long]("k_each") === 1L)
    assert(r.getAs[Long]("lo") === 2L && r.getAs[Long]("hi") === 10L)
    assert(r.getAs[Double]("winsorized_mean") === 6.0)
    // trimPm 0: lo/hi are the extremes, clamp is the identity
    val z = Profile.winsorizedMean(df, col("v"), trimPm = 0).collect()(0)
    assert(z.getAs[Double]("winsorized_mean") === z.getAs[Double]("mean"))
  }

  test("cvFolds: near-equal stratum folds, deterministic, exhaustive") {
    import spark.implicits._
    val df = (1L to 23L).map(i => (if (i <= 13) "a" else "b", i))
      .toDF("lang", "doc_id")
    val f = TextAnalysis.cvFolds(df, "lang", "doc_id", k = 5, salt = "t")
    val sizes = f.groupBy("lang", "fold").count()
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    // 13 rows -> folds of 3,3,3,2,2; 10 rows -> all 2
    assert(sizes.filter(_._1._1 == "a").values.toSeq.sorted === Seq(2L, 2L, 3L, 3L, 3L))
    assert(sizes.filter(_._1._1 == "b").values.toSeq.sorted === Seq(2L, 2L, 2L, 2L, 2L))
    assert(f.count() === 23L && f.agg(min("fold"), max("fold"))
      .collect()(0).toSeq === Seq(0, 4))
    // identical on re-derivation
    val g = TextAnalysis.cvFolds(df, "lang", "doc_id", k = 5, salt = "t")
    assert(f.exceptAll(g).count() === 0L)
  }

  test("twap: holding-time weights, last tick unweighted, single obs nulls") {
    import spark.implicits._
    val ev = Seq((1L, 0L, 1L, 1.0), (1L, 10L, 2L, 3.0), (1L, 30L, 3L, 2.0),
      (2L, 5L, 4L, 9.0)).toDF("user_id", "ts_ms", "event_id", "value")
    val got = Events.twap(ev, "user_id", "ts_ms", col("value"), "event_id")
      .orderBy("key").collect()
    // u1: 1.0 for 10ms + 3.0 for 20ms over span 30 -> 70/30
    assert(got(0).getAs[Long]("n_obs") === 3L)
    assert(got(0).getAs[Long]("span_ms") === 30L)
    assert(got(0).getAs[Double]("twap") === 2.333333)
    assert(got(1).getAs[Long]("n_obs") === 1L &&
      got(1).isNullAt(got(1).fieldIndex("twap")))
  }

  test("quantileNormalize: rank mapping onto the pooled scale; identity on one group") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 10L), ("B", 20L), ("B", 30L)).toDF("src", "x")
    val got = Profile.quantileNormalize(df, "src", col("x"))
      .orderBy("src", "v").collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("v")),
        r.getLong(r.fieldIndex("v_norm"))))
    assert(got.toSeq === Seq(("A", 1L, 2L), ("A", 2L, 10L), ("A", 3L, 30L),
      ("B", 10L, 2L), ("B", 20L, 10L), ("B", 30L, 30L)))
    // a single group maps onto itself
    val one = Profile.quantileNormalize(df.filter(col("src") === "A"),
      "src", col("x")).collect()
    assert(one.forall(r => r.getLong(r.fieldIndex("v")) ===
      r.getLong(r.fieldIndex("v_norm"))))
  }

  test("apportionWeighted: largest remainder over weights, exact budget, tie by group") {
    import spark.implicits._
    val w = Seq(("a", 3L), ("b", 1L)).toDF("g", "wt")
    val got = TextAnalysis.apportionWeighted(w, "g", "wt", budget = 10L)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(2)))
    // floors 7/2, one seat short, remainders tie at 2 -> group asc wins
    assert(got.toSeq === Seq(("a", 8L), ("b", 2L)))
    assert(got.map(_._2).sum === 10L)
  }

  test("generalizationLadder: first qualifying rung chosen; suppression always qualifies") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 11L, 12L).map(("a", _)).toDF("lang", "v")
    val got = Profile.generalizationLadder(df, "lang", col("v"),
      widths = Seq(1L, 10L, 0L), k = 2).orderBy("level").collect()
    assert(got.map(_.getAs[Boolean]("qualifies")).toSeq ===
      Seq(false, true, true))
    assert(got.map(_.getAs[Boolean]("chosen")).toSeq ===
      Seq(false, true, false))
    assert(got(1).getAs[Long]("n_classes") === 2L &&
      got(1).getAs[Long]("min_class") === 2L)
  }

  test("correlationAudit: perfectly correlated pair scores 1; zero-variance dims drop") {
    import spark.implicits._
    val e = Seq((1L, Array(1.0f, 2.0f, 5.0f)), (2L, Array(2.0f, 4.0f, 5.0f)),
      (3L, Array(3.0f, 6.0f, 5.0f))).toDF("vec_id", "embedding")
    val r = Profile.correlationAudit(e).collect()(0)
    // dim2 is constant (var 0) -> only the (0,1) pair survives, corr2 = 1
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Double]("offdiag_corr2") === 1.0)
    assert(r.getAs[Double]("max_corr2") === 1.0)
    assert(r.getAs[Int]("max_i") === 0 && r.getAs[Int]("max_j") === 1)
  }

  test("mutualInformation: zero for independent columns, H(x) for a copy") {
    import spark.implicits._
    // uniform over the 2x3 grid -> independent
    val ind = (0L until 6L).map(i => (i % 2, i % 3)).toDF("a", "b")
    val r = Profile.mutualInformation(ind, col("a"), col("b")).collect()(0)
    assert(r.getAs[Double]("mi") === 0.0 && r.getAs[Long]("n_cells") === 6L)
    assert(r.getAs[Double]("nmi") === 0.0)
    // y = x -> MI = H(X), NMI = 1
    val dep = Seq(0L, 0L, 1L, 1L).map(v => (v, v)).toDF("a", "b")
    val d = Profile.mutualInformation(dep, col("a"), col("b")).collect()(0)
    assert(d.getAs[Double]("mi") === d.getAs[Double]("h_x"))
    assert(d.getAs[Double]("nmi") === 1.0)
  }

  test("giniStumpScores: perfect feature zeroes impurity, constant feature decreases nothing") {
    import spark.implicits._
    val df = Seq(("x", 1L, "l1"), ("x", 2L, "l1"), ("y", 3L, "l2"),
      ("y", 4L, "l2")).toDF("f", "id", "lab")
    val got = Profile.giniStumpScores(df, col("lab"), Seq(
      "perfect" -> col("f"), "constant" -> lit("k")))
      .orderBy("feature").collect()
    val const = got(0); val perfect = got(1)
    assert(perfect.getAs[String]("feature") === "perfect" &&
      perfect.getAs[Double]("weighted_gini") === 0.0 &&
      perfect.getAs[Double]("gini_decrease") ===
        perfect.getAs[Double]("parent_gini"))
    assert(const.getAs[String]("feature") === "constant" &&
      const.getAs[Double]("gini_decrease") === 0.0)
    assert(perfect.getAs[Double]("parent_gini") === 0.5)
    // a null feature value is its own bucket, not a dropped row: a
    // feature that is null exactly on one label still separates it
    val withNull = Seq((Some("x"), "l1"), (Some("x"), "l1"),
      (None, "l2"), (None, "l2")).toDF("f", "lab")
    val nb = Profile.giniStumpScores(withNull, col("lab"),
      Seq("nullable" -> col("f"))).collect()(0)
    assert(nb.getAs[Long]("n_buckets") === 2L &&
      nb.getAs[Double]("weighted_gini") === 0.0)
  }

  test("kwic: centered context, clamped at text start, 1-based positions") {
    import spark.implicits._
    val d = Seq((1L, "a b slow query c d"), (2L, "slow query x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.kwic(d, "doc_id", "text", "slow query", ctx = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("pos") === 3 &&
      got(0).getAs[String]("context") === "a b slow query c d")
    assert(got(1).getAs[Int]("pos") === 1 &&
      got(1).getAs[String]("context") === "slow query x")
  }

  test("heapsLaw: V = m exactly gives beta 1; curve rides one fold") {
    import spark.implicits._
    // doc m introduces exactly one new token -> V(m) = m
    val d = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.heapsLaw(d, "doc_id", "text",
      pms = Seq(250, 500, 750, 1000)).orderBy("pm").collect()
    assert(got.map(_.getAs[Long]("m_docs")).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(got.map(_.getAs[Long]("vocab")).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(got.map(_.getAs[Double]("beta")).distinct.toSeq === Seq(1.0))
    assert(got.map(_.getAs[Double]("r2")).distinct.toSeq === Seq(1.0))
  }

  test("zipfFit: decaying frequencies fit a negative log-log slope") {
    import spark.implicits._
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(d, "text", k = 10).collect()(0)
    assert(r.getAs[Long]("n_ranked") === 4L)
    assert(r.getAs[Double]("slope") < 0.0)
    assert(r.getAs[Double]("r2") > 0.9)
  }

  test("seasonalResiduals: hour slots and per-slot median baselines") {
    import spark.implicits._
    // two events at hour 1 (values 10, 20 -> lower median 10), one at hour 2
    val ev = Seq((1L, 3600000L, 10.0), (2L, 3660000L, 20.0),
      (3L, 7200000L, 5.0)).toDF("event_id", "ts_ms", "value")
    val got = Events.seasonalResiduals(ev, "ts_ms", col("value"))
      .orderBy("event_id")
      .select("hour", "hour_median_v6", "resid_v6").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1, 10000000L, 0L), (1, 10000000L, 10000000L), (2, 5000000L, 0L)))
  }

  test("kneserNeyLogProb: discounted bigram + continuation lower order, hand-checked") {
    import spark.implicits._
    // c(a b)=2, c(a c)=1; ctx a: c=3, N1+=2; cont b/c: N1+=1 each; types=2
    // p(b|a) = (2-.75)/3 + .75*(2/3)*(1/2) = 2/3 -> ln = -0.405465
    // p(c|a) = (1-.75)/3 + .25        = 1/3 -> ln = -1.098612
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyLogProb(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 1L, -0.405465), (2L, 1L, -1.098612),
      (3L, 1L, -0.405465)))
    // a doc with < 2 tokens contributes no bigram rows
    assert(TextAnalysis.kneserNeyLogProb(
      Seq((1L, "solo"), (2L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text").count() === 1L)
    // the maxTypes guard fails LOUDLY with the type count named: 2
    // bigram types (a b, a c) against a bound of 1 (VERDICT r15 #4)
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyLogProb(d, "doc_id", "text", maxTypes = 1L) }
    assert(ex.getMessage.contains("2 distinct bigram types"))
  }

  test("conditionalEntropy: the maxTypes guard fails loudly above the bound (VERDICT r15 #4)") {
    import spark.implicits._
    val d = Seq("a b", "a c", "b c").toDF("text") // 3 bigram types
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.conditionalEntropy(d, "text", maxTypes = 2L) }
    assert(ex.getMessage.contains("3 distinct bigram types"))
    // at the bound it runs (boundary inclusive)
    assert(TextAnalysis.conditionalEntropy(d, "text", maxTypes = 3L)
      .count() === 1L)
  }

  test("goodTuring: r* = (r+1)N_{r+1}/N_r; top count has no estimate; p0 = N1/N") {
    import spark.implicits._
    // counts: a=3, b=2, c=1 -> N_1 = N_2 = N_3 = 1
    val d = Seq("a a a b b c").toDF("text")
    val got = TextAnalysis.goodTuring(d, "text").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getAs[Long]("n_next") === 1L)
    assert(r1.getAs[Double]("r_star") === 2.0) // (1+1)*1/1
    assert(r1.getAs[Long]("n_tokens") === 6L)
    assert(r1.getAs[Long]("n_types") === 3L)
    assert(r1.getAs[Double]("p0") === 0.166667)
    assert(got(1).getAs[Double]("r_star") === 3.0) // (2+1)*1/1
    assert(got(2).isNullAt(got(2).fieldIndex("r_star"))) // N_4 = 0
  }

  test("jsDivergence: hand-checked two-source divergence; one-sided terms ride ln 2") {
    import spark.implicits._
    // a: x x y (p_x=2/3, p_y=1/3); b: x z (1/2, 1/2)
    // JSD = (1/3)ln(8/7) + (1/4)ln(6/7) + (1/6)ln2 + (1/4)ln2 = 0.294784
    val d = Seq(("a", "x x y"), ("b", "x z")).toDF("source", "text")
    val r = TextAnalysis.jsDivergence(d, "source", "text", Seq("a", "b"))
      .collect()(0)
    assert(r.getAs[String]("sa") === "a" && r.getAs[String]("sb") === "b")
    assert(r.getAs[Long]("n_terms_union") === 3L)
    assert(r.getAs[Long]("n_terms_shared") === 1L)
    assert(r.getAs[Double]("jsd") === 0.294784)
    // identical distributions diverge by exactly zero
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    assert(TextAnalysis.jsDivergence(same, "source", "text", Seq("a", "b"))
      .collect()(0).getAs[Double]("jsd") === 0.0)
  }

  test("mannWhitneyU: midranks with ties, tie-corrected z, rank-biserial") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,4}: R_a = 1 + 2.5 + 4 = 7.5, U_a = 1.5
    // sigma^2 = (6/12)(6 - 6/20) = 2.85, z = -1.5/sqrt(2.85) = -0.888523
    val d = Seq((1L, "A"), (2L, "A"), (3L, "A"), (2L, "B"), (4L, "B"))
      .toDF("v", "g")
    val r = Profile.mannWhitneyU(d, col("v"), col("g"), "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u_a") === 1.5)
    assert(r.getAs[Double]("rank_biserial") === 0.5) // 1 - 2*1.5/6
    assert(r.getAs[Double]("z") === -0.888523)
  }

  test("cuped: perfect covariate equalizes arms; theta and rho2 exact") {
    import spark.implicits._
    // y = 2x per user -> theta 2, rho2 1; both adjusted means land on 5.0
    val rows = Seq(
      (1L, true, 1000000L), (1L, false, 2000000L),
      (2L, true, 2000000L), (2L, false, 4000000L),
      (3L, true, 3000000L), (3L, false, 6000000L),
      (4L, true, 4000000L), (4L, false, 8000000L))
      .toDF("u", "pre", "v")
    val got = Profile.cuped(rows, col("u"), pmod(col("u"), lit(2)),
      col("v"), col("pre")).collect()
    val byVar = got.map(r => r.getLong(0) -> r).toMap
    assert(byVar(0L).getAs[Double]("mean_y") === 6.0) // users 2, 4
    assert(byVar(1L).getAs[Double]("mean_y") === 4.0) // users 1, 3
    got.foreach { r =>
      assert(r.getAs[Double]("mean_y_adj") === 5.0)
      assert(r.getAs[Double]("theta") === 2.0)
      assert(r.getAs[Double]("rho2") === 1.0)
    }
  }

  test("smithWaterman kernel: local fragments score free of their surroundings") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def sw(a: String, b: String) =
      graft.functions.TextKernels.smithWaterman(u(a), u(b), 2, -1, -1)
    assert(sw("abc", "abc") === 6)       // full match
    assert(sw("xabcy", "zabcw") === 6)   // local "abc", junk costs nothing
    assert(sw("abXcd", "abYcd") === 7)   // substitute (2+2-1+2+2) beats gapping
    assert(sw("aa", "bb") === 0)         // clamped at zero
    assert(sw("", "x") === 0 && sw("ab", "") === 0)
    assert(sw("ab", "ba") === 2)         // best single-char anchor
    // column API matches the kernel
    import spark.implicits._
    val r = Seq(("xabcy", "zabcw")).toDF("a", "b")
      .select(graft.functions.TextExprs.smithWaterman(col("a"), col("b")))
      .head.getInt(0)
    assert(r === 6)
  }

  test("dispersion: one-source burst scores 1/2 under even shares; absent cells fold") {
    import spark.implicits._
    // shares: a = b = 1/2. 'x': 4/5 vs 1/5 -> DP 0.3; 'y': only b -> DP 0.5
    val d = Seq(("a", "x x x x"), ("b", "y y x y")).toDF("source", "text")
    val got = TextAnalysis.dispersion(d, "source", "text",
        minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("y", 3L, 1L, 0.5), ("x", 5L, 2L, 0.3)))
  }

  test("mcNemar: only discordant pairs vote; clamped continuity correction") {
    import spark.implicits._
    // b = 3 (A right, B wrong), c = 1, 2 concordant -> chi2 = (2-1)^2/4
    val d = Seq(
      (true, true, false), (true, true, false), (true, true, false),
      (true, false, true),
      (true, true, true), (false, false, false)).toDF("lbl", "pa", "pb")
    val r = Profile.mcNemar(d, col("lbl"), col("pa"), col("pb")).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("b") === 3L && r.getAs[Long]("c") === 1L)
    assert(r.getAs[Double]("chi2") === 0.25)
    // b = c = 0: no discordance, no statistic
    val z = Profile.mcNemar(d.filter(col("pa") === col("pb")),
      col("lbl"), col("pa"), col("pb")).collect()(0)
    assert(z.isNullAt(z.fieldIndex("chi2")))
  }

  test("spearman: monotone = 1 regardless of shape; midrank ties hand-checked") {
    import spark.implicits._
    val mono = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L), (5L, 25L))
      .toDF("x", "y")
    assert(Profile.spearman(mono, col("x"), col("y"))
      .collect()(0).getAs[Double]("rho") === 1.0)
    assert(Profile.spearman(mono, col("x"), -col("y"))
      .collect()(0).getAs[Double]("rho") === -1.0)
    // ties: ranks x (1, 2.5, 2.5, 4), y (1..4) -> 18/sqrt(18*20)
    val tied = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)).toDF("x", "y")
    val r = Profile.spearman(tied, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("rho") === 0.948683)
  }

  test("conditionalEntropy: hand-checked H(cur|ctx), H(cur), and their MI") {
    import spark.implicits._
    // bigrams: "a b" x2, "b a", "a c" -> B=4; ctx a: 3, ctx b: 1
    // H(cur|ctx) = -( (2/4)ln(2/3) + (1/4)ln(1/3) + (1/4)ln 1 ) = 0.477386
    // H(cur) = 3 x (1/4)ln 4 + ... = 0.5 ln 2 + 0.25 ln 4 + 0.25 ln 4 = 1.039721
    val d = Seq("a b a b", "a c").toDF("text")
    val r = TextAnalysis.conditionalEntropy(d, "text").collect()(0)
    assert(r.getAs[Long]("n_bigrams") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Double]("h_cur") === 1.039721)
    assert(r.getAs[Double]("h_cond") === 0.477386)
    assert(r.getAs[Double]("mi") === 0.562335)
  }

  test("kendallTauBinned: monotone = +/-1; crossed pairs cancel to 0") {
    import spark.implicits._
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val up = Profile.kendallTauBinned(mono, col("x"), col("y"), bins = 4)
      .collect()(0)
    assert(up.getAs[Long]("n") === 4L)
    assert(up.getAs[Double]("c_pairs") === 6.0 &&
      up.getAs[Double]("d_pairs") === 0.0)
    assert(up.getAs[Double]("tau_b") === 1.0)
    assert(Profile.kendallTauBinned(mono, col("x"), -col("y"), bins = 4)
      .collect()(0).getAs[Double]("tau_b") === -1.0)
    // 2x2 checkerboard: one concordant, one discordant -> tau 0
    val cross = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val z = Profile.kendallTauBinned(cross, col("x"), col("y"), bins = 2)
      .collect()(0)
    assert(z.getAs[Double]("c_pairs") === 1.0 &&
      z.getAs[Double]("d_pairs") === 1.0)
    assert(z.getAs[Double]("tau_b") === 0.0)
  }

  test("mongeElkan: reordered tokens score 1 from the long side, junk dilutes the short") {
    import spark.implicits._
    val pairs = Seq((1L, "john smith", 2L, "smith john a"))
      .toDF("id_a", "key_a", "id_b", "key_b")
    val r = graft.ext.Blocking.mongeElkan(pairs).collect()(0)
    // every a-token has an exact twin -> 1.0; 'a' finds no match -> 2/3
    assert(r.getAs[Double]("me_ab") === 1.0)
    assert(r.getAs[Double]("me_ba") === 0.666667)
    assert(r.getAs[Double]("me") === 0.833334)
  }

  test("mongeElkan: duplicate tokens collapse (distinct semantics); empty-token pairs kept as null") {
    import spark.implicits._
    // distinct-token mean: 'john john smith' scores like 'john smith'
    val dup = Seq((1L, "john john smith", 2L, "john smith"))
      .toDF("id_a", "key_a", "id_b", "key_b")
    val rd = graft.ext.Blocking.mongeElkan(dup).collect()(0)
    assert(rd.getAs[Double]("me_ab") === 1.0)
    assert(rd.getAs[Double]("me") === 1.0)
    // a pair whose key tokenizes to nothing survives with null scores
    // (ADVICE r14 — the inner explode used to drop it silently)
    val pairs = Seq((1L, "john smith", 2L, "smith john"),
      (3L, "   ", 4L, "smith")).toDF("id_a", "key_a", "id_b", "key_b")
    val got = graft.ext.Blocking.mongeElkan(pairs).orderBy("id_a").collect()
    assert(got.length === 2, "the empty-token pair must not vanish")
    assert(got(1).getAs[Long]("id_a") === 3L)
    assert(got(1).isNullAt(got(1).fieldIndex("me_ab")) &&
      got(1).isNullAt(got(1).fieldIndex("me")))
  }

  test("weightedJaccard: multiset min/max; disjoint pair scores 0") {
    import spark.implicits._
    val d = Seq((1L, "a a b"), (2L, "a b b"), (3L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.weightedJaccard(d, "doc_id", "text", pairs)
      .orderBy("doc_a", "doc_b").collect()
    // {a:2,b:1} vs {a:1,b:2}: min 2, max 4 -> 0.5
    assert(got(0).getAs[Long]("sum_min") === 2L)
    assert(got(0).getAs[Double]("wjac") === 0.5)
    assert(got(1).getAs[Long]("sum_min") === 0L)
    assert(got(1).getAs[Double]("wjac") === 0.0)
  }

  test("diffInDiff: shared trend cancels, treatment delta remains") {
    import spark.implicits._
    // treated u1: 10 -> 30; control u2: 20 -> 25 => did = 20 - 5 = 15
    val ev = Seq(
      (1L, false, 10000000L), (1L, true, 30000000L),
      (2L, false, 20000000L), (2L, true, 25000000L)).toDF("u", "p", "v")
    val r = graft.ext.Profile.diffInDiff(ev, col("u"), col("u") === 1,
      col("p"), col("v")).collect()(0)
    assert(r.getAs[Long]("n_tpre") === 1L && r.getAs[Long]("n_cpost") === 1L)
    assert(r.getAs[Double]("mean_tpre") === 10.0)
    assert(r.getAs[Double]("mean_tpost") === 30.0)
    assert(r.getAs[Double]("mean_cpre") === 20.0)
    assert(r.getAs[Double]("mean_cpost") === 25.0)
    assert(r.getAs[Double]("did") === 15.0)
  }

  test("jenksBreaks: DP picks the variance-optimal split, not the greedy one") {
    import spark.implicits._
    // occupied bins: {10k,20k}, {30k}, {40k}, {100k}; k=2 optimum keeps
    // 10k-40k together (sse6 500) and isolates 100k — splits at j=1 or
    // j=2 cost 2917 / 2000 (hand-computed)
    val d = Seq(10000L, 20000L, 30000L, 40000L, 100000L).toDF("v")
    val got = graft.ext.Profile.jenksBreaks(d, col("v"), k = 2, bins = 8)
      .orderBy("class").collect()
    assert(got(0).getAs[Long]("bin_lo") === 0L)
    assert(got(0).getAs[Long]("bin_hi") === 2L)
    assert(got(0).getAs[Long]("n_rows") === 4L)
    assert(got(0).getAs[Double]("mean") === 25000.0)
    assert(got(0).getAs[Long]("sse6") === 500L)
    assert(got(1).getAs[Long]("bin_lo") === 7L)
    assert(got(1).getAs[Long]("n_rows") === 1L)
    assert(got(1).getAs[Double]("mean") === 100000.0)
    assert(got(1).getAs[Long]("sse6") === 0L)
  }

  test("vocabRichness: Chao1 lower bound and Good coverage, hand-checked") {
    import spark.implicits._
    // counts: a=3, b=2, c=1, d=1 -> V=4, N1=2, N2=1, N=7
    // chao1 = 4 + 4/2 = 6; coverage = 1 - 2/7 = 0.714286
    val d = Seq("a a a b b c d").toDF("text")
    val r = TextAnalysis.vocabRichness(d, "text").collect()(0)
    assert(r.getAs[Long]("n_tokens") === 7L && r.getAs[Long]("vocab") === 4L)
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 1L)
    assert(r.getAs[Double]("chao1") === 6.0)
    assert(r.getAs[Double]("coverage") === 0.714286)
    // no doubletons: the estimator is undefined, not infinite
    val z = TextAnalysis.vocabRichness(Seq("a b").toDF("text"), "text")
      .collect()(0)
    assert(z.isNullAt(z.fieldIndex("chao1")))
  }

  test("captureRecapture: Lincoln-Petersen from two pair screens") {
    import spark.implicits._
    val a = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val b = Seq((1L, 2L), (4L, 5L), (6L, 7L), (8L, 9L)).toDF("doc_a", "doc_b")
    val r = Dedup.captureRecapture(a, b).collect()(0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Long]("n_both") === 2L)
    assert(r.getAs[Double]("est_total") === 6.0) // 3*4/2
    // disjoint screens: no overlap, no estimate
    val z = Dedup.captureRecapture(a,
      Seq((6L, 7L)).toDF("doc_a", "doc_b")).collect()(0)
    assert(z.isNullAt(z.fieldIndex("est_total")))
  }

  test("needlemanWunsch kernel: global ends pay gaps; SW's junk is not free") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def nw(a: String, b: String) =
      graft.functions.TextKernels.needlemanWunsch(u(a), u(b), 2, -1, -1)
    assert(nw("abc", "abc") === 6)
    assert(nw("abc", "abd") === 3)  // 2 + 2 - 1
    assert(nw("abc", "bc") === 3)   // leading gap -1, then 2 + 2
    assert(nw("", "ab") === -2 && nw("ab", "") === -2)
    assert(nw("ab", "ba") === 0)    // one anchor match, two gaps
    // vs SW on shared-fragment-in-junk: local 6, global punishes
    def sw(a: String, b: String) =
      graft.functions.TextKernels.smithWaterman(u(a), u(b), 2, -1, -1)
    assert(sw("xabcy", "zabcw") === 6 && nw("xabcy", "zabcw") === 4)
  }

  test("wasserstein1: shift by a constant = that constant; identical = 0") {
    import spark.implicits._
    // B = A + 5: W1 is exactly 5 regardless of shape
    val d = Seq((1L, "A"), (4L, "A"), (9L, "A"),
      (6L, "B"), (9L, "B"), (14L, "B")).toDF("v", "g")
    val r = Profile.wasserstein1(d, col("v"), col("g"), "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("w1") === 5.0)
    val same = Seq((1L, "A"), (2L, "A"), (1L, "B"), (2L, "B")).toDF("v", "g")
    assert(Profile.wasserstein1(same, col("v"), col("g"), "A", "B")
      .collect()(0).getAs[Double]("w1") === 0.0)
  }

  test("psi: identical distributions score 0; disjoint masses score high") {
    import spark.implicits._
    val same = Seq((1L, "A"), (9L, "A"), (1L, "B"), (9L, "B")).toDF("v", "g")
    val r0 = Profile.psi(same, col("v"), col("g"), "A", "B", bins = 2)
      .collect()(0)
    assert(r0.getAs[Long]("n_cells") === 2L)
    assert(r0.getAs[Double]("psi") === 0.0)
    // all of A low, all of B high: strong drift, well past the 0.25 gate
    val split = Seq((1L, "A"), (2L, "A"), (8L, "B"), (9L, "B")).toDF("v", "g")
    val r1 = Profile.psi(split, col("v"), col("g"), "A", "B", bins = 2)
      .collect()(0)
    assert(r1.getAs[Double]("psi") > 1.0)
  }

  test("psi: ALL bins fold (ADVICE r14) — both-empty cells count, smoothed shares sum to 1") {
    import spark.implicits._
    // values 0 and 9 over 10 bins: bins 1..8 are empty in BOTH groups;
    // n_cells must still read 10, and with n_a != n_b those empty cells
    // carry (1/(n_a+10) - 1/(n_b+10))*ln terms — psi strictly above the
    // two-occupied-cells-only fold
    val df = (Seq.fill(30)((0L, "A")) ++ Seq.fill(30)((9L, "A")) ++
      Seq.fill(5)((0L, "B")) ++ Seq.fill(5)((9L, "B"))).toDF("v", "g")
    val r = Profile.psi(df, col("v"), col("g"), "A", "B", bins = 10)
      .collect()(0)
    assert(r.getAs[Long]("n_cells") === 10L,
      "every cell id participates, occupied or not")
    // hand fold (n_a=60, n_b=10, B=10): occupied cells pa=(30+1)/70,
    // pb=(5+1)/20; empty cells pa=1/70, pb=1/20
    val t = (pa: Double, pb: Double) => (pa - pb) * math.log(pa / pb)
    val expected = 2 * t(31.0 / 70, 6.0 / 20) + 8 * t(1.0 / 70, 1.0 / 20)
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-5,
      s"got ${r.getAs[Double]("psi")}, want ~$expected")
  }

  test("psi bin ids: near-Long.MaxValue span routes to the decimal path, no negative ids") {
    import spark.implicits._
    // span ~ Long.MaxValue: the long product (v - lo) * bins would wrap;
    // the guard must route to DECIMAL and every row must land in a
    // valid cell (a negative id would fall off the all-bins join and
    // silently drop its count from n_a/n_b)
    val df = Seq((Long.MinValue / 2, "A"), (Long.MaxValue / 2, "A"),
      (0L, "B"), (Long.MaxValue / 2, "B")).toDF("v", "g")
    val r = Profile.psi(df, col("v"), col("g"), "A", "B", bins = 10)
      .collect()(0)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L,
      "every row must reach a valid cell")
    assert(r.getAs[Long]("n_cells") === 10L)
    assert(!r.getAs[Double]("psi").isNaN)
  }

  test("categoricalAssociation: perfect copy scores 1 everywhere, independence 0") {
    import spark.implicits._
    val perfect = Seq(("x", "1"), ("x", "1"), ("y", "2"), ("y", "2"))
      .toDF("a", "b")
    val rp = Profile.categoricalAssociation(perfect, col("a"), col("b"))
      .collect()(0)
    assert(rp.getAs[Double]("chi2") === 4.0)
    assert(rp.getAs[Double]("cramers_v") === 1.0)
    assert(rp.getAs[Double]("theil_u_a") === 1.0)
    assert(rp.getAs[Double]("theil_u_b") === 1.0)
    val indep = Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2"))
      .toDF("a", "b")
    val ri = Profile.categoricalAssociation(indep, col("a"), col("b"))
      .collect()(0)
    assert(ri.getAs[Double]("chi2") === 0.0)
    assert(ri.getAs[Double]("cramers_v") === 0.0)
    assert(ri.getAs[Double]("theil_u_a") === 0.0)
  }

  test("brierDecomposition: perfect forecast = resolution; overconfident = reliability") {
    import spark.implicits._
    val perfect = Seq((0L, false), (100L, true)).toDF("p", "y")
    val rp = Profile.brierDecomposition(perfect, col("p"), col("y"))
      .collect()(0)
    assert(rp.getAs[Double]("brier") === 0.0)
    assert(rp.getAs[Double]("reliability") === 0.0)
    assert(rp.getAs[Double]("resolution") === 0.25)
    assert(rp.getAs[Double]("uncertainty") === 0.25)
    val wrong = Seq((100L, false)).toDF("p", "y")
    val rw = Profile.brierDecomposition(wrong, col("p"), col("y"))
      .collect()(0)
    assert(rw.getAs[Double]("brier") === 1.0)
    assert(rw.getAs[Double]("reliability") === 1.0)
    assert(rw.getAs[Double]("resolution") === 0.0)
  }

  test("wasserstein1Matrix: pairwise shifts come out in metric units") {
    import spark.implicits._
    val d = Seq(("a", 1L), ("b", 6L), ("c", 11L)).toDF("g", "v")
    val got = Profile.wasserstein1Matrix(d, col("v"), col("g"),
        Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("w1"))).toMap
    assert(got(("a", "b")) === 5.0)
    assert(got(("a", "c")) === 10.0)
    assert(got(("b", "c")) === 5.0)
  }

  test("substringEditDistance: free start/end, edits only inside the match") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def sed(p: String, t: String) =
      graft.functions.TextKernels.substringEditDistance(u(p), u(t))
    assert(sed("abc", "xxabcyy") === 0) // exact substring, junk free
    assert(sed("abc", "xabzcy") === 1)  // one insert inside the span
    assert(sed("abc", "") === 3)        // nothing to match against
    assert(sed("abc", "def") === 3)
    assert(sed("ab", "b") === 1)
    assert(sed("", "xyz") === 0)        // empty pattern matches anywhere
  }

  test("lcsLength: classic cases; ratio is the diff-style similarity") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def lcs(a: String, b: String) =
      graft.functions.TextKernels.lcsLength(u(a), u(b))
    assert(lcs("abcde", "ace") === 3)
    assert(lcs("ABCBDAB", "BDCABA") === 4)
    assert(lcs("abc", "") === 0 && lcs("", "abc") === 0)
    assert(lcs("abc", "abc") === 3)
    // order matters: a reversal shares only one preserved run
    assert(lcs("abcd", "dcba") === 1)
  }

  test("cosineMatrix: scaled copy is cosine-1; orthogonal vocabularies are 0") {
    import spark.implicits._
    val d = Seq(("a", "x x y"), ("b", "x x x x y y"), ("c", "z w"))
      .toDF("source", "text")
    val got = TextAnalysis.cosineMatrix(d, "source", "text",
        Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("cosine"))).toMap
    assert(got(("a", "b")) === 1.0) // b = 2x a: same direction
    // full-matrix contract (ADVICE r14): token-disjoint pairs emit a
    // 0-cell, never a hole — callers iterate the complete matrix
    assert(got(("a", "c")) === 0.0 && got(("b", "c")) === 0.0)
    // dissimilar but overlapping: x-only vs x+y
    val e = Seq(("a", "x"), ("b", "x y")).toDF("source", "text")
    val r = TextAnalysis.cosineMatrix(e, "source", "text", Seq("a", "b"))
      .collect()(0)
    assert(r.getAs[Double]("cosine") === 0.707107) // 1/sqrt(2)
  }

  test("vocabOverlapMatrix: nested vocabulary has overlap 1, Dice < 1") {
    import spark.implicits._
    val d = Seq(("a", "x y"), ("b", "x y z w")).toDF("source", "text")
    val r = TextAnalysis.vocabOverlapMatrix(d, "source", "text",
      Seq("a", "b")).collect()(0)
    assert(r.getAs[Long]("v_a") === 2L && r.getAs[Long]("v_b") === 4L)
    assert(r.getAs[Long]("n_common") === 2L)
    assert(r.getAs[Double]("overlap") === 1.0)
    assert(r.getAs[Double]("dice") === 0.666667) // 4/6
  }

  test("smithWatermanAffine: long gaps cost open + ext, not per-char") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def swa(a: String, b: String) =
      graft.functions.TextKernels.smithWatermanAffine(u(a), u(b), 2, -1, 2, 1)
    assert(swa("abc", "abc") === 6)
    assert(swa("xabcy", "zabcw") === 6)    // local junk still free
    assert(swa("abXcd", "abYcd") === 7)    // substitution, no gap
    assert(swa("abXYcd", "abcd") === 5)    // 2-gap: 8 - (2+1)
    assert(swa("abXYZcd", "abcd") === 4)   // 3-gap: 8 - (2+1+1)
    assert(swa("ab", "ba") === 2)
    assert(swa("", "x") === 0 && swa("ab", "") === 0)
    // vs linear SW: the long gap shreds linear (8-3 gaps at -1 = 5 too at
    // 3 chars; at 4 chars affine wins: 8-5 = 3 vs affine 8-(2+3) = 3...)
    // the defining check: affine >= linear-with-open-cost always
    def sw(a: String, b: String) =
      graft.functions.TextKernels.smithWaterman(u(a), u(b), 2, -1, -1)
    assert(swa("abWXYZcd", "abcd") >= sw("abWXYZcd", "abcd") - 1)
  }

  test("lDiversity: distinct-l and entropy per QI group; homogeneous group fails l") {
    import spark.implicits._
    val d = Seq(("g1", 1L), ("g1", 1L), ("g1", 2L), ("g1", 2L),
      ("g2", 1L), ("g2", 1L), ("g2", 1L)).toDF("qi", "s")
    val got = Profile.lDiversity(d, Seq("qi"), col("s"), l = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert(g1.getAs[Long]("k") === 4L && g1.getAs[Long]("l_distinct") === 2L)
    // two terms of round6(-(0.5 ln 0.5)) = 0.346574 each
    assert(g1.getAs[Double]("entropy") === 0.693148)
    assert(g1.getAs[Boolean]("meets_l"))
    val g2 = got("g2")
    assert(g2.getAs[Long]("l_distinct") === 1L)
    assert(g2.getAs[Double]("entropy") === 0.0)
    assert(!g2.getAs[Boolean]("meets_l"))
  }
}
