package graft

import org.apache.spark.sql.DataFrame
import graft.ops.FuzzyJoin

/** Bucket truth table from the reference semantics
  * (/root/reference/main.py:197-230) + full-vs-pruned equivalence. */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 8-char strings so cross-probe distances all exceed the threshold (3)
  private val data = Seq(
    (1L, "abcdefgh"),    // exact for probe1
    (2L, "abcdefgx"),    // d=1 from abcdefgh
    (3L, "abcdefxy"),    // d=2 from abcdefgh
    (4L, "aaaabbbx"),    // d=1 from aaaabbbb
    (5L, "aaaabbxx"),    // d=2 from aaaabbbb (tie with 6)
    (6L, "aaaabbyy"),    // d=2 from aaaabbbb (tie with 5)
    (7L, "kkkkmmmm"),    // exact-only probe's sole neighbor
    (8L, "zzzzzzzzzzzzzzzz") // far from everything
  ).toDF("data_id", "match_val")

  private val search = Seq("abcdefgh", "aaaabbbb", "kkkkmmmm", "qqqqrrrr").toDF("search_val")

  private def buckets(df: DataFrame): Map[(String, String), Set[Long]] =
    df.select("search_val", "bucket", "data_id").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap

  private lazy val full = buckets(FuzzyJoin.fuzzyMatch(search, data, 3))

  test("exact bucket: d == 0") {
    assert(full(("abcdefgh", "exact")) === Set(1L))
    assert(full(("kkkkmmmm", "exact")) === Set(7L))
  }

  test("best bucket: min over (0, T], exact does not reset it") {
    assert(full(("abcdefgh", "best")) === Set(2L)) // d=1, despite exact d=0 present
  }

  test("best keeps ALL ties at the min") {
    assert(full(("aaaabbbb", "best")) === Set(4L))
    assert(full(("aaaabbbb", "potential")) === Set(5L, 6L)) // tied d=2, not best
  }

  test("potential = (0,T] minus best") {
    assert(full(("abcdefgh", "potential")) === Set(3L))
  }

  test("poor_best fallback: only when nothing in (0,T]; keeps global-min ties") {
    // qqqqrrrr: nothing within 3; all global-min ties are kept (every 8-char
    // candidate is at d=8)
    val pb = full(("qqqqrrrr", "poor_best"))
    assert(pb === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(!full.contains(("qqqqrrrr", "best")))
    assert(!full.contains(("qqqqrrrr", "potential")))
  }

  test("a probe with ONLY an exact match duplicates it into poor_best (main.py:218-228)") {
    // kkkkmmmm: d=0 exists but no 0<d<=3, so fallback scans all incl. d=0
    assert(full(("kkkkmmmm", "poor_best")) === Set(7L))
    assert(full(("kkkkmmmm", "exact")) === Set(7L))
  }

  test("pruned variant is row-identical to the full scan") {
    val f = FuzzyJoin.fuzzyMatch(search, data, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    val p = FuzzyJoin.fuzzyMatchPruned(search, data, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    assert(f.exceptAll(p).isEmpty && p.exceptAll(f).isEmpty)
  }

  test("q-gram refined variant is row-identical to the full scan (incl. short strings)") {
    // lengths straddle the short/long routing boundary q(T+1)-1 = 7:
    // "ab" (2), "abcdef" (6) go through the band-only channels; the 8-char
    // fixtures exercise the (length, prefix-gram) composite key; the
    // mixed pair (8-char probe vs 6-char candidate) crosses channels.
    val mixData = data.unionByName(Seq(
      (20L, "ab"), (21L, "abcd"), (22L, "abcdef"), (23L, "abcdefg")).toDF("data_id", "match_val"))
    val mixSearch = search.unionByName(Seq("abc", "abcdefg").toDF("search_val"))
    val f = FuzzyJoin.fuzzyMatch(mixSearch, mixData, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    val g = FuzzyJoin.fuzzyMatchPrunedQgram(mixSearch, mixData, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    assert(f.exceptAll(g).isEmpty && g.exceptAll(f).isEmpty)
  }

  test("q-gram variant == full scan on randomized strings (repetitive + mixed alphabets, all lengths)") {
    // Adversarial for the prefix-filter theorem: low-distinct-gram
    // repetitive strings ('ababab', 'aaaa'), digit-heavy strings whose
    // grams sort before letters, symbols that normalize away, and lengths
    // straddling the short/long routing boundary.
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "ab1", "a", "abcde0", "ab-!x")
    def randStr() = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(14)).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    val dataR = (1L to 60L).map(i => (i, randStr())).toDF("data_id", "match_val")
    val searchR = (0 until 25).map(_ => randStr()).distinct.toDF("search_val")
    val f = FuzzyJoin.fuzzyMatch(searchR, dataR, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    val g = FuzzyJoin.fuzzyMatchPrunedQgram(searchR, dataR, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    assert(f.exceptAll(g).isEmpty && g.exceptAll(f).isEmpty)
  }

  test("q-gram variant scores duplicate probe rows per-row (internal pair dedup is per probe ROW)") {
    val dupSearch = Seq("abcdefgh", "abcdefgh").toDF("search_val")
    val out = FuzzyJoin.fuzzyMatchPrunedQgram(dupSearch, data, 3)
    assert(out.filter($"bucket" === "exact").count() === 2)
  }

  test("q-gram variant keeps distinct data rows that share a data_id value") {
    // long strings (channel C) with a repeated data_id: the internal pair
    // dedup must collapse multi-gram collisions of the SAME rows only,
    // never two different rows that happen to share an id
    val dupIdData = Seq((1L, "abcdefgh"), (1L, "abcdefgx"), (1L, "abcdefgh"))
      .toDF("data_id", "match_val")
    val s1 = Seq("abcdefgh").toDF("search_val")
    val f = FuzzyJoin.fuzzyMatch(s1, dupIdData, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    val g = FuzzyJoin.fuzzyMatchPrunedQgram(s1, dupIdData, 3)
      .select("search_val", "match_val", "data_id", "distance", "bucket")
    assert(f.exceptAll(g).isEmpty && g.exceptAll(f).isEmpty)
    assert(g.filter($"bucket" === "exact").count() === 2) // both identical rows kept
  }

  test("duplicate probe rows are scored per-row like the reference loop") {
    val dupSearch = Seq("abcdefgh", "abcdefgh").toDF("search_val")
    val out = FuzzyJoin.fuzzyMatch(dupSearch, data, 3)
    val exact = out.filter($"bucket" === "exact").count()
    assert(exact === 2) // one output row per probe row
  }

  test("topK radius-first == brute-force rank over the full cross product") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // mix: abcdefgh fills its band (>=2 within radius 3); qqqqrrrr needs the fallback
    val k = 2
    val got = FuzzyJoin.topK(search, data, k, radius = 3)
      .select("search_val", "rnk", "data_id", "distance")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val w = Window.partitionBy("search_val").orderBy(col("distance").asc, col("data_id").asc)
    val expected = FuzzyJoin.score(search, data)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("search_val", "rnk", "data_id", "distance")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected)
    assert(got.size === 4 * k) // every probe gets exactly k results
  }

  test("topKDamerau radius-first == brute-force DL rank; keeps transpositions a lev filter would lose") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // "abcdefhg" is DL=1 but LEV=2 from abcdefgh — the band phase must
    // filter by DL, not banded levenshtein, or this candidate is lost
    val dlData = data.unionByName(Seq((9L, "abcdefhg")).toDF("data_id", "match_val"))
    val k = 3
    val got = FuzzyJoin.topKDamerau(search, dlData, k, radius = 3)
      .select("search_val", "rnk", "data_id", "dl")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val w = Window.partitionBy("search_val").orderBy(col("dl").asc, col("data_id").asc)
    val expected = graft.ops.Partitioning.spread(dlData)
      .withColumn("m_norm", graft.ops.Normalize.norm(col("match_val")))
      .crossJoin(broadcast(search
        .withColumn("s_norm", graft.ops.Normalize.norm(col("search_val")))))
      .withColumn("dl", graft.functions.TextExprs.damerauLevenshtein(
        col("s_norm"), col("m_norm")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("search_val", "rnk", "data_id", "dl")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got === expected)
    assert(got.size === 4 * k)
    // the transposition candidate ties dl=1 with data_id 2 (id tiebreak)
    // and must beat every d=2 candidate — rank 3 under k=3
    assert(got.contains(("abcdefgh", 3, 9L, 1)),
      "DL=1 transposition must outrank the lev-band d=2 survivors")
  }

  test("topKJaroWinklerBanded == topKJaroWinkler on strong AND weak matches") {
    def rows(df: DataFrame): Set[(String, Int, Long)] =
      df.select("search_val", "rnk", "data_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // strong: near-identical names — the certificate (kth sim > 0.9 at
    // rho=0.5) fires and the fallback scan sees zero probes
    val strongData = Seq((1L, "jellyfish co"), (2L, "jellyfish inc"),
      (3L, "jellyfish ltd"), (4L, "unrelated zq")).toDF("data_id", "match_val")
    val strongSearch = Seq("jellyfish co").toDF("search_val")
    assert(rows(FuzzyJoin.topKJaroWinklerBanded(strongSearch, strongData, 3)) ===
      rows(FuzzyJoin.topKJaroWinkler(strongSearch, strongData, 3)))
    // weak: nothing certifies — every probe must fall through to the
    // exact scan and the result still matches the plain form
    assert(rows(FuzzyJoin.topKJaroWinklerBanded(search, data, 2)) ===
      rows(FuzzyJoin.topKJaroWinkler(search, data, 2)))
  }

  test("q155 (banded) answers q149 (exact) identically at the query level") {
    // the two queries share one DuckDB mirror (ExtQueries.jwTopkOracleSql);
    // this pins the same identity engine-side on real testdata, including
    // the projection, rounding, and ordering the oracle hashes
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q149_fuzzy_jw_topk")(spark, dir).collect().toSeq
    val banded = SparkEntry.queries("q155_fuzzy_jw_banded")(spark, dir).collect().toSeq
    assert(exact.nonEmpty)
    assert(banded === exact)
  }

  test("prescreened tier == exact tier when every true match shares a rare gram") {
    def rows(df: DataFrame): Set[(String, Int, Long)] =
      df.select("search_val", "rnk", "data_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val strongData = Seq((1L, "jellyfish co"), (2L, "jellyfish inc"),
      (3L, "jellyfish ltd"), (4L, "unrelated zq")).toDF("data_id", "match_val")
    val strongSearch = Seq("jellyfish co").toDF("search_val")
    assert(rows(FuzzyJoin.topKJaroWinklerPrescreened(
        strongSearch, strongData, 3, q = 2)) ===
      rows(FuzzyJoin.topKJaroWinkler(strongSearch, strongData, 3)))
  }

  test("prescreened tier: water-fill budget — 2·maxCandidates postings, rarest gram filled first") {
    // probe grams vs data df: 'xy' appears once, 'ab' five times, 'bx'
    // never. With maxCandidates = 1 the water-fill budget B = 2 fills
    // ascending df: 'xy' takes its FULL posting (b = 1), the remaining
    // budget gives 'ab' a depth-1 prefix of its salted-h60 bucket.
    // Candidates = the xy-string plus exactly one deterministically
    // sampled ab-string: two postings total, the bound exactly.
    val d = Seq((1L, "abcdef"), (2L, "abdedf"), (3L, "abeeef"),
      (4L, "abffff"), (5L, "abgggg"), (6L, "qqxyqq")).toDF("data_id", "match_val")
    val s = Seq("abxy").toDF("search_val")
    val out = FuzzyJoin.topKJaroWinklerPrescreened(s, d, 3, q = 2,
        maxCandidates = 1)
      .select("data_id").collect().map(_.getLong(0)).toSet
    val abPick = (1L to 5L).minBy(id =>
      (graft.ext.TextAnalysis.h60Local("jwb:c:ab:" + id), id))
    assert(out === Set(6L, abPick),
      "candidates must be the rare-gram string + ONE h60-sampled ab posting")
    // with budget for both grams uncapped, all ab-strings join the
    // candidate set (k = 6 so the whole candidate set surfaces)
    val wide = FuzzyJoin.topKJaroWinklerPrescreened(s, d, 6, q = 2,
        maxCandidates = 100)
      .select("data_id").collect().map(_.getLong(0)).toSet
    assert(wide === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("prescreened tier: probe sharing no indexed gram emits no rows, no crash") {
    val d = Seq((1L, "aaaa"), (2L, "aabb")).toDF("data_id", "match_val")
    val s = Seq("zzzz").toDF("search_val")
    assert(FuzzyJoin.topKJaroWinklerPrescreened(s, d, 2, q = 2).count() === 0L)
  }

  test("prescreened tier: stop-gram cut (maxDf) drops ubiquitous grams from the index") {
    // 'ab' appears in every data string (df 4 > maxDf 3) -> stop-gram;
    // the probe's only other gram 'bz' appears once -> its string is
    // the sole candidate. With the default maxDf the same probe sees
    // every string through 'ab'.
    val d = Seq((1L, "abcc"), (2L, "abdd"), (3L, "abee"), (4L, "abzz"))
      .toDF("data_id", "match_val")
    val s = Seq("abz").toDF("search_val")
    val capped = FuzzyJoin.topKJaroWinklerPrescreened(s, d, 4, q = 2,
        maxDf = 3)
      .select("data_id").collect().map(_.getLong(0)).toSet
    assert(capped === Set(4L), "only the rare-gram candidate may survive")
    val open = FuzzyJoin.topKJaroWinklerPrescreened(s, d, 4, q = 2)
      .select("data_id").collect().map(_.getLong(0)).toSet
    assert(open === Set(1L, 2L, 3L, 4L))
  }

  test("prescreened tier: a partial channel reads the h60-smallest posting prefix, SALTED by gram") {
    // one shared gram 'qq' with df 5 > budget B = 2·maxCandidates = 4:
    // water-fill gives the single channel the WHOLE budget, so the
    // candidate set is the 4 data ids with smallest h60('jwb:' || g ||
    // ':' || id) — the deterministic uniform bucket prefix the oracle
    // replays (round 16's flat cap read only maxCandidates = 2 here;
    // concentrating the budget into one deeper prefix is the round-17
    // water-fill win). The GRAM salt keeps distinct partial channels
    // sampling independently.
    val d = Seq((1L, "qqa"), (2L, "qqb"), (3L, "qqc"), (4L, "qqd"),
      (5L, "qqe")).toDF("data_id", "match_val")
    val s = Seq("qqz").toDF("search_val")
    val got = FuzzyJoin.topKJaroWinklerPrescreened(s, d, 5, q = 2,
        maxCandidates = 2)
      .select("data_id").collect().map(_.getLong(0)).toSet
    val expect = (1L to 5L).sortBy(id => (
        graft.ext.TextAnalysis.h60Local("jwb:c:qq:" + id), id)).take(4).toSet
    assert(got === expect, s"bucket prefix must follow pinned salted-h60 order")
  }

  test("prescreened tier: cap-ACTIVE output invariant under physical repartition (VERDICT r15 #3)") {
    // 40 corpus rows all sharing gram 'qq', maxCandidates = 3 -> the cap
    // genuinely truncates. The capped sample is ordered by (h60, data_id):
    // the id tiebreak makes the rank window a function of the row SET, so
    // any physical layout of either side must yield byte-identical ranks.
    val d = (1L to 40L).map(i => (i, s"qq${('a' + (i % 26)).toChar}$i"))
      .toDF("data_id", "match_val")
    val s = Seq("qqz", "qqy").toDF("search_val")
    def canon(search: DataFrame, data: DataFrame) =
      FuzzyJoin.topKJaroWinklerPrescreened(search, data, 5, q = 2,
          maxCandidates = 3)
        .select("search_val", "rnk", "data_id", "sim")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    val base = canon(s, d)
    assert(base.nonEmpty)
    assert(canon(s.repartition(3), d.repartition(7)) === base)
    assert(canon(s.coalesce(1), d.repartition(13)) === base)
  }

  test("lev prescreened hybrid: exact-within-radius certificate, prescreen beyond, dupes die") {
    val d = Seq((1L, "abcd"), (2L, "abcx"), (3L, "abxd"), (4L, "axcd"),
      (5L, "qqqqabzz"), (6L, "ppppabyy")).toDF("data_id", "match_val")
    // probe with 4 neighbors at d <= 1: phase 1 alone answers, EXACT
    val gotA = FuzzyJoin.topKLevenshteinPrescreened(
        Seq("abcd").toDF("search_val"), d, 3, radius = 1, q = 2)
      .select("rnk", "data_id", "distance").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(gotA === Seq((1, 1L, 0), (2, 2L, 1), (3, 3L, 1)))
    // probe with NOTHING in radius 1: residual -> prescreen channels
    // cover ids {1,2,3,5,6} via shared bigrams; top-3 are the d=2 rows
    // BEYOND the radius, with exact distances
    val gotB = FuzzyJoin.topKLevenshteinPrescreened(
        Seq("abzz").toDF("search_val"), d, 3, radius = 1, q = 2)
      .select("rnk", "data_id", "distance").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(gotB === Seq((1, 1L, 2), (2, 2L, 2), (3, 3L, 2)))
    // probe whose ONE in-radius match (itself) is ALSO a prescreen
    // candidate: the pair rides both streams and must rank exactly once
    val gotC = FuzzyJoin.topKLevenshteinPrescreened(
        Seq("qqqqabzz").toDF("search_val"), d, 3, radius = 1, q = 2)
      .select("rnk", "data_id", "distance").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(gotC.head === ((1, 5L, 0)))
    assert(gotC.map(_._2).distinct.size === gotC.size,
      s"a both-path pair must die in the distinct fold: $gotC")
    assert(gotC.map(_._1) === (1 to gotC.size), s"ranks contiguous: $gotC")
  }

  test("jwPrescreenCoverage: per-channel retention ratios; minCoverage guard fails loudly") {
    val d = Seq((1L, "qqa"), (2L, "qqb"), (3L, "qqc"), (4L, "qqd"),
      (5L, "qqxy")).toDF("data_id", "match_val")
    val s = Seq("qqxyz", "qqq").toDF("search_val")
    val cov = FuzzyJoin.jwPrescreenCoverage(s, d, q = 2, maxCandidates = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    // 'qqq' indexes only c:qq (its skip-gram s:qq hits nothing): df 5,
    // water-filled to depth B = 4 -> 0.8 both ways; 'qqxyz' fills FOUR
    // df-1 channels (c:qx, c:xy, s:qx, s:qy — the round-17 skip family
    // doubles its rare features), exhausting the budget before c:qq ->
    // all-full channels, best = worst = 1.0
    assert(cov === Seq(("qqq", 1L, 1L, 0.8, 0.8),
      ("qqxyz", 4L, 0L, 1.0, 1.0)))
    // the guard reads mean best-channel coverage = (0.8 + 1.0)/2 = 0.9
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(s, d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.95) }
    assert(ex.getMessage.contains("minCoverage"))
    // below the mean it runs (and default 0.0 never guards)
    assert(FuzzyJoin.topKJaroWinklerPrescreened(s, d, 3, q = 2,
      maxCandidates = 2, minCoverage = 0.85).count() > 0L)
  }

  test("coverage guard r17 shape: uncovered probes count as 0; minWorstCoverage floors the min (ADVICE r16)") {
    val d = Seq((1L, "qqa"), (2L, "qqb"), (3L, "qqc"), (4L, "qqd"),
      (5L, "qqxy")).toDF("data_id", "match_val")
    // 'zzz' shares no indexed gram with the corpus: the old
    // covered-probe mean IGNORED it (vacuous pass); it now counts as
    // coverage 0, so the mean over ALL probes is (1.0 + 0.8 + 0)/3
    val s3 = Seq("qqxyz", "qqq", "zzz").toDF("search_val")
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(s3, d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.7) }
    assert(ex.getMessage.contains("uncovered = 0"))
    assert(FuzzyJoin.topKJaroWinklerPrescreened(s3, d, 3, q = 2,
      maxCandidates = 2, minCoverage = 0.55).count() > 0L)
    // an ENTIRELY uncovered probe set fails instead of passing vacuously
    val ex0 = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(
        Seq("zzz").toDF("search_val"), d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.1) }
    assert(ex0.getMessage.contains("minCoverage"))
    // the bimodal floor: mean passes at 0.55, but the worst probe is
    // the uncovered one (0) — minWorstCoverage catches what mean hides
    val exw = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(s3, d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.55, minWorstCoverage = 0.1) }
    assert(exw.getMessage.contains("minWorstCoverage"))
    // fully covered set: worst = min per-probe best = 0.8
    val s2 = Seq("qqxyz", "qqq").toDF("search_val")
    intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(s2, d, 3, q = 2,
        maxCandidates = 2, minWorstCoverage = 0.9) }
    assert(FuzzyJoin.topKJaroWinklerPrescreened(s2, d, 3, q = 2,
      maxCandidates = 2, minWorstCoverage = 0.7).count() > 0L)
  }

  test("water-fill allocation achieves the brute-force optimum of sum(b/df) under the budget (VERDICT r17 #4)") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.functions.col
    // seeded property loop (the TopKSpec idiom — each rep runs a job)
    def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
      var seed = org.scalacheck.rng.Seed(1818L)
      (0 until n).foreach { _ =>
        gen.apply(Gen.Parameters.default, seed).foreach(f)
        seed = seed.next
      }
    }
    val gen = for {
      k <- Gen.choose(1, 7)
      dfs <- Gen.listOfN(k, Gen.choose(1L, 12L))
      b <- Gen.choose(1L, 40L)
    } yield (dfs, b)
    forAllN(gen, 18) { case (dfs, budget) =>
      // the engine's allocation, via the exact expression rareGrams uses
      val rows = dfs.zipWithIndex
        .map { case (df, i) => ("p", f"g$i%02d", df) }
        .toDF("search_val", "g", "df")
      val alloc = rows.withColumn("b", FuzzyJoin.waterFillB(budget))
        .filter(col("b") >= 1).select("b", "df").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(alloc.forall { case (b, df) => b >= 1 && b <= df })
      assert(alloc.map(_._1).sum <= budget)   // hard posting bound
      val got = alloc.map { case (b, df) => b.toDouble / df }.sum
      // brute-force optimal integer allocation (DP over gram, budget)
      val dfArr = dfs.toArray
      val memo = collection.mutable.Map.empty[(Int, Long), Double]
      def best(i: Int, rem: Long): Double =
        if (i == dfArr.length || rem <= 0L) 0.0
        else memo.getOrElseUpdate((i, rem),
          (0L to math.min(dfArr(i), rem)).map(bi =>
            bi.toDouble / dfArr(i) + best(i + 1, rem - bi)).max)
      val opt = best(0, budget)
      assert(math.abs(got - opt) < 1e-9,
        s"dfs=$dfs budget=$budget greedy=$got optimal=$opt")
    }
  }

  test("coverage guard: NULL search_val probes count as uncovered, not invisible (ADVICE r17)") {
    val d = Seq((1L, "qqa"), (2L, "qqb"), (3L, "qqc"), (4L, "qqd"),
      (5L, "qqxy")).toDF("data_id", "match_val")
    // an ALL-NULL probe set: countDistinct saw 0 probes -> meanAll
    // defaulted to 1.0 and the guard passed vacuously; null probes now
    // count as one uncovered probe value (null normalizes to null -> no
    // grams -> no coverage), so the guard fails loudly
    val sNull = Seq[Option[String]](None, None).toDF("search_val")
    val exn = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(sNull, d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.1) }
    assert(exn.getMessage.contains("minCoverage"))
    // mixed: covered 'qqxyz' (1.0) + 'qqq' (0.8) + one null probe (0)
    // -> mean (1.0 + 0.8 + 0)/3 = 0.6: fails at 0.7, runs at 0.55
    val sMix = Seq(Some("qqxyz"), Some("qqq"), None).toDF("search_val")
    val exm = intercept[IllegalArgumentException] {
      FuzzyJoin.topKJaroWinklerPrescreened(sMix, d, 3, q = 2,
        maxCandidates = 2, minCoverage = 0.7) }
    assert(exm.getMessage.contains("uncovered = 0"))
    assert(FuzzyJoin.topKJaroWinklerPrescreened(sMix, d, 3, q = 2,
      maxCandidates = 2, minCoverage = 0.55).count() > 0L)
  }

  test("lev prescreened tier: coverage guard parity over RESIDUAL probes (VERDICT r16 #3)") {
    val d = Seq((1L, "abcde"), (2L, "abcdf"), (3L, "abcdg"),
      (4L, "abcdh")).toDF("data_id", "match_val")
    // 'zzzzzz' is residual (no in-radius match) AND uncovered (shares
    // no trigram): the guard must fail it loudly...
    val s = Seq("zzzzzz").toDF("search_val")
    val ex = intercept[IllegalArgumentException] {
      FuzzyJoin.topKLevenshteinPrescreened(s, d, k = 3, radius = 1,
        q = 3, maxCandidates = 2, minCoverage = 0.5) }
    assert(ex.getMessage.contains("topKLevenshteinPrescreened"))
    // ...while a probe whose top-k is CERTIFICATE-covered (>= k within
    // radius) is exempt — coverage is a residual-probe contract only
    val covered = Seq("abcde").toDF("search_val")
    assert(FuzzyJoin.topKLevenshteinPrescreened(covered, d, k = 3,
      radius = 1, q = 3, maxCandidates = 2, minCoverage = 0.99)
      .count() === 3L)
  }

  test("jwPrescreenRecall: perfect recall on covered probes, micro-average arithmetic") {
    val d = Seq((1L, "jellyfish co"), (2L, "jellyfish inc"),
      (3L, "jellyfish ltd"), (4L, "unrelated zq")).toDF("data_id", "match_val")
    val s = Seq("jellyfish co", "jellyfish ink").toDF("search_val")
    val r = FuzzyJoin.jwPrescreenRecall(s, d, 3, q = 2).collect()(0)
    assert(r.getAs[Long]("n_probes") === 2L)
    assert(r.getAs[Long]("n_exact") === 6L)
    assert(r.getAs[Long]("n_hits") === 6L)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Long]("n_full_recall") === 2L)
  }

  test("charGrams kernel == the interpreted HOF chain (incl. short, empty, unicode)") {
    import org.apache.spark.sql.functions._
    val gen = org.scalacheck.Gen.listOfN(14, org.scalacheck.Gen.frequency(
      (8, org.scalacheck.Gen.alphaNumChar),
      (2, org.scalacheck.Gen.oneOf('a', 'b')), // repetition -> duplicate grams
      (1, org.scalacheck.Gen.oneOf('é', '中'))) // lone surrogates excluded:
    ).map(_.mkString)                           // malformed UTF-8 is not a contract
    var seed = org.scalacheck.rng.Seed(7L)
    val samples = (0 until 200).flatMap { _ =>
      val s = gen.apply(org.scalacheck.Gen.Parameters.default, seed)
      seed = seed.next; s
    } ++ Seq("", "a", "ab", "aaaa", "😀😀a")
    for (q <- Seq(2, 3)) {
      val df = samples.toDF("s")
      def chain(c: org.apache.spark.sql.Column) =
        when(length(c) < q, array(c)).otherwise(
          array_distinct(transform(sequence(lit(1), length(c) - (q - 1)),
            i => c.substr(i, lit(q)))))
      val bad = df.select(col("s"),
          graft.functions.TextExprs.charGrams(col("s"), q).as("k"),
          chain(col("s")).as("h"))
        .filter(not(col("k") <=> col("h")))
        .collect()
      assert(bad.isEmpty, s"q=$q kernel != chain on: ${bad.take(3).toSeq}")
    }
  }

  test("prescreenGrams kernel == the interpreted two-family HOF chain (incl. short, empty, unicode)") {
    import org.apache.spark.sql.functions._
    val gen = org.scalacheck.Gen.listOfN(14, org.scalacheck.Gen.frequency(
      (8, org.scalacheck.Gen.alphaNumChar),
      (2, org.scalacheck.Gen.oneOf('a', 'b')),
      (1, org.scalacheck.Gen.oneOf('é', '中')))
    ).map(_.mkString)
    var seed = org.scalacheck.rng.Seed(11L)
    val samples = (0 until 200).flatMap { _ =>
      val s = gen.apply(org.scalacheck.Gen.Parameters.default, seed)
      seed = seed.next; s
    } ++ Seq("", "a", "ab", "abc", "abcd", "abcde", "aaaa", "😀😀a")
    for (q <- Seq(2, 3)) {
      val span = 2 * (q - 1) + 1
      val df = samples.toDF("s")
      def contig(c: org.apache.spark.sql.Column) =
        when(length(c) < q, array(concat(lit("c:"), c))).otherwise(
          array_distinct(transform(sequence(lit(1), length(c) - (q - 1)),
            i => concat(lit("c:"), c.substr(i, lit(q))))))
      def skip(c: org.apache.spark.sql.Column) =
        when(length(c) < span,
          array().cast("array<string>")).otherwise(
          array_distinct(transform(sequence(lit(1), length(c) - (span - 1)),
            i => concat((lit("s:") +: (0 until q).map(j =>
              c.substr(i + lit(2 * j), lit(1)))): _*))))
      val bad = df.select(col("s"),
          graft.functions.TextExprs.prescreenGrams(col("s"), q).as("k"),
          concat(contig(col("s")), skip(col("s"))).as("h"))
        .filter(not(col("k") <=> col("h")))
        .collect()
      assert(bad.isEmpty, s"q=$q kernel != chain on: ${bad.take(3).toSeq}")
    }
  }

  test("topKJaroWinkler corpus-side guard fires, naming the banded alternative") {
    val e = intercept[IllegalArgumentException](
      FuzzyJoin.topKJaroWinkler(search, data, 2, maxDataRows = 2))
    assert(e.getMessage.contains("topKJaroWinklerBanded"),
      "the error must point at the exact certified-bound two-phase form")
  }

  test("topK onCache handle releases the internal cache in a loop") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val handles = scala.collection.mutable.Buffer.empty[DataFrame]
    (1 to 3).foreach { _ =>
      FuzzyJoin.topK(search, data, 2, radius = 3, onCache = handles += _).count()
    }
    assert(handles.size === 3)
    handles.foreach(_.unpersist(blocking = true))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"persisted RDDs outlived the loop after explicit release: $leaked")
  }

  test("empty inputs: no search rows / no data rows yield empty results, no crash") {
    val noSearch = spark.emptyDataFrame.selectExpr("cast(null as string) as search_val").limit(0)
    val noData = spark.emptyDataFrame
      .selectExpr("cast(null as long) as data_id", "cast(null as string) as match_val").limit(0)
    assert(FuzzyJoin.fuzzyMatch(noSearch, data, 3).count() === 0)
    assert(FuzzyJoin.fuzzyMatch(search, noData, 3).count() === 0)
    assert(FuzzyJoin.fuzzyMatchPruned(noSearch, data, 3).count() === 0)
    assert(FuzzyJoin.fuzzyMatchPruned(search, noData, 3).count() === 0)
  }

  test("null match values score null distance and fall out of every bucket") {
    val withNull = data.unionByName(Seq((9L, null.asInstanceOf[String])).toDF("data_id", "match_val"))
    val out = FuzzyJoin.fuzzyMatch(search, withNull, 3)
    assert(out.filter($"data_id" === 9L).count() === 0)
    // non-null rows unaffected
    assert(buckets(out)(("abcdefgh", "exact")) === Set(1L))
  }

  test("normalization collapse: all-symbol strings normalize to empty and match each other exactly") {
    val symData = Seq((1L, "///---")).toDF("data_id", "match_val")
    val symSearch = Seq("!!!").toDF("search_val")
    val out = buckets(FuzzyJoin.fuzzyMatch(symSearch, symData, 3))
    assert(out(("!!!", "exact")) === Set(1L)) // both normalize to ""
  }

  test("probe-side broadcast guard: every fuzzy engine refuses a corpus-sized probe set") {
    // maxProbeRows below the (4-row) search table stands in for "probe side
    // at corpus scale" — the guard's decision scan is bounded, so the test
    // also proves the limit path executes
    for (f <- Seq[() => DataFrame](
      () => FuzzyJoin.fuzzyMatch(search, data, 3, maxProbeRows = 2),
      () => FuzzyJoin.fuzzyMatchPruned(search, data, 3, maxProbeRows = 2),
      () => FuzzyJoin.fuzzyMatchPrunedQgram(search, data, 3, maxProbeRows = 2),
      () => FuzzyJoin.topK(search, data, 2, maxProbeRows = 2),
      () => FuzzyJoin.topKJaroWinklerPrescreened(search, data, 2,
        maxProbeRows = 2),
      () => FuzzyJoin.topKLevenshteinPrescreened(search, data, 2,
        maxProbeRows = 2),
      () => FuzzyJoin.jwPrescreenCoverage(search, data, maxProbeRows = 2))) {
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("MinHash"),
        "the error must point at the scale-safe near-dup operators")
    }
    // at the default ceiling the probe set passes and results are unchanged
    assert(buckets(FuzzyJoin.fuzzyMatch(search, data, 3))(("abcdefgh", "exact")) === Set(1L))
  }

  test("round-16 tiers: empty inputs and uncovered probes yield empty results, no crash") {
    val noSearch = spark.emptyDataFrame
      .selectExpr("cast(null as string) as search_val").limit(0)
    val noData = spark.emptyDataFrame
      .selectExpr("cast(null as long) as data_id",
        "cast(null as string) as match_val").limit(0)
    assert(FuzzyJoin.topKLevenshteinPrescreened(noSearch, data, 2).count() === 0)
    assert(FuzzyJoin.topKLevenshteinPrescreened(search, noData, 2).count() === 0)
    assert(FuzzyJoin.jwPrescreenCoverage(noSearch, data).count() === 0)
    assert(FuzzyJoin.jwPrescreenCoverage(search, noData).count() === 0)
    // a probe with no indexed gram emits NO coverage row — the same
    // no-rows contract as the operator itself
    val covered = FuzzyJoin.jwPrescreenCoverage(
      Seq("abcd", "zzzz").toDF("search_val"),
      Seq((1L, "abcdef")).toDF("data_id", "match_val"), q = 2)
    assert(covered.select("search_val").collect().map(_.getString(0)).toSeq
      === Seq("abcd"))
  }

  test("water-fill edges: one partial channel max, per-probe prefix depths, exact tight budget") {
    // seven corpus rows share c:qq (df 7); each contributes one df-1
    // contiguous gram and one df-1 skip gram. maxCandidates = 3 -> B = 6.
    val d = ('a' to 'g').zipWithIndex.map { case (c, i) =>
      ((i + 1).toLong, s"qq$c") }.toDF("data_id", "match_val")
    // 'qqz' indexes ONLY c:qq: single channel at depth min(7, 6) = 6;
    // 'qqa' fills c:qa and s:qa (df 1 each, full) then c:qq at the
    // remaining 4 — exactly ONE partial channel per probe, budget
    // spent to exactly min(B, sum df)
    val cov = FuzzyJoin.jwPrescreenCoverage(
        Seq("qqz", "qqa").toDF("search_val"), d, q = 2, maxCandidates = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(cov === Seq(
      ("qqa", 3L, 1L, 1.0, 0.571429),   // 4/7, portable-rounded
      ("qqz", 1L, 1L, 0.857143, 0.857143))) // 6/7
    // the shared per-gram bucket serves BOTH depths as rank prefixes:
    // qqz reads the 6-prefix of c:qq's salted order, qqa the 4-prefix
    // (plus its own full df-1 channels — both postings are row 1)
    val order = (1L to 7L).sortBy(id => (
      graft.ext.TextAnalysis.h60Local("jwb:c:qq:" + id), id))
    def got(p: String) = FuzzyJoin.topKJaroWinklerPrescreened(
        Seq(p).toDF("search_val"), d, 7, q = 2, maxCandidates = 3)
      .select("data_id").collect().map(_.getLong(0)).toSet
    assert(got("qqz") === order.take(6).toSet)
    assert(got("qqa") === (order.take(4).toSet + 1L))
  }
}
