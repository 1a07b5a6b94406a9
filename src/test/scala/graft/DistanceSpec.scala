package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.{Distance, Normalize}

/** Pure-function reference for the metric axioms. */
object RefLev {
  def dist(sRaw: String, tRaw: String): Int = {
    val s = sRaw.toLowerCase.replaceAll("[^a-z0-9]", "")
    val t = tRaw.toLowerCase.replaceAll("[^a-z0-9]", "")
    val prev = Array.range(0, t.length + 1)
    var i = 1
    while (i <= s.length) {
      var diag = prev(0); prev(0) = i
      var j = 1
      while (j <= t.length) {
        val tmp = prev(j)
        prev(j) =
          if (s.charAt(i - 1) == t.charAt(j - 1)) diag
          else math.min(diag + 1, math.min(prev(j) + 1, prev(j - 1) + 1))
        diag = tmp; j += 1
      }
      i += 1
    }
    prev(t.length)
  }
}

class DistanceSpec extends SparkTestBase {
  import spark.implicits._

  /** Seeded property loop (scalatestplus bridge is not in the offline cache). */
  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll[A](g1: Gen[A], g2: Gen[A])(f: (A, A) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(p => f(p._1, p._2))
  private def forAll[A](g1: Gen[A], g2: Gen[A], g3: Gen[A])(f: (A, A, A) => Unit): Unit =
    forAll(Gen.zip(g1, g2, g3))(p => f(p._1, p._2, p._3))

  // Known-answer pair from the reference's own inline fixture
  // (/root/reference/main.py:131) — verified against the reference DP.
  test("reference fixture pair distance = 2") {
    val df = Seq(("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC")).toDF("a", "b")
    val d = df.select(Distance.dist($"a", $"b")).head.getInt(0)
    assert(d === 2)
    assert(RefLev.dist("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC") === 2)
  }

  test("normalization strips symbols and case (exact bucket after norm)") {
    val df = Seq(("CH-S12FTXD white", "CH-S12FTXD-WHITE")).toDF("a", "b")
    assert(df.select(Distance.dist($"a", $"b")).head.getInt(0) === 0)
    assert(df.select(Normalize.norm($"a")).head.getString(0) === "chs12ftxdwhite")
  }

  test("built-in levenshtein matches the reference DP on arbitrary strings") {
    val gen = Gen.listOfN(12, Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.oneOf('-', '/', ' ', '#')))).map(_.mkString)
    forAll(gen, gen) { (a: String, b: String) =>
      val sparkD = Seq((a, b)).toDF("a", "b")
        .select(Distance.dist($"a", $"b")).head.getInt(0)
      assert(sparkD === RefLev.dist(a, b))
    }
  }

  test("metric axioms (pure reference impl)") {
    val gen = Gen.listOfN(10, Gen.alphaNumChar).map(_.mkString)
    forAll(gen, gen, gen) { (a: String, b: String, c: String) =>
      assert(RefLev.dist(a, a) === 0)
      assert(RefLev.dist(a, b) === RefLev.dist(b, a))
      assert(RefLev.dist(a, c) <= RefLev.dist(a, b) + RefLev.dist(b, c))
      assert(RefLev.dist(a, "") === a.toLowerCase.replaceAll("[^a-z0-9]", "").length)
    }
  }

  test("visualLevenshtein: distance matches, symbols trace invariants") {
    val (d, sym) = Distance.visualLevenshtein("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC")
    assert(d === 2)
    // trace covers both strings up to the shorter end: ones = matches
    assert(sym.forall(x => x == 0 || x == 1))
    val (d0, sym0) = Distance.visualLevenshtein("abc", "abc")
    assert(d0 === 0 && sym0 === Seq(1, 1, 1))
    // distance 0 <=> all-1s of equal length
    forAll(Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)) { (s: String) =>
      val (dd, ss) = Distance.visualLevenshtein(s, s)
      val clean = s.toLowerCase.replaceAll("[^a-z0-9]", "")
      assert(dd === 0 && ss.length === clean.length && ss.forall(_ == 1))
    }
  }

  test("visualLevenshtein: distance always matches the DP; trace is bounded") {
    // note the greedy forward trace is a heuristic: its 0-count can exceed
    // the optimal distance (faithful to the reference), but matches (1s)
    // never exceed the shorter cleaned length and the trace is finite.
    forAll(Gen.alphaNumStr.map(_.take(10)), Gen.alphaNumStr.map(_.take(10))) { (a: String, b: String) =>
      val (d, sym) = Distance.visualLevenshtein(a, b)
      assert(d === RefLev.dist(a, b))
      val la = a.toLowerCase.replaceAll("[^a-z0-9]", "").length
      val lb = b.toLowerCase.replaceAll("[^a-z0-9]", "").length
      assert(sym.count(_ == 1) <= math.min(la, lb))
      assert(sym.length <= la + lb)
    }
  }

  test("visualiseDifferences: reference fixture pair chains common substrings") {
    // raw strings, no normalization (main.py:400 feeds raw values)
    val (splices, ranges) = Distance.visualiseDifferences("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC")
    assert(splices.nonEmpty)
    // every splice is a literal substring of s2 at its recorded range
    val s2 = "CH-S09FTXAL-SC"
    splices.zip(ranges).foreach { case (sp, (a, b)) =>
      assert(s2.substring(a, b) === sp)
      assert(sp.length >= 2)
    }
    // ranges consume s2 monotonically without overlap
    assert(ranges.sliding(2).forall { case Seq((_, e1), (s2i, _)) => s2i >= e1; case _ => true })
  }

  test("splicesWithGaps: interleaves gaps, guards empty match list") {
    val out = Distance.splicesWithGaps(Seq("bc"), Seq((1, 3)), "abcd")
    assert(out === Seq((0, "a"), (1, "bc"), (0, "d")))
    assert(Distance.splicesWithGaps(Nil, Nil, "xyz") === Seq((0, "xyz")))
    assert(Distance.splicesWithGaps(Nil, Nil, "") === Nil)
    // reconstruction: concatenating splices+gaps in order yields s2
    val (sp, rg) = Distance.visualiseDifferences("large bolt", "large bolts")
    val parts = Distance.splicesWithGaps(sp, rg, "large bolts")
    assert(parts.map(_._2).mkString === "large bolts")
  }

  test("splicesWithGaps: abutting blocks carry an EMPTY inter-block gap (ADVICE r15)") {
    // 'abxcd' vs 'abcd' chains blocks 'ab' then 'cd', which abut in s2:
    // the inter-block gap is emitted with empty text (flag 0, "") — the
    // q03 oracle replays exactly this shape ('1:ab|0:|1:cd'), and only
    // an empty HEAD gap is ever suppressed.
    val (sp, rg) = Distance.visualiseDifferences("abxcd", "abcd")
    assert(sp === Seq("ab", "cd") && rg === Seq((0, 2), (2, 4)))
    val out = Distance.splicesWithGaps(sp, rg, "abcd")
    assert(out === Seq((1, "ab"), (0, ""), (1, "cd")))
    assert(out.map { case (f, t) => s"$f:$t" }.mkString("|") === "1:ab|0:|1:cd")
  }

  test("UDFs are null-safe") {
    val df = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
    assert(df.select(Distance.visualLevenshteinUdf($"a", $"b")).head.isNullAt(0))
    assert(df.select(Distance.diffSplicesUdf($"a", $"b")).head.isNullAt(0))
  }
}
