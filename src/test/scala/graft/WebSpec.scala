package graft

import org.apache.spark.sql.functions._

import graft.ext.Web

class WebSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("u").select(Web.normalizeUrl(col("u")))
      .head.getString(0)

  test("normalizeUrl: literal cases pin every rule") {
    assert(norm("HTTP://WWW.Ex.COM:80/p?b=2&a=1#f") ===
      "http://www.ex.com/p?a=1&b=2")
    assert(norm("https://Host.Net:443") === "https://host.net/")
    assert(norm("https://Host.Net:8443/x") === "https://host.net:8443/x")
    // path case preserved; empty query params dropped; fragment dropped
    assert(norm("http://a.b/CaseKept?&&z=1&&#frag") === "http://a.b/CaseKept?z=1")
    // :80 is only default for http, not https
    assert(norm("https://a.b:80/x") === "https://a.b:80/x")
    // non-URL passes through untouched
    assert(norm("not a url") === "not a url")
    // idempotence on already-canonical forms
    assert(norm("http://www.ex.com/p?a=1&b=2") === "http://www.ex.com/p?a=1&b=2")
  }

  test("hostOf: strips scheme, userinfo, port, path") {
    val host = Seq(Tuple1("https://User:pw@Sub.Ex.COM:8443/p?q#f")).toDF("u")
      .select(Web.hostOf(col("u"))).head.getString(0)
    assert(host === "sub.ex.com")
  }

  test("pathPrefixes: directory boundaries shortest-first, depth-capped") {
    def pfx(p: String, d: Int = 16): Seq[String] =
      Seq(Tuple1(p)).toDF("p").select(Web.pathPrefixes(col("p"), d))
        .head.getSeq[String](0)
    assert(pfx("/a/b/c") === Seq("/a", "/a/b", "/a/b/c"))
    assert(pfx("/a/b/c", d = 2) === Seq("/a", "/a/b"))
    assert(pfx("/") === Seq("/"))
    assert(pfx("") === Seq.empty)
  }

  test("normalizeUrl idempotence property over generated messy URLs") {
    var seed = org.scalacheck.rng.Seed(11L)
    val seg = org.scalacheck.Gen.oneOf("Ab", "c9", "D-e", "ff")
    val gen = for {
      scheme <- org.scalacheck.Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp")
      h1 <- seg; h2 <- seg
      port <- org.scalacheck.Gen.oneOf("", ":80", ":443", ":8080")
      path <- org.scalacheck.Gen.oneOf("", "/", "/P/q", "/UPPER/x")
      query <- org.scalacheck.Gen.oneOf("", "?z=1&a=2", "?b=1&&a=3&")
      frag <- org.scalacheck.Gen.oneOf("", "#F")
    } yield s"$scheme://$h1.$h2$port$path$query$frag"
    val urls = (1 to 150).map { _ =>
      val u = gen.apply(org.scalacheck.Gen.Parameters.default, seed).get
      seed = seed.next; u
    }
    val out = urls.map(Tuple1(_)).toDF("u")
      .select(Web.normalizeUrl(col("u")).as("n1"))
      .select(col("n1"), Web.normalizeUrl(col("n1")).as("n2"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"normalize must be idempotent, diverged on: ${r.getString(0)}"))
  }

  test("blocklistVerdict == independent brute-force longest-prefix on random sets") {
    // Brute force uses the INDEPENDENT formulation (path == rule ||
    // path.startsWith(rule + "/")) — not the operator's prefix
    // enumeration — so a shared boundary bug cannot cancel.
    var seed = org.scalacheck.rng.Seed(23L)
    def draw[A](g: org.scalacheck.Gen[A]): A = {
      val v = g.apply(org.scalacheck.Gen.Parameters.default, seed).get
      seed = seed.next; v
    }
    val seg = org.scalacheck.Gen.oneOf("a", "b", "c", "ab")
    val ruleGen = for {
      d <- org.scalacheck.Gen.choose(1, 3)
      segs <- org.scalacheck.Gen.listOfN(d, seg)
      act <- org.scalacheck.Gen.oneOf("block", "allow", "review")
    } yield ("/" + segs.mkString("/"), act)
    val rules = (1 to 12).map(_ => draw(ruleGen))
      .groupBy(_._1).map(_._2.head).toSeq // distinct prefixes
    val pathGen = for {
      d <- org.scalacheck.Gen.choose(1, 5)
      segs <- org.scalacheck.Gen.listOfN(d, seg)
    } yield "/" + segs.mkString("/")
    val paths = (1 to 120).map(i => (i.toLong, draw(pathGen)))
    def brute(p: String): (String, String) = {
      val hits = rules.filter { case (r, _) => p == r || p.startsWith(r + "/") }
      if (hits.isEmpty) ("allow", "")
      else { val (r, a) = hits.maxBy(_._1.length); (a, r) }
    }
    val got = Web.blocklistVerdict(paths.toDF("id", "path"), "path",
        rules.toDF("prefix", "action"))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getString(3)))
      .toMap
    paths.foreach { case (id, p) =>
      assert(got(id) === brute(p), s"mismatch on path $p (rules: $rules)")
    }
  }

  test("blocklistVerdict: longest prefix wins; allow carves out of block; default for misses") {
    val pages = Seq(
      (1L, "/x/secret/deep/file"), (2L, "/x/secret/ok/file"),
      (3L, "/x/open/file"), (4L, "/y")).toDF("id", "path")
    val rules = Seq(("/x/secret", "block"), ("/x/secret/ok", "allow"))
      .toDF("prefix", "action")
    val got = Web.blocklistVerdict(pages, "path", rules)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3))).toMap
    assert(got(1L) === (("block", "/x/secret")))
    assert(got(2L) === (("allow", "/x/secret/ok")), "deeper allow must win")
    assert(got(3L) === (("allow", "")))
    assert(got(4L) === (("allow", "")))
  }

  test("blocklistVerdict: duplicate rows keep multiplicity; column collision throws") {
    val rules = Seq(("/x", "block")).toDF("prefix", "action")
    // exact-duplicate input rows must each produce an output row — the
    // surrogate-id regroup must not collapse them
    val dup = Seq(("/x/a"), ("/x/a"), ("/y")).map(Tuple1(_)).toDF("path")
    val out = Web.blocklistVerdict(dup, "path", rules).collect()
    assert(out.length === 3, "duplicate rows must keep their multiplicity")
    assert(out.count(r => r.getString(1) === "block") === 2)
    // pre-existing `action` column would be silently clobbered — refuse
    val clash = Seq(("/x/a", "keep")).toDF("path", "action")
    intercept[IllegalArgumentException] {
      Web.blocklistVerdict(clash, "path", rules) }
  }

  test("extractHrefs: anchors only — decoys, non-anchor hrefs, and order pinned") {
    def links(s: String): Seq[String] =
      Seq(Tuple1(s)).toDF("m").select(Web.extractHrefs(col("m")))
        .head.getSeq[String](0)
    assert(links("""<a href="u1">x</a><p>t</p><a class="c" href="u2">y</a>""")
      === Seq("u1", "u2"))
    // data-href on a non-anchor tag and bare text mentions never match
    assert(links("""<body data-href="d"><p>href="t"</p></body>""") === Seq())
    // one tag, one match: the non-greedy attr scan stops at the first href
    assert(links("""<a id="i" href="u" data-href="d">z</a>""") === Seq("u"))
    // an href in a SELF-closing or later tag still requires the <a anchor
    assert(links("""<img href="pic"/><a\thref="u3">w</a>""".replace("\\t", "\t"))
      === Seq("u3"))
    assert(links("no markup at all") === Seq())
  }
}
