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
}
