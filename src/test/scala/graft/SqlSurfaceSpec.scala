package graft

/** The SQL face of the engine: GraftExtensions registers the native
  * expressions as SQL functions (session built with
  * spark.sql.extensions=graft.GraftExtensions — see SparkTestBase). */
class SqlSurfaceSpec extends SparkTestBase {

  test("vec_dot / vec_cosine callable from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("distinct_word_shingles callable from SQL, default and explicit k") {
    val r = spark.sql(
      """SELECT distinct_word_shingles('a b c d') AS s3,
        |       distinct_word_shingles('a b c d', 2) AS s2""".stripMargin).head()
    assert(r.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
  }

  test("word_shingles callable from SQL: positional, repeats kept") {
    val r = spark.sql(
      """SELECT word_shingles('a b a b a') AS s3,
        |       word_shingles('a b a b a', 2) AS s2""".stripMargin).head()
    assert(r.getSeq[String](0) === Seq("a b a", "b a b", "a b a"))
    assert(r.getSeq[String](1) === Seq("a b", "b a", "a b", "b a"))
  }

  test("winnow_fingerprint callable from SQL; non-literal k rejected") {
    val n = spark.sql("SELECT size(winnow_fingerprint('the quick brown fox')) AS n")
      .head().getInt(0)
    assert(n > 0)
    val err = intercept[Exception] {
      spark.sql("SELECT winnow_fingerprint('abc', length('xx'))").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("jaro_winkler / damerau_levenshtein callable from SQL") {
    val r = spark.sql(
      """SELECT jaro_winkler('martha', 'marhta') AS jw,
        |       damerau_levenshtein('ca', 'abc') AS dl""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 0.9611111111) < 1e-9)
    assert(r.getInt(1) === 2, "full (unrestricted) variant: ca/abc = 2")
  }

  test("nfc_normalize / strip_accents callable from SQL") {
    // 'cafe' + U+0301 combining acute: NFC composes to 4 chars, strip
    // drops the mark; both must run inside the SQL surface
    val dec = "cafe\u0301"
    val r = spark.sql(
      s"SELECT nfc_normalize('$dec') AS n, length(nfc_normalize('$dec')) AS ln, " +
        s"strip_accents('$dec') AS a, strip_accents('caf\u00e9') AS ac").head()
    assert(r.getString(0) === "caf\u00e9" && r.getInt(1) === 4)
    assert(r.getString(2) === "cafe" && r.getString(3) === "cafe")
  }

  test("full fuzzy classify expressible in ONE SQL statement over the engine's functions") {
    spark.read.parquet("/root/testdata/sf0.001/part.parquet").createOrReplaceTempView("part_v")
    val out = spark.sql(
      """WITH search AS (SELECT DISTINCT p_name AS sv FROM part_v),
        |scored AS (
        |  SELECT sv, p_name AS mv,
        |         levenshtein(regexp_replace(lower(sv), '[^a-zA-Z0-9]', ''),
        |                     regexp_replace(lower(p_name), '[^a-zA-Z0-9]', '')) AS d
        |  FROM search CROSS JOIN part_v)
        |SELECT sv, min(d) AS min_d FROM scored GROUP BY sv""".stripMargin)
    assert(out.count() > 0)
  }
}
