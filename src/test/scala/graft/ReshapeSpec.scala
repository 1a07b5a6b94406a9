package graft

import org.apache.spark.sql.functions._

import graft.ops.Reshape

/** Pivot/unpivot reshaping: round-trip law + the scale-critical plan
  * shapes (explicit-values pivot = ONE hash aggregate, no distinct
  * pre-scan; unpivot = map-only Expand, zero Exchange). */
class ReshapeSpec extends SparkTestBase {
  import spark.implicits._

  private def long = Seq(
    ("s0", "en", 10L), ("s0", "en", 20L), ("s0", "de", 5L),
    ("s1", "de", 7L), ("s1", "fr", 3L), ("s2", "en", 1L))
    .toDF("source", "lang", "n_chars")

  test("pivotDense builds the dense multi-measure matrix") {
    val wide = Reshape.pivotDense(long, "source", "lang",
      Seq("de", "en", "fr"),
      Seq("n" -> (c => count(when(c, 1))),
        "chars" -> (c => coalesce(sum(when(c, col("n_chars"))), lit(0L)))))
    val bySource = wide.collect().map(r => r.getString(0) -> r).toMap
    assert(wide.columns.toSeq ===
      Seq("source", "de_n", "de_chars", "en_n", "en_chars", "fr_n", "fr_chars"))
    val s0 = bySource("s0")
    assert((s0.getLong(1), s0.getLong(2), s0.getLong(3), s0.getLong(4)) ===
      ((1L, 5L, 2L, 30L)))
    // absent combo (s2, de): count 0, coalesced sum 0 — dense, no nulls
    val s2 = bySource("s2")
    assert((s2.getLong(1), s2.getLong(2)) === ((0L, 0L)))
  }

  test("unpivot(pivot(df)) minus empty cells == direct groupBy") {
    val langs = Seq("de", "en", "fr")
    val wide = Reshape.pivotDense(long, "source", "lang", langs,
      Seq("" -> (c => count(when(c, 1)))))
    val back = Reshape.unpivot(wide, Seq("source"), langs, "lang", "n_docs")
      .filter(col("n_docs") > 0)
    val direct = long.groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
    assert(back.collect().map(_.toString).sorted.toSeq ===
      direct.collect().map(_.toString).sorted.toSeq)
  }

  test("pivotDense multi-measure stays ONE exchange (PivotFirst would be two)") {
    val wide = Reshape.pivotDense(long, "source", "lang", Seq("de", "en", "fr"),
      Seq("n" -> (c => count(when(c, 1))),
        "chars" -> (c => coalesce(sum(when(c, col("n_chars"))), lit(0L)))))
    val p = wide.queryExecution.executedPlan.toString
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "pivotDense must plan one hash aggregate regardless of measure " +
        "count:\n" + p)
  }

  test("native pivot would cost TWO exchanges; unpivot adds none over ours") {
    val langs = Seq("de", "en", "fr")
    // Why pivotDense exists: Spark's own explicit-values pivot plans
    // PivotFirst for supported measure types — shuffle on (key, cat)
    // THEN on key. Pin the observed native shape so a future Spark that
    // fixes this gets noticed (and the wrapper reconsidered).
    val native = long.groupBy(col("source")).pivot("lang", langs)
      .agg(count(lit(1)).as("n"))
    val nativePlan = native.queryExecution.executedPlan.toString
    assert(nativePlan.sliding("Exchange".length).count(_ == "Exchange") == 2
      && nativePlan.contains("pivotfirst"),
      "expected Spark's native pivot to still plan two-shuffle " +
        "PivotFirst:\n" + nativePlan)
    val wide = Reshape.pivotDense(long, "source", "lang", langs,
      Seq("" -> (c => count(when(c, 1)))))
    assert(wide.columns.toSeq === Seq("source", "de", "en", "fr"),
      "empty suffix must name columns by value alone")
    val back = Reshape.unpivot(wide, Seq("source"), langs, "lang", "n_docs")
    val backPlan = back.queryExecution.executedPlan.toString
    assert(backPlan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "unpivot must add ZERO exchanges over the pivot (map-only Expand):\n" +
        backPlan)
    assert(backPlan.contains("Expand") || backPlan.contains("expand"),
      "unpivot should plan as Expand:\n" + backPlan)
  }
}
