package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof: latest right at-or-before each left; inclusive ties; null before any right") {
    val left = Seq(
      (1L, 5L, "a"),   // before any right row -> null
      (1L, 10L, "b"),  // exactly at right ts 10 -> inclusive match
      (1L, 25L, "c"),  // between 20 and 30 -> 20
      (1L, 99L, "d"),  // after the last right row -> 30
      (2L, 50L, "e")   // key with no right rows at all -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L),
      (1L, 20L, 200L),
      (1L, 30L, 300L)
    ).toDF("k", "t", "v")

    val out = AsOfJoin.asof(left, right, "k", "t")
      .select("tag", "__r_v", "__r_ts")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(out === Set(
      ("a", -1L, -1L),
      ("b", 100L, 10L),
      ("c", 200L, 20L),
      ("d", 300L, 30L),
      ("e", -1L, -1L)))
  }

  test("asofForward: earliest right at-or-after each left; inclusive ties; null after the last right") {
    val left = Seq(
      (1L, 5L, "a"),   // before all right rows -> earliest (10)
      (1L, 10L, "b"),  // exactly at right ts 10 -> inclusive match
      (1L, 25L, "c"),  // between 20 and 30 -> 30
      (1L, 99L, "d"),  // after the last right row -> null
      (2L, 50L, "e")   // key with no right rows at all -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L),
      (1L, 20L, 200L),
      (1L, 30L, 300L)
    ).toDF("k", "t", "v")

    val out = AsOfJoin.asofForward(left, right, "k", "t")
      .select("tag", "__r_v", "__r_ts")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(out === Set(
      ("a", 100L, 10L),
      ("b", 100L, 10L),
      ("c", 300L, 30L),
      ("d", -1L, -1L),
      ("e", -1L, -1L)))
  }

  test("asof plan: one exchange by key, no range-join pair explosion") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, 9L)).toDF("k", "t", "v")
    val p = AsOfJoin.asof(left, right, "k", "t").queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof must not plan any join operator:\n$p")
    assert(p.contains("Window"))
  }
}
