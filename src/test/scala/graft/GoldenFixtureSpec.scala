package graft

import graft.ops.FuzzyJoin

/** Golden-file test (SURVEY §5.4, FIXTURES.md §A3): the engine's full
  * fuzzy classification on the reference's own committed SKU data
  * (/root/reference/output.xlsx sheet1 + the inline pair at main.py:131),
  * checked against an independent brute-force classifier built on the
  * pure-Scala reference DP (RefLev). */
class GoldenFixtureSpec extends SparkTestBase {
  import spark.implicits._

  private val skus = Seq(
    "CH-S09FTXF-NG", "CH-S12FTXF-NG", "CH-S18FTXF-NG", "CH-S24FTXF-NG",
    "CH-S09FTXLA2-NG", "CH-S12FTXLA2-NG", "CH-S18FTXLA2-NG", "CH-S24FTXLA2-NG",
    "CH-S09FTXD-WHITE", "CH-S12FTXD white", "CH-S18FTXD white", "CH-S24FTXD white",
    "CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC")

  private val probes = Seq("CH-S09FTXD-BL/SC", "CH-S12FTXD-WHITE", "CH-XX-UNRELATED-99")

  private val T = 3

  /** Independent reimplementation of main.py:197-230's bucket semantics. */
  private def refClassify(probe: String): Map[String, Set[Int]] = {
    val ds = skus.zipWithIndex.map { case (s, i) => (i, RefLev.dist(probe, s)) }
    val exact = ds.filter(_._2 == 0).map(_._1).toSet
    val pos = ds.filter { case (_, d) => d > 0 && d <= T }
    val m = scala.collection.mutable.Map.empty[String, Set[Int]]
    if (exact.nonEmpty) m("exact") = exact
    if (pos.nonEmpty) {
      val minP = pos.map(_._2).min
      m("best") = pos.filter(_._2 == minP).map(_._1).toSet
      val pot = pos.filter(_._2 > minP).map(_._1).toSet
      if (pot.nonEmpty) m("potential") = pot
    } else {
      val minAll = ds.map(_._2).min
      m("poor_best") = ds.filter(_._2 == minAll).map(_._1).toSet
    }
    m.toMap
  }

  test("golden SKUs: engine buckets == reference semantics, probe by probe") {
    val data = skus.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("data_id", "match_val")
    val search = probes.toDF("search_val")
    val got = FuzzyJoin.fuzzyMatch(search, data, T)
      .select("search_val", "bucket", "data_id").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2).toInt).toSet).toMap)
      .toMap
    probes.foreach { p =>
      assert(got.getOrElse(p, Map.empty) === refClassify(p), s"probe: $p")
    }
  }

  test("golden known answers from the reference artifacts") {
    val c = refClassify("CH-S09FTXD-BL/SC")
    assert(c("exact") === Set(12)) // itself, in the data
    assert(c("best") === Set(13))  // CH-S09FTXAL-SC at d=2 (main.py:131 pair)
    assert(RefLev.dist("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC") === 2)
    // normalization collapses case/space/hyphen: exact match across variants
    assert(refClassify("CH-S12FTXD-WHITE")("exact") === Set(9))
    // unrelated probe: poor_best fallback, nothing within threshold
    val u = refClassify("CH-XX-UNRELATED-99")
    assert(u.contains("poor_best") && !u.contains("best"))
  }
}
