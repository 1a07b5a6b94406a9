package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "errors":{...},"n_err":N,"reps":R,"sf":"..."}
  *
  * Harness design (round-over-round deltas must be signal, not noise):
  *   - FIXED sorted query order — Map iteration order shifted between
  *     rounds when queries were added, reshuffling which query paid shared
  *     warm-up costs;
  *   - per-query warm-up run(s) + median of `reps` timed runs — the first
  *     execution of each unique plan pays one-time Janino codegen (2-8s on
  *     complex plans), which used to dominate sub-second queries;
  *   - a failing query is EXCLUDED from the total and reported under
  *     "errors" with a nonzero "n_err" — previously a broken query silently
  *     contributed its time-to-failure, so a regression could "improve" the
  *     number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM", "1").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed global warmup: session init, file listing, common codegen.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (try {
          (0 until warm).foreach(_ => fn(spark, sfDir).count())
          val times = (0 until reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          Right(times(times.length / 2))
        } catch {
          case e: Throwable =>
            Left(e.toString.linesIterator.next().take(200).replace("\"", "'"))
        })
      }

    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(m)) => k -> m }
    val qs = ok.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => s"\"$k\":\"$m\"" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_err":${errs.size},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
