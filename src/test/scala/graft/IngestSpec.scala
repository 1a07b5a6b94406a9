package graft

import java.nio.file.Files

import graft.ops.Ingest

/** Source surface (SURVEY §2.1): mixed-format folder scan with by-name
  * schema alignment — the reference's "read every tabular file in the data
  * folder and concat" generalized past a single format. */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("folderMixed: parquet + csv + json in one folder align by name with null fill") {
    val dir = Files.createTempDirectory("graft-mixed").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .coalesce(1).write.parquet(dir + "/p")
    Seq((3L, "gamma", 9.5)).toDF("id", "name", "score")
      .coalesce(1).write.option("header", "true").csv(dir + "/c")
    Seq((4L, "delta")).toDF("id", "extra")
      .coalesce(1).write.json(dir + "/j")
    Seq((5L, "epsilon", 7.25)).toDF("id", "name", "score")
      .coalesce(1).write.orc(dir + "/o")
    // flatten the per-format subdirs into one folder of files
    val flat = Files.createTempDirectory("graft-flat").toString
    for (sub <- Seq("p", "c", "j", "o");
         f <- new java.io.File(dir, sub).listFiles
         if f.getName.endsWith(".parquet") || f.getName.endsWith(".csv")
           || f.getName.endsWith(".json") || f.getName.endsWith(".orc"))
      Files.copy(f.toPath, java.nio.file.Paths.get(flat, f.getName))

    val out = Ingest.folderMixed(spark, flat)
    assert(out.count() === 5)
    assert(out.columns.toSet === Set("id", "name", "score", "extra"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("name") === "alpha")
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))     // parquet row: no csv col
    assert(byId(3L).getAs[Double]("score") === 9.5)             // csv row with inferSchema
    assert(byId(4L).getAs[String]("extra") === "delta")         // json-only column
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("name")))
    assert(byId(5L).getAs[String]("name") === "epsilon")        // orc row
    assert(byId(5L).getAs[Double]("score") === 7.25)
  }

  test("folderMixed: empty folder is a loud error") {
    val dir = Files.createTempDirectory("graft-empty").toString
    val e = intercept[IllegalArgumentException](Ingest.folderMixed(spark, dir))
    assert(e.getMessage.contains("no parquet/csv/json"))
  }
}
