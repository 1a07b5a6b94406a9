package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources. Reference surface (SURVEY.md §2.1): single-file scan (S1) and
  * folder scan + union-all with schema alignment by name (S2). The harness
  * data is Parquet (TESTDATA.md), so scans are vectorized-columnar and column
  * pruning / predicate pushdown come from Catalyst for free.
  */
object Ingest {

  /** S1: read one table of a scale-factor directory.
    *
    * Some generators write `events.ts` as parquet TIMESTAMP(NANOS), which
    * Spark rejects by default; `nanosAsLong` reads it as a long we convert
    * explicitly (see [[eventsWithTs]]). The conf is a no-op for every other
    * column type, including the TIMESTAMP(MICROS) layout current generators
    * emit.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize an events frame so downstream code sees ONE contract
    * regardless of how the generator encoded `ts`:
    *   - `ts`     TIMESTAMP (session-local; sessions run UTC) at
    *              microsecond precision
    *   - `ts_ms`  epoch millis as BIGINT, for arithmetic that must be
    *              engine-portable (DuckDB mirror: `epoch_ms(ts)`)
    *
    * Two layouts exist in the wild: TIMESTAMP(NANOS) read as a nanos long
    * (legacy conf above), and TIMESTAMP(MICROS) read as TIMESTAMP_NTZ. Both
    * conversions are map-only column expressions — schema dispatch happens
    * once at plan build, not per row.
    *
    * Two loud contracts (round-8 advisor items): the NTZ→TIMESTAMP cast
    * reinterprets wall-clock in the SESSION zone, so a non-UTC session
    * would silently shift every epoch milli away from the oracle's
    * `epoch_ms(ts)` — the session zone is required to be UTC up front.
    * And a long-typed ts is asserted IN-PLAN to sit in a plausible
    * epoch-NANOS range (>= 1e16, ~1970-04; millis/micros stay below that
    * until 2286), so a generator writing millis or micros longs fails
    * loudly instead of being misscaled by up to 10^6. */
  def withTsCols(df: DataFrame): DataFrame = {
    require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
      "withTsCols requires spark.sql.session.timeZone=UTC: the TIMESTAMP_NTZ " +
        "layout converts via a session-zone cast, and any other zone silently " +
        "shifts every derived epoch milli")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long layout
        // assert_true returns NULL when the check passes, so the coalesce
        // adds 0 and keeps the check inside the VALUE expressions — an
        // uncolumned side-check would be pruned away by Catalyst. The
        // check rides BOTH derived columns: a consumer selecting only ts
        // (or only ts_ms) lets Catalyst prune the other, and a check
        // attached to just one would vanish with it.
        val nanosCk = coalesce(
          assert_true(col("ts") >= lit(10000000000000000L),
            lit("events.ts long values are below the plausible epoch-NANOS " +
              "range — an epoch millis/micros long layout would be silently " +
              "misscaled; convert the source or extend withTsCols")).cast("long"),
          lit(0L))
        df.withColumn("ts_ms", expr("ts div 1000000") + nanosCk)
          .withColumn("ts", timestamp_micros(expr("ts div 1000") + nanosCk))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ layout (micros)
        df.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
    }
  }

  /** `events` with `ts` as a proper timestamp column (microsecond precision)
    * plus `ts_ms` (epoch millis) for arithmetic that must be
    * engine-portable. See [[withTsCols]] for the layout dispatch. */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame =
    withTsCols(table(spark, dir, "events"))

  /** S2 (reference /root/reference/main.py:692-696): union-all over many
    * files/tables, aligning columns by NAME and null-filling the gaps —
    * pandas `concat(ignore_index=True)` semantics. `unionByName` with
    * `allowMissingColumns=true` is the exact Spark equivalent and is a
    * metadata-only plan node (no shuffle). */
  def unionAllByName(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Folder scan: glob every parquet under `dir`. For homogeneous folders
    * prefer the single multi-path scan (one job, partition-parallel) over a
    * reduce of unions. */
  def folder(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/*.parquet")
  }

  /** S2 widened to mixed formats: the reference's data_folder holds
    * arbitrary tabular files (xlsx there — read natively via [[Xlsx]],
    * the reference's ONLY input format, main.py:19-21 — plus
    * parquet/csv/json/orc). One multi-path scan PER FORMAT —
    * partition-parallel, with pushdown where the format supports it —
    * then one union by name with null fill, so a folder mixing formats
    * and schemas reads like the reference's concat. The file LISTING is
    * driver-side metadata only, but schema INFERENCE for csv/json costs
    * one extra pass over those files (xlsx: one aggregate) — at scale,
    * pass explicit schemas (or convert to parquet at landing) instead. */
  def folderMixed(spark: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(_.isFile).map(_.getPath.toString)
    def grp(ext: String) = files.filter(_.toLowerCase.endsWith(ext)).toSeq
    val perFormat = Seq(
      Some(grp(".parquet")).filter(_.nonEmpty).map { ps =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(ps: _*)
      },
      Some(grp(".csv")).filter(_.nonEmpty).map(ps =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(ps: _*)),
      Some(grp(".json")).filter(_.nonEmpty).map(ps =>
        spark.read.json(ps: _*)),
      // ORC: the other self-describing columnar format Spark speaks
      // natively — full pushdown + pruning, no inference pass needed
      Some(grp(".orc")).filter(_.nonEmpty).map(ps =>
        spark.read.orc(ps: _*)),
      // the reference's native format, one task per workbook (see Xlsx)
      Some(grp(".xlsx")).filter(_.nonEmpty).map(ps =>
        Xlsx.read(spark, ps))
    ).flatten
    require(perFormat.nonEmpty, s"no parquet/csv/json/orc/xlsx files under $dir")
    unionAllByName(perFormat)
  }

  /** JSONL (newline-delimited JSON) sink — the interchange format LLM data
    * pipelines actually exchange corpora in. One JSON object per line, one
    * file per partition, written in parallel (no driver funnel). Spark's
    * JSON writer omits null fields per line (standard JSONL practice);
    * [[jsonl]] restores them as typed nulls via the explicit schema. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL source with an EXPLICIT schema — at scale, schema inference
    * costs a full extra pass over the data and silently widens types on
    * dirty lines; production readers pass the contract instead. Malformed
    * lines fail loudly (FAILFAST) rather than becoming a row of nulls. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** CSV sink: header, full quoting, escaped quotes — the conservative
    * dialect every downstream parser (including this library's own
    * [[csv]]) reads back byte-exactly, embedded delimiters and newlines
    * included. NULL is encoded as the `\N` token (the one CSV convention
    * that keeps null distinct from empty string — a field whose VALUE is
    * literally `\N` is the format's inherent ambiguity; JSONL has none). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").option("escape", "\"")
      .option("nullValue", "\\N").csv(path)

  /** CSV source with an explicit schema (same rationale as [[jsonl]]);
    * `multiLine` so quoted embedded newlines survive the round trip. Scale
    * note: multiLine makes each file NON-SPLITTABLE (one task per file —
    * record boundaries can't be found mid-file), so keep landing files
    * partition-sized and convert to parquet before the hot path; JSONL has
    * no such penalty (newlines inside values are always escaped). */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("escape", "\"").option("multiLine", "true")
      .option("nullValue", "\\N").option("mode", "FAILFAST").csv(path)

  /** Schema-evolution read: parquet shards written at DIFFERENT schema
    * versions, aligned by NAME with null-fill (mergeSchema) — a column
    * a shard's writer never knew about is NULL there, exactly the
    * pandas-concat / UNION-BY-NAME law S2's mixed-folder union follows
    * (q04), now across schema VERSIONS of one dataset. Scale note:
    * mergeSchema reads one footer per file as a distributed job —
    * fine for a bounded shard set; a 10^6-file lake should pass its
    * target schema explicitly (`spark.read.schema(...)`) and skip the
    * merge job, at the price of silently ignoring novel columns. */
  def readEvolved(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
