package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-heavy scans of small inputs.
  *
  * Spark sizes scan partitions by input BYTES (`files.maxPartitionBytes`),
  * which is right for IO-bound plans but wrong when a cheap-to-read side
  * feeds a compute-bound operator: a 200 KB parquet file arrives as ONE
  * partition, so a BroadcastNestedLoopJoin scoring millions of pairs against
  * it runs on one core. [[spread]] repartitions UP to the cluster's default
  * parallelism only when the plan has fewer partitions — on a real multi-TB
  * input (thousands of splits) it is a no-op, so the shuffle cost is only
  * ever paid when the input is small enough for it to be trivial.
  */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Size-statistics probe, NOT df.rdd.getNumPartitions: the RDD conversion
    // forced eager PHYSICAL planning of every scored pipeline (each input
    // planned twice) and pinned an AQE-opaque RDD boundary into the plan.
    // Optimized-plan stats are driver-side metadata — no job, no physical
    // plan, no boundary: file relations report their on-disk bytes, so an
    // input smaller than one scan split per core (i.e. one that cannot fill
    // the cluster by byte-based splitting) is repartitioned up, and a real
    // multi-split input passes through untouched — same decision the
    // partition-count probe made, for metadata cost.
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(maxSplit) * target) df.repartition(target) else df
  }

  /** Bucketed materialization for co-located joins: write `df` as a table
    * hash-bucketed (and sorted) by `key`, so every future equi-join or
    * aggregation on `key` between same-bucketed tables plans WITHOUT a
    * shuffle — the join's exchange is paid ONCE at write time instead of
    * once per downstream query. The scale lever for fact-to-fact joins
    * repeated across a pipeline (events ⋈ purchases by user, docs ⋈
    * features by doc_id): at 100 TB, re-shuffling both sides per query
    * dominates everything; two tables bucketed by the same key into the
    * same count join map-side. Requires a metastore table (`saveAsTable`) —
    * plain parquet paths carry no bucket metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
