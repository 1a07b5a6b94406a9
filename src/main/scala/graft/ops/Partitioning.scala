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
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
