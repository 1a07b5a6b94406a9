package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the lakehouse OPTIMIZE primitive.
  *
  * Streaming sinks, per-trigger appends, and over-partitioned writes
  * leave directories of kilobyte-sized parquet files. At 100 TB the
  * pathology compounds: the listing alone (millions of entries) costs
  * more than the scan, every file burns a task launch plus a footer
  * read, and row-group-per-file kills both compression and min/max
  * pruning. Compaction re-writes a directory into size-targeted files,
  * optionally range-clustering rows so the new files also carry tight
  * min/max stats on a chosen column.
  *
  * Two paths, chosen by `clusterCol`:
  *
  *  - `None` — `coalesce(nOut)`: NO shuffle. Input splits are merged
  *    map-side into `nOut` write tasks; at scale, the shuffle saved IS
  *    the operator (re-shuffling 100 TB to fix file sizes would cost
  *    more than the problem). Output sizes track the merged inputs, so
  *    pre-existing skew carries through — acceptable for the
  *    small-file case this targets, where inputs are uniformly tiny.
  *
  *  - `Some(col)` — `repartitionByRange(nOut) + sortWithinPartitions`:
  *    one shuffle, and every output file covers a contiguous range of
  *    the cluster column, so file-level min/max stats prune range
  *    scans forever after. Range boundaries come from Spark's sampler,
  *    so reruns are data-identical but not byte-identical; when
  *    byte-identical reruns matter, use the deterministic sketch-CDF
  *    layout ([[Partitioning.writeRangeBucketed]]) instead — it trades
  *    the flat-directory schema for `bucket=k/` partition dirs.
  *
  * Sizing reads FILE METADATA only (count + bytes, no data): O(files)
  * driver memory — the same listing cost every reader of the
  * fragmented directory already pays per query, paid here once to end
  * it. Output count = ceil(totalBytes / targetBytes): parquet-in,
  * parquet-out with the same codec re-compresses to roughly input
  * bytes, so input bytes are the right size proxy.
  */
object Compaction {

  /** What a compaction did (or would do): input fragmentation observed
    * and the output file count derived from `targetBytes`. */
  case class CompactPlan(nInputFiles: Int, totalBytes: Long, nOutputFiles: Int)

  /** Metadata-only sizing pass over the `.parquet` files directly under
    * `inDir` (flat directory — the shape streaming sinks and
    * `df.write.parquet` produce; hive-partitioned trees compact
    * per-partition-directory, one plan each). */
  def plan(spark: SparkSession, inDir: String, targetBytes: Long): CompactPlan = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no .parquet files directly under $inDir")
    val total = files.map(_.getLen).sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes)
    require(nOut <= Int.MaxValue, s"nOutputFiles overflows Int: $nOut")
    CompactPlan(files.length, total, nOut.toInt)
  }

  /** Compact `inDir` into `outDir` (overwrite) at ~`targetBytes` per
    * file; see the object doc for the two layout paths. Returns the
    * executed plan so callers can audit fragmentation before/after. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long,
              clusterCol: Option[String] = None): CompactPlan = {
    val p = plan(spark, inDir, targetBytes)
    val df = spark.read.parquet(inDir)
    val out = clusterCol match {
      case None => df.coalesce(p.nOutputFiles)
      case Some(c) =>
        df.repartitionByRange(p.nOutputFiles, col(c))
          .sortWithinPartitions(col(c))
    }
    out.write.mode("overwrite").parquet(outDir)
    p
  }
}
