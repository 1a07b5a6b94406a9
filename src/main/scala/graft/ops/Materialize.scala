package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Shared eager-materialization point for every operator that feeds ONE
  * computed table into SEVERAL downstream branches.
  *
  * Why the pattern exists at all: multi-branch reuse never happens via
  * ReuseExchange in these pipelines — per-branch predicate pushdown and
  * column pruning make each branch's exchange canonically different, so a
  * lazy plan re-runs the upstream chain once per branch (measured 4x on
  * the BM25 tokenize, round 7). Every site therefore collapses the stream
  * to a COMPACT table (vocab-, user-, group- or doc-signal-sized — never
  * raw-corpus-sized) and materializes it eagerly; all branches then read
  * the materialized rows.
  *
  * Why the MODE exists: the original sites all used `localCheckpoint`,
  * which truncates lineage into executor-LOCAL blocks — fast, but on a
  * preemptible/spot cluster one lost executor after materialization kills
  * the job with no recompute path (no lineage, no replica). This helper
  * generalizes the connected-components loop's dual-path precedent
  * ([[graft.ext.Dedup]]'s `checkpointDir` — managed parquet snapshots)
  * into the one knob every consumer shares:
  *
  *   - [[ExecutorLocal]] (default): `localCheckpoint` — lowest latency,
  *     blocks freed by the ContextCleaner when the plan is unreachable.
  *     The right trade for interactive scoring passes and anything
  *     re-runnable.
  *   - [[Replicated]]: eager `persist(MEMORY_AND_DISK_2)` — two replicas
  *     AND retained lineage, so a single executor loss reads the replica
  *     and a double loss recomputes instead of failing the job. Blocks
  *     pin storage until the plan is unreachable or unpersisted; local
  *     single-JVM runs keep one replica (Spark logs the reduction).
  *   - [[Snapshot]]: managed parquet under a caller-owned directory
  *     (HDFS/object store on a real cluster) — survives any number of
  *     executor losses and even driver restart of a downstream stage;
  *     the caller owns deleting the directory when done with the results
  *     (the CC-loop contract). Unlike `df.checkpoint()` this neither
  *     mutates the global SparkContext checkpoint dir nor leaks files
  *     behind the default-off `cleanCheckpoints` flag.
  *
  * Mode is resolved per SESSION from `spark.graft.materialize.mode`
  * (`executor-local` | `replicated` | `snapshot`, with
  * `spark.graft.materialize.snapshotDir` naming the snapshot root), so a
  * long fault-domain job flips one conf instead of threading a parameter
  * through every operator signature. Results are IDENTICAL across modes —
  * only the storage/durability trade changes (MaterializeSpec pins this).
  */
object Materialize {

  sealed trait Mode
  /** `localCheckpoint`: executor-local blocks, no lineage. Fast; lost
    * blocks fail the job. */
  case object ExecutorLocal extends Mode
  /** Eager 2-replica persist, lineage retained: replica read on single
    * loss, recompute on double loss. */
  case object Replicated extends Mode
  /** Managed parquet snapshot under `dir` (caller owns the directory's
    * lifecycle): survives executor loss outright. */
  final case class Snapshot(dir: String) extends Mode

  val ModeKey = "spark.graft.materialize.mode"
  val SnapshotDirKey = "spark.graft.materialize.snapshotDir"

  private val snapshotId = new AtomicLong(0L)

  /** The session-configured [[Mode]] (defaults to [[ExecutorLocal]]).
    * Loud on an unknown mode string or a snapshot mode without a dir. */
  def sessionMode(spark: SparkSession): Mode =
    spark.conf.get(ModeKey, "executor-local") match {
      case "executor-local" => ExecutorLocal
      case "replicated" => Replicated
      case "snapshot" =>
        val dir = spark.conf.getOption(SnapshotDirKey).getOrElse(
          throw new IllegalArgumentException(
            s"$ModeKey=snapshot requires $SnapshotDirKey to name a " +
              "caller-owned directory (HDFS/object store on a cluster)"))
        Snapshot(dir)
      case other =>
        throw new IllegalArgumentException(
          s"unknown $ModeKey '$other' — use executor-local | replicated | snapshot")
    }

  /** Materialize `df` eagerly under the session-configured mode and
    * return a DataFrame whose plan reads the materialized rows. */
  def stable(df: DataFrame, name: String = "mat"): DataFrame =
    stable(df, sessionMode(df.sparkSession), name)

  /** Materialize `df` eagerly under an explicit mode. */
  def stable(df: DataFrame, mode: Mode, name: String): DataFrame = mode match {
    case ExecutorLocal => df.localCheckpoint()
    case Replicated =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
      p.count() // force: branches must read blocks, not race to build them
      p
    case Snapshot(dir) =>
      val spark = df.sparkSession
      val path = s"$dir/graft-${name.replaceAll("[^A-Za-z0-9_-]", "_")}-" +
        s"${snapshotId.incrementAndGet()}"
      df.write.mode("overwrite").parquet(path)
      // Read with the origin schema so names/types/order are exact.
      // (Snapshot results are released by deleting the caller-owned
      // directory — [[release]] is a no-op on them by design.)
      // Nullability still WIDENS to nullable — Spark marks every
      // file-source column nullable regardless of the supplied schema
      // (files can't prove non-null). That widening is semantically safe
      // (never narrowing) and disappears at any parquet sink; the other
      // two modes keep the origin nullability bit-for-bit.
      spark.read.schema(df.schema).parquet(path)
  }

  /** Release the storage behind a SUPERSEDED [[stable]] result.
    *
    * Iterative operators (PageRank, k-core peel, the BPE merge loop)
    * materialize every round; without an explicit release a 50-iteration
    * job pins 50 rounds of blocks — the ContextCleaner frees them only
    * when the driver GCs the plan handles (periodic GC default: 30 min),
    * so storage fills and eviction churn lands on whatever runs next
    * (the round-10 bench regression signature). Loop discipline: after
    * round N+1 is materialized (stable is eager, so its blocks are
    * self-contained and no longer read round N's), release round N —
    * a loop then holds TWO rounds of blocks, not `iters`.
    *
    * Mode behavior: [[ExecutorLocal]] unpersists the localCheckpoint
    * RDD found on the plan's LogicalRDD leaves (the df handle itself is
    * not registered with the CacheManager); [[Replicated]] unpersists
    * the df's own persist handle; [[Snapshot]] is a no-op — the caller
    * owns the directory lifecycle (the CC-loop contract, which deletes
    * superseded snapshots itself). NEVER call this on a result still
    * referenced by an unexecuted lazy plan: checkpointed RDDs have no
    * lineage, so a later action would fail with a missing-block error
    * rather than recompute. */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false) // Replicated-mode handle; no-op otherwise
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
