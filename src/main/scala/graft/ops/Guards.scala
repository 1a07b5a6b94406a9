package graft.ops

import org.apache.spark.sql.DataFrame

/** Loud scale guards.
  *
  * The fuzzy-string and kNN engines BROADCAST their probe side — the right
  * plan for the reference's search-list shape (tens to thousands of rows;
  * /root/reference/main.py:559-560 drives a hand-entered search table), and
  * a driver/executor-melting one if a user points the same API at a corpus
  * (e.g. attempting string self-dedup via fuzzyMatch). Rather than silently
  * attempting the broadcast, every probe-broadcasting entry point bounds the
  * probe side first and fails with an error naming the scale-safe
  * alternative.
  *
  * The decision scan is `limit(max+1).count()`: it reads at most max+1 rows
  * of the probe plan — cost proportional to the ACTUAL probe size for
  * legitimate callers, never a full count() of a large upstream pipeline.
  */
object Guards {

  /** Default probe-row ceiling for broadcast-side inputs: far above any
    * plausible interactive search list, far below the scale where a
    * broadcast build side threatens driver/executor memory. */
  val MaxBroadcastRows = 2000000L

  /** Returns `df` unchanged if it holds at most `maxRows` rows; otherwise
    * throws, naming the engine and its scale-safe `alternatives`. */
  def requireBroadcastable(df: DataFrame, what: String, alternatives: String,
                           maxRows: Long = MaxBroadcastRows): DataFrame = {
    val lim = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val n = df.limit(lim).count()
    require(n <= maxRows,
      s"$what exceeds $maxRows rows but is BROADCAST by this engine — at this " +
        s"scale use $alternatives instead, or raise maxProbeRows deliberately " +
        "for an offline run")
    df
  }

  /** The soft sibling of [[requireBroadcastable]] for operators that are
    * CORRECT either way and only want the broadcast as a plan choice:
    * returns `broadcast(df)` when the same bounded `limit(max+1)` probe
    * fits, and `df` UNHINTED otherwise — the downstream join degrades to
    * a shuffled join instead of melting the driver. Use where the small
    * side's cardinality is data-dependent (per-GROUP rate tables, derived
    * dimension slices) rather than structurally bounded. */
  def broadcastIfSmall(df: DataFrame,
                       maxRows: Long = MaxBroadcastRows): DataFrame = {
    val lim = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    if (df.limit(lim).count() <= maxRows)
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}
