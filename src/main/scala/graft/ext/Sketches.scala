package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed, ENGINE-PORTABLE cardinality sketches.
  *
  * HyperLogLog (Flajolet/Fusy/Gandouet/Meunier, AofA 2007) with two
  * deliberate deviations from a production HLL, both in service of
  * cross-engine determinism:
  *
  *   - the hash is the portable md5-derived [[TextAnalysis.h60]], so a SQL
  *     oracle reproduces every register exactly;
  *   - the harmonic denominator sum(2^-rho_j) is accumulated in EXACT
  *     integer arithmetic — sum of 2^(52 - rho_j) as BIGINT, rescaled once
  *     at the end — so there is no floating summation order to drift and
  *     nothing to round away. (rho <= 52 and m = 512 keep the scaled sum
  *     <= 2^61, inside BIGINT.)
  *
  * `approx_count_distinct` (HLL++) is the production choice when
  * cross-engine reproducibility of the ESTIMATE doesn't matter; this
  * operator exists for pipelines that pin sketch outputs in regression
  * gates across engines.
  *
  * Shape at scale: one groupBy(keys, bucket) MAX — partial-aggregated
  * map-side, so the shuffle carries at most m register rows per key group,
  * never the values — then one groupBy(keys) fold over <= m rows. Cost is
  * independent of the cardinality being estimated; compare the exact
  * count(DISTINCT x), whose shuffle carries every distinct value.
  */
object Sketches {

  /** log2 register count; m = 512 registers => ~1.04/sqrt(512) = 4.6%
    * standard error. */
  val HLL_P = 9
  val HLL_M: Int = 1 << HLL_P

  /** alpha_m * m^2 * 2^52 — the whole numerator as ONE driver-side double
    * so both engines consume the identical constant (the oracle embeds
    * this value's shortest-round-trip decimal form). */
  val HLL_NUMERATOR: Double =
    0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * (1L << 52).toDouble

  /** HLL approximate distinct count of `value` per `keys` group.
    *
    * h60 supplies 60 hash bits: low 9 = register index, high 51 = the
    * pattern word w; rho = leading zeros of w within 51 bits + 1
    * = 52 - bitlen(w) (52 when w = 0). Registers below the linear-counting
    * threshold (raw <= 2.5m with empty registers) fall back to
    * m * ln(m / empty) per the original paper.
    */
  def approxDistinct(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val m = HLL_M
    val keyCols = keys.map(col)
    val registers = df
      .withColumn("__h", TextAnalysis.h60(value.cast("string")))
      .withColumn("__w", expr(s"__h div $m"))
      .withColumn("__rho",
        when(col("__w") > 0, lit(52) - length(bin(col("__w")))).otherwise(lit(52)))
      .groupBy((keyCols :+ (col("__h") % m).as("__bucket")): _*)
      .agg(max("__rho").as("max_rho"))
    registers
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - max_rho)")).as("__s_nonempty"))
      .withColumn("__s",
        col("__s_nonempty") + (lit(m) - col("__n_buckets")) * lit(1L << 52))
      .withColumn("__zeros", lit(m) - col("__n_buckets"))
      .withColumn("__raw", lit(HLL_NUMERATOR) / col("__s").cast("double"))
      .withColumn("approx_distinct", round(
        when(col("__raw") <= 2.5 * m && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")), 6))
      .select((keyCols :+ col("approx_distinct")): _*)
  }
}
