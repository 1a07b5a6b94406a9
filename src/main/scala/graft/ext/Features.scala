package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature engineering — the deterministic encode/transform
  * layer between curated data and model input: dictionary encoding with
  * a decode-roundtrip law, and leakage-safe target statistics.
  */
object Features {

  /** Frequency-ordered dictionary for one categorical column: dense
    * 1-based ids assigned by (count DESC, value ASC) — the most frequent
    * category is id 1, ties break lexicographically, so the dictionary
    * is a pure function of the data (no RNG, no layout dependence).
    * Returns (id, value, freq).
    *
    * Shape at scale: the value fold is the only row-scale shuffle
    * (map-side partials); the rank window then orders DISTINCT values in
    * one partition — bounded by category cardinality, the same
    * deliberate contract as the ROC-AUC rank and histogram sketches.
    * NULL is a real category (encoded like any value) so decode can
    * restore it. */
  def dictionary(df: DataFrame, colName: String): DataFrame = {
    val byFreq = Window.orderBy(col("freq").desc, col("value").asc_nulls_first)
    df.groupBy(col(colName).as("value"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("id", row_number().over(byFreq).cast("long"))
      .select("id", "value", "freq")
  }

  /** Encode `colName` through [[dictionary]]'s dense ids (appends
    * `<col>_id`). The dictionary side is category-sized — Catalyst
    * broadcasts it; the null-safe join condition keeps NULL categories
    * encodable. Decode is the same join on id: spec + q206 pin the
    * decode∘encode == identity law. */
  def dictEncode(df: DataFrame, colName: String,
                 dict: DataFrame): DataFrame =
    df.join(broadcast(dict.select(col("id").as(s"${colName}_id"),
        col("value").as("__dv"))),
      col(colName) <=> col("__dv"), "left")
      .drop("__dv")

  def dictDecode(df: DataFrame, colName: String,
                 dict: DataFrame): DataFrame =
    df.join(broadcast(dict.select(col("id").as(s"${colName}_id"),
        col("value").as(colName))),
      Seq(s"${colName}_id"), "left")

  /** Leave-one-out target encoding of a categorical against a BINARY
    * outcome: each row receives (positives in its category − its own
    * outcome) / (category size − 1) — the category's positive rate
    * computed WITHOUT the row itself, the standard leakage guard that
    * keeps the feature honest for the very rows it trains on. Null when
    * the row is alone in its category (no peers to borrow from).
    *
    * EXACT core: binary outcomes make both numerator and denominator
    * integers; the single division rounds to 6 dp. Shape at scale: one
    * category fold (map-side partials, category-sized result) broadcast
    * back onto the rows — no window over raw rows, no per-row state. */
  def targetEncodeLoo(df: DataFrame, catCol: String, pos: Column,
                      outCol: String = "te_loo"): DataFrame = {
    val y = when(pos, 1L).otherwise(0L)
    val stats = df.groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n_cat"), sum(y).as("__pos_cat"))
    df.withColumn("__y", y)
      .join(broadcast(stats), col(catCol) <=> col("__cat"), "left")
      .withColumn(outCol, when(col("__n_cat") > 1,
        TextAnalysis.round6Portable(
          (col("__pos_cat") - col("__y")).cast("double") /
            (col("__n_cat") - 1))))
      .drop("__cat", "__n_cat", "__pos_cat", "__y")
  }
}
