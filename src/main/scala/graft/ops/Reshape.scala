package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long↔wide reshaping for dataset cards and mixture matrices: pivot a
  * (row-key, category, measures) long table into one column per category
  * value, and unpivot a wide matrix back to long rows.
  *
  * 100 TB story — the category domain is EXPLICIT, by design:
  *   - [[pivotDense]] requires the caller to name the category values and
  *     writes the matrix as longhand conditional aggregates
  *     (`agg(CASE WHEN cat = v THEN m END)` per value): ONE hash
  *     aggregate with map-side partials — a single shuffle on the row
  *     key, output width fixed at plan time. Spark's native
  *     `groupBy.pivot` is deliberately NOT used: with explicit values it
  *     still plans through `PivotFirst` whenever the measure type
  *     supports it (TWO hash aggregates — shuffle on (key, cat), then on
  *     key — and NULL cells for absent combinations; ReshapeSpec
  *     documents the observed plan), and values-less `pivot(cat)` adds
  *     an eager distinct job over the full input just to discover the
  *     domain (capped by `spark.sql.pivotMaxValues`). Pivot categories
  *     in a curation pipeline (lang, source, split, quality band) are
  *     small closed enums known to the caller; a genuinely unbounded
  *     domain should stay LONG (grouped rows), not become columns.
  *   - [[unpivot]] plans as a map-only Expand (one output row per listed
  *     value column per input row) — no shuffle, no state; it composes
  *     with whatever partitioning the wide input already has.
  *
  * Round-trip law (proven cross-engine by q173): unpivot(pivotDense(df))
  * with empty cells dropped equals the direct `groupBy(key, cat)`
  * aggregate — reshaping is lossless for present combinations.
  */
object Reshape {

  /** Dense wide matrix: one row per `key`, one column set per `values`
    * entry, always ONE hash aggregate regardless of measure count (see
    * object scaladoc). Every cell is defined: the caller's aggregate
    * sees the membership condition and decides its own empty-cell value
    * (`c => count(when(c, 1))` gives 0;
    * `c => coalesce(sum(when(c, m)), lit(0L))` makes sums dense).
    *
    * `measures` maps an alias suffix to a function from the membership
    * condition (`cat = value`) to an aggregate; output columns are
    * `<value>_<suffix>` in value-major order (Spark pivot naming), or
    * just `<value>` when the suffix is empty (single-measure matrices
    * whose unpivot should recover the category values verbatim). */
  def pivotDense(df: DataFrame, key: String, cat: String, values: Seq[String],
                 measures: Seq[(String, Column => Column)]): DataFrame = {
    require(values.nonEmpty && measures.nonEmpty,
      "pivotDense needs explicit values and at least one measure")
    val cells = values.flatMap { v =>
      val cond = col(cat) === lit(v)
      measures.map { case (suffix, agg) =>
        agg(cond).as(if (suffix.isEmpty) v else s"${v}_$suffix") }
    }
    df.groupBy(col(key)).agg(cells.head, cells.tail: _*)
  }

  /** Long rows back out of a wide matrix: ids are carried through,
    * each column in `valueCols` becomes one row with its name in
    * `varName` and its cell in `valName`. Map-only Expand — no shuffle.
    * NULL cells (combinations absent at pivot time under a non-count
    * aggregate) survive as NULL-valued rows; filter `valName IS NOT
    * NULL` to recover exactly the present combinations. */
  def unpivot(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
              varName: String, valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
}
