package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String normalization applied before every distance computation.
  *
  * Reference: /root/reference/main.py:26-27, 75-76, 171-172 — lowercase then
  * strip every character outside [a-zA-Z0-9].
  *
  * Built-in `lower` + `regexp_replace` so the whole thing stays inside
  * whole-stage codegen (no UDF). After `lower`, `[^a-z0-9]` is equivalent to
  * the reference's `[^a-zA-Z0-9]`.
  */
object Normalize {
  def norm(c: Column): Column = regexp_replace(lower(c), "[^a-z0-9]", "")

  /** DuckDB-oracle fragment for the same normalization (DuckDB needs the
    * explicit 'g' flag for global replacement; Spark is global by default). */
  def normSql(expr: String): String =
    s"regexp_replace(lower($expr), '[^a-z0-9]', '', 'g')"
}
