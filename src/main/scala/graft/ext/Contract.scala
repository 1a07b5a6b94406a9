package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data contracts — the quality gate a pipeline runs before
  * promoting a table, beside the privacy gate (Profile.kAnonymity) and
  * the statistical profile (q132). A contract is a list of CHECKS; the
  * audit emits one row per check: (check_name, n_rows, n_violations, pass).
  *
  * Scale shape, by check family:
  *   - row checks (NotNull / InRange / Matches / OneOf) all fold into
  *     ONE conditional-aggregate pass over the table — map-side
  *     partials, a single 1-row shuffle, no matter how many checks;
  *   - Unique is one hash aggregate on the key (violations = rows in
  *     groups of size > 1, counted without materializing the groups);
  *   - ForeignKey is a LEFT ANTI join against the referenced key set
  *     (broadcast when small, shuffle otherwise — Catalyst's call).
  * The report is check-count-sized; nothing row-sized leaves the
  * executors. Violating ROWS are deliberately not returned here — a
  * caller who wants them filters by the check predicate, which this
  * object exposes ([[Check.violates]]) so gate and extraction can never
  * disagree. */
object Contract {

  sealed trait Check {
    def name: String
    /** Row-level violation predicate; None for set-level checks
      * (Unique, ForeignKey) whose violations are not per-row
      * expressible. */
    def violates: Option[Column]
  }

  final case class NotNull(colName: String) extends Check {
    val name = s"not_null($colName)"
    val violates = Some(col(colName).isNull)
  }

  /** Closed interval; null passes (pair with NotNull to forbid). */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($colName,$lo,$hi)"
    val violates =
      Some(col(colName).isNotNull && !col(colName).between(lo, hi))
  }

  /** Full-string regex; null passes. */
  final case class Matches(colName: String, regex: String) extends Check {
    val name = s"matches($colName)"
    val violates =
      Some(col(colName).isNotNull && !col(colName).rlike(regex))
  }

  /** Closed value domain; null passes. */
  final case class OneOf(colName: String, values: Seq[String]) extends Check {
    val name = s"one_of($colName)"
    val violates =
      Some(col(colName).isNotNull && !col(colName).isin(values: _*))
  }

  /** Every key appears once; a group of size g > 1 counts g violating
    * rows (all members are suspect — no arbitrary survivor choice in a
    * GATE). */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
    val violates = None
  }

  /** Every non-null key value exists in `refName`'s `refCol` (the ref
    * table is passed to [[audit]] by name). Null keys pass (orphan-null
    * policy belongs to NotNull). */
  final case class ForeignKey(colName: String, refName: String,
                              refCol: String) extends Check {
    val name = s"fk($colName->$refName.$refCol)"
    val violates = None
  }

  /** One row per check: (check_name, n_rows, n_violations, pass), in the
    * declared check order (check_id carries it through the union). */
  def audit(df: DataFrame, checks: Seq[Check],
            refs: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(checks.nonEmpty, "a contract needs at least one check")
    val total = count(lit(1))
    val rowChecks = checks.zipWithIndex.collect {
      case (c, i) if c.violates.isDefined => (c, i, c.violates.get)
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowChecks.nonEmpty) {
      // all row checks in ONE pass: a conditional count per check
      val aggs = total.as("n_rows") +:
        rowChecks.map { case (_, i, v) => count(when(v, 1)).as(s"v_$i") }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = array(rowChecks.map { case (c, i, _) =>
        struct(lit(i).as("check_id"), lit(c.name).as("check_name"),
          col(s"v_$i").as("n_violations"))
      }: _*)
      parts += one.select(explode(rows).as("x"), col("n_rows"))
        .select(col("x.check_id"), col("x.check_name"), col("n_rows"),
          col("x.n_violations"))
    }
    checks.zipWithIndex.foreach {
      case (u: Unique, i) =>
        val dup = df.groupBy(u.cols.map(col): _*)
          .agg(count(lit(1)).as("__g"))
          .agg(coalesce(sum(when(col("__g") > 1, col("__g"))), lit(0L))
            .as("n_violations"))
        parts += df.agg(total.as("n_rows")).crossJoin(dup)
          .select(lit(i).as("check_id"), lit(u.name).as("check_name"),
            col("n_rows"), col("n_violations"))
      case (fk: ForeignKey, i) =>
        val ref = refs.getOrElse(fk.refName, throw new IllegalArgumentException(
          s"contract references unknown table '${fk.refName}'"))
        val orphans = df.filter(col(fk.colName).isNotNull)
          .join(ref.select(col(fk.refCol).as(fk.colName)).distinct(),
            Seq(fk.colName), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        parts += df.agg(total.as("n_rows")).crossJoin(orphans)
          .select(lit(i).as("check_id"), lit(fk.name).as("check_name"),
            col("n_rows"), col("n_violations"))
      case _ => ()
    }
    parts.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check_id")
      .drop("check_id")
  }

  /** Functional-dependency violation discovery: which values of `lhs`
    * map to MORE than one value of `rhs` — the "is this column really
    * determined by that key?" profiling question behind normalization,
    * dedup-key choice, and schema inference. Returns one row per
    * violating lhs value with its row count, the number of distinct rhs
    * values, and the lexicographic min/max rhs as the witness pair.
    *
    * Shape at scale: a two-level fold — groupBy(lhs, rhs) with map-side
    * partials (the only row-scale shuffle, keyed by the pair), then a
    * groupBy(lhs) over the pair-distinct rows. Never count(DISTINCT)
    * over raw rows: the pair fold bounds what shuffles at the number of
    * DISTINCT pairs, not rows. Output is violating-groups-sized. */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdViolations needs at least one lhs column")
    df.groupBy((lhs :+ rhs).map(col): _*).agg(count(lit(1)).as("__n"))
      .groupBy(lhs.map(col): _*)
      .agg(sum("__n").as("n_rows"), count(lit(1)).as("n_rhs"),
        min(col(rhs)).as("rhs_min"), max(col(rhs)).as("rhs_max"))
      .filter(col("n_rhs") > 1)
  }
}
