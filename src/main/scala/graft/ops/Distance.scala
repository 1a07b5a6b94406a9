package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Edit-distance functions.
  *
  * The plain distance (reference /root/reference/main.py:169-194, unit-cost
  * Wagner–Fischer over normalized strings) maps to Spark's built-in
  * `levenshtein` composed with [[Normalize.norm]] — bit-identical integers,
  * fully codegen'd, no UDF.
  *
  * The visual variants (alignment trace, greedy substring chaining) have no
  * Spark built-in, so they are Scala UDFs over pure functions. They are off
  * the hot path (rendered per *displayed* candidate in the reference, not per
  * scored pair) so UDF overhead is acceptable; a codegen'd Catalyst
  * `Expression` upgrade is possible later because the functions are pure.
  */
object Distance {

  /** d(s, t) after normalization — the engine's core scoring column. */
  def dist(s: Column, t: Column): Column =
    levenshtein(Normalize.norm(s), Normalize.norm(t))

  /** Locale.ROOT keeps lowercasing identical to Spark `lower` / DuckDB
    * `lower` / Python `str.lower` — a Turkish-style default locale would
    * map 'I' to dotless 'ı' (then stripped), silently diverging from the
    * q09 oracle. */
  private def clean(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]", "")

  /** Full DP matrix, unit costs. Only used by the trace UDF; the scoring path
    * uses the built-in expression. */
  private def dpMatrix(s: String, t: String): Array[Array[Int]] = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (j == 0) i else if (i == 0) j else 0
    }
    var j = 1
    while (j <= t.length) {
      var i = 1
      while (i <= s.length) {
        d(i)(j) =
          if (s.charAt(i - 1) == t.charAt(j - 1)) d(i - 1)(j - 1)
          else math.min(d(i - 1)(j) + 1, math.min(d(i)(j - 1) + 1, d(i - 1)(j - 1) + 1))
        i += 1
      }
      j += 1
    }
    d
  }

  /** Reference /root/reference/main.py:24-70 (`visual_levenshtein_distance`):
    * distance plus a greedy forward alignment trace — 1 per matched char,
    * 0 per edit, walking both cleaned strings concurrently consulting the DP
    * matrix; stops at the shorter string's end (no tail padding).
    *
    * Returns (distance, symbols).
    */
  def visualLevenshtein(sRaw: String, tRaw: String): (Int, Seq[Int]) = {
    val s = clean(sRaw); val t = clean(tRaw)
    val d = dpMatrix(s, t)
    val symbols = scala.collection.mutable.ArrayBuffer.empty[Int]
    var si = 0; var ti = 0
    while (si < s.length && ti < t.length) {
      if (s.charAt(si) == t.charAt(ti)) {
        symbols += 1; si += 1; ti += 1
      } else if (d(si + 1)(ti + 1) == d(si)(ti) + 1) { // substitution
        symbols += 0; si += 1; ti += 1
      } else if (d(si + 1)(ti + 1) == d(si + 1)(ti) + 1) { // deletion
        symbols += 0; si += 1
      } else { // insertion (d(si+1)(ti+1) == d(si)(ti+1) + 1)
        symbols += 0; ti += 1
      }
    }
    (d(s.length)(t.length), symbols.toSeq)
  }

  /** Reference /root/reference/main.py:130-166 (`visualise_differences`):
    * greedy common-substring chaining over the RAW strings (the reference
    * deliberately does not normalize here — main.py:400). For successive
    * positions of s1, grow the longest substring (>= 2 chars) findable in the
    * remaining suffix of s2, consuming s2 monotonically.
    *
    * Deviation from the reference, by design (SURVEY.md §2.8 F4): the
    * reference feeds raw data through `re.search` as a regex pattern, which
    * breaks on metacharacters; we match literally (`indexOf`), which is the
    * intended behavior.
    *
    * Returns (matched splices, their [start, end) index ranges in s2).
    */
  def visualiseDifferences(s1: String, s2: String): (Seq[String], Seq[(Int, Int)]) = {
    var minIndex = 0
    val splices = scala.collection.mutable.ArrayBuffer.empty[String]
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var skipNeed = 0
    var index = 0
    while (index < s1.length) {
      if (skipNeed > 0) { skipNeed -= 1 }
      else if (index + 1 < s1.length) {
        var step = 1
        var last: Option[(Int, Int)] = None // span relative to s2.substring(minIndex)
        var chunk = s1.substring(index, index + step + 1)
        var continue = true
        while (continue) {
          val rel = s2.substring(minIndex).indexOf(chunk)
          if (rel >= 0) {
            skipNeed += 1
            last = Some((rel, rel + chunk.length))
            step += 1
            if (index + step == s1.length) {
              last.foreach { case (a, b) =>
                splices += s2.substring(minIndex + a, minIndex + b)
                ranges += ((minIndex + a, minIndex + b))
                minIndex += b
              }
              continue = false
            } else chunk = s1.substring(index, index + step + 1)
          } else {
            last.foreach { case (a, b) =>
              splices += s2.substring(minIndex + a, minIndex + b)
              ranges += ((minIndex + a, minIndex + b))
              minIndex += b
            }
            continue = false
          }
        }
      }
      index += 1
    }
    (splices.toSeq, ranges.toSeq)
  }

  /** Reference /root/reference/main.py:290-300 (`get_splices_with_indices`):
    * interleave matched splices (flag 1) with the unmatched gap text of s2
    * (flag 0), including head/tail gaps. The reference crashes on an empty
    * match list (main.py:292); we return the whole string as one unmatched
    * gap instead. */
  def splicesWithGaps(splices: Seq[String], ranges: Seq[(Int, Int)], s2: String): Seq[(Int, String)] = {
    if (ranges.isEmpty) return if (s2.isEmpty) Seq.empty else Seq((0, s2))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    if (ranges.head._1 != 0) out += ((0, s2.substring(0, ranges.head._1)))
    var i = 0
    while (i < splices.length) {
      out += ((1, splices(i)))
      if (i != splices.length - 1) out += ((0, s2.substring(ranges(i)._2, ranges(i + 1)._1)))
      i += 1
    }
    if (ranges.last._2 != s2.length) out += ((0, s2.substring(ranges.last._2)))
    out.toSeq
  }

  // ---- Column-level UDF wrappers (null in -> null out) ----

  /** struct<dist: int, symbols: array<int>> */
  val visualLevenshteinUdf = udf { (s: String, t: String) =>
    if (s == null || t == null) null else visualLevenshtein(s, t)
  }

  /** array<struct<flag: int, text: string>> — F4 chained into F5. */
  val diffSplicesUdf = udf { (s1: String, s2: String) =>
    if (s1 == null || s2 == null) null
    else {
      val (sp, rg) = visualiseDifferences(s1, s2)
      splicesWithGaps(sp, rg, s2)
    }
  }
}
