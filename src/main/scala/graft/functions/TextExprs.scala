package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel for shingle construction, shared by the interpreted and
  * codegen paths of [[DistinctWordShingles]]. Semantics are identical to the
  * built-in composition
  * `array_distinct(transform(sequence(...), i -> array_join(slice(tokens, i+1, k), " ")))`
  * over `filter(split(text, " "), t -> length(t) > 0)` — verified
  * property-style in TextAnalysisSpec — but in ONE pass with no intermediate
  * arrays. The HOF composition evaluates every lambda on Catalyst's
  * interpreted path (tree-walk + closure per element), which measured ~0.4 ms
  * per ~300-char document; this kernel is ~50x cheaper and keeps the
  * surrounding operators inside whole-stage codegen.
  */
object TextKernels {

  def distinctShingles(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, toks.length * 2))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

/** `distinct_word_shingles(text, k)`: the DISTINCT set of k-token shingles
  * (consecutive whitespace tokens joined by single spaces), first-occurrence
  * order, empty array when the document has fewer than k tokens. */
case class DistinctWordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.distinctShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.distinctShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** Column API for [[DistinctWordShingles]]. */
  def distinctShingles(text: Column, k: Int = 3): Column =
    bridge.column(DistinctWordShingles(bridge.expression(text), k))
}
