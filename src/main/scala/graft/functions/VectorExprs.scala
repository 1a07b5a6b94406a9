package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (ARRAY<FLOAT> /
  * ARRAY<DOUBLE> columns).
  *
  * Why expressions and not higher-order functions: Spark's `aggregate` /
  * `zip_with` lambdas are evaluated on the interpreted path (one closure
  * call per element, boxed lambda variables) and break whole-stage codegen
  * for the surrounding operators. A pairwise similarity scan evaluates the
  * kernel O(n·m) times, so the kernel must stay inside codegen: these
  * expressions emit a tight primitive `for` loop via `doGenCode` and fuse
  * dot + both norms into ONE pass over the vectors.
  *
  * Numerics: elements are upcast to double and accumulated left-to-right,
  * exactly like the `aggregate(zip_with(...))` formulation they replace and
  * like DuckDB's `list_inner_product` over `DOUBLE[]` — so DuckDB-oracle
  * hashes are unchanged (values are bit-identical).
  */
object VectorExprs {

  private[functions] def checkVecTypes(e: BinaryExpression): TypeCheckResult =
    (e.left.dataType, e.right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${e.prettyName} expects two ARRAY<FLOAT|DOUBLE> args, " +
          s"got ${e.left.dataType.sql} and ${e.right.dataType.sql}")
    }

  /** per-element read returning double, for interpreted eval */
  private[functions] def reader(dt: DataType): (ArrayData, Int) => Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case _ => (a, i) => a.getDouble(i)
    }

  /** per-element read as Java source, for codegen */
  private[functions] def readerSrc(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  /** `sum(x_i * y_i)` over the common prefix of the two arrays. */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** `dot(a,b) / (|a| * |b|)`, one fused pass; NaN on a zero vector
    * (same as the divide-by-zero the unfused form produces). */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = VectorExprs.checkVecTypes(this)
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val rx = VectorExprs.reader(left.dataType); val ry = VectorExprs.reader(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += rx(x, i) * ry(y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VectorExprs.readerSrc(left.dataType, x, i)} * ${VectorExprs.readerSrc(right.dataType, y, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = VectorExprs.checkVecTypes(this)
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val rx = VectorExprs.reader(left.dataType); val ry = VectorExprs.reader(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0; var i = 0
    while (i < n) {
      val xv = rx(x, i); val yv = ry(y, i)
      sxy += xv * yv; sxx += xv * xv; syy += yv * yv
      i += 1
    }
    sxy / (math.sqrt(sxx) * math.sqrt(syy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val sxy = ctx.freshName("sxy"); val sxx = ctx.freshName("sxx")
      val syy = ctx.freshName("syy")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $sxy = 0.0; double $sxx = 0.0; double $syy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${VectorExprs.readerSrc(left.dataType, x, i)};
         |  double $yv = ${VectorExprs.readerSrc(right.dataType, y, i)};
         |  $sxy += $xv * $yv; $sxx += $xv * $xv; $syy += $yv * $yv;
         |}
         |${ev.value} = $sxy / (java.lang.Math.sqrt($sxx) * java.lang.Math.sqrt($syy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
