package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §4.3's
  * optional custom-Expression tier).
  *
  * The declared queries use higher-order functions (`aggregate` /
  * `zip_with`), which are correct but interpret a lambda per element.
  * These expressions generate a tight primitive loop inside
  * whole-stage codegen instead — the (b) tier of the extension
  * preference order (compose built-ins > custom Expression > custom
  * operator > mapPartitions).
  *
  * Numerics: identical to the HOF formulation — sequential index-order
  * accumulation of doubles, dot/(sqrt(n1)*sqrt(n2)) — so swapping them
  * into an oracle-matched query must not change a single bit.
  */

/** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns, accumulated in index order. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ARRAY<DOUBLE>; call sites (VectorExpressions) guarantee it
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cos(a,b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — one pass,
  * three accumulators, same op order as the declared-query formula. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be ARRAY<DOUBLE>; call sites (VectorExpressions) guarantee it
  override def dataType: DataType = DoubleType

  // cosine is UNDEFINED for a zero vector: declared NULL (adversarial-
  // tier find, r10 — the raw division yields NaN here but NULL in
  // DuckDB's 0/0, and Spark sorts NaN FIRST under DESC where both
  // engines sort NULL last, so a zero candidate ranked TOP of knn).
  // NULL needs no oracle change: DuckDB's arithmetic produces it
  // naturally, and both engines' default DESC null ordering agrees.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Both entry points coerce inputs to ARRAY<DOUBLE> (the expressions
    * read elements with getDouble and do no type checking of their own,
    * so a raw float32 array would be read with the wrong stride). */
  private def asDouble(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    Cast(e, ArrayType(DoubleType))

  /** Column-level API. */
  def dot_product(a: Column, b: Column): Column = GraftBridge.column(
    DotProduct(asDouble(GraftBridge.expression(a)), asDouble(GraftBridge.expression(b))))
  def cosine_sim(a: Column, b: Column): Column = GraftBridge.column(
    CosineSimilarity(asDouble(GraftBridge.expression(a)), asDouble(GraftBridge.expression(b))))

  /** SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(asDouble(exprs(0)), asDouble(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(asDouble(exprs(0)), asDouble(exprs(1))), "built-in")
  }
}
