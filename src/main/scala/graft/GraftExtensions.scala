package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{CosineSimilarity, CountMinAgg, DotProduct, MinHashAgg}
import graft.plans.AsOf

/** One-line installation of graft's engine extensions — the idiomatic
  * packaging for a Spark-native library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or in code:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Installs:
  *  - the AsOfJoin planner strategy (plans.AsOfJoinPlan → merge exec);
  *  - SQL functions `dot_product(a, b)` and `cosine_sim(a, b)` over
  *    ARRAY<DOUBLE> (inputs auto-cast), backed by the codegen
  *    expressions;
  *  - the aggregate `minhash_sig(h, numPerm)` — one-pass MinHash
  *    signature over 64-bit shingle hashes (TypedImperativeAggregate);
  *  - the aggregate `cms_sketch(h, depth, width)` — Count-Min sketch
  *    counters (point estimates via `CountMinAgg.cms_estimate`, which
  *    is plain built-in SQL over the array).
  *
  * (Queries built through the `AsOf.join` / `VectorExpressions` Scala
  * APIs self-register on first use; this class exists so plain-SQL
  * users and spark-submit deployments get the same surface.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def asDouble(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  private def binary(name: String, exprs: Seq[Expression])
      (mk: (Expression, Expression) => Expression): Expression = {
    require(exprs.length == 2,
      s"$name requires exactly 2 arguments, got ${exprs.length}")
    mk(asDouble(exprs(0)), asDouble(exprs(1)))
  }

  // shared by every injected aggregate that takes literal int params
  // (buffer sizes must be known at construction, not per-row)
  private def intLit(fn: String, what: String)(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOf.AsOfStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => binary("dot_product", exprs)(DotProduct.apply)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => binary("cosine_sim", exprs)(CosineSimilarity.apply)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"minhash_sig requires (hash, numPerm), got ${exprs.length} args")
        MinHashAgg(exprs.head,
          intLit("minhash_sig", "numPerm")(exprs(1))).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"cms_sketch requires (hash, depth, width), got ${exprs.length} args")
        CountMinAgg(exprs.head, intLit("cms_sketch", "depth")(exprs(1)),
          intLit("cms_sketch", "width")(exprs(2))).toAggregateExpression()
      }))
  }
}
