package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the text hot path (the §4.3 tier the
  * vector expressions already occupy).
  *
  * The BPE-ish token estimate was formulated as
  * `aggregate(transform(split(text,' '), t -> ceil(length(t)/4)), 0, +)`
  * — correct, but higher-order functions interpret their lambda per
  * element AND materialize the split array per row. On the packing /
  * token-accounting path that is the per-row cost at 100 TB. This
  * expression computes the identical value in ONE pass over the
  * string's UTF-8 bytes inside whole-stage codegen: split on the space
  * byte (0x20 — never a UTF-8 continuation byte, so byte-splitting is
  * code-point-safe), count code points per run (continuation bytes
  * skipped, matching `length()`'s numChars), add ceil(run/charsPerTok).
  * Empty runs (consecutive/leading/trailing spaces) contribute
  * ceil(0/4) = 0 exactly as the HOF form's empty split tokens do.
  * Equality with the HOF formulation is property-tested in
  * TextExpressionsSpec — swapping it into an oracle-matched query must
  * not change a single value. */
case class BpeTokenCount(child: Expression, charsPerTok: Int)
    extends UnaryExpression {

  require(charsPerTok > 0, s"charsPerTok must be positive, got $charsPerTok")

  // input must be STRING; the call site (TextExpressions) casts
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeCount(input.asInstanceOf[UTF8String], charsPerTok)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.bpeCount($c, $charsPerTok);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Static kernel the generated code calls (kept outside the case-class
  * companion so the codegen call target is an unambiguous static). */
object TextKernels {
  def bpeCount(s: UTF8String, charsPerTok: Int): Long = {
    val b = s.getBytes
    var total = 0L
    var run = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == 0x20) {
        if (run > 0) { total += (run + charsPerTok - 1) / charsPerTok; run = 0 }
      } else if ((c & 0xC0) != 0x80) run += 1 // leading byte = one code point
      i += 1
    }
    if (run > 0) total += (run + charsPerTok - 1) / charsPerTok
    total
  }
}

object TextExpressions {
  import org.apache.spark.sql.catalyst.expressions.Cast

  /** Column API: one-pass codegen'd BPE-ish token count. */
  def bpe_token_count(text: Column, charsPerTok: Int = 4): Column =
    GraftBridge.column(BpeTokenCount(
      Cast(GraftBridge.expression(text), StringType), charsPerTok))

  /** SQL registration: `SELECT bpe_token_count(text)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_token_count",
      exprs => BpeTokenCount(Cast(exprs.head, StringType), 4), "built-in")
}
