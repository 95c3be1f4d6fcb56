package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count-Min sketch as a single custom aggregate (Cormode–Muthukrishnan
  * 2005): `depth × width` counters; item h increments one counter per
  * row at column `xxhash64(row, h) mod width`; a point estimate is the
  * MINIMUM of the item's `depth` counters — never an underestimate,
  * over by at most `ε·N` (ε ≈ e/width) with probability `1 − e^-depth`.
  *
  * The frequency workhorse at 100 TB: heavy-hitter detection without
  * the full `groupBy(term)` shuffle — the sketch is one fixed
  * `depth·width·8`-byte buffer through partial/final aggregation
  * regardless of cardinality, where the exact groupBy shuffles one
  * (term, count) pair per DISTINCT term. Pair with an exact
  * second-pass filter on the sketch's candidates when exactness on
  * the head is needed.
  *
  * Row seeds replicate `xxhash64(lit(d), h)` exactly (Spark folds
  * arguments left-to-right from seed 42), so the POINT-ESTIMATE side
  * needs no custom expression at all — `CountMinAgg.cms_estimate`
  * composes built-in codegen'd `xxhash64`/`pmod`/`element_at`/`least`
  * over the sketch array. CmsSpec asserts the cross-form contract
  * (estimate ≥ exact everywhere, merge == single-pass).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       weight: Option[Expression] = None,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(depth > 0 && depth <= 16, s"cms_sketch depth must be in [1,16], got $depth")
  require(width > 0, s"cms_sketch width must be positive, got $width")
  // depth*width Longs must allocate as one positive-Int-length array
  // (buffer, serialize's *8 byte count, and cms_estimate's element_at
  // index all assume it) — fail loudly instead of a
  // NegativeArraySizeException deep in aggregation
  require(depth.toLong * width <= Int.MaxValue / 8,
    s"cms_sketch depth*width must be <= ${Int.MaxValue / 8}, got ${depth.toLong * width}")

  override def inputTypes = Seq.fill(children.length)(LongType)

  // seed chain per row: hash(d, IntegerType, 42) — identical to the
  // MinHashAgg permutation seeds, which is what lets cms_estimate use
  // the built-in xxhash64(lit(d), h)
  private lazy val rowSeeds: Array[Long] =
    Array.tabulate(depth)(d => XxHash64Function.hash(d, IntegerType, 42L))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // weighted form: one (hash, count) row counts as `count`
      // occurrences — build the sketch from a pre-aggregated term
      // table at 1/distinct-fraction of the row volume. NULL or
      // negative weights contribute nothing (CMS counters must stay
      // monotone for the one-sided-error contract).
      val w: Long = weight match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case x: Long => math.max(x, 0L)
          // the analyzer coerces to BIGINT via ImplicitCastInputTypes;
          // only direct construction (no analysis) can land here — fail
          // with the type, not an opaque MatchError mid-aggregation
          case other => throw new IllegalArgumentException(
            s"cms_sketch weight must evaluate to Long, got " +
              s"${other.getClass.getName} ($other)")
        }
      }
      if (w > 0L) {
        val h0 = v.asInstanceOf[Long]
        var d = 0
        while (d < depth) {
          val idx = java.lang.Math.floorMod(
            XxHash64Function.hash(h0, LongType, rowSeeds(d)), width.toLong).toInt
          buf(d * width + idx) += w
          d += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child +: weight.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head, weight = newChildren.lift(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "cms_sketch"
}

object CountMinAgg {
  import org.apache.spark.sql.functions._

  /** Column API: `cms_sketch(itemHash, depth, width)` → ARRAY<BIGINT>
    * of `depth·width` counters (row-major). */
  def cms_sketch(itemHash: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(itemHash), depth, width)
        .toAggregateExpression())

  /** Weighted build: each (itemHash, weight) row counts as `weight`
    * occurrences — bit-identical to the unweighted sketch over the
    * exploded rows (CmsSpec), at the pre-aggregated table's row count
    * instead of the corpus's. */
  def cms_sketch_weighted(itemHash: Column, weight: Column,
                          depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(itemHash), depth, width,
        Some(GraftBridge.expression(weight)))
        .toAggregateExpression())

  /** Point estimate from a sketch column: min over rows of the item's
    * counter. Pure built-in expressions (codegen'd end to end) — the
    * row index replicates the aggregate's seed chain via
    * `xxhash64(lit(d), h)`; `element_at` is 1-based.
    *
    * Guarded against (depth, width) disagreeing with the sketch the
    * column actually holds: out-of-range `element_at` returns NULL,
    * `least` skips NULLs, and the min over the surviving rows can
    * UNDERESTIMATE — silently breaking the one-sided-error contract.
    * The `size` check turns that into a loud per-row error instead
    * (evaluated once per estimate row; the sketch is normally a 1-row
    * broadcast, so the cost is nil). */
  def cms_estimate(sketch: Column, itemHash: Column, depth: Int, width: Int): Column = {
    require(depth > 0 && depth <= 16, s"cms_estimate depth must be in [1,16], got $depth")
    require(width > 0, s"cms_estimate width must be positive, got $width")
    require(depth.toLong * width <= Int.MaxValue / 8,
      s"cms_estimate depth*width must be <= ${Int.MaxValue / 8}, got ${depth.toLong * width}")
    // itemHash cast to BIGINT explicitly: the aggregate's analyzer
    // coercion hashes its input AS LongType, and xxhash64 hashes each
    // argument by its natural type — an INT hash column here would
    // index different counters than the sketch's and silently
    // UNDERestimate, breaking the one-sided-error contract
    val rows = (0 until depth).map { d =>
      element_at(sketch,
        (pmod(xxhash64(lit(d), itemHash.cast("long")), lit(width.toLong)) +
          lit(d.toLong * width) + lit(1L)).cast("int"))
    }
    val est = if (rows.size == 1) rows.head else least(rows: _*)
    // NULL sketch (e.g. a left join with no sketch row for the group)
    // stays NULL — only a PRESENT sketch of the wrong size is an error
    when(sketch.isNull, lit(null).cast("long"))
      .when(size(sketch) === lit(depth * width), est)
      .otherwise(raise_error(concat(
        lit(s"cms_estimate(depth=$depth, width=$width) over a sketch of "),
        size(sketch).cast("string"),
        lit(s" counters (expected ${depth * width})"))))
  }
}
