package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bucket index of `key` within a sorted (ascending) boundary array — the
  * per-row half of an equi-depth range bucketing (boundaries come from
  * `percentile_approx`). Binary search, O(log parts) per row, codegen'd:
  * the interpreted `aggregate()` HOF formulation this replaces scanned all
  * parts-1 boundaries per row, which at cluster-scale partition counts
  * (10^3-10^4) puts an O(parts) interpreted loop inside the hot path.
  *
  * Semantics (matching `Window.orderBy` placement so per-bucket row_numbers
  * concatenate into a global ordering):
  *  - ascending:  bucket = #(bounds <= key); null key -> first or last
  *    bucket per `nullsFirst` (Spark default: asc = NULLS FIRST).
  *  - descending: bucket = #(bounds >= key), so bucket ids still ascend in
  *    output order (largest keys -> bucket 0); null key per `nullsFirst`
  *    (Spark default: desc = NULLS LAST).
  *  - null bounds array (empty/all-null input): everything -> bucket 0.
  *  - NaN key: Spark's total order puts NaN above every double, so NaN
  *    belongs in the extreme-value bucket (asc -> n, desc -> 0). A plain
  *    binary search would strand it at the wrong end (every NaN comparison
  *    is false), silently mis-numbering rows relative to other buckets.
  *    Callers must keep NaN out of the boundary array itself (see
  *    RunningCount.quantileBuckets) — a NaN bound breaks the search's
  *    sortedness invariant.
  *
  * Never null-producing: a bucket id exists for every row.
  */
case class BucketIndex(
    left: Expression,
    right: Expression,
    descending: Boolean,
    nullsFirst: Boolean)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_index needs (double, array<double>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val boundsAny = right.eval(input)
    if (boundsAny == null) return 0
    val bounds = boundsAny.asInstanceOf[ArrayData]
    val n = bounds.numElements()
    val keyAny = left.eval(input)
    if (keyAny == null) return if (nullsFirst) 0 else n
    val k = keyAny.asInstanceOf[Double]
    if (java.lang.Double.isNaN(k)) return if (descending) 0 else n
    var lo = 0
    var hi = n
    if (!descending) {
      // first index with bounds[i] > k  ==  #(bounds <= k)
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds.getDouble(mid) <= k) lo = mid + 1 else hi = mid
      }
      lo
    } else {
      // n - (first index with bounds[i] >= k)  ==  #(bounds >= k)
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bounds.getDouble(mid) < k) lo = mid + 1 else hi = mid
      }
      n - lo
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val cmp = if (!descending) s"<= ${leftGen.value}" else s"< ${leftGen.value}"
    val result = if (!descending) lo else s"$n - $lo"
    val nullBucket = if (nullsFirst) "0" else n
    val nanBucket = if (descending) "0" else n
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        |${leftGen.code}
        |${rightGen.code}
        |int ${ev.value} = 0;
        |if (!${rightGen.isNull}) {
        |  int $n = ${rightGen.value}.numElements();
        |  if (${leftGen.isNull}) {
        |    ${ev.value} = $nullBucket;
        |  } else if (java.lang.Double.isNaN(${leftGen.value})) {
        |    ${ev.value} = $nanBucket;
        |  } else {
        |    int $lo = 0, $hi = $n;
        |    while ($lo < $hi) {
        |      int $mid = ($lo + $hi) >>> 1;
        |      if (${rightGen.value}.getDouble($mid) $cmp) $lo = $mid + 1; else $hi = $mid;
        |    }
        |    ${ev.value} = $result;
        |  }
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BucketIndex =
    copy(left = l, right = r)
}

/** 2-D Hilbert-curve index of two non-negative `bits`-bit values — the
  * space-filling-curve clustering key with strictly better locality than
  * the Morton/Z-order interleave ([[graft.sources.Layouts.zorderKey]]):
  * every unit step along the Hilbert curve moves one cell in exactly one
  * dimension (no Z-shape jumps), so range-written files cover tighter
  * rectangles and min/max footer skipping prunes more under two-column
  * predicates.
  *
  * The classic iterative xy2d walk (Hamilton's formulation): per level s =
  * 2^(bits−1) … 1, quadrant id (3·rx) XOR ry accumulates s² cells, then
  * the frame rotates/reflects. Pure integer compares/shifts in a tight
  * generated loop — codegen'd like [[BucketIndex]], no HOF lambda frames.
  * Callers pass values already reduced to `bits` bits (bucket ids,
  * `pmod`s — the [[graft.sources.Layouts.zorderKeyN]] contract); higher
  * bits are masked off by construction. The same walk is replayable as a
  * recursive CTE, which is how the DuckDB oracle checks it. */
case class HilbertKey(
    left: Expression,
    right: Expression,
    bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!(bits >= 1 && bits <= 31))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_key bits out of [1, 31]: $bits")
    else if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert_key needs integral inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = toLong(a) & mask
    var y = toLong(b) & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1
      s"""
         |long $x = ((long) $a) & ${mask}L;
         |long $y = ((long) $b) & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertKey =
    copy(left = l, right = r)
}
