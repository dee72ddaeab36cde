package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two float/double arrays: ONE traversal
  * accumulating dot, |a|², |b|² left-to-right, then dot / (√|a|²·√|b|²).
  *
  * Why an Expression and not `zip_with`+`aggregate`: Spark's higher-order
  * functions don't participate in codegen (interpreted `ArrayTransform` /
  * `ArrayAggregate` eval, with a fresh lambda frame per element) and the
  * HOF formulation re-computes both norms per pair — measured 175s for a
  * 500×500 pair scan at sf0.01. This expression does the whole thing in a
  * tight generated loop; the accumulation order (array order, left fold)
  * is exactly DuckDB's `list_sum`, keeping the oracle bit-identical.
  *
  * Fails fast on a length mismatch (same policy as [[HyperplaneBucket]]):
  * silently truncating to the shorter vector returns a plausible-looking
  * but wrong similarity for ragged embeddings.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @inline private def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_similarity: array length mismatch ($n vs ${y.numElements()})")
    val lf = isFloatArr(left); val rf = isFloatArr(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = elemAt(x, i, lf); val yv = elemAt(y, i, rf)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloatArr(left)) "getFloat" else "getDouble"
    val rGet = if (isFloatArr(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_similarity: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.$lGet($i);
         |  double $yv = (double) $b.$rGet($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Fused random-hyperplane LSH bucket id: all plane dot products in ONE
  * traversal of the vector (bit i = v·plane_i >= 0). Composing this from
  * per-plane dot() columns re-evaluates the HOF dot chain once per plane —
  * and the multi-probe explode then inlines the whole bucket expression per
  * probe. Fails fast on a dimension mismatch (a zip-padded null would
  * silently send every vector to bucket 0). */
case class HyperplaneBucket(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    planes: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val dim = if (planes.isEmpty) 0 else planes(0).length

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket needs array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"hyperplaneBucket: vector dim != plane dim $dim (size=$n)")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * plane(j); j += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): HyperplaneBucket =
    copy(child = c)
}

/** The `n` nearest centroid indices for a vector, ordered by (squared
  * euclidean distance, index) — the IVF coarse-quantizer assignment (n=1 for
  * corpus cells) and probe list (n=nprobe for queries) in ONE traversal.
  *
  * Replaces Spark ML's `model.transform` for assignment on purpose: ML uses
  * `fastSquaredDistance` (norm-cached ‖a‖²−2a·b+‖b‖² with a precision
  * fallback), whose rounding near cell boundaries an independent SQL oracle
  * cannot reproduce. Here the distance is the plain left-fold
  * Σ(v_i−c_i)² in array order — bit-identical to DuckDB's
  * `list_sum(list_transform(list_zip(e, ctr), z -> (z[1]-z[2])*(z[1]-z[2])))`
  * — so cell assignment, probe sets, and therefore the whole IVF result are
  * verifiable cross-engine. Ties break toward the smaller index, matching
  * `ORDER BY d, cell` in the oracle. */
case class NearestCells(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: Array[Array[Double]],
    n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val dim = if (centroids.isEmpty) 0 else centroids(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len != dim)
      throw new IllegalArgumentException(
        s"nearestCells: vector dim != centroid dim $dim (size=$len)")
    val v = new Array[Double](len)
    var i = 0
    while (i < len) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val k = centroids.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ctr = centroids(c)
      var acc = 0.0
      var j = 0
      while (j < len) { val x = v(j) - ctr(j); acc += x * x; j += 1 }
      d(c) = acc
      c += 1
    }
    // stable ascending sort of indices by distance (ties keep index order)
    val order = Array.range(0, k).sortWith { (a, b) =>
      java.lang.Double.compare(d(a), d(b)) match {
        case 0 => a < b
        case cmp => cmp < 0
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      order.take(math.min(n, k)).map(Int.box))
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NearestCells =
    copy(child = c)
}

/** Nearest-centroid by COSINE against an in-plan centroid array — the
  * native form of [[graft.operators.Similarity.assignToCentroids]]'s fold.
  * `right` is the broadcast one-row `array<struct<cid: long, cv: array>>`
  * (cid-sorted); the result is the cid of the first maximum cosine in
  * array order (strict `>`, so ties keep the LOWEST cid, and an all-NaN
  * row — e.g. a zero vector — returns the -1 sentinel), bit-matching the
  * `aggregate` HOF formulation it replaces (kept as the spec's reference)
  * and the DuckDB oracle's `ORDER BY cos DESC, cid`. Per-centroid cosine
  * uses the same left-fold accumulation as [[CosineSimilarity]].
  *
  * Why native: the HOF fold evaluates interpreted with a lambda frame per
  * centroid per row — measured 1.14 s / 200k rows at k=8 and linear in k
  * (`tools/AssignProbe`); this loop does the whole row in one call. */
case class NearestCentroid(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private lazy val vecIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val centIsFloat = right.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    right.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == LongType &&
            vecOk(fields(1).dataType) && vecOk(left.dataType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_centroid needs (array<float|double>, " +
            s"array<struct<bigint, array<float|double>>>), got ${left.dataType} / ${right.dataType}")
    }
  }

  // The centroid argument is a broadcast one-row array: every row of a
  // partition reads the SAME underlying bytes, but each read wraps them in
  // a fresh UnsafeArrayData, so the cache is keyed on (base object
  // identity, offset, size) — stable across rows — with plain instance
  // identity as the fallback for non-unsafe ArrayData. A key miss just
  // re-decodes: pure caching, never a correctness dependence.
  @transient private var cachedRef: AnyRef = _
  @transient private var cachedOffset: Long = -1L
  @transient private var cachedSize: Int = -1
  @transient private var cachedIds: Array[Long] = _
  @transient private var cachedVecs: Array[Array[Double]] = _
  @transient private var cachedNorm2: Array[Double] = _

  private def cacheHit(cents: ArrayData): Boolean = cents match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      (u.getBaseObject.asInstanceOf[AnyRef] eq cachedRef) &&
        u.getBaseOffset == cachedOffset && u.getSizeInBytes == cachedSize
    case other => other.asInstanceOf[AnyRef] eq cachedRef
  }

  private def decodeCents(cents: ArrayData): Unit = {
    val k = cents.numElements()
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Double]](k)
    val n2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val st = cents.getStruct(c, 2)
      ids(c) = st.getLong(0)
      val cvArr = st.getArray(1)
      val m = cvArr.numElements()
      val cv = new Array[Double](m)
      var j = 0
      var acc = 0.0
      while (j < m) {
        cv(j) = if (centIsFloat) cvArr.getFloat(j).toDouble else cvArr.getDouble(j)
        acc += cv(j) * cv(j)
        j += 1
      }
      vecs(c) = cv; n2(c) = acc
      c += 1
    }
    cents match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        cachedRef = u.getBaseObject.asInstanceOf[AnyRef]
        cachedOffset = u.getBaseOffset; cachedSize = u.getSizeInBytes
      case other =>
        cachedRef = other.asInstanceOf[AnyRef]; cachedOffset = -1L; cachedSize = -1
    }
    cachedIds = ids; cachedVecs = vecs; cachedNorm2 = n2
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vArr = a.asInstanceOf[ArrayData]
    val n = vArr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (vecIsFloat) vArr.getFloat(i).toDouble else vArr.getDouble(i)
      i += 1
    }
    val cents = b.asInstanceOf[ArrayData]
    if (!cacheHit(cents)) decodeCents(cents)
    val ids = cachedIds; val vecs = cachedVecs; val n2 = cachedNorm2
    val k = ids.length
    var bestCid = -1L
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val cv = vecs(c)
      if (cv.length != n)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector dim $n != centroid dim ${cv.length} (cid=${ids(c)})")
      var dot = 0.0; var na = 0.0
      var j = 0
      while (j < n) {
        val xv = v(j)
        dot += xv * cv(j); na += xv * xv
        j += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(n2(c)))
      if (cos > bestCos) { bestCos = cos; bestCid = ids(c) }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroid =
    copy(left = l, right = r)
}

/** Fused Johnson–Lindenstrauss ±1 sign projection: quantize each component
  * ONCE to round(x·1000) (the exact BigDecimal HALF_UP walk Spark's own
  * `round()` takes on doubles, so this expression is bit-identical to the
  * HOF formulation the oracle replays), then every output coordinate is a
  * signed integer sum — one traversal, k long accumulators, zero float
  * accumulation.
  *
  * Why native: the `zip_with`+`aggregate` HOF form re-quantizes the vector
  * once PER OUTPUT DIM with a lambda frame and an ArrayData alloc per
  * element — measured ~180 µs/row at (dim=64, k=8), 9.0 s for the sf1
  * embeddings scan that this expression exists to keep at scan speed. */
case class SignProject(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    signs: Array[Array[Long]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_project needs array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SignProject.project(input.asInstanceOf[ArrayData], signs, isFloat)

  // genuine whole-stage participation (not CodegenFallback's per-row
  // interpreted eval + boxing): the generated code calls one static
  // compiled kernel, keeping the surrounding stage fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignProject.project($c, $signsRef, $isFloat);")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): SignProject =
    copy(child = c)
}

object SignProject {
  /** The projection kernel, shared by interpreted eval and generated
    * code: quantize once to round(x·1000) fixed-point (Spark
    * Round(double, 0) semantics exactly — decimal HALF_UP on the shortest
    * string form via BigDecimal.valueOf, not binary rint), then each
    * output coordinate is a signed integer sum. */
  def project(arr: ArrayData, signs: Array[Array[Long]], isFloat: Boolean): ArrayData = {
    val dim = if (signs.isEmpty) 0 else signs(0).length
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"projectSignsQuantized: vector dim != sign dim $dim (size=$n)")
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = java.math.BigDecimal.valueOf(x * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    val k = signs.length
    val out = new Array[Long](k)
    var p = 0
    while (p < k) {
      val row = signs(p)
      var acc = 0L
      var j = 0
      while (j < n) { acc += q(j) * row(j); j += 1 }
      out(p) = acc
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** |A ∩ B| of two SORTED long arrays by two-pointer merge — O(|A|+|B|)
  * with zero allocation, vs `size(array_intersect(...))` which builds a
  * hash set per call and materializes the intersection array only to
  * measure it. The hot inner op of adjacency-intersection triangle
  * counting ([[graft.operators.Graph.triangleCount]]), where it runs once
  * per edge over Σdeg² total elements. Callers own the sortedness
  * precondition (both sides produced by `sort_array`); duplicate elements
  * are counted min(multiplicity) times, exactly like a sorted-merge
  * would — adjacency lists are sets, so the case does not arise there. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private lazy val isString = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // both sides the SAME element type: long ids (triangle adjacency) or
    // strings (r18: shingle sets — UTF8String.compareTo is the binary
    // order sort_array uses for StringType, so the merge is consistent)
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) |
           (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sorted_intersect_count needs two array<bigint> or two " +
            s"array<string>, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    if (isString) {
      while (i < n && j < m) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp < 0) i += 1
        else if (cmp > 0) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    } else {
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val body = if (isString) {
        val cmp = ctx.freshName("cmp")
        s"""
           |int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |if ($cmp < 0) { $i++; } else if ($cmp > 0) { $j++; }
           |else { $c++; $i++; $j++; }
         """.stripMargin
      } else {
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |long $xv = $a.getLong($i); long $yv = $b.getLong($j);
           |if ($xv < $yv) { $i++; } else if ($xv > $yv) { $j++; }
           |else { $c++; $i++; $j++; }
         """.stripMargin
      }
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  $body
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Exact covariance MOMENTS of a quantized (long) vector column, as a
  * one-pass mergeable native aggregate — the scale shape for a PCA /
  * correlation census. The composed formulation (per-row HOF generating
  * d(d+1)/2 product structs, exploded through a keyed agg) pays the
  * interpreted-lambda tax times d²/2 AND pushes n·d²/2 rows through the
  * aggregate hashmap — measured 52 s at sf1 for d=64; this aggregate does
  * ONE update call per vector, a tight j≤k product loop into a flat
  * buffer.
  *
  * Exactness: Σqⱼqₖ accumulates in TWO'S-COMPLEMENT 128-BIT (hi, lo)
  * pairs — products of quantized components bounded by |q| < 3.03e9
  * (guarded per element, one check per component) fit a long; their SUM
  * does not at petabyte row counts, and a double would forfeit the
  * hash-gate contract. Σqⱼ rides plain longs (overflow needs ~10¹² rows
  * in ONE partition). Output: one array of d(d+1)/2 structs
  * (j, k, n, p = Σqⱼqₖ as DECIMAL(38,0), sj, sk) — explode and derive
  * `cov_num = n·p − sj·sk` declaratively. Merged across partials by
  * element-wise 128-bit addition, so map-side combine applies and the
  * shuffle carries one census per partition, never rows. */
case class CovMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[CovMoments.State]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(dim >= 2 && dim <= 1024, s"dim in [2, 1024]: $dim")

  private val tri = dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("p", DecimalType(38, 0), nullable = false),
    StructField("sj", LongType, nullable = false),
    StructField("sk", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CovMoments.State =
    new CovMoments.State(dim, tri)

  override def update(st: CovMoments.State, input: org.apache.spark.sql.catalyst.InternalRow): CovMoments.State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"cov_moments: vector length ${arr.numElements()} != dim $dim")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        val x = arr.getLong(i)
        require(x > -3037000499L && x < 3037000499L,
          s"cov_moments: |q|=$x too large — product would overflow a long")
        q(i) = x
        i += 1
      }
      st.n += 1
      var j = 0
      var t = 0
      while (j < dim) {
        st.s(j) += q(j)
        val qj = q(j)
        var k = j
        while (k < dim) {
          val p = qj * q(k)
          // two's-complement 128-bit add of p into (hi(t), lo(t))
          val lo0 = st.lo(t)
          val lo1 = lo0 + p
          val carry = ((lo0 & p) | ((lo0 | p) & ~lo1)) >>> 63
          st.lo(t) = lo1
          st.hi(t) += (p >> 63) + carry
          k += 1
          t += 1
        }
        j += 1
      }
    }
    st
  }

  override def merge(a: CovMoments.State, b: CovMoments.State): CovMoments.State = {
    a.n += b.n
    var i = 0
    while (i < dim) { a.s(i) += b.s(i); i += 1 }
    var t = 0
    while (t < tri) {
      val lo0 = a.lo(t)
      val lo1 = lo0 + b.lo(t)
      val carry = ((lo0 & b.lo(t)) | ((lo0 | b.lo(t)) & ~lo1)) >>> 63
      a.lo(t) = lo1
      a.hi(t) += b.hi(t) + carry
      t += 1
    }
    a
  }

  override def eval(st: CovMoments.State): Any = {
    val out = new Array[Any](tri)
    var j = 0
    var t = 0
    while (j < dim) {
      var k = j
      while (k < dim) {
        val bytes = new Array[Byte](16)
        var b = 0
        while (b < 8) {
          bytes(b) = (st.hi(t) >>> (56 - 8 * b)).toByte
          bytes(b + 8) = (st.lo(t) >>> (56 - 8 * b)).toByte
          b += 1
        }
        val dec = org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(bytes)), 38, 0)
        out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](j, k, st.n, dec, st.s(j), st.s(k)))
        k += 1
        t += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(st: CovMoments.State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * dim + 16 * tri)
    bb.putLong(st.n)
    var i = 0
    while (i < dim) { bb.putLong(st.s(i)); i += 1 }
    var t = 0
    while (t < tri) { bb.putLong(st.hi(t)); bb.putLong(st.lo(t)); t += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMoments.State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val st = new CovMoments.State(dim, tri)
    st.n = bb.getLong
    var i = 0
    while (i < dim) { st.s(i) = bb.getLong; i += 1 }
    var t = 0
    while (t < tri) { st.hi(t) = bb.getLong; st.lo(t) = bb.getLong; t += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CovMoments =
    copy(child = c)
}

object CovMoments {
  /** Flat moment buffer: n, per-dim Σq, per-pair 128-bit Σqq. */
  final class State(dim: Int, tri: Int) {
    var n: Long = 0L
    val s: Array[Long] = new Array[Long](dim)
    val hi: Array[Long] = new Array[Long](tri)
    val lo: Array[Long] = new Array[Long](tri)
  }
}

/** PQ subspace code: the argmin codeword id over ONE subspace window of the
  * vector — the native form of the `aggregate`-HOF argmin in
  * [[graft.operators.Similarity]]'s `pqCodeColumns` (kept there as the
  * spec's reference semantics). `codebook` is the broadcast one-row
  * `array<struct<cid: long, cv: array<double>>>` for subspace j; the
  * distance is the left-fold Σ(v_{start+i} − cv_i)² in array order
  * (bit-identical to the HOF / DuckDB `list_sum ∘ list_zip`), the winner
  * is the FIRST strict improvement in array order (ties keep the earliest,
  * i.e. lowest-cid entry of the cid-sorted codebook), and the sentinel is
  * −1: a window that extends past the vector, or contains a null element,
  * or an all-NaN distance row can never strictly beat +∞ — exactly the
  * HOF's null/NaN propagation (NaN compares greatest, Java
  * `Double.compare` semantics, matching Catalyst's double ordering).
  * A codeword whose length differs from the effective window length is
  * skipped for the same reason (`zip_with` null-pads the shorter side).
  * `positional = true` returns the winner's 0-based INDEX in the
  * cid-sorted codebook array instead of its cid (same argmin, same
  * sentinel) — the ADC paths key their distance tables by position so
  * the per-pair lookup is an O(1) array index instead of an O(k) map
  * scan; cid and index name the same codeword because both sides read
  * the SAME sort_array'd codebook row.
  *
  * Why native: the HOF evaluates interpreted — one lambda frame per
  * codeword per row, a fresh zip array per distance — measured ~1.3 s per
  * corpus pass at sf0.1 (m=8, k=32); this loop does the whole row's
  * subspace in one call against a per-task decoded codebook cache (the
  * [[NearestCentroid]] caching discipline). */
case class PqCode(
    left: Expression,
    right: Expression,
    start: Int,
    len: Int,
    positional: Boolean = false)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private lazy val vecIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val cvIsFloat = right.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    right.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == LongType &&
            vecOk(fields(1).dataType) && vecOk(left.dataType) && start >= 0 && len >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_code needs (array<float|double>, array<struct<bigint, " +
            s"array<float|double>>>, start >= 0, len >= 1), got ${left.dataType} / " +
            s"${right.dataType} / $start / $len")
    }
  }

  // per-task decoded-codebook cache — the [[NearestCentroid]] discipline:
  // keyed on (base object identity, offset, size) for unsafe arrays, plain
  // identity otherwise; a miss just re-decodes (pure caching).
  @transient private var cachedRef: AnyRef = _
  @transient private var cachedOffset: Long = -1L
  @transient private var cachedSize: Int = -1
  @transient private var cachedIds: Array[Long] = _
  @transient private var cachedVecs: Array[Array[Double]] = _

  private def cacheHit(cb: ArrayData): Boolean = cb match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      (u.getBaseObject.asInstanceOf[AnyRef] eq cachedRef) &&
        u.getBaseOffset == cachedOffset && u.getSizeInBytes == cachedSize
    case other => other.asInstanceOf[AnyRef] eq cachedRef
  }

  private def decodeCb(cb: ArrayData): Unit = {
    val k = cb.numElements()
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Double]](k)
    var c = 0
    while (c < k) {
      val st = cb.getStruct(c, 2)
      ids(c) = st.getLong(0)
      val cvArr = st.getArray(1)
      val m = cvArr.numElements()
      // a null element inside a codeword nulls every distance against it
      // in the HOF form — mark the codeword unusable (null slot)
      var hasNull = false
      var j = 0
      val cv = new Array[Double](m)
      while (j < m) {
        if (cvArr.isNullAt(j)) hasNull = true
        else cv(j) = if (cvIsFloat) cvArr.getFloat(j).toDouble else cvArr.getDouble(j)
        j += 1
      }
      vecs(c) = if (hasNull) null else cv
      c += 1
    }
    cb match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        cachedRef = u.getBaseObject.asInstanceOf[AnyRef]
        cachedOffset = u.getBaseOffset; cachedSize = u.getSizeInBytes
      case other =>
        cachedRef = other.asInstanceOf[AnyRef]; cachedOffset = -1L; cachedSize = -1
    }
    cachedIds = ids; cachedVecs = vecs
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vArr = a.asInstanceOf[ArrayData]
    val n = vArr.numElements()
    // effective window = slice(vec, start+1, len): may be shorter than len
    val subLen = math.max(0, math.min(n - start, len))
    val sub = new Array[Double](subLen)
    var hasNull = false
    var i = 0
    while (i < subLen) {
      if (vArr.isNullAt(start + i)) hasNull = true
      else sub(i) =
        if (vecIsFloat) vArr.getFloat(start + i).toDouble
        else vArr.getDouble(start + i)
      i += 1
    }
    val cb = b.asInstanceOf[ArrayData]
    if (!cacheHit(cb)) decodeCb(cb)
    val ids = cachedIds; val vecs = cachedVecs
    var bestCid = -1L
    var bestD = Double.PositiveInfinity
    if (!hasNull) {
      var c = 0
      val k = ids.length
      while (c < k) {
        val cv = vecs(c)
        // zip_with null-pads unequal lengths -> null distance -> skipped
        if (cv != null && cv.length == subLen) {
          var acc = 0.0
          var j = 0
          while (j < subLen) { val x = sub(j) - cv(j); acc += x * x; j += 1 }
          // FIRST strict improvement, Catalyst double ordering (NaN greatest)
          if (java.lang.Double.compare(acc, bestD) < 0) {
            bestD = acc
            bestCid = if (positional) c.toLong else ids(c)
          }
        }
        c += 1
      }
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqCode = copy(left = l, right = r)
}

/** Squared L2 distance Σ(a_i − b_i)² by left fold in array order — the
  * native form of the `aggregate(zip_with(a, b, (x,y) => (x−y)²))` HOF
  * shape used by the brute L2 searchers, prototype scoring and k-center
  * scans (kept at the call sites' scaladocs as the reference semantics;
  * DuckDB `list_sum ∘ list_zip` bit-identical). Null semantics replicate
  * the HOF exactly: a length mismatch (zip_with null-pads the shorter
  * side) or a null element anywhere poisons the fold — result null.
  *
  * Why native: the HOF evaluates interpreted with a lambda frame per
  * element per pair — on a |corpus|×|queries| pair scan that is the whole
  * stage cost. */
case class L2Distance(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  // element kinds: 0 = double, 1 = float, 2 = long (long arrays arrive
  // from the quantized prototype path, where the HOF cast them to double
  // per element — getLong(i).toDouble is the identical Catalyst cast)
  private def kind(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case _ => 0
  }
  private lazy val leftKind = kind(left.dataType)
  private lazy val rightKind = kind(right.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
           ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_distance needs two array<float|double|bigint>, got ${left.dataType} / ${right.dataType}")
  }

  private def elem(arr: ArrayData, i: Int, k: Int): Double = k match {
    case 1 => arr.getFloat(i).toDouble
    case 2 => arr.getLong(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (bb.numElements() != n) return null // zip_with null-pad -> null fold
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = elem(aa, i, leftKind) - elem(bb, i, rightKind)
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): L2Distance = copy(left = l, right = r)
}

/** SQ8 reconstruction distance: Σ(q_i − (lo_i + code_i·(hi_i − lo_i)/255))²
  * by left fold in array order — the native fusion of the two-HOF shape in
  * [[graft.operators.Similarity]]'s sq8Search / ivfSq8Search (reconstruct
  * via `zip_with(codes, rng, …)`, then square-distance via
  * `aggregate(zip_with(qe, recon, …))` — kept there in scaladoc as the
  * reference). Every float op replays the HOF's exact IEEE order:
  * (hi − lo), code·Δ, /255, lo + ·, (q − rec), ·², acc + term. Null
  * semantics identical: any length mismatch among the three arrays or a
  * null element poisons the fold — result null. `rng` is the broadcast
  * one-row range census — decoded once per task via the
  * [[NearestCentroid]] identity-keyed cache. */
case class Sq8L2(
    first: Expression,
    second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private lazy val qFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = second.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val rOk = third.dataType match {
      case ArrayType(StructType(f), _) if f.length == 2 &&
        f(0).dataType == DoubleType && f(1).dataType == DoubleType => true
      case _ => false
    }
    if (qOk && cOk && rOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sq8_l2 needs (array<float|double>, array<bigint>, " +
          s"array<struct<double,double>>), got ${first.dataType} / " +
          s"${second.dataType} / ${third.dataType}")
  }

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedOffset: Long = -1L
  @transient private var cachedSize: Int = -1
  @transient private var cachedLo: Array[Double] = _
  @transient private var cachedHi: Array[Double] = _
  @transient private var cachedHasNull: Boolean = false

  private def cacheHit(rng: ArrayData): Boolean = rng match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      (u.getBaseObject.asInstanceOf[AnyRef] eq cachedRef) &&
        u.getBaseOffset == cachedOffset && u.getSizeInBytes == cachedSize
    case other => other.asInstanceOf[AnyRef] eq cachedRef
  }

  private def decodeRng(rng: ArrayData): Unit = {
    val n = rng.numElements()
    val lo = new Array[Double](n)
    val hi = new Array[Double](n)
    var hasNull = false
    var i = 0
    while (i < n) {
      if (rng.isNullAt(i)) hasNull = true
      else {
        val st = rng.getStruct(i, 2)
        if (st.isNullAt(0) || st.isNullAt(1)) hasNull = true
        else { lo(i) = st.getDouble(0); hi(i) = st.getDouble(1) }
      }
      i += 1
    }
    rng match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        cachedRef = u.getBaseObject.asInstanceOf[AnyRef]
        cachedOffset = u.getBaseOffset; cachedSize = u.getSizeInBytes
      case other =>
        cachedRef = other.asInstanceOf[AnyRef]; cachedOffset = -1L; cachedSize = -1
    }
    cachedLo = lo; cachedHi = hi; cachedHasNull = hasNull
  }

  override def nullSafeEval(q: Any, c: Any, r: Any): Any = {
    val qe = q.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[ArrayData]
    val rng = r.asInstanceOf[ArrayData]
    if (!cacheHit(rng)) decodeRng(rng)
    val n = qe.numElements()
    if (cd.numElements() != n || cachedLo.length != n || cachedHasNull)
      return null // zip_with null-pad / null struct -> null fold
    val lo = cachedLo; val hi = cachedHi
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (qe.isNullAt(i) || cd.isNullAt(i)) return null
      val qv = if (qFloat) qe.getFloat(i).toDouble else qe.getDouble(i)
      val rec = lo(i) + cd.getLong(i).toDouble * (hi(i) - lo(i)) / 255.0
      val d = qv - rec
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8L2 =
    copy(first = f, second = s, third = t)
}
