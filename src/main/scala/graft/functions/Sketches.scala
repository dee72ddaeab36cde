package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.functions._

/** Locality-sensitive sketches as native Catalyst expressions.
  *
  * The reference has no sketching at all (its only stateful op is a running
  * counter, Operators.java:57-63); these are the scale-path extensions for
  * training-data dedup (SURVEY.md §7.2 step 7). Implemented as Catalyst
  * `Expression`s rather than Scala UDFs so evaluation stays on `UTF8String` /
  * `ArrayData` without per-row serialization to JVM objects; one array
  * traversal computes the whole signature.
  */
object Sketches {

  /** xxhash64 over a UTF8String with a seed — same primitive Spark's
    * `xxhash64()` SQL function uses. */
  @inline private[functions] def hash64(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(s, StringType, seed)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5 (= the
    * big-endian u64 of the first 8 digest bytes, shifted right 4). Any SQL
    * engine with md5 + hex-to-int can reproduce it bit-exactly (DuckDB:
    * `('0x' || substr(md5(s),1,15))::UBIGINT`), which is what makes a
    * simhash built on it oracle-checkable. 60 bits keeps the value inside a
    * signed 64-bit integer on engines without unsigned types. */
  @inline private[functions] def md5Hash60(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h >>> 4
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash (Charikar 2002) of a token array: per token a 64-bit
    * hash votes +1/-1 on each bit position; the sign of each accumulated
    * vote is the output bit. Near-identical documents differ in few bits.
    *
    * `portable = true` swaps the per-token xxhash64 for [[md5Hash60]] and
    * votes over 60 bit positions (bits 60-63 stay 0) — slightly slower per
    * token, but reproducible in any engine with md5, so results can be
    * verified against an independent SQL oracle. The default xxhash64 path
    * is the throughput choice for production dedup. */
  case class SimHash64(child: Expression, portable: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    // null in -> null out (true for every nullSafeEval expression here);
    // lets constraint propagation derive isnotnull on the CHILD. Note the
    // optimizer still keeps the original isnotnull(simhash64(x)) predicate
    // it inferred from join keys — operators avoid that re-evaluation by
    // making the sketch column non-nullable (see Dedup.simhashPairs).
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes() = super.checkInputDataTypes()
    private val nBits = if (portable) 60 else 64
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](nBits)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h = if (portable) md5Hash60(s) else hash64(s, 42L)
          var b = 0
          while (b < nBits) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < nBits) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  def simhash64(tokens: Column, portable: Boolean = false): Column =
    GraftExpr.column(SimHash64(GraftExpr.expression(tokens), portable))

  // ---------------------------------------------------------------- MinHash

  /** k-permutation MinHash signature of a string-array (shingle set), one
    * pass: per element two strong hashes (h1, h2), the k permutations are the
    * standard cheap combination h1 + i*h2 (Indyk/Broder composite trick used
    * by public MinHash implementations). Returns array<long> of length k. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = hash64(s, 0x9E3779B97F4A7C15L)
          val h2 = hash64(s, 0xC2B2AE3D27D4EB4FL) | 1L // odd => full-period mix
          var j = 0
          while (j < k) {
            val h = h1 + j * h2
            if (h < sig(j)) sig(j) = h
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  }

  def minhashSignature(shingles: Column, k: Int): Column =
    GraftExpr.column(MinHashSignature(GraftExpr.expression(shingles), k))

  // ------------------------------------------------------------ RollingHash

  /** Polynomial rolling hash (Rabin-Karp) over the document's characters —
    * a cheap order-sensitive content fingerprint. */
  case class RollingHash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = h * 1000003L + (bytes(i) & 0xffL)
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
  }

  def rollingHash(text: Column): Column =
    GraftExpr.column(RollingHash(GraftExpr.expression(text)))

  // ------------------------------------------------------------- LSH bands

  /** Band keys for MinHash-LSH: the signature is cut into `bands` bands of
    * `rowsPerBand` values; each band is hashed to one bucket key. Two docs
    * collide iff some band matches entirely. Returns array<struct<band:int,
    * key:bigint>> ready to explode into a bucket join.
    *
    * NOTE: composing this from `signature.getItem(i)` columns would make
    * CollapseProject inline the signature expression into every getItem —
    * bands*rowsPerBand re-evaluations of the whole MinHash pass per row
    * (measured 124s vs <1s at sf0.01). Prefer [[minhashBands]], which fuses
    * shingles -> signature -> band keys into ONE expression evaluation. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    val entries = (0 until bands).map { b =>
      val bandVals = (0 until rowsPerBand).map(r => signature.getItem(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(bandVals: _*).as("key"))
    }
    array(entries: _*)
  }

  /** Fused shingles -> k-minhash -> banded bucket keys, one traversal per
    * row. Output array<struct<band:int, key:bigint>>, length = `bands`. */
  case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with CodegenFallback {
    override def nullIntolerant: Boolean = true
    private val k = bands * rowsPerBand
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("band", IntegerType, nullable = false),
        StructField("key", LongType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = hash64(s, 0x9E3779B97F4A7C15L)
          val h2 = hash64(s, 0xC2B2AE3D27D4EB4FL) | 1L
          var j = 0
          while (j < k) {
            val h = h1 + j * h2
            if (h < sig(j)) sig(j) = h
            j += 1
          }
        }
        i += 1
      }
      val out = new Array[Any](bands)
      var b = 0
      while (b < bands) {
        var key = -7046029254386353131L // FNV-ish seed
        var r = 0
        while (r < rowsPerBand) {
          key = key * 1099511628211L + sig(b * rowsPerBand + r)
          r += 1
        }
        out(b) = InternalRow(b, key)
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
  }

  def minhashBands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    GraftExpr.column(MinHashBands(GraftExpr.expression(shingles), bands, rowsPerBand))

  // ------------------------------------------------------------- KMV sketch

  /** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002,
    * Beyer et al. SIGMOD 2007) as a one-pass MERGEABLE native aggregate.
    *
    * State is the k smallest DISTINCT [[md5Hash60]] values seen — O(k)
    * regardless of input size, merged across partials by set-union +
    * re-truncate, so partial (map-side) aggregation applies and the
    * shuffle carries one k-long array per group, never the data. Unlike
    * HLL, the sketch content is a pure function of the input SET under a
    * public hash: an independent SQL engine reproduces it bit-exactly as
    * `the k smallest distinct ('0x' || substr(md5(v),1,15))::UBIGINT` —
    * which makes this the ORACLE-CHECKABLE member of the distinct-sketch
    * family (q_profile_sketch's HLL row stays estimate-only by design).
    *
    * Returns the ascending LongArray of minima (size < k means the
    * distinct count was exact = size). The standard readouts compose
    * declaratively on top: estimate `(k-1)·2^60 / kth_min` when full,
    * union = merge-and-truncate of two sketch arrays, intersection via
    * the Jaccard of shared minima in the union's k-set. */
  case class KmvSketch(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    require(k >= 2, s"k must be >= 2: $k")

    // update() hashes the child as UTF8String; rejecting non-string
    // children at analysis time keeps `kmv_sketch(user_id, 32)` on a
    // numeric column an AnalysisException, never a runtime
    // ClassCastException inside the aggregate (cast explicitly upstream)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"kmv_sketch needs a STRING child (cast explicitly), got $other")
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = md5Hash60(v.asInstanceOf[UTF8String])
        if (buf.size < k) { buf.add(h); () }
        else if (h < buf.last()) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }
      }
      buf
    }

    override def merge(
        buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      buf.addAll(other)
      while (buf.size > k) buf.pollLast()
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketch =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvSketch =
      copy(child = c)
  }

  /** [[KmvSketch]] as an aggregate Column: `kmvSketch(col("text"), 64)`. */
  def kmvSketch(value: Column, k: Int): Column =
    GraftExpr.column(KmvSketch(GraftExpr.expression(value), k).toAggregateExpression())

  /** Merge two KMV sketch arrays declaratively (set-union of minima,
    * re-truncated to k) — the union sketch, computable post-aggregation
    * without touching the data again. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate of a KMV sketch array: exact size when the
    * sketch never filled, else the standard (k-1)/kth-minimum estimator
    * over the 60-bit hash space. Fixed double op order — an oracle
    * reproducing the same order matches bit-exactly. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
        element_at(sketch, k).cast("double"))
}
