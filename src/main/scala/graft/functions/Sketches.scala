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
}
