package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: trim -> whitespace-split -> n-gram join
  * (-> optional first-occurrence distinct) in one evaluation.
  *
  * Matches the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', slice(split(
  * trim(text), "\\s+"), i+1, n))))` exactly (same token split semantics:
  * Java `Pattern.split(s, -1)` == Spark `StringSplitSQL` on a trimmed
  * string; empty text yields one empty token, fewer than n tokens yield an
  * empty array). The HOF chain evaluates interpreted with a lambda frame per
  * element — its first heavy use measured ~50s of interpreter/JIT warmup at
  * sf0.01; this expression is one tight JVM loop.
  */
case class WordShingles(child: Expression, n: Int, distinctOut: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    val toks = text.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    if (distinctOut) {
      val seen = new java.util.LinkedHashSet[String](m * 2)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator(); var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString); i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}
