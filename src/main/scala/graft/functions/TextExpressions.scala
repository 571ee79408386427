package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shingling expressions. Tokenization matches
  * `split(trim(text), "\s+")` (Java regex semantics) so results line up
  * with the HOF formulation and the DuckDB oracle's
  * `string_split_regex(trim(text), '\s+')`. */
private[functions] object Shingling {
  val ws = java.util.regex.Pattern.compile("\\s+")

  def tokens(text: UTF8String): Array[String] = {
    val s = text.toString.trim
    if (s.isEmpty) Array.empty[String] else ws.split(s)
  }

  /** xxhash64 (seed 42, the builtin's) of each distinct word n-gram,
    * sorted ascending. */
  def sortedDistinctShingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokens(text)
    if (toks.length < n) return Array.empty[Long]
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** Distinct word-n-gram shingle hashes of a text column, sorted — the
  * set representation for exact Jaccard. One pass per row, no interpreted
  * lambdas. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Shingling.sortedDistinctShingleHashes(input.asInstanceOf[UTF8String], n))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard of two sorted long arrays by a single merge walk —
  * |A∩B| / |A∪B|. Replaces array_intersect/array_union over string sets
  * (hash collisions at 64 bits are negligible; the *counts*, and thus the
  * Jaccard double, equal the string-set computation). */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused tokenize → shingle → xxhash64 → MinHash signature: one pass from
  * the raw text to the k-position signature (no intermediate shingle
  * array materialized per row). */
case class TextMinHash(child: Expression, n: Int, coeffA: Seq[Long], coeffB: Seq[Long], prime: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = Shingling.tokens(input.asInstanceOf[UTF8String])
    val k = coeffA.length
    val a = coeffA.toArray; val b = coeffB.toArray
    val mins = Array.fill(k)(prime)
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val h = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        val hm = ((h % prime) + prime) % prime
        var m = 0
        while (m < k) {
          val v = (a(m) * hm + b(m)) % prime
          if (v < mins(m)) mins(m) = v
          m += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object textnative {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def shingle_hashes(text: Column, n: Int): Column = c(ShingleHashes(e(text), n))
  def jaccard_sorted(a: Column, b: Column): Column = c(JaccardSorted(e(a), e(b)))
  def text_minhash(text: Column, n: Int, family: Seq[(Long, Long)], prime: Long): Column =
    c(TextMinHash(e(text), n, family.map(_._1), family.map(_._2), prime))
}
