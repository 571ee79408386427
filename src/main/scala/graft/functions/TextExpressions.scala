package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-thread MD5 instance for the md5Base oracle-twin hot paths —
  * MessageDigest is stateful but digest() resets it, so one instance per
  * thread avoids a getInstance allocation per row/shingle. */
private[functions] object Md5 {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = tl.get()
}

/** Native text-shingling expressions. Tokenization matches
  * `split(trim(text), "\s+")` (Java regex semantics) so results line up
  * with the HOF formulation and the DuckDB oracle's
  * `string_split_regex(trim(text), '\s+')`. */
private[functions] object Shingling {
  val ws = java.util.regex.Pattern.compile("\\s+")

  /** Space-only trim — Spark SQL's trim()/UTF8String.trim strip the space
    * character 0x20 ONLY (as does DuckDB's trim), while Java's
    * String.trim also strips tabs/newlines. A tab-edged document must
    * tokenize identically to `split(trim(text), "\s+")`, so the fused
    * expressions replicate the SQL semantics, not Java's. */
  def spaceTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Tokens exactly as `split(trim(text), "\s+")` produces them — Spark's
    * split passes limit -1 (trailing empty fields KEPT, "" → [""]), and
    * DuckDB's string_split_regex behaves identically (verified on
    * tab-edged and empty inputs). Do not "simplify" to Java's one-arg
    * split: it drops trailing empties and diverges on "a b\t". */
  def tokens(text: UTF8String): Array[String] =
    ws.split(spaceTrim(text.toString), -1)

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
  * lambdas; codegen emits a direct static call (no per-row InternalRow
  * boxing, and the projection stays inside the WholeStageCodegen span). */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Shingling.sortedDistinctShingleHashes(input.asInstanceOf[UTF8String], n))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Shingling$$.MODULE$$.sortedDistinctShingleHashes($input, $n));
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard of two sorted long arrays by a single merge walk —
  * |A∩B| / |A∪B|. Replaces array_intersect/array_union over string sets
  * (hash collisions at 64 bits are negligible; the *counts*, and thus the
  * Jaccard double, equal the string-set computation). Runs once per
  * candidate PAIR — the dedup-verify hot path — so the walk is codegen'd
  * inline rather than dispatched through interpreted eval. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
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
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |final int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused tokenize → shingle → base-hash → MinHash signature: one pass
  * from the raw text to the k-position signature (no intermediate shingle
  * array materialized per row). Base hash is xxhash64 (seed 42, Spark's
  * builtin — the fast production path) or, with `md5Base = true`, the
  * first 4 bytes of md5 as an unsigned 32-bit value — exactly
  * `conv(substring(md5(s), 1, 8), 16, 10)`, an engine-independent hash a
  * DuckDB oracle can replicate (`('0x' || substr(md5(s), 1, 8))::BIGINT`). */
case class TextMinHash(child: Expression, n: Int, coeffA: Seq[Long], coeffB: Seq[Long],
    prime: Long, md5Base: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val aArr = coeffA.toArray
  @transient private lazy val bArr = coeffB.toArray
  override def nullSafeEval(input: Any): Any =
    TextMinHash.compute(input.asInstanceOf[UTF8String], n, aArr, bArr, prime, md5Base)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, input =>
      s"""${ev.value} = graft.functions.TextMinHash$$.MODULE$$.compute(
         |  $input, $n, $aRef, $bRef, ${prime}L, $md5Base);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextMinHash {
  /** Static body shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, a: Array[Long], b: Array[Long],
      prime: Long, md5Base: Boolean): GenericArrayData = {
    val toks = Shingling.tokens(text)
    val k = a.length
    val mins = Array.fill(k)(prime)
    val md = if (md5Base) Md5.get() else null
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
        val h =
          if (md5Base) {
            // first 4 digest bytes, big-endian unsigned — the integer value
            // of the first 8 hex digits of md5(shingle)
            val d = md.digest(
              sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          } else XxHash64Function.hash(
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
}

/** Fused tokenize → per-token xxhash64 → 64-bit vote → SimHash, one pass
  * per row. Returns struct(bits: 64 0/1 longs, chunks: 4 big-endian
  * 16-bit keys for pigeonhole banding). The HOF formulation interpreted
  * 64 lambda calls per TOKEN (the same per-element interpretation that
  * cost 322 s for MinHash, BASELINE.md); this is one JVM loop.
  * Tokenization replicates `split(trim(text), "\s+")` exactly
  * (space-only trim, limit -1 split: trailing empties kept, "" → [""] —
  * see Shingling.tokens), so outputs are bit-identical to the SQL
  * formulation. */
case class TextSimHash(child: Expression, md5Base: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("bits", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("chunks", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextSimHash.compute(input.asInstanceOf[UTF8String], md5Base)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextSimHash$$.MODULE$$.compute($input, $md5Base);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextSimHash {
  /** Static body shared by interpreted eval and generated code. With
    * `md5Base`, each token's 64 hash bits are the first 8 md5 digest
    * bytes big-endian — the value of the first 16 md5 hex digits, which
    * DuckDB reproduces via `('0x' || substr(md5(t), 1, 16))::UBIGINT`
    * (same bit pattern as this signed long). */
  def compute(input: UTF8String, md5Base: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Shingling.tokens(input)
    val md = if (md5Base) Md5.get() else null
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h =
        if (md5Base) {
          val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var acc = 0L
          var k = 0
          while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
          acc
        } else XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    val bits = Array.tabulate(64)(j => if (votes(j) > 0) 1L else 0L)
    val chunks = Array.tabulate(4) { c =>
      var acc = 0L
      var j = 0
      while (j < 16) { acc = acc * 2 + bits(c * 16 + j); j += 1 }
      acc
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(bits), new GenericArrayData(chunks))
  }
}

/** Positions where two long arrays differ (the hamming distance of two
  * bit arrays) — one codegen'd loop per candidate pair, replacing the
  * interpreted zip_with+aggregate walk. */
case class HammingBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) { if (x.getLong(i) != y.getLong(i)) d += 1; i += 1 }
    d
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, d) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("d"))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) != $b.getLong($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused per-document text statistics: one pass over the string instead
  * of five interpreted HOF `aggregate`/`filter` walks (per-element lambda
  * interpretation is the cost documented for MinHash in BASELINE.md).
  * Emits struct(n_tokens, n_regex_tokens, sum_token_len, n_chars,
  * n_punct, n_upper, n_stop) — all counts; the ratio arithmetic stays in
  * the (codegen'd) projection layer so existing outputs are bit-identical:
  *  - n_tokens replicates `size(split(trim(text), "\s+"))`, including the
  *    empty-string → [""] Java split quirk (count 1).
  *  - n_regex_tokens counts `[A-Za-z0-9]+|[^A-Za-z0-9\s]` matches.
  *  - n_chars/n_punct/n_upper iterate code points (Java regex character
  *    classes are code-point based, as is Spark's length()).
  *  - n_stop counts tokens exactly equal to a stopword (the `isin` set). */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_regex_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_upper", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val stopRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextStats$$.MODULE$$.compute($input, $stopRef);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {
  private val regexTok =
    java.util.regex.Pattern.compile("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")

  /** Static body shared by interpreted eval and generated code. */
  def compute(text: UTF8String,
      stop: java.util.HashSet[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val raw = text.toString
    val toks = Shingling.tokens(text)
    var sumTokLen = 0L
    var nStop = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumTokLen += t.codePointCount(0, t.length)
      if (stop.contains(t)) nStop += 1
      i += 1
    }
    // regex tokens over the RAW text (matches regexp_extract_all)
    var nRegex = 0L
    val m = regexTok.matcher(raw)
    while (m.find()) nRegex += 1
    // code-point walk for char-class counts
    var nChars = 0L; var nPunct = 0L; var nUpper = 0L
    var k = 0
    while (k < raw.length) {
      val cp = raw.codePointAt(k)
      nChars += 1
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      // Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!alnum && !ws) nPunct += 1
      if (cp >= 'A' && cp <= 'Z') nUpper += 1
      k += Character.charCount(cp)
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, nRegex, sumTokLen, nChars, nPunct, nUpper, nStop)
  }
}

/** Distinct word-n-gram md5 hex keys of a text column — the
  * decontamination join key, fused into one pass per row (tokenize →
  * shingle → md5 → distinct) instead of a transform+array_distinct HOF
  * chain interpreting a lambda per shingle. md5 hex is the
  * engine-independent key the DuckDB oracle computes verbatim; emission
  * order is first-occurrence (matches array_distinct over the shingle
  * stream), though every consumer treats the result as a set. */
case class ShingleMd5Keys(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleMd5Keys.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ShingleMd5Keys$$.MODULE$$.compute($input, $n);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleMd5Keys {
  private val hex = "0123456789abcdef".toCharArray

  /** Static body shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = Shingling.tokens(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val md = Md5.get()
    val seen = new java.util.LinkedHashSet[UTF8String]()
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
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        out(2 * k) = hex((d(k) >> 4) & 0xf).toByte
        out(2 * k + 1) = hex(d(k) & 0xf).toByte
        k += 1
      }
      seen.add(UTF8String.fromBytes(out))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }
}

/** Fused per-document repetition statistics (Gopher-style quality
  * signals): token-frequency map + distinct-2-gram set built in ONE pass
  * per row, instead of exploding every token into its own row and paying
  * two (doc_id, token)-keyed shuffles per metric. Memory is bounded by a
  * single document's vocabulary (rows stream through the operator), so
  * the projection shape survives 100 TB. Emits struct(n_tokens,
  * n_distinct, max_count, n_2grams, n_distinct_2grams) — all counts; the
  * ratio doubles stay in the projection layer so they form exactly as the
  * SQL `CAST(a AS DOUBLE) / b` the oracle computes.
  * Tokenization is `split(trim(text), "\s+")` semantics exactly (see
  * Shingling.tokens: space-only trim, "" → [""]). */
case class TextRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false),
    StructField("n_2grams", LongType, nullable = false),
    StructField("n_distinct_2grams", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextRepetition.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextRepetition$$.MODULE$$.compute($input);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextRepetition {
  /** Static body shared by interpreted eval and generated code. */
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Shingling.tokens(text)
    val counts = new java.util.HashMap[String, Int]()
    var maxCount = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val grams = new java.util.HashSet[String]()
    var j = 0
    while (j < toks.length - 1) {
      grams.add(toks(j) + " " + toks(j + 1))
      j += 1
    }
    val n2 = math.max(toks.length - 1, 0)
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, counts.size.toLong, maxCount.toLong,
      n2.toLong, grams.size.toLong)
  }
}

/** Content-defined chunking (rsync/FastCDC family): split `text` at every
  * position p (1-based, p ≥ w) where the md5 of the w-char gram ending at
  * p satisfies `uint32(first 8 hex digits) % d == 0`, and return the
  * chunk substrings in order. Boundary decisions are CHAR-based (Java
  * String / DuckDB substr semantics agree on chars; md5 hashes the
  * gram's UTF-8 bytes on both engines), so the oracle replays the rule
  * with `substr` + `md5` verbatim. One fused pass per row — the
  * production stand-in for a rolling Rabin hash, kept md5-based so the
  * boundary rule is engine-replayable rather than implementation-
  * defined. */
case class CdcChunkList(child: Expression, w: Int, d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CdcChunkList.compute(input.asInstanceOf[UTF8String], w, d)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.CdcChunkList$$.MODULE$$.compute($input, $w, $d);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CdcChunkList {
  /** Static body shared by interpreted eval and generated code. */
  def compute(text: UTF8String, w: Int, d: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = Md5.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var p = w
    while (p <= n) {
      val dig = md.digest(s.substring(p - w, p)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex digits of the md5 = the first 4 bytes as an
      // unsigned 32-bit int — identical to the oracle's
      // CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      if (h % d == 0) {
        out += UTF8String.fromString(s.substring(start, p))
        start = p
      }
      p += 1
    }
    if (start < n) out += UTF8String.fromString(s.substring(start, n))
    new GenericArrayData(out.toArray)
  }
}

/** Unicode NFC (canonical composition) helper behind [[NfcNormalize]].
  * The JVM's `java.text.Normalizer` implements the same Unicode
  * canonical composition DuckDB's utf8proc `nfc_normalize` does, so the
  * gate pits two independent Unicode implementations against each
  * other. `isNormalized` short-circuits the common case (ASCII and
  * already-composed text) without allocating. */
private[functions] object NfcHelper {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization — the canonicalization every exact-dedup /
  * content-hash pass needs up front (composed "é" and decomposed
  * "e"+U+0301 are different bytes for the same text and would evade
  * byte-level dedup). Spark has no builtin; this is a codegen'd native
  * expression rather than a UDF so it stays inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NfcHelper.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.NfcHelper$$.MODULE$$.nfc($input);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}


/** Token-level longest-common-subsequence statistics for ROUGE-L: one
  * codegen'd pass computing (lcs_len, n_left, n_right) over the two
  * texts' whitespace tokens. The classic two-row DP — O(m·n) time, O(n)
  * space — runs LOCALLY per row pair: the distributed unit is the eval
  * PAIR (millions of pairs in parallel), never the DP cell, which is the
  * shape every published ROUGE evaluator uses. Tokens are interned to
  * int ids first so the inner loop compares ints, not strings. */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lcs_len", LongType, nullable = false),
    StructField("n_left", LongType, nullable = false),
    StructField("n_right", LongType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any =
    LcsTokens.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsTokens$$.MODULE$$.compute($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LcsTokens {
  /** Static body shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val ta = Shingling.tokens(a)
    val tb = Shingling.tokens(b)
    val ids = new java.util.HashMap[String, Integer]()
    def intern(ts: Array[String]): Array[Int] = {
      val out = new Array[Int](ts.length)
      var i = 0
      while (i < ts.length) {
        var id = ids.get(ts(i))
        if (id == null) { id = ids.size(); ids.put(ts(i), id) }
        out(i) = id
        i += 1
      }
      out
    }
    val xa = intern(ta); val xb = intern(tb)
    var prev = new Array[Int](xb.length + 1)
    var cur = new Array[Int](xb.length + 1)
    var i = 0
    while (i < xa.length) {
      var j = 0
      while (j < xb.length) {
        cur(j + 1) =
          if (xa(i) == xb(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      prev(xb.length).toLong, xa.length.toLong, xb.length.toLong)
  }
}

object textnative {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def nfc_normalize(text: Column): Column = c(NfcNormalize(e(text)))

  def shingle_hashes(text: Column, n: Int): Column = c(ShingleHashes(e(text), n))
  def jaccard_sorted(a: Column, b: Column): Column = c(JaccardSorted(e(a), e(b)))
  def text_minhash(text: Column, n: Int, family: Seq[(Long, Long)], prime: Long,
      md5Base: Boolean = false): Column =
    c(TextMinHash(e(text), n, family.map(_._1), family.map(_._2), prime, md5Base))
  def text_simhash(text: Column, md5Base: Boolean = false): Column =
    c(TextSimHash(e(text), md5Base))
  def text_stats(text: Column, stopwords: Seq[String]): Column =
    c(TextStats(e(text), stopwords))
  def text_repetition(text: Column): Column = c(TextRepetition(e(text)))
  def shingle_md5_keys(text: Column, n: Int): Column = c(ShingleMd5Keys(e(text), n))
  def hamming_bits(a: Column, b: Column): Column = c(HammingBits(e(a), e(b)))
  def cdc_chunks(text: Column, w: Int, d: Int): Column =
    c(CdcChunkList(e(text), w, d))
  def lcs_tokens(a: Column, b: Column): Column = c(LcsTokens(e(a), e(b)))
}
