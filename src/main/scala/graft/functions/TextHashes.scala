package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_hash(words, n)` — distinct word-n-gram shingle
  * hashes as int64 in [0, 2^31-1), one pass, thread-local md5.
  *
  * Replaces the three-level lambda pipeline
  * `transform(array_distinct(transform(sequence(...), ...)), md5...)`
  * whose lambdas Spark evaluates interpreted per element and whose
  * definition the optimizer re-inlines into pushed-down filters (the
  * md5 chain then runs 3-4× per row — see the d2 plan audit). The
  * hash is EXACTLY the SQL formula
  * `conv(substring(md5(s),1,15),16,10) % (2^31-1)` so the DuckDB
  * oracle mirror is unchanged.
  */
case class ShingleHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  override protected def nullSafeEval(words: Any, n: Any): Any =
    ShingleHash.hashes(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n) => s"graft.functions.ShingleHash.hashes($w, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHash =
    copy(left = newLeft, right = newRight)
}

object ShingleHash {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray
  val P = 2147483647L

  /** md5-hex[0:15] as a base-16 long, mod 2^31-1 — identical to
    * `cast(conv(substring(md5(s),1,15),16,10) as bigint) % P`. */
  def hashOne(s: String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = 7.5 bytes: 60 bits
    var acc = 0L
    var i = 0
    while (i < 8) {
      val hi = (d(i) >> 4) & 0xf
      val lo = d(i) & 0xf
      if (i < 7) acc = (acc << 8) | ((hi.toLong << 4) | lo)
      else acc = (acc << 4) | hi // 15th hex digit only
      i += 1
    }
    acc % P
  }

  def hashes(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = hashOne(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_shingle_seq(words, n)` — POSITIONAL word-n-gram hashes:
  * one int64 per gram start position, in document order, duplicates
  * kept (vs [[ShingleHash]]'s distinct set). The per-position form
  * d9's repeated-span detection needs: position i of the output is
  * the hash of words[i..i+n-1], so consecutive equal hashes across
  * two documents are consecutive shared text. Same md5/conv formula
  * as [[ShingleHash]] — `array_distinct(graft_shingle_seq(w,n))` ≡
  * `graft_shingle_hash(w,n)` (pinned in TextHashesSpec). */
case class ShingleSeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_seq"

  override protected def nullSafeEval(words: Any, n: Any): Any =
    ShingleSeq.seqHashes(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n) => s"graft.functions.ShingleSeq.seqHashes($w, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSeq =
    copy(left = newLeft, right = newRight)
}

object ShingleSeq {
  def seqHashes(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = ShingleHash.hashOne(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_minhash(xs, k)` — k MinHash values over an int64 shingle
  * array in ONE pass (vs k separate `array_min(transform(...))`
  * interpreted scans). Permutation constants are the fixed
  * `TextDedup.minhashPerms` family: a_i=(2i+1)·2654435761 mod P,
  * b_i=(i·40503·65537+17) mod P. Empty input → nulls (matches
  * array_min of empty). */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(xs: Any, k: Any): Any =
    MinHashSig.sig(xs.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xs, k) => s"graft.functions.MinHashSig.sig($xs, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

/** `graft_sig_matches(sig1, sig2)` — positions where two signature
  * arrays (array<long>, nulls allowed) hold equal non-null values, as
  * int64. Replaces the interpreted
  * `aggregate(zip_with(sig1, sig2, (x,y) -> if(x=y,1,0)), 0, +)`
  * (d3's confirm filter) and Curation's
  * `size(filter(zip_with(...), v -> v))` — both count only pairs
  * where the equality is TRUE, so null-vs-anything contributes 0,
  * exactly as here. */
case class SigMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sig_matches"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigMatches.matches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigMatches.matches($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatches =
    copy(left = newLeft, right = newRight)
}

object SigMatches {
  def matches(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

object MinHashSig {
  val P = 2147483647L

  def sig(xs: ArrayData, k: Int): ArrayData = {
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // nulls
    val as = new Array[Long](k); val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = (2L * i + 1) * 2654435761L % P
      bs(i) = (i * 40503L * 65537 + 17) % P
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j)
      var p = 0
      while (p < k) {
        val h = (as(p) * x + bs(p)) % P
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_winnow(hs, w)` — winnowing fingerprint selection (MOSS,
  * Schleimer et al. SIGMOD'03): the DISTINCT minima of every sliding
  * window of width `w` over an int64 hash sequence, in
  * first-occurrence order — semantics-identical to
  * `array_distinct(transform(sequence(0, size(hs)-w), i ->
  * array_min(slice(hs, i+1, w))))`, which evaluates interpreted per
  * element and re-slices per window (O(m·w) allocations). One tight
  * generated-code loop instead; the t5 hot path. */
case class WinnowMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(xs: Any, w: Any): Any =
    WinnowMin.winnow(xs.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, w) => s"graft.functions.WinnowMin.winnow($x, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowMin =
    copy(left = newLeft, right = newRight)
}

object WinnowMin {
  def winnow(xs: ArrayData, w: Int): ArrayData = {
    val m = xs.numElements()
    if (w <= 0 || m < w) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + w <= m) {
      var mn = xs.getLong(i)
      var j = 1
      while (j < w) {
        val v = xs.getLong(i + j)
        if (v < mn) mn = v
        j += 1
      }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
