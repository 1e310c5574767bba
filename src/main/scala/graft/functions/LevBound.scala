package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_lev_bound(l, r, maxDist)` — exact Levenshtein distance if
  * it is ≤ `maxDist`, else −1 (the 3-arg `levenshtein` contract),
  * computed with Myers' bit-parallel algorithm (Myers 1999; Hyyrö
  * 2003 block form): the DP column is packed into 64-bit carry
  * vectors, so the cost is O(n · ⌈m/64⌉) word operations instead of
  * the banded DP's O(n · min(2·maxDist, m)) cell operations — ~25×
  * fewer for the verification tier d14 runs (maxlen ~2000, cap
  * 0.2·maxlen), where the built-in's banded DP was the sf1 hot loop.
  * The distance is the same integer the classic DP produces (the
  * algorithm is exact, not approximate), so DuckDB-oracle parity is
  * untouched; d14's differential spec pins this against the built-in
  * on randomized inputs.
  *
  * Distances count UTF-16 code units (Java chars) — identical to
  * code points on the BMP, and to every engine on ASCII corpora like
  * the test fixtures. Nulls: any null input → null.
  */
case class LevBound(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_bound"

  override protected def nullSafeEval(l: Any, r: Any, d: Any): Any =
    LevBound.dist(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString, d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r, d) =>
      s"graft.functions.LevBound.dist($l.toString(), $r.toString(), $d)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LevBound =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LevBound {

  /** Exact Levenshtein distance of `a` and `b` if ≤ `maxDist`, else
    * −1. Called from generated code. */
  def dist(a: String, b: String, maxDist: Int): Int = {
    if (maxDist < 0) return -1
    // pattern = shorter string (fewer 64-bit blocks)
    val (p, t) = if (a.length <= b.length) (a, b) else (b, a)
    val m = p.length
    val n = t.length
    if (n - m > maxDist) return -1 // lev >= |len diff|
    if (m == 0) return n // n <= maxDist by the guard above
    val score = if (m <= 64) myers64(p, t) else myersBlocks(p, t)
    if (score <= maxDist) score else -1
  }

  /** Single-word Myers (m ≤ 64). PV/MV are the +1/−1 vertical delta
    * bit-vectors of the current DP column; each text char updates
    * them with ~15 word ops. Score tracks D[m][j]. */
  private def myers64(p: String, t: String): Int = {
    val m = p.length
    // Peq: per-char bitmask of pattern positions (sparse map — the
    // alphabet is whatever the documents use)
    val peq = new java.util.HashMap[Character, Array[Long]]()
    var i = 0
    while (i < m) {
      val c = Character.valueOf(p.charAt(i))
      var mask = peq.get(c)
      if (mask == null) { mask = new Array[Long](1); peq.put(c, mask) }
      mask(0) |= 1L << i
      i += 1
    }
    val high = 1L << (m - 1)
    var pv = -1L
    var mv = 0L
    var score = m
    var j = 0
    val n = t.length
    while (j < n) {
      val masks = peq.get(Character.valueOf(t.charAt(j)))
      val eq = if (masks == null) 0L else masks(0)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & high) != 0L) score += 1
      if ((mh & high) != 0L) score -= 1
      ph = (ph << 1) | 1L // D[0][j] = j: the boundary increments
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** Block Myers (m > 64): the same recurrence per 64-bit block with
    * horizontal-delta carries between blocks (Hyyrö 2003). */
  private def myersBlocks(p: String, t: String): Int = {
    val m = p.length
    val w = (m + 63) / 64 // blocks
    val peq = new java.util.HashMap[Character, Array[Long]]()
    var i = 0
    while (i < m) {
      val c = Character.valueOf(p.charAt(i))
      var mask = peq.get(c)
      if (mask == null) { mask = new Array[Long](w); peq.put(c, mask) }
      mask(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    val zeros = new Array[Long](w)
    val pv = Array.fill(w)(-1L)
    val mv = new Array[Long](w)
    // top bit of the LAST block = pattern position m-1
    val lastHigh = 1L << ((m - 1) & 63)
    var score = m
    var j = 0
    val n = t.length
    while (j < n) {
      val masks = peq.getOrDefault(Character.valueOf(t.charAt(j)), zeros)
      var hin = 1 // D[0][j+1] − D[0][j] = +1 along the top boundary
      var b = 0
      while (b < w) {
        val eqRaw = masks(b)
        val pvB = pv(b)
        val mvB = mv(b)
        // carry-in < 0 acts like a match at the block's first row
        val eq = if (hin < 0) eqRaw | 1L else eqRaw
        val xv = eqRaw | mvB
        val xh = (((eq & pvB) + pvB) ^ pvB) | eq
        var ph = mvB | ~(xh | pvB)
        var mh = pvB & xh
        val highBit = if (b == w - 1) lastHigh else java.lang.Long.MIN_VALUE
        var hout = 0
        if ((ph & highBit) != 0L) hout = 1
        else if ((mh & highBit) != 0L) hout = -1
        ph = ph << 1
        mh = mh << 1
        if (hin > 0) ph |= 1L
        else if (hin < 0) mh |= 1L
        pv(b) = mh | ~(xv | ph)
        mv(b) = ph & xv
        hin = hout
        b += 1
      }
      score += hin // hout of the last block = ΔD[m][·]
      j += 1
    }
    score
  }
}
