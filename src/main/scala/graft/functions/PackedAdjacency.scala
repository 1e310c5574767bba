package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `graft_pack_sorted(array<long>) -> binary` — sort + delta-varint
  * pack an id list into a compact byte buffer.
  *
  * The shuffle-payload kernel for adjacency-carrying exchanges (g2's
  * closure): an UnsafeArrayData long array costs 8 B/element on the
  * wire plus header, while a SORTED id list delta-varint packs to
  * ~1-2 B/element on graph-scale ids (neighbor gaps are small once
  * ids are dense). At sf10 g2's one big exchange carries ~5 G array
  * elements — packing turns tens of GB of shuffle into a few.
  *
  * Encoding: first value zigzag-varint (sign-safe), then plain
  * varint deltas (non-negative after the sort). The sort happens
  * inside the kernel so callers don't depend on collect_list order
  * (which is arrival order, not a contract). Duplicates are DROPPED
  * after the sort (zero deltas skipped), so a packed buffer is
  * always a SET: [[PackedIntersect]]/[[PackedCommonCount]] then
  * match `array_intersect`/`cardinality(array_intersect)` semantics
  * even when a caller packs a collect_list that contains repeats
  * (g2's oriented edges and d15's shingle sets are distinct by
  * construction, but the kernel must not make that a silent
  * requirement). Null array → null.
  */
case class PackSortedLongs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_sorted"

  override protected def nullSafeEval(a: Any): Any =
    PackSortedLongs.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackSortedLongs.pack($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PackSortedLongs = copy(child = newChild)
}

object PackSortedLongs {
  /** Called from generated code — one tight loop, no boxing. */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) { xs(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(xs)
    // a 64-bit varint spans up to ceil(64/7) = 10 bytes (a
    // max-unsigned delta, e.g. MinValue -> MaxValue, hits it)
    val buf = new Array[Byte](n * 10)
    var pos = 0
    var prev = 0L
    i = 0
    while (i < n) {
      // zigzag the head (ids are non-negative here but the codec
      // must not silently corrupt a negative), plain varint deltas
      var d =
        if (i == 0) (xs(0) << 1) ^ (xs(0) >> 63)
        else xs(i) - prev
      // skip duplicates (zero delta after the sort): packed buffers
      // are sets, matching array_intersect semantics for any caller
      if (i == 0 || d != 0L) {
        prev = xs(i)
        while ((d & ~0x7FL) != 0L) {
          buf(pos) = ((d & 0x7FL) | 0x80L).toByte; pos += 1; d >>>= 7
        }
        buf(pos) = d.toByte; pos += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }
}

/** `graft_packed_intersect(binary, binary) -> array<long>` — the
  * sorted-merge intersection of two [[PackSortedLongs]] buffers,
  * decoded lazily during the walk (no intermediate arrays). Replaces
  * `array_intersect` on the unpacked form: same elements, ascending
  * order, at a fraction of the exchange bytes and without
  * array_intersect's per-call hash set. Nulls: either side null →
  * null. */
case class PackedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_packed_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedIntersect.intersect(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PackedIntersect.intersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedIntersect =
    copy(left = newLeft, right = newRight)
}

/** `graft_packed_common(binary, binary) -> int` — the CARDINALITY of
  * the [[PackedIntersect]] merge, skipping the output array: the
  * verify kernel for containment/Jaccard-style |A ∩ B| checks where
  * only the count matters. Same two-pointer walk, zero allocation. */
case class PackedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_packed_common"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedCommonCount.common(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.PackedCommonCount.common($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedCommonCount =
    copy(left = newLeft, right = newRight)
}

object PackedCommonCount {
  /** Called from generated code. */
  def common(a: Array[Byte], b: Array[Byte]): Int = {
    var ia = 0; var ib = 0
    var va = 0L; var vb = 0L
    var firstA = true; var firstB = true
    var k = 0
    def nextA(): Unit = {
      var d = 0L; var shift = 0
      var bt: Long = 0L
      while ({ bt = a(ia) & 0xFFL; ia += 1; (bt & 0x80L) != 0L }) {
        d |= (bt & 0x7FL) << shift; shift += 7
      }
      d |= bt << shift
      va = if (firstA) { firstA = false; (d >>> 1) ^ -(d & 1L) } else va + d
    }
    def nextB(): Unit = {
      var d = 0L; var shift = 0
      var bt: Long = 0L
      while ({ bt = b(ib) & 0xFFL; ib += 1; (bt & 0x80L) != 0L }) {
        d |= (bt & 0x7FL) << shift; shift += 7
      }
      d |= bt << shift
      vb = if (firstB) { firstB = false; (d >>> 1) ^ -(d & 1L) } else vb + d
    }
    if (ia < a.length && ib < b.length) {
      nextA(); nextB()
      var done = false
      while (!done) {
        if (va == vb) {
          k += 1
          if (ia < a.length && ib < b.length) { nextA(); nextB() }
          else done = true
        } else if (va < vb) {
          if (ia < a.length) nextA() else done = true
        } else {
          if (ib < b.length) nextB() else done = true
        }
      }
    }
    k
  }
}

object PackedIntersect {
  /** Called from generated code: two-pointer merge over the packed
    * streams. Output is bounded by the shorter input's cardinality. */
  def intersect(a: Array[Byte], b: Array[Byte]): ArrayData = {
    var ia = 0; var ib = 0
    var va = 0L; var vb = 0L
    var firstA = true; var firstB = true
    // worst case: every element of the shorter side matches
    val out = new Array[Long](math.min(a.length, b.length))
    var k = 0

    // decode next value from a / b; returns Long.MinValue via the
    // `more` flags — inlined manually to keep this allocation-free
    def nextA(): Unit = {
      var d = 0L; var shift = 0
      var bt: Long = 0L
      while ({ bt = a(ia) & 0xFFL; ia += 1; (bt & 0x80L) != 0L }) {
        d |= (bt & 0x7FL) << shift; shift += 7
      }
      d |= bt << shift
      va = if (firstA) { firstA = false; (d >>> 1) ^ -(d & 1L) } else va + d
    }
    def nextB(): Unit = {
      var d = 0L; var shift = 0
      var bt: Long = 0L
      while ({ bt = b(ib) & 0xFFL; ib += 1; (bt & 0x80L) != 0L }) {
        d |= (bt & 0x7FL) << shift; shift += 7
      }
      d |= bt << shift
      vb = if (firstB) { firstB = false; (d >>> 1) ^ -(d & 1L) } else vb + d
    }

    if (ia < a.length && ib < b.length) {
      nextA(); nextB()
      var done = false
      while (!done) {
        if (va == vb) {
          out(k) = va; k += 1
          if (ia < a.length && ib < b.length) { nextA(); nextB() }
          else done = true
        } else if (va < vb) {
          if (ia < a.length) nextA() else done = true
        } else {
          if (ib < b.length) nextB() else done = true
        }
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
