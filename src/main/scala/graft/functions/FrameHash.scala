package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_ahash(frame)` — 16-bit average-hash of a 16-byte binary
  * frame as int64: bit i is set iff `16·bᵢ > Σb` over the unsigned
  * first 16 bytes (the all-integer form of the classic mean-threshold
  * aHash; see m3 in [[graft.queries.MediaQueries]]).
  *
  * Replaces the per-byte hex-parse lambda pipeline
  * `aggregate(sequence(0,15), ..., conv(substring(hex(fr),...),16,10) ...)`
  * whose ~50 expression nodes evaluate INTERPRETED per element — the
  * same pitfall that motivated [[ShingleHash]]. One tight codegen'd
  * loop over the raw bytes; no hex round-trip at all.
  *
  * Short-frame contract (< 16 bytes): returns 0, matching the lambda
  * form where `conv('', 16, 10)` yields NULL, the null poisons the
  * frame sum, every bit comparison becomes NULL → 0 — pinned
  * kernel-vs-lambda in FrameHashSpec.
  */
case class AHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash"

  override protected def nullSafeEval(bytes: Any): Any =
    AHash.ahash(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.AHash.ahash($b)")

  override protected def withNewChildInternal(newChild: Expression): AHash =
    copy(child = newChild)
}

object AHash {
  def ahash(bytes: Array[Byte]): Long = {
    if (bytes.length < 16) return 0L
    var sum = 0L
    var i = 0
    while (i < 16) { sum += (bytes(i) & 0xffL); i += 1 }
    var h = 0L
    i = 0
    while (i < 16) {
      if (16L * (bytes(i) & 0xffL) > sum) h |= 1L << i
      i += 1
    }
    h
  }
}
