package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_pair_merge(tokens, a, b)` — one BPE merge application:
  * every non-overlapping adjacent occurrence of (a, b) in the token
  * array is replaced by the concatenated token `a+b`, scanning left
  * to right greedily (the byte-pair-encoding convention: "a a a a"
  * under merge (a,a) → ["aa","aa"], two merges, not three).
  *
  * This is inherently sequential per row — not expressible as a
  * `transform` lambda (each output token depends on whether the
  * previous pair merged) — which is exactly what makes a native
  * kernel the right Spark extension point: one generated-code call,
  * no per-row closures, codegen-friendly in the merge-round scan.
  */
case class PairMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // null elements pass through unmerged, so containsNull follows the input
  override def dataType: DataType = first.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "graft_pair_merge"

  override protected def nullSafeEval(toks: Any, a: Any, b: Any): Any =
    PairMerge.merge(toks.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a, b) => s"graft.functions.PairMerge.merge($t, $a, $b)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PairMerge =
    copy(first = f, second = s, third = t)
}

object PairMerge {
  def merge(toks: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val m = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (cur != null && i + 1 < m && !toks.isNullAt(i + 1) &&
          cur.equals(a) && toks.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(cur) // null elements are non-matching and pass through
        i += 1
      }
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_count_in(arr, probes)` — how many elements of `arr` occur
  * in the (small, typically literal) `probes` array: the
  * stopword-density primitive behind the t1/t2 quality features and
  * the curation language gate. `size(filter(arr, x -> x = 'the' OR
  * ...))` evaluates the lambda interpreted per element; this is one
  * generated-code call with a tight two-level scan (probe sets are
  * a handful of function words — linear beats hashing; swap in a set
  * if a probe list ever grows past ~100). */
case class CountIn(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_count_in"

  override protected def nullSafeEval(arr: Any, probes: Any): Any =
    CountIn.countIn(arr.asInstanceOf[ArrayData], probes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, p) => s"graft.functions.CountIn.countIn($a, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}

/** `graft_norm(text)` — the t7/curation text normalizer in one
  * kernel call: Unicode-lowercase (the same `UTF8String.toLowerCase`
  * Spark's `lower()` uses, so the cross-engine contract with the
  * DuckDB regex oracle is untouched), then a single byte scan that
  * keeps `[a-z0-9 ]`, collapses space runs and trims — byte-for-byte
  * `trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ''),
  * ' +', ' '))` without two regex-engine passes over every document
  * (the single hottest stage of the composed curation pipeline by
  * the c1 budget table: lang_gate carried 50% of stage cost, most of
  * it this normalization). Multi-byte UTF-8 sequences drop correctly
  * in the byte scan: every byte of one has the high bit set, so each
  * fails the ASCII class test exactly as the char-level regex drops
  * the whole char. Differential spec: NormTextSpec (randomized
  * against the regex composition). */
case class NormText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(s: Any): Any =
    NormText.norm(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormText.norm($c)")

  override protected def withNewChildInternal(n: Expression): NormText =
    copy(child = n)
}

object NormText {
  def norm(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        // a space run (or leading spaces) resolves when the next kept
        // char arrives: emit one separator unless at the start (trim)
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c; o += 1
      } else if (c == ' ') pendingSpace = true
      // any other byte (punct, control, UTF-8 continuation) drops
      i += 1
    }
    UTF8String.fromBytes(out, 0, o) // trailing run never emits = trim
  }
}

object CountIn {
  def countIn(arr: ArrayData, probes: ArrayData): Long = {
    val n = arr.numElements()
    val k = probes.numElements()
    var count = 0L
    var i = 0
    while (i < n) {
      val x = arr.getUTF8String(i)
      var j = 0
      var hit = false
      while (j < k && !hit) {
        if (x != null && x.equals(probes.getUTF8String(j))) hit = true
        j += 1
      }
      if (hit) count += 1
      i += 1
    }
    count
  }
}
