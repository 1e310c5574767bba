package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloomBytes, key)` — membership probe of a
  * long key against a serialized [[org.apache.spark.util.sketch
  * .BloomFilter]] carried as a BINARY literal.
  *
  * This is the user-space form of Spark's own runtime bloom filter
  * (`InjectRuntimeFilter` builds the same sketch from the build side
  * of a join and probes it on the stream side): the filter is built
  * ONCE driver-side from the small side's keys (`df.stat
  * .bloomFilter` — a treeAggregate over mergeable partials, never the
  * rows themselves) and shipped in the plan; the probe then prunes
  * the BIG side map-side, before any shuffle, with the expected
  * false-positive rate as the only cost. False positives are removed
  * by the exact join that follows — the sketch changes WHERE rows
  * die (scan-side vs post-shuffle), never the result.
  *
  * The filter deserializes once per expression instance at plan time
  * (the bytes child must be foldable — a literal); both the
  * interpreted path and the generated code reference that single
  * deserialized object, so the per-row cost is the pure bit probe.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter = {
    require(left.foldable, "graft_bloom_contains: bloom bytes must be a literal")
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bytes: Any, key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (_, k) => s"$ref.mightContainLong($k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
