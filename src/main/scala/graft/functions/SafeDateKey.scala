package graft.functions

import java.time.{Instant, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_date_key(ts, tz)` — UTC instant → `yyyy-MM-dd` business-date
  * key in an IANA timezone, silently falling back to UTC when the zone
  * id is invalid.
  *
  * This is the reference's `toDateKeyInTz` (SURVEY §2.2 P2; reference
  * `src/adapters/aloware.adapter.ts:4-22`): the invalid-tz fallback is
  * load-bearing — bad `contact.timezone` strings must not error out or
  * null the row. Built-in `from_utc_timestamp` raises on invalid zones
  * (ANSI), hence this native Catalyst expression: codegen-friendly
  * (static call, no UDF serialization, stays inside WholeStageCodegen
  * spans) and null-propagating only on its inputs.
  */
case class SafeDateKey(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be (TimestampType, StringType); the function builder
  // in GraftExtensions is the only constructor path and callers cast.
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_date_key"

  override protected def nullSafeEval(micros: Any, tz: Any): Any =
    SafeDateKey.dateKey(micros.asInstanceOf[Long], tz.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ts, tz) =>
      s"graft.functions.SafeDateKey.dateKey($ts, $tz)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SafeDateKey =
    copy(left = newLeft, right = newRight)
}

object SafeDateKey {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  // Hot path: called from generated code — resolve the zone with a
  // last-one cache (webhook batches are usually single-tz runs).
  private val lastZone = new java.lang.ThreadLocal[(String, ZoneId)]

  def zoneOrUtc(id: String): ZoneId = {
    val cached = lastZone.get()
    if (cached != null && cached._1 == id) return cached._2
    val z =
      try ZoneId.of(id)
      catch { case _: Exception => ZoneOffset.UTC }
    lastZone.set((id, z))
    z
  }

  /** micros since epoch + zone id → UTF8 "yyyy-MM-dd" in that zone. */
  def dateKey(micros: Long, tz: UTF8String): UTF8String = {
    val instant = Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val zone = if (tz == null) ZoneOffset.UTC else zoneOrUtc(tz.toString)
    UTF8String.fromString(instant.atZone(zone).toLocalDate.format(fmt))
  }
}
