package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k highest-scored ids per group
  * (ties broken by ascending id — fully deterministic).
  *
  * The scale story vs a rank window: `row_number().over(partitionBy
  * (g).orderBy(...))` sorts EVERY group member on the shuffled side;
  * this `Aggregator` keeps an O(k) buffer with map-side partial
  * aggregation, so only k rows per group cross the wire — the right
  * shape when groups are large (e.g. kNN against a full corpus).
  */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.size < k) trim(buf :+ in)
    else if (better(in, buf.last)) trim(buf :+ in)
    else buf
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    trim(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
