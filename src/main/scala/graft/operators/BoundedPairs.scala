package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-group pair enumeration with bounded per-reducer work.
  *
  * `withinGroupPairs(df, g, id, maxCell)` yields every ordered pair
  * (`a.id < b.id`) of rows sharing `g` — the same pair set as the
  * naive self-join on `g` — but a group of size n is hash-chunked
  * into m = ⌈n / maxCell⌉ chunks: the left side replicates each row
  * to every target chunk, the right side keys by its own chunk, and
  * the join runs on (g, chunk). One degenerate group (the k-means
  * cell that swallowed the corpus, the boilerplate bucket) therefore
  * spreads across m join keys with ≈ n·maxCell candidate rows per
  * key instead of n² on a single reducer — the e16 salted-join shape
  * applied to self-pairing. Groups at or under `maxCell` keep m = 1
  * (zero replication), so the guard is free until skew appears.
  *
  * The chunk count table is one row per group (metadata-scale,
  * always broadcastable); chunk assignment is deterministic
  * (`xxhash64(id) mod m`), so the output is stable run-to-run.
  * Callers select through the `a.` / `b.` aliases exactly as with a
  * plain self-join.
  */
object BoundedPairs {

  def withinGroupPairs(
      df: DataFrame, groupCol: String, idCol: String, maxCell: Int): DataFrame = {
    require(maxCell > 0, "maxCell must be positive")
    val sizes = chunkCounts(df, groupCol, maxCell)
    val tagged = df.join(broadcast(sizes), Seq(groupCol))
    val aSide = tagged
      .withColumn("__t", explode(sequence(lit(0), col("__m") - 1)))
      .drop("__m")
    val bSide = tagged
      .withColumn("__t", pmod(xxhash64(col(idCol)), col("__m")).cast("int"))
      .drop("__m")
    aSide.as("a").hint("shuffle_hash")
      .join(bSide.as("b").hint("shuffle_hash"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col("a.__t") === col("b.__t") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
  }

  /** Two-sided form: every (left row, right row) pair sharing `g`
    * with DIFFERENT ids — the delta-vs-index shape (d12). The RIGHT
    * (index) side is chunked by its own group sizes; the LEFT
    * (delta) side replicates per target chunk, so one degenerate
    * index cell spreads across ⌈n_right/maxCell⌉ keys instead of one
    * reducer. Pair set = the plain group equi-join minus same-id
    * rows, each pair exactly once. */
  def crossGroupPairs(
      left: DataFrame, right: DataFrame,
      groupCol: String, idCol: String, maxCell: Int): DataFrame = {
    require(maxCell > 0, "maxCell must be positive")
    val sizes = chunkCounts(right, groupCol, maxCell)
    val aSide = left.join(broadcast(sizes), Seq(groupCol))
      .withColumn("__t", explode(sequence(lit(0), col("__m") - 1)))
      .drop("__m")
    val bSide = right.join(broadcast(sizes), Seq(groupCol))
      .withColumn("__t", pmod(xxhash64(col(idCol)), col("__m")).cast("int"))
      .drop("__m")
    aSide.as("a").hint("shuffle_hash")
      .join(bSide.as("b").hint("shuffle_hash"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col("a.__t") === col("b.__t") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
  }

  /** One row per group: `__m` = ⌈group size / maxCell⌉ chunks —
    * metadata-scale, always broadcastable. */
  private def chunkCounts(df: DataFrame, groupCol: String, maxCell: Int): DataFrame =
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__m", greatest(lit(1),
        ceil(col("__n") / lit(maxCell.toDouble)).cast("int")))
      .select(col(groupCol), col("__m"))
}
