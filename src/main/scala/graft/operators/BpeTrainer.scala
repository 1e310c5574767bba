package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training — the vocabulary
  * LEARNING step of an LLM pipeline (t3 counts tokens under a fixed
  * tokenizer; this builds the tokenizer). Classic BPE (Sennrich et
  * al., ACL'16): repeatedly count adjacent token pairs across the
  * corpus, merge the most frequent pair everywhere, repeat.
  *
  * Spark shape per round: one explode + partial/final count agg keyed
  * on (a, b) (the corpus-wide pair histogram), a driver read of ONE
  * winning row (iterative control flow, the ConnectedComponents
  * convention — never data collection), then a map-side
  * `graft_pair_merge` kernel application (greedy left-to-right,
  * sequential per row — precisely what a `transform` lambda cannot
  * express) with a localCheckpoint to cut lineage. At 100 TB each
  * round is one scan + one vocabulary-sized shuffle; R rounds = R
  * passes, the textbook distributed-BPE cost. Production trainers
  * batch several non-interacting merges per pass; the per-round
  * structure here is the same.
  *
  * Ties break deterministically by (count desc, a, b) so the learned
  * merge table is reproducible across runs and partitionings.
  */
object BpeTrainer {

  /** One learned merge: rank (1-based round), the pair, its count at
    * merge time. */
  final case class Merge(rank: Int, a: String, b: String, count: Long)

  final case class Result(merges: Seq[Merge], corpus: DataFrame)

  /** Learn `rounds` merges over `df`'s token-array column. Returns
    * the merge table and the corpus re-tokenized under it. Stops
    * early when no adjacent pair remains. */
  def train(df: DataFrame, tokensCol: String, rounds: Int): Result = {
    require(rounds >= 0, "rounds must be non-negative")
    var corpus = df
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = corpus
        .filter(expr(s"size($tokensCol) >= 2")) // sequence(0,-1) descends!
        .select(explode(expr(
          s"transform(sequence(0, size($tokensCol) - 2), " +
            s"i -> struct($tokensCol[i] AS a, $tokensCol[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect() // ONE row: the round's winner — control flow, not data
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, n)
        corpus = corpus.withColumn(tokensCol,
          call_function("graft_pair_merge", col(tokensCol), lit(a), lit(b)))
          .localCheckpoint()
        r += 1
      }
    }
    Result(merges.result(), corpus)
  }

  /** Apply an already-learned merge table to a (new) corpus — the
    * inference-side tokenization under a frozen vocabulary, e.g.
    * today's crawl under yesterday's tokenizer. Merges apply in rank
    * order, exactly as during training. */
  def applyMerges(df: DataFrame, tokensCol: String, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(df) { (d, m) =>
      d.withColumn(tokensCol,
        call_function("graft_pair_merge", col(tokensCol), lit(m.a), lit(m.b)))
    }
}
