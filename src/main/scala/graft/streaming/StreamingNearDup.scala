package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextDedup

/** Streaming MinHash+LSH near-duplicate detection — the streaming
  * form of batch d3: documents arrive continuously and each one is
  * checked against the signatures already seen, so a pipeline can
  * reject near-dups AT INGEST instead of re-clustering the corpus.
  *
  * Dataflow: signature + band keys are the same stateless kernels as
  * batch (`graft_shingle_hash` → `graft_minhash` → band concat), so
  * batch and stream agree on what "near-dup" means. Each doc explodes
  * to one row per band; `flatMapGroupsWithState` keyed on (band, key)
  * holds the signatures seen in that bucket and emits a hit per
  * stored signature agreeing on ≥ `minSigMatches` of k positions.
  *
  * Scale/state story: state lives per band-bucket, sharded across
  * executors by bucket key — the same partitioning as the batch
  * band join. Each bucket stores `maxBucket` (sig, docId) pairs at
  * most, FIFO-evicted: a bucket that overflows is by definition a
  * boilerplate/dense bucket (the streaming analog of d2's frequency
  * cap and d4's bucket split), so dropping its oldest members bounds
  * memory at `buckets × maxBucket × k` longs while keeping recent
  * history — the right trade for ingest-time filtering. Emission is
  * per band, so a pair colliding in ≥2 bands emits ≥2 rows; key the
  * downstream on (d1, d2) — rows carry `band` so they stay unique.
  */
object StreamingNearDup {

  final case class Banded(band: Int, key: String, docId: Long, sig: Seq[Long])
  final case class Hit(band: Int, d1: Long, d2: Long, sigMatches: Int)

  /** docs(idCol: long, textCol: string) stream → Hit stream.
    * d1 = the arriving doc, d2 = the stored doc it matches. */
  def detect(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, minSigMatches: Int = 12,
      maxBucket: Int = 64): Dataset[Hit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val banded = docs
      .select(col(idCol).as("docId"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("xs", TextDedup.shingleHashes("w", 3))
      .withColumn("sig", TextDedup.minhashSig("xs", k))
      .select(col("docId"), col("sig"),
        explode(array((0 until bands).map(j =>
          struct(lit(j).as("band"),
            concat_ws("-", (0 until rows).map(r =>
              col("sig").getItem(j * rows + r)): _*).as("key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("docId"), col("sig"))
      .as[Banded]

    def update(bucket: (Int, String), batch: Iterator[Banded],
        state: GroupState[List[(Long, Seq[Long])]]): Iterator[Hit] = {
      var seen = state.getOption.getOrElse(Nil)
      val out = Seq.newBuilder[Hit]
      // deterministic arrival order within the micro-batch
      batch.toSeq.sortBy(_.docId).foreach { doc =>
        seen.foreach { case (storedId, storedSig) =>
          if (storedId != doc.docId) {
            val m = storedSig.iterator.zip(doc.sig.iterator)
              .count { case (a, b) => a == b }
            if (m >= minSigMatches)
              out += Hit(bucket._1, doc.docId, storedId, m)
          }
        }
        seen = ((doc.docId, doc.sig) :: seen).take(maxBucket)
      }
      state.update(seen)
      out.result().iterator
    }

    banded
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
