package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch replay of recorded webhook JSON (SURVEY §2.1 S3, §2.3 F5,
  * §2.7 O1 — the reference's file harness): recursively list a
  * capture directory, keep `*.json` files matching a substring
  * pattern, order deterministically by file path, optionally limit to
  * the first N files, and feed each line as an envelope.
  *
  * Spark-first: the listing/filter is the data source's job
  * (`recursiveFileLookup` + `pathGlobFilter`), the pattern filter and
  * deterministic order ride on `input_file_name()`, and the limit is
  * a rank over distinct files — no driver-side directory walk.
  */
object Replay {

  def envelopes(
      spark: SparkSession, dir: String, source: String,
      pattern: Option[String] = None, limit: Option[Int] = None): DataFrame = {
    var reader = spark.read
      .schema("value STRING")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json")
    val raw = reader.text(dir)
      .select(col("value"), input_file_name().as("src_file"))
      .filter(pattern.map(p => col("src_file").contains(p)).getOrElse(lit(true)))
    val limited = limit match {
      case Some(n) =>
        // first N files in path order — rank the METADATA-scale
        // distinct-file frame and semi-join the kept names back, so
        // every line of a kept file survives without funneling the
        // whole corpus through one global-window reducer (a
        // full-replay limit at 100× would serialize on one core; the
        // file list is always tiny relative to the lines)
        val keep = raw.select(col("src_file")).distinct()
          .orderBy(col("src_file")).limit(n)
        raw.join(broadcast(keep), Seq("src_file"), "left_semi")
      case None => raw
    }
    limited.select(
      lit(source).as("source"),
      map().cast("map<string,string>").as("headers"),
      col("value").as("body"),
      current_timestamp().as("receivedAt"),
      col("src_file"))
  }

  /** Replay through the full ingest pipeline; returns the reference
    * harness's summary counters (A2) alongside the outputs. */
  final case class Summary(files: Long, lines: Long, processed: Long)

  def run(
      spark: SparkSession, dir: String, source: String,
      ledger: DataFrame, roster: Option[DataFrame],
      nowEpochSec: Long, pattern: Option[String] = None,
      limit: Option[Int] = None): (IngestPipeline.Output, Summary) = {
    val env = envelopes(spark, dir, source, pattern, limit).cache()
    val out = IngestPipeline.run(env.drop("src_file"), ledger, roster, nowEpochSec)
    val files = env.select(countDistinct(col("src_file"))).head().getLong(0)
    val lines = env.count()
    (out, Summary(files, lines, out.facts.count()))
  }
}
