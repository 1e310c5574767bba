package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write-side layout contracts for a curated corpus — the storage
  * half of the scale story. At 100 TB the NEXT job's cost is decided
  * when THIS job writes: partition directories make calendar/source
  * filters partition-pruned scans, bounded file sizes keep task
  * planning sane (no 10 GB files, no 10 M tiny ones), in-file sort
  * order gives parquet min/max row-group pruning on range
  * predicates, and bucketed tables delete the shuffle from every
  * future equi-join on the bucket key (see BucketingSpec for the
  * no-exchange plan proof).
  */
object CorpusLayout {

  /** Parquet tree partitioned by `partitionCols` (one directory per
    * value combination — keep cardinality directory-scale, e.g.
    * source/date, never doc id), each file capped at
    * `maxRecordsPerFile` rows and sorted by `sortCols` so range
    * predicates prune row groups via parquet min/max stats.
    *
    * The `repartition(partitionCols)` before the write routes each
    * output partition's rows to one task — without it every task
    * holds an open writer per directory (memory) and emits a file
    * per (task × directory) — small-file storm at scale. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Int): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(path)
  }

  /** Bucketed + sorted table: co-locates `bucketCols` keys at write
    * time so every later equi-join or aggregation on them plans
    * without an exchange (and sort-merge joins without a sort). Spark
    * bucketing requires the table catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String]): Unit = {
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
