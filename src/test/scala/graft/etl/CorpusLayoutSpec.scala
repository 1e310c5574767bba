package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CorpusLayout]]: the written tree must actually deliver the
  * layout properties the next job's plan depends on. */
class CorpusLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned: partition dirs, file-size cap, in-file sort order") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val docs = (1 to 950).map { i =>
      (i.toLong, s"src${i % 3}", s"doc text $i", i * 37 % 1000)
    }.toDF("doc_id", "source", "text", "quality")
    CorpusLayout.writePartitioned(docs, dir,
      partitionCols = Seq("source"), sortCols = Seq("quality"),
      maxRecordsPerFile = 100)

    // one directory per source value
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    dirs shouldBe Array("source=src0", "source=src1", "source=src2")

    // every data file respects the record cap
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    files should not be empty
    files.foreach { f =>
      spark.read.parquet(f.getAbsolutePath).count() should be <= 100L
    }

    // in-file sort: each file's quality column is non-decreasing
    files.foreach { f =>
      val qs = spark.read.parquet(f.getAbsolutePath)
        .select("quality").as[Int].collect()
      qs.sorted.toSeq shouldBe qs.toSeq
    }

    // round trip: nothing lost, partition column restored
    val back = spark.read.parquet(dir)
    back.count() shouldBe 950L
    back.select(countDistinct(col("source"))).as[Long].head() shouldBe 3L

    // and a source filter becomes a partition filter at the scan
    // (directory pruning, not a data filter)
    val pruned = back.filter(col("source") === "src1")
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[.*src1.*\\]"
  }

  test("writeBucketed: equi-join on the bucket key plans without an exchange") {
    spark.sql("DROP TABLE IF EXISTS layout_docs")
    spark.sql("DROP TABLE IF EXISTS layout_scores")
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val scores = (1L to 500L).map(i => (i, i % 10)).toDF("doc_id", "score")
    CorpusLayout.writeBucketed(docs, "layout_docs", 4,
      Seq("doc_id"), Seq("doc_id"))
    CorpusLayout.writeBucketed(scores, "layout_scores", 4,
      Seq("doc_id"), Seq("doc_id"))
    val joined = spark.table("layout_docs")
      .join(spark.table("layout_scores"), "doc_id")
    joined.count() shouldBe 500L
    joined.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
  }
}
