package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CorpusLayout]]: the written tree must actually deliver the
  * layout properties the next job's plan depends on. */
class CorpusLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: domain corners map to the interleaved-bit corners") {
    val corners = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("a", "b")
      .withColumn("z", CorpusLayout.zorderKey(
        col("a"), lit(0.0), lit(65535.0), col("b"), lit(0.0), lit(65535.0)))
      .select("z").as[Long].collect()
    corners shouldBe Array(0L, 0x55555555L, 0xAAAAAAAAL.toLong & 0xFFFFFFFFL, 0xFFFFFFFFL)
  }

  test("writeZOrdered: each file covers a rectangle — both columns prune") {
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("l_quantity"))
    def spans(path: String): (Seq[Long], Seq[Long]) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("pa"),
          (max("l_quantity") - min("l_quantity")).as("qa"))
        .collect()
      (perFile.map(_.getLong(1)).toSeq.sorted, perFile.map(_.getLong(2)).toSeq.sorted)
    }
    def median(xs: Seq[Long]): Long = xs(xs.size / 2)

    // baseline: 16 files sorted by partkey alone — quantity unsorted,
    // every file spans ~the whole quantity domain
    val sortedDir = Files.createTempDirectory("graft-zsortA").toString
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sortedDir)
    val zDir = Files.createTempDirectory("graft-zord").toString
    CorpusLayout.writeZOrdered(li, zDir, "l_partkey", "l_quantity", 16)

    val (paSorted, qaSorted) = spans(sortedDir)
    val (paZ, qaZ) = spans(zDir)
    paSorted.size shouldBe 16
    paZ.size shouldBe 16

    // the A-sorted layout already prunes A ... and nothing else
    val qGlobal = li.agg(max("l_quantity") - min("l_quantity"))
      .collect()(0).getLong(0)
    median(qaSorted) should be >= (qGlobal * 0.9).toLong

    // z-order: BOTH axes shrink per file — rectangles, not stripes
    median(qaZ) should be <= (median(qaSorted) * 0.6).toLong
    val pGlobal = li.agg(max("l_partkey") - min("l_partkey"))
      .collect()(0).getLong(0)
    median(paZ) should be <= (pGlobal * 0.6).toLong

    // nothing lost in transit
    spark.read.parquet(zDir).count() shouldBe li.count()
  }

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

  test("compactPartitioned: bin-packs fragmented partitions only, " +
      "keeps rows/sort/pruning identical, and is idempotent") {
    val dir = Files.createTempDirectory("graft-compact").toString
    // simulate the continuous sink: 8 micro-batches each appending one
    // small file per day directory
    val rows = (1 to 800).map { i =>
      (i.toLong, s"2024-01-${10 + i % 3}", i * 37 % 1000)
    }
    rows.grouped(100).foreach { chunk =>
      chunk.toDF("id", "day", "v")
        .repartition(col("day"))
        .sortWithinPartitions(col("day"), col("v"))
        .write.partitionBy("day").mode("append").parquet(dir)
    }
    def dataFiles(): Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    val before = dataFiles()
    before.values.foreach(_ shouldBe 8) // one file per batch per day
    val want = spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet

    val rep = CorpusLayout.compactPartitioned(spark, dir,
      partitionCols = Seq("day"), sortCols = Seq("v"),
      maxRecordsPerFile = 1000)
    rep.partitions.map(_.before).sum shouldBe before.values.sum
    val after = dataFiles()
    after.keySet shouldBe before.keySet // same partition directories
    after.values.foreach(_ shouldBe 1)  // bin-packed under the cap
    rep.filesAfter shouldBe 3

    // content identical, in-file sort restored
    val back = spark.read.parquet(dir)
    back.select("id", "v", "day").collect().map(_.toSeq).toSet shouldBe want
    new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val vs = spark.read.parquet(f.getAbsolutePath)
          .select("v").as[Int].collect()
        vs.sorted.toSeq shouldBe vs.toSeq
      }
    // the compacted read prunes identically (plan lock)
    val plan = back.filter(col("day") === "2024-01-11")
      .queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[.*2024-01-11.*\\]"

    // SELECTIVE + idempotent: a second pass finds nothing fragmented
    val rep2 = CorpusLayout.compactPartitioned(spark, dir,
      partitionCols = Seq("day"), sortCols = Seq("v"),
      maxRecordsPerFile = 1000)
    rep2.partitions shouldBe empty
    rep2.skipped shouldBe 3
    dataFiles() shouldBe after
  }

  test("compactPartitioned: recovers an interrupted swap — rolls back " +
      "before the commit marker, forward after it, losing nothing") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-compact-recover").toString
    val rows = (1 to 400).map { i =>
      (i.toLong, s"2024-02-${10 + i % 2}", i * 13 % 100)
    }
    rows.grouped(100).foreach { chunk =>
      chunk.toDF("id", "day", "v")
        .repartition(col("day"))
        .sortWithinPartitions(col("day"), col("v"))
        .write.partitionBy("day").mode("append").parquet(dir)
    }
    val want = spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(leaf: Path): Seq[Path] =
      fs.listStatus(leaf).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")).map(_.getPath).toSeq
    val staging = new Path(dir + ".compact-staging")

    // CRASH WINDOW 1 (before _COMMIT): two originals already moved
    // into .orig, uncommitted staged output present → must roll BACK
    // (originals restored, staged output discarded) and then compact
    // normally.
    val leaf10 = new Path(dir, "day=2024-02-10")
    val staged10 = new Path(staging, "day=2024-02-10")
    val orig10 = new Path(staged10, ".orig")
    fs.mkdirs(orig10)
    val bogus = fs.create(new Path(staged10, "part-bogus.parquet"))
    bogus.write("not parquet".getBytes); bogus.close()
    dataFiles(leaf10).take(2).foreach(f =>
      fs.rename(f, new Path(orig10, f.getName)) shouldBe true)
    dataFiles(leaf10).size shouldBe 2 // live leaf now missing files

    val rep = CorpusLayout.compactPartitioned(spark, dir,
      partitionCols = Seq("day"), sortCols = Seq("v"),
      maxRecordsPerFile = 1000)
    rep.partitions.map(_.before).sum shouldBe 8 // all originals seen
    fs.exists(staging) shouldBe false
    spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet shouldBe want

    // CRASH WINDOW 2 (after _COMMIT): every original displaced into
    // .orig, staged replacement not yet renamed in, live leaf EMPTY →
    // must roll FORWARD (staged file lands, .orig is dead).
    val leaf11 = new Path(dir, "day=2024-02-11")
    val staged11 = new Path(staging, "day=2024-02-11")
    val orig11 = new Path(staged11, ".orig")
    fs.mkdirs(orig11)
    val replTmp = Files.createTempDirectory("graft-compact-repl").toString
    spark.read.parquet(dir).filter(col("day") === "2024-02-11")
      .select("id", "v").coalesce(1).write.mode("overwrite").parquet(replTmp)
    val replFile = new java.io.File(replTmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    fs.rename(new Path(replFile.getAbsolutePath),
      new Path(staged11, replFile.getName)) shouldBe true
    dataFiles(leaf11).foreach(f =>
      fs.rename(f, new Path(orig11, f.getName)) shouldBe true)
    fs.createNewFile(new Path(staged11, "_COMMIT")) shouldBe true
    dataFiles(leaf11) shouldBe empty // the crash left the leaf bare

    // the STANDALONE recovery entry point — what a serving process
    // calls at startup, no new compaction needed
    CorpusLayout.recoverCompaction(spark, dir)
    fs.exists(staging) shouldBe false
    dataFiles(leaf11).size shouldBe 1 // the committed staged file
    spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet shouldBe want
    val rep2 = CorpusLayout.compactPartitioned(spark, dir,
      partitionCols = Seq("day"), sortCols = Seq("v"),
      maxRecordsPerFile = 1000)
    rep2.partitions shouldBe empty // nothing fragmented after recovery
  }

  test("compactPartitioned: a committed but TRUNCATED staged leaf rolls " +
      "back to .orig instead of landing corrupt files") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-compact-corrupt").toString
    (1 to 100).grouped(50).foreach { chunk =>
      chunk.map(i => (i.toLong, "2024-03-01", i % 7)).toDF("id", "day", "v")
        .repartition(col("day")).write.partitionBy("day")
        .mode("append").parquet(dir)
    }
    val want = spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(leaf: Path): Seq[Path] =
      fs.listStatus(leaf).filter(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")).map(_.getPath).toSeq
    val staging = new Path(dir + ".compact-staging")
    val leaf = new Path(dir, "day=2024-03-01")
    val staged = new Path(staging, "day=2024-03-01")
    val orig = new Path(staged, ".orig")
    fs.mkdirs(orig)
    // the power-crash artifact: marker durable, staged parquet
    // truncated, originals all displaced, live leaf empty
    val corrupt = fs.create(new Path(staged, "part-corrupt.parquet"))
    corrupt.write("PAR1 then a torn tail".getBytes); corrupt.close()
    dataFiles(leaf).foreach(f =>
      fs.rename(f, new Path(orig, f.getName)) shouldBe true)
    fs.createNewFile(new Path(staged, "_COMMIT")) shouldBe true
    dataFiles(leaf) shouldBe empty

    CorpusLayout.recoverCompaction(spark, dir)
    fs.exists(staging) shouldBe false
    // the ORIGINALS came back; the truncated staged file never landed
    spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet shouldBe want
  }

  test("compactPartitioned: corrupt staging with NO displaced originals " +
      "rolls back automatically — the live leaf provably holds the intact " +
      "originals") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-compact-loneorig").toString
    (1 to 40).map(i => (i.toLong, "2024-05-01", i)).toDF("id", "day", "v")
      .repartition(col("day")).write.partitionBy("day")
      .mode("overwrite").parquet(dir)
    val want = spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + ".compact-staging")
    val staged = new Path(staging, "day=2024-05-01")
    // crash artifact outside the syncStagedTree guarantee: the marker
    // persisted but neither the staged data nor the .orig renames did —
    // live leaf untouched, .orig never created, staged file torn
    fs.mkdirs(staged)
    val corrupt = fs.create(new Path(staged, "part-corrupt.parquet"))
    corrupt.write("torn".getBytes); corrupt.close()
    fs.createNewFile(new Path(staged, "_COMMIT")) shouldBe true

    // recoverable WITHOUT an operator: the live files are the
    // untouched originals; recovery discards the corrupt staging
    CorpusLayout.recoverCompaction(spark, dir)
    fs.exists(staging) shouldBe false
    spark.read.parquet(dir)
      .select("id", "v", "day").collect().map(_.toSeq).toSet shouldBe want
  }

  test("compactPartitioned: a corrupt staged leaf after a PARTIAL " +
      "roll-forward fails loudly and destroys neither copy") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-compact-mixed").toString
    // TWO appends → two original files, so one can be displaced into
    // .orig while the other plays the already-landed staged file — the
    // genuinely mixed state (an empty .orig is the provably-safe
    // lone-originals state the previous test shows rolling back)
    (1 to 40).grouped(20).foreach { chunk =>
      chunk.map(i => (i.toLong, "2024-04-01", i)).toDF("id", "day", "v")
        .repartition(col("day")).write.partitionBy("day")
        .mode("append").parquet(dir)
    }
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + ".compact-staging")
    val leaf = new Path(dir, "day=2024-04-01")
    val staged = new Path(staging, "day=2024-04-01")
    val orig = new Path(staged, ".orig")
    fs.mkdirs(orig)
    // mixed state: marker durable, live leaf already holds a (landed
    // staged) data file, the staged file still in staging is corrupt,
    // originals displaced in .orig — neither roll direction is clean
    val corrupt = fs.create(new Path(staged, "part-corrupt.parquet"))
    corrupt.write("torn".getBytes); corrupt.close()
    fs.createNewFile(new Path(staged, "_COMMIT")) shouldBe true
    val origData = fs.listStatus(leaf).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_")).map(_.getPath)
    origData.tail.foreach(f =>
      fs.rename(f, new Path(orig, f.getName)) shouldBe true)
    // (the one file left in the live leaf plays the already-landed
    // staged replacement)
    an[java.io.IOException] should be thrownBy
      CorpusLayout.recoverCompaction(spark, dir)
    // quarantine intact: staging (with .orig and the corrupt file)
    // survives, the live file survives — manual reconciliation state
    fs.exists(staging) shouldBe true
    fs.exists(orig) shouldBe true
    fs.listStatus(leaf).count(f => f.isFile &&
      !f.getPath.getName.startsWith("_")) shouldBe 1
    // clean up so later suites' temp sweeps don't trip on the tree
    fs.delete(staging, true)
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
