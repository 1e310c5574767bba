package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The combined lifecycle job: one entry point, idempotent, and every
  * crash window of the SCD2 clear-and-replace swap converges. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private val horizon = "2024-02-15 00:00:00"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** expired-closed (drops), retained-closed (survives), open
    * (survives) — one key each. */
  private def scdRows: DataFrame = Seq(
    (1L, "OLD", ts("2024-01-01 00:00:00"),
      Option(ts("2024-02-01 00:00:00")), false),    // expired closed
    (2L, "MOVED", ts("2024-01-01 00:00:00"),
      Option(ts("2024-03-01 00:00:00")), false),    // retained closed
    (2L, "NEW", ts("2024-03-01 00:00:00"), None, true),
    (3L, "STAY", ts("2024-01-01 00:00:00"), None, true))
    .toDF("key", "attr", "validFrom", "validTo", "isCurrent")

  private def attrsAt(path: String): Set[String] =
    spark.read.parquet(path).select(col("attr"))
      .collect().map(_.getString(0)).toSet

  test("one entry point: compact + scd2 vacuum + artifact drop, idempotent") {
    val serve = tmp("graft-maint-serve"); val dim = tmp("graft-maint-dim")
    val art = tmp("graft-maint-art")
    // fragmented serving tree: three appends -> 3 files per partition
    (1 to 3).foreach { i =>
      Seq(("a", i.toLong), ("b", i.toLong)).toDF("source", "id")
        .repartition(1).write.mode("append")
        .partitionBy("source").parquet(serve.toString)
    }
    scdRows.write.mode("overwrite").parquet(dim.toString)
    Files.write(art.resolve("blob.bin"),
      "retired".getBytes(StandardCharsets.UTF_8))

    val r = Maintenance.run(spark,
      serving = Seq(Maintenance.ServingTree(serve.toString,
        Seq("source"), Seq("id"), maxRecordsPerFile = 1 << 20)),
      dims = Seq(Maintenance.Scd2Table(dim.toString, horizon)),
      retiredArtifacts = Seq(art.toString))

    r.compaction.head._2.filesBefore shouldBe 6
    r.compaction.head._2.filesAfter shouldBe 2
    r.scd2.head.rowsBefore shouldBe 4
    r.scd2.head.rowsAfter shouldBe 3
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY")
    r.artifactsDropped shouldBe Seq(art.toString)
    Files.exists(art) shouldBe false
    // serving rows survived the bin-pack
    spark.read.parquet(serve.toString).count() shouldBe 6

    // re-run: a completed job is a no-op
    val r2 = Maintenance.run(spark,
      serving = Seq(Maintenance.ServingTree(serve.toString,
        Seq("source"), Seq("id"), maxRecordsPerFile = 1 << 20)),
      dims = Seq(Maintenance.Scd2Table(dim.toString, horizon)),
      retiredArtifacts = Seq(art.toString))
    r2.compaction.head._2.partitions shouldBe empty
    r2.scd2.head.rowsBefore shouldBe 3
    r2.scd2.head.rowsAfter shouldBe 3
    r2.artifactsDropped shouldBe empty
  }

  /** Builds a dim dir + the staged state of a MID-SWAP vacuum whose
    * staging carries a sentinel open row (so convergence to the
    * STAGED data — roll-forward — is distinguishable from a fresh
    * vacuum of the old table — roll-back). */
  private def stagedState(): (Path, DataFrame) = {
    val dim = tmp("graft-maint-crash")
    scdRows.write.mode("overwrite").parquet(dim.toString)
    val staged = Scd2.vacuum(scdRows, to_timestamp(lit(horizon)))
      .union(Seq((99L, "SENTINEL", ts("2024-04-01 00:00:00"),
        Option.empty[Timestamp], true))
        .toDF("key", "attr", "validFrom", "validTo", "isCurrent"))
    (dim, staged)
  }

  private def rerun(dim: Path): Maintenance.Scd2Report =
    Maintenance.run(spark,
      dims = Seq(Maintenance.Scd2Table(dim.toString, horizon))).scd2.head

  test("crash window: staging without marker rolls BACK to a fresh vacuum") {
    val (dim, staged) = stagedState()
    staged.write.mode("overwrite").parquet(dim.toString + ".vacuum-staging")
    // no marker -> the staged (sentinel-bearing) tree must be discarded
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY")
    Files.exists(Paths.get(dim.toString + ".vacuum-staging")) shouldBe false
  }

  test("crash window: marker present, table not yet moved -> roll FORWARD") {
    val (dim, staged) = stagedState()
    staged.write.mode("overwrite").parquet(dim.toString + ".vacuum-staging")
    Files.write(Paths.get(dim.toString + ".vacuum-staging", "_COMMIT"),
      Array.emptyByteArray)
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY", "SENTINEL")
  }

  test("crash window: marker present, table already moved to orig -> roll FORWARD") {
    val (dim, staged) = stagedState()
    staged.write.mode("overwrite").parquet(dim.toString + ".vacuum-staging")
    Files.write(Paths.get(dim.toString + ".vacuum-staging", "_COMMIT"),
      Array.emptyByteArray)
    Files.move(dim, Paths.get(dim.toString + ".vacuum-orig"))
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY", "SENTINEL")
    Files.exists(Paths.get(dim.toString + ".vacuum-orig")) shouldBe false
  }

  /** Truncates the tail off every staged parquet data file — the
    * power-crash artifact (durable marker, unpersisted data pages)
    * recovery's footer probe must catch. */
  private def corruptStaging(stagingDir: Path): Unit = {
    Files.list(stagingDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(math.max(0L, ch.size() - 4L)) finally ch.close()
      }
  }

  test("crash window: marker durable but staging truncated, table intact -> roll BACK") {
    val (dim, staged) = stagedState()
    val staging = Paths.get(dim.toString + ".vacuum-staging")
    staged.write.mode("overwrite").parquet(staging.toString)
    Files.write(staging.resolve("_COMMIT"), Array.emptyByteArray)
    corruptStaging(staging)
    // footer probe fails -> the corrupt staged tree is discarded and a
    // FRESH vacuum runs over the intact table (no SENTINEL, no loss)
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY")
    Files.exists(staging) shouldBe false
  }

  test("crash window: marker durable but staging truncated, table moved -> orig restored") {
    val (dim, staged) = stagedState()
    val staging = Paths.get(dim.toString + ".vacuum-staging")
    staged.write.mode("overwrite").parquet(staging.toString)
    Files.write(staging.resolve("_COMMIT"), Array.emptyByteArray)
    corruptStaging(staging)
    Files.move(dim, Paths.get(dim.toString + ".vacuum-orig"))
    // the ORIGINAL table (pre-vacuum, all 4 rows incl. OLD) comes back
    // rather than rolling forward onto truncated files, then the rerun
    // vacuums it fresh
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY")
    Files.exists(staging) shouldBe false
    Files.exists(Paths.get(dim.toString + ".vacuum-orig")) shouldBe false
  }

  test("crash window: orig alone (no staging, no table) -> orig is restored, never deleted") {
    // the state a crash between corrupt-staging rollback steps could
    // leave (and the reason the rollback restores BEFORE discarding):
    // the tail must read a lone orig as the sole surviving copy
    val (dim, _) = stagedState()
    Files.move(dim, Paths.get(dim.toString + ".vacuum-orig"))
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY")
    Files.exists(Paths.get(dim.toString + ".vacuum-orig")) shouldBe false
  }

  test("crash window: swap landed, cleanup interrupted -> tail finishes") {
    val (dim, staged) = stagedState()
    // simulate the post-rename state: P = staged content + internal
    // marker, orig tree still present
    val orig = Paths.get(dim.toString + ".vacuum-orig")
    Files.move(dim, orig)
    staged.write.mode("overwrite").parquet(dim.toString)
    Files.write(dim.resolve("_COMMIT"), Array.emptyByteArray)
    rerun(dim)
    attrsAt(dim.toString) shouldBe Set("MOVED", "NEW", "STAY", "SENTINEL")
    Files.exists(dim.resolve("_COMMIT")) shouldBe false
    Files.exists(orig) shouldBe false
  }
}
