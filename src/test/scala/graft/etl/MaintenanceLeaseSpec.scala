package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance writer lease: concurrent runs on one tree
  * serialize, a sink's leased appends never land inside a half-swapped
  * directory, foreign live leases fail fast, stale leases break. */
class MaintenanceLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private val horizon = "2024-02-15 00:00:00"

  private def scdRows = Seq(
    (1L, "OLD", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      Option(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")), false),
    (2L, "STAY", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      Option.empty[java.sql.Timestamp], true))
    .toDF("key", "attr", "validFrom", "validTo", "isCurrent")

  test("two concurrent maintenance runs on one dim serialize; both converge") {
    val dim = tmp("graft-lease-dim")
    scdRows.write.mode("overwrite").parquet(dim.toString)
    val job = () => Maintenance.run(spark,
      dims = Seq(Maintenance.Scd2Table(dim.toString, horizon))).scd2.head
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (a, b) = (Future(job()), Future(job()))
    val results = Seq(Await.result(a, 5.minutes), Await.result(b, 5.minutes))
    // one run vacuumed 2 -> 1; the other saw either the pre state
    // (2 -> 1, idempotent) or the post state (1 -> 1, no-op) — never
    // an interleaved swap (which would lose the table or duplicate it)
    results.foreach(_.rowsAfter shouldBe 1L)
    spark.read.parquet(dim.toString).select(col("attr"))
      .collect().map(_.getString(0)).toSet shouldBe Set("STAY")
    Files.exists(Paths.get(dim.toString + ".lease")) shouldBe false
  }

  test("a sink's leased appends and a concurrent compaction never interleave") {
    val serve = tmp("graft-lease-serve")
    // fragment the tree so the compaction has real work
    (1 to 3).foreach { i =>
      Seq(("a", i.toLong)).toDF("source", "id")
        .repartition(1).write.mode("append")
        .partitionBy("source").parquet(serve.toString)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val compact = Future {
      Maintenance.run(spark, serving = Seq(Maintenance.ServingTree(
        serve.toString, Seq("source"), Seq("id"),
        maxRecordsPerFile = 1 << 20)))
    }
    // the sink appends 5 micro-batches, each under the SAME lease the
    // compaction holds — serialization means every batch lands either
    // wholly before or wholly after the swap, never inside it
    val sink = Future {
      (100 to 104).foreach { i =>
        MaintenanceLease.withLease(spark, serve.toString) {
          Seq(("a", i.toLong)).toDF("source", "id")
            .repartition(1).write.mode("append")
            .partitionBy("source").parquet(serve.toString)
        }
      }
    }
    Await.result(compact, 5.minutes)
    Await.result(sink, 5.minutes)
    // zero lost rows: 3 original + 5 appended
    spark.read.parquet(serve.toString).select(col("id"))
      .collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 3L, 100L, 101L, 102L, 103L, 104L)
    Files.exists(Paths.get(serve.toString + ".lease")) shouldBe false
  }

  test("release only frees an OWNED lease — a foreign lease that replaced it survives") {
    val tree = tmp("graft-lease-own")
    val lease = Paths.get(tree.toString + ".lease")
    val foreign = s"other-process ${System.currentTimeMillis() + 600000}"
    MaintenanceLease.withLease(spark, tree.toString) {
      // simulate outliving the TTL: another process broke our lease
      // and took its own while we were still running
      Files.write(lease, foreign.getBytes(StandardCharsets.UTF_8))
    }
    // our release must NOT have freed the other holder's live lease
    new String(Files.readAllBytes(lease),
      StandardCharsets.UTF_8) shouldBe foreign
    Files.delete(lease)
  }

  test("an empty lease file is judged by mtime: fresh blocks, old breaks") {
    val tree = tmp("graft-lease-empty")
    val lease = Paths.get(tree.toString + ".lease")
    // fresh empty file = someone mid-create → conservative: held
    Files.write(lease, Array.emptyByteArray)
    an[MaintenanceLease.HeldException] should be thrownBy {
      MaintenanceLease.withLease(spark, tree.toString)(())
    }
    // same empty file but older than the ttl → stale, broken, acquired
    Files.setLastModifiedTime(lease, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 16L * 60 * 1000))
    var ran = false
    MaintenanceLease.withLease(spark, tree.toString) { ran = true }
    ran shouldBe true
    Files.exists(lease) shouldBe false
  }

  test("fencing: a TTL-expired holder's late swap is rejected while the " +
      "new holder's completes") {
    val tree = tmp("graft-lease-fence")
    // fragment two partitions so the compaction has a real rename batch
    (1 to 3).foreach { i =>
      Seq(("a", i.toLong), ("b", i.toLong)).toDF("source", "id")
        .repartition(1).write.mode("append")
        .partitionBy("source").parquet(tree.toString)
    }
    val want = spark.read.parquet(tree.toString)
      .select(col("id"), col("source")).collect().map(_.toSeq).toSet
    val lease = Paths.get(tree.toString + ".lease")
    val newHolder = s"new-holder ${System.currentTimeMillis() + 600000}"
    // the stale holder acquires, then — simulating that it outlived its
    // TTL — a breaker fences its lease and installs its own BEFORE the
    // stale holder reaches its rename batches
    val rejected = intercept[MaintenanceLease.HeldException] {
      MaintenanceLease.withLeaseFenced(spark, tree.toString) { fence =>
        Files.write(lease, newHolder.getBytes(StandardCharsets.UTF_8))
        // the swap protocols call exactly this before each rename batch
        CorpusLayout.compactPartitioned(spark, tree.toString,
          Seq("source"), Seq("id"), maxRecordsPerFile = 1 << 20,
          fence = Some(fence))
      }
    }
    rejected.getMessage should include("fencing check failed")
    // the stale holder renamed NOTHING: live tree intact (its staging
    // write ran, but no leaf swap started — recovery discards it)
    spark.read.parquet(tree.toString)
      .select(col("id"), col("source")).collect().map(_.toSeq)
      .toSet shouldBe want
    // and its owned-only release left the new holder's lease alone
    new String(Files.readAllBytes(lease),
      StandardCharsets.UTF_8) shouldBe newHolder
    // the NEW holder (after the stale one aborted) completes normally
    Files.delete(lease)
    val rep = Maintenance.run(spark, serving = Seq(Maintenance.ServingTree(
      tree.toString, Seq("source"), Seq("id"),
      maxRecordsPerFile = 1 << 20)))
    rep.skippedHeld shouldBe empty
    rep.compaction.head._2.filesAfter shouldBe 2 // one per partition
    spark.read.parquet(tree.toString)
      .select(col("id"), col("source")).collect().map(_.toSeq)
      .toSet shouldBe want
  }

  test("Maintenance.run skips a foreign-held tree and still maintains " +
      "the rest, reporting the skip") {
    val held = tmp("graft-lease-skip-held")
    val free = tmp("graft-lease-skip-free")
    scdRows.write.mode("overwrite").parquet(held.toString)
    scdRows.write.mode("overwrite").parquet(free.toString)
    val heldLease = Paths.get(held.toString + ".lease")
    Files.write(heldLease,
      s"other-process ${System.currentTimeMillis() + 600000}"
        .getBytes(StandardCharsets.UTF_8))
    val rep = Maintenance.run(spark, dims = Seq(
      Maintenance.Scd2Table(held.toString, horizon),
      Maintenance.Scd2Table(free.toString, horizon)))
    // one foreign holder must not starve the other trees
    rep.skippedHeld shouldBe Seq(held.toString)
    rep.scd2.map(_.path) shouldBe Seq(free.toString)
    rep.scd2.head.rowsAfter shouldBe 1L
    spark.read.parquet(held.toString).count() shouldBe 2L // untouched
    Files.delete(heldLease)
  }

  test("a live foreign lease fails fast; a stale one is broken") {
    val tree = tmp("graft-lease-foreign")
    val lease = Paths.get(tree.toString + ".lease")
    // live foreign lease (expiry far in the future)
    Files.write(lease, s"other-process ${System.currentTimeMillis() + 600000}"
      .getBytes(StandardCharsets.UTF_8))
    an[MaintenanceLease.HeldException] should be thrownBy {
      MaintenanceLease.withLease(spark, tree.toString)(())
    }
    // stale foreign lease (already expired) is broken and re-acquired
    Files.write(lease, s"other-process ${System.currentTimeMillis() - 1000}"
      .getBytes(StandardCharsets.UTF_8))
    var ran = false
    MaintenanceLease.withLease(spark, tree.toString) { ran = true }
    ran shouldBe true
    Files.exists(lease) shouldBe false
  }
}
