package graft.etl

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stripe-locked durable-table lifecycle under actual CONCURRENCY
  * (round 14 — the races the refcount/lock design claims to close,
  * exercised with real threads rather than sequential calls):
  * build-or-attach races build exactly once; a reader session's scans
  * survive another session's concurrent release; a raced idempotent
  * append lands exactly once. */
class DurableConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def await(latch: CountDownLatch): Unit =
    latch.await(120, TimeUnit.SECONDS) shouldBe true

  test("build-or-attach raced from 8 threads builds exactly once, " +
      "every caller reads the same rows") {
    val table = s"graft_conc_build_${graft.ArtifactRegistry.processTag}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 8).foreach { _ =>
      pool.execute { () =>
        try {
          start.await()
          val scan = DurableArtifacts.bucketedTable(
            spark, table, 2, Seq("id"), Seq("id")) {
            builds.incrementAndGet()
            (1L to 500L).toDF("id").withColumn("v", col("id") * 2)
          }
          results.add(scan.agg(sum(col("v"))).head().getLong(0))
          ()
        } catch { case t: Throwable => errors.add(t); () }
        finally done.countDown()
      }
    }
    start.countDown(); await(done); pool.shutdown()
    errors shouldBe empty
    builds.get() shouldBe 1
    import scala.jdk.CollectionConverters._
    results.iterator().asScala.toSet shouldBe Set(500L * 501L)
    DurableArtifacts.drop(spark, table)
    spark.catalog.tableExists(table) shouldBe false
  }

  test("a reader session's scans survive a sibling's concurrent " +
      "release; the table retires only when the reader releases too") {
    val table = s"graft_conc_rel_${graft.ArtifactRegistry.processTag}"
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    DurableArtifacts.bucketedTable(s1, table, 2, Seq("id"), Seq("id")) {
      (1L to 1000L).toDF("id")
    }
    DurableArtifacts.bucketedTable(s2, table, 2, Seq("id"), Seq("id")) {
      fail("second session must attach, not rebuild")
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try while (!stop.get()) {
        s2.table(table).count() shouldBe 1000L
        reads.incrementAndGet(); ()
      } catch { case t: Throwable => errors.add(t); () }
    })
    reader.start()
    // release s1 WHILE s2 is actively scanning — refcount must keep
    // the table (and its directory) alive for the attached reader
    Thread.sleep(50)
    DurableArtifacts.drop(s1, table)
    Thread.sleep(300) // let the reader keep scanning post-release
    spark.catalog.tableExists(table) shouldBe true
    stop.set(true); reader.join(30000)
    errors shouldBe empty
    reads.get() should be > 0
    DurableArtifacts.drop(s2, table)
    spark.catalog.tableExists(table) shouldBe false
  }

  test("a raced idempotent append lands the delta exactly once") {
    val table = s"graft_conc_app_${graft.ArtifactRegistry.processTag}"
    DurableArtifacts.bucketedTable(spark, table, 2, Seq("id"), Seq("id")) {
      (1L to 100L).toDF("id")
    }
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(4)
    val applied = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 4).foreach { _ =>
      pool.execute { () =>
        try {
          start.await()
          val ran = DurableArtifacts.appendBucketed(spark, table, 2,
            Seq("id"), Seq("id"),
            alreadyFolded = cur => !cur.filter(col("id") > 100L).isEmpty) {
            (101L to 150L).toDF("id")
          }
          if (ran) { applied.incrementAndGet(); () }
        } catch { case t: Throwable => errors.add(t); () }
        finally done.countDown()
      }
    }
    start.countDown(); await(done); pool.shutdown()
    errors shouldBe empty
    applied.get() shouldBe 1 // the predicate ran under the stripe lock
    spark.table(table).count() shouldBe 150L
    DurableArtifacts.drop(spark, table)
  }
}
