package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle of the bounded artifact registry backing DocArtifacts /
  * PqArtifacts / GraphArtifacts: memoized builds, LRU residency
  * bound, idempotent release, and the release-vs-build race (the
  * leak the @volatile-flag design had). */
class ArtifactRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def bundle(tag: Int): DataFrame = {
    val df = Seq((tag, tag)).toDF("a", "b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  test("memoizes per (session, dir): one build per key") {
    var builds = 0
    val reg = new ArtifactRegistry[DataFrame](f => Seq(f), maxCorpora = 4)
    def get(d: String) = reg(spark, d) { (_, _) => builds += 1; bundle(builds) }
    get("a"); get("a"); get("a")
    builds shouldBe 1
    reg.release(spark, "a")
  }

  test("LRU bound: exceeding maxCorpora releases the least-recently-USED bundle") {
    val reg = new ArtifactRegistry[DataFrame](f => Seq(f), maxCorpora = 2)
    val fa = reg(spark, "a") { (_, _) => bundle(1) }
    val fb = reg(spark, "b") { (_, _) => bundle(2) }
    reg(spark, "a") { (_, _) => fail("a is resident — must not rebuild") }
    val fc = reg(spark, "c") { (_, _) => bundle(3) } // evicts b (LRU), not a
    fb.storageLevel shouldBe StorageLevel.NONE
    fa.storageLevel should not be StorageLevel.NONE
    fc.storageLevel should not be StorageLevel.NONE
    reg.size shouldBe 2
    // the evicted key rebuilds on next access (lazy re-admission)
    var rebuilt = false
    reg(spark, "b") { (_, _) => rebuilt = true; bundle(4) }
    rebuilt shouldBe true
    Seq("a", "b", "c").foreach(reg.release(spark, _))
  }

  test("release unpersists, is idempotent, and a later access rebuilds") {
    val reg = new ArtifactRegistry[DataFrame](f => Seq(f), maxCorpora = 4)
    val f = reg(spark, "x") { (_, _) => bundle(9) }
    reg.release(spark, "x")
    f.storageLevel shouldBe StorageLevel.NONE
    reg.release(spark, "x") // second release: no-op, no throw
    var rebuilt = false
    reg(spark, "x") { (_, _) => rebuilt = true; bundle(10) }
    rebuilt shouldBe true
    reg.release(spark, "x")
  }

  test("a release racing an in-flight build waits for it and still unpersists") {
    val reg = new ArtifactRegistry[DataFrame](f => Seq(f), maxCorpora = 4)
    val started = new java.util.concurrent.CountDownLatch(1)
    val frame = new java.util.concurrent.atomic.AtomicReference[DataFrame]
    val builder = new Thread(() => {
      reg(spark, "r") { (_, _) =>
        started.countDown()
        Thread.sleep(300) // release arrives mid-build
        val f = bundle(42); frame.set(f); f
      }
      ()
    })
    builder.start()
    started.await()
    reg.release(spark, "r") // must WAIT for the build, then unpersist
    builder.join()
    frame.get.storageLevel shouldBe StorageLevel.NONE
  }
}
