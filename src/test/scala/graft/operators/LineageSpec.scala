package graft.operators

import graft.SparkSpec

/** Reliable-mode contract for [[Lineage.cut]]: `setCheckpointDir` is
  * invoked exactly once per configured base directory, no matter how
  * many cuts run. The guard must survive two failure modes seen in
  * review:
  *  - Option-equality / naive comparison against the raw base never
  *    matches the qualified `<scheme>:<dir>/<UUID>` path Spark
  *    stores, so every cut mints a fresh UUID subdir (one driver-FS
  *    round-trip per cut) and clobbers a dir the host app set;
  *  - a SUBSTRING match false-positives when one base is a string
  *    prefix of another (`/x/chk` vs `/x/chk2`), silently leaving
  *    checkpoints in the old directory after a reconfigure.
  * Spark exposes no setCheckpointDir call counter, so "invoked once"
  * is asserted through its observable effect: the qualified
  * checkpoint path (base + random UUID leaf) is IDENTICAL across
  * cuts — any re-invocation would mint a fresh UUID. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-lineage-")
    val p = d.resolve(name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  private def frame = spark.range(10).toDF("id")

  test("two cuts against one base dir set the checkpoint dir once " +
      "(same UUID subdir, host setting preserved)") {
    val base = tmp("chk")
    try {
      Lineage.checkpointDirOverride = Some(base)
      Lineage.cut(frame).count()
      val after1 = sc.getCheckpointDir
      after1 should not be empty
      after1.get should include(new java.io.File(base).getName)
      Lineage.cut(frame).count()
      withClue("second cut re-invoked setCheckpointDir (fresh UUID): ") {
        sc.getCheckpointDir shouldBe after1
      }
      // exactly one UUID subdir was minted under the base
      new java.io.File(base).listFiles().count(_.isDirectory) shouldBe 1
    } finally Lineage.checkpointDirOverride = None
  }

  test("a base that is a string prefix of the active one is NOT a " +
      "match: reconfiguring /x/chk2 -> /x/chk moves the checkpoints") {
    val root = java.nio.file.Files.createTempDirectory("graft-lineage-")
    val chk2 = root.resolve("chk2"); val chk = root.resolve("chk")
    java.nio.file.Files.createDirectories(chk2)
    java.nio.file.Files.createDirectories(chk)
    try {
      Lineage.checkpointDirOverride = Some(chk2.toString)
      Lineage.cut(frame).count()
      val atChk2 = sc.getCheckpointDir.get
      atChk2 should include("chk2")
      // now reconfigure to the PREFIX base — a substring guard would
      // false-positive on ".../chk2/<uuid>".contains(".../chk")
      Lineage.checkpointDirOverride = Some(chk.toString)
      Lineage.cut(frame).count()
      val atChk = sc.getCheckpointDir.get
      withClue("reconfigure to a prefix base was silently ignored: ") {
        atChk should not be atChk2
      }
      new org.apache.hadoop.fs.Path(atChk).getParent.getName shouldBe "chk"
      // and the new base is sticky too: one more cut, same UUID
      Lineage.cut(frame).count()
      sc.getCheckpointDir.get shouldBe atChk
    } finally Lineage.checkpointDirOverride = None
  }

  test("cut under reliable mode still yields the same rows") {
    val base = tmp("chk")
    try {
      Lineage.checkpointDirOverride = Some(base)
      val out = Lineage.cut(frame.withColumn("id", $"id" * 2))
      out.as[Long].collect().sorted shouldBe (0L until 20L by 2).toArray
    } finally Lineage.checkpointDirOverride = None
  }
}
