package graft.etl

import graft.SparkSpec

/** The full insert / overwrite / delete / passthrough / absent-
  * tombstone matrix for [[CdcApply]], plus last-writer-wins within a
  * key and the batch-composition law the k2 oracle relies on. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    rows.toDF("k", "payload")

  private def log(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "v", "op", "payload")

  private def applied(s: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame) =
    CdcApply(s, c, "k", Seq("v"), "op", Seq("payload"))
      .as[(Long, String)].collect().toSet

  test("insert, overwrite, delete, passthrough, and no-op tombstone") {
    val s = snap((1L, "old1"), (2L, "old2"), (3L, "old3"))
    val c = log(
      (2L, 10L, "U", "new2"),  // overwrite
      (3L, 10L, "D", "x"),     // delete
      (4L, 10L, "U", "new4"),  // insert
      (5L, 10L, "D", "x"))     // tombstone for absent key: no-op
    applied(s, c) shouldBe Set((1L, "old1"), (2L, "new2"), (4L, "new4"))
  }

  test("last writer wins within a key, by version") {
    val c = log((1L, 1L, "U", "a"), (1L, 3L, "U", "c"), (1L, 2L, "D", "x"))
    applied(snap(), c) shouldBe Set((1L, "c"))
    // highest version is the delete: key ends absent
    val c2 = log((1L, 1L, "U", "a"), (1L, 5L, "D", "x"), (1L, 2L, "U", "b"))
    applied(snap(), c2) shouldBe Set.empty
  }

  test("randomized LWW law: CdcApply equals a per-key last-writer fold") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val snapRows = (1L to 8L).filter(_ => rnd.nextBoolean()).map(k => (k, s"s$k"))
      val changes = (1 to 40).map { v =>
        (1L + rnd.nextInt(10), v.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U", s"p$v")
      }
      // reference model: per key, the highest-version change decides
      val expected = changes.groupBy(_._1)
        .foldLeft(snapRows.toMap) { case (m, (k, cs)) =>
          val last = cs.maxBy(_._2)
          if (last._3 == "D") m - k else m + (k -> last._4)
        }
      withClue(s"round $round") {
        applied(snapRows.toDF("k", "payload"),
          changes.toDF("k", "v", "op", "payload")) shouldBe
          expected.toSet.map((kv: (Long, String)) => kv)
      }
    }
  }

  test("degenerate inputs: empty log is identity; empty snapshot is build") {
    val s = snap((1L, "a"), (2L, "b"))
    applied(s, log()) shouldBe Set((1L, "a"), (2L, "b"))
    applied(snap(), log((3L, 1L, "U", "c"))) shouldBe Set((3L, "c"))
    applied(snap(), log()) shouldBe Set.empty
  }

  test("batch composition: apply(apply(s, c1), c2) == apply(s, c1 ++ c2)") {
    val s = snap((1L, "old1"), (2L, "old2"))
    val c1 = log((1L, 1L, "D", "x"), (3L, 1L, "U", "a3"))
    val c2 = log((1L, 2L, "U", "back1"), (2L, 2L, "D", "x"))
    val stepwise = applied(CdcApply(s, c1, "k", Seq("v"), "op", Seq("payload")), c2)
    val once = applied(s, c1.unionByName(c2))
    stepwise shouldBe once
    stepwise shouldBe Set((1L, "back1"), (3L, "a3"))
  }
}
