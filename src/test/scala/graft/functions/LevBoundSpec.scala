package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_lev_bound must return EXACTLY what the classic DP (and
  * Spark's own 3-arg levenshtein) returns — the bit-parallel form is
  * an implementation, not an approximation. Randomized differential
  * coverage spans both code paths (single-word m ≤ 64 and the block
  * form), tiny alphabets (worst-case carry churn), and the cap
  * boundary. */
class LevBoundSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: classic full DP, no cap. */
  private def dp(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    var prev = Array.tabulate(n + 1)(identity)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      cur(0) = i
      var j = 1
      while (j <= n) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(sub, math.min(prev(j) + 1, cur(j - 1) + 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  test("edge cases: empties, equal, cap boundary, negative cap") {
    LevBound.dist("", "", 0) shouldBe 0
    LevBound.dist("", "abc", 3) shouldBe 3
    LevBound.dist("", "abc", 2) shouldBe -1
    LevBound.dist("abc", "abc", 0) shouldBe 0
    LevBound.dist("kitten", "sitting", 3) shouldBe 3
    LevBound.dist("kitten", "sitting", 2) shouldBe -1
    LevBound.dist("a", "b", -1) shouldBe -1
    // length-difference prune fires regardless of content
    LevBound.dist("a" * 10, "a" * 100, 10) shouldBe -1
  }

  test("randomized differential vs classic DP (both block regimes, " +
      "small alphabets)") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 0 until 400) {
      val alpha = 2 + rnd.nextInt(25)
      // force m>64 block path on half the trials, incl. multi-block
      val maxLen = if (trial % 2 == 0) 60 else 80 + rnd.nextInt(240)
      def str() = {
        val len = rnd.nextInt(maxLen + 1)
        new String(Array.fill(len)(('a' + rnd.nextInt(alpha)).toChar))
      }
      val (a, b) = (str(), str())
      val want = dp(a, b)
      withClue(s"trial=$trial a=${a.length} b=${b.length} alpha=$alpha") {
        LevBound.dist(a, b, Int.MaxValue) shouldBe want
        LevBound.dist(a, b, want) shouldBe want
        if (want > 0) LevBound.dist(a, b, want - 1) shouldBe -1
      }
    }
  }

  test("column form agrees with Spark's built-in 3-arg levenshtein " +
      "and stays codegen (d14's exact verification tier)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      def str(n: Int) =
        new String(Array.fill(rnd.nextInt(n))(('a' + rnd.nextInt(4)).toChar))
      (str(200), str(200), rnd.nextInt(60))
    }
    // repartition keeps ConvertToLocalRelation from folding the whole
    // query driver-side — the point is to see the codegen'd plan
    val df = rows.toDF("l", "r", "cap").repartition(2)
      .withColumn("got",
        call_function("graft_lev_bound", col("l"), col("r"), col("cap")))
      .withColumn("want",
        call_function("levenshtein", col("l"), col("r"), col("cap")))
    df.filter(col("got") =!= col("want")).count() shouldBe 0
    df.filter(col("got").isNull =!= col("want").isNull).count() shouldBe 0
    // codegen path really engages (no interpreted fallback) — execute
    // first so AQE materializes the final stages into the plan string;
    // the `*(n)` prefix is the whole-stage-codegen marker
    df.collect()
    val planLine = df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("graft_lev_bound")).next().trim
    withClue(planLine)(planLine should startWith regex """\+- \*\(\d+\)""")
  }
}
