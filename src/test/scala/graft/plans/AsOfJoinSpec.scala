package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 150L, "t3"), (3L, 50L, "t4")
  ).toDF("user", "t", "trade")
  private lazy val quotes = Seq(
    (1L, 90L, "q90"), (1L, 100L, "q100"), (1L, 150L, "q150"),
    (2L, 151L, "q151")
  ).toDF("q_user", "q_t", "quote")

  test("randomized differential: both directions match a pure-Scala reference model") {
    // the custom physical operator vs an in-memory oracle over 25
    // seeded random datasets — key skew, empty keys, boundary ties
    // (right.time == left.time) all arise naturally. Right (key, time)
    // pairs are unique per dataset: the operator's tiebreak between
    // equal-time right rows is sort-order-dependent, which is fine in
    // production (any of the equal-time states is "the state as of t")
    // but would make a differential test flaky.
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 25) {
      val nL = 1 + rnd.nextInt(40)
      val nR = rnd.nextInt(40)
      val lefts = (1 to nL).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, s"L$i"))
      val rights = rnd.shuffle(
        (0 until 5).flatMap(k =>
          (0 until 50).map(t => (k.toLong, t.toLong))).toVector)
        .take(nR).map { case (k, t) => (k, t, s"R$k-$t") }
      val lDf = lefts.toDF("user", "t", "lid")
      val rDf = rights.toDF("q_user", "q_t", "rv")

      def reference(forward: Boolean): Map[String, Option[String]] =
        lefts.map { case (k, t, id) =>
          val cands = rights.filter(r => r._1 == k &&
            (if (forward) r._2 >= t else r._2 <= t))
          id -> (if (cands.isEmpty) None
                 else if (forward) Some(cands.minBy(_._2)._3)
                 else Some(cands.maxBy(_._2)._3))
        }.toMap

      def run(forward: Boolean): Map[String, Option[String]] = {
        val joined =
          if (forward) AsOfJoin.forward(lDf, rDf,
            keys = Seq("user" -> "q_user"), leftTime = "t", rightTime = "q_t")
          else AsOfJoin.backward(lDf, rDf,
            keys = Seq("user" -> "q_user"), leftTime = "t", rightTime = "q_t")
        joined.select($"lid", $"rv").collect()
          .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      }

      withClue(s"case $case_ backward (nL=$nL nR=$nR): ") {
        run(forward = false) shouldBe reference(forward = false)
      }
      withClue(s"case $case_ forward (nL=$nL nR=$nR): ") {
        run(forward = true) shouldBe reference(forward = true)
      }
    }
  }

  test("backward as-of attaches the latest right row at or before left time") {
    val out = AsOfJoin.backward(trades, quotes,
      keys = Seq("user" -> "q_user"), leftTime = "t", rightTime = "q_t")
      .select($"trade", $"quote").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("t1") shouldBe "q100" // inclusive: q_t == t wins over q90
    out("t2") shouldBe "q150" // latest ≤ 200
    out("t3") shouldBe null   // only later quote for user 2
    out("t4") shouldBe null   // no quotes for user 3
  }

  test("matches the composed join+max form on real events data (e9 contract)") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "events").withColumn("tsu", unix_micros($"ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"tsu".as("c_tsu"), $"event_id".as("c_id"))
    val custom = AsOfJoin.backward(purchases, clicks,
      keys = Seq("user_id" -> "c_user"), leftTime = "tsu", rightTime = "c_tsu")
      .select($"event_id", $"c_tsu".as("last_click_tsu"))
    val composed = purchases.join(clicks,
        $"c_user" === $"user_id" && $"c_tsu" <= $"tsu", "left")
      .groupBy($"event_id").agg(max($"c_tsu").as("last_click_tsu"))
    val a = custom.orderBy("event_id").collect().toSeq
    val b = composed.orderBy("event_id").collect().toSeq
    a.map(r => (r.getLong(0), Option(r.get(1)))) shouldBe
      b.map(r => (r.getLong(0), Option(r.get(1))))
    a.nonEmpty shouldBe true
  }

  test("forward as-of attaches the earliest right row at or after left time") {
    val out = AsOfJoin.forward(trades, quotes,
      keys = Seq("user" -> "q_user"), leftTime = "t", rightTime = "q_t")
      .select($"trade", $"quote").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("t1") shouldBe "q100" // inclusive: q_t == t wins over q150
    out("t2") shouldBe null   // nothing at or after 200 for user 1
    out("t3") shouldBe "q151" // earliest ≥ 150
    out("t4") shouldBe null   // no quotes for user 3
  }

  test("forward: shared lookahead serves equal-time and repeated left rows") {
    // two left rows with the SAME (key, time) and one right row after:
    // the peek merge must serve BOTH (the right row is never consumed)
    val l = Seq((1L, 100L, "a"), (1L, 100L, "b"), (1L, 120L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 130L, "next")).toDF("rk", "rt", "v")
    val out = AsOfJoin.forward(l, r, Seq("k" -> "rk"), "t", "rt")
      .select($"tag", $"v").collect().map(x => x.getString(0) -> x.getString(1)).toMap
    out shouldBe Map("a" -> "next", "b" -> "next", "c" -> "next")
  }

  test("forward matches the composed join+min form on many keys and ties") {
    val l = (1 to 200).map(i => (i.toLong % 10, i.toLong * 10)).toDF("k", "t")
    val r = (1 to 500).map(i => (i.toLong % 10, i.toLong * 4 + 1, s"v$i"))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.forward(l, r, Seq("k" -> "rk"), "t", "rt")
    val expected = l.join(r, $"k" === $"rk" && $"rt" >= $"t", "left")
      .groupBy($"k", $"t").agg(min($"rt").as("best"))
    val got = out.select($"k", $"t", $"rt").orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    val want = expected.orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    got.toSeq shouldBe want.toSeq
  }

  test("plans as one merge pass: AsOfJoinExec with exchange+sort per side") {
    val df = AsOfJoin.backward(trades, quotes,
      Seq("user" -> "q_user"), "t", "q_t")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("AsOfJoin") // nodeName strips the Exec suffix
    plan should include("Sort")
    // and exactly one exchange per side, not the join+agg double shuffle
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
  }

  test("many keys and ties: every left row gets the right candidate") {
    val l = (1 to 200).map(i => (i.toLong % 10, i.toLong * 10)).toDF("k", "t")
    val r = (1 to 500).map(i => (i.toLong % 10, i.toLong * 4 + 1, s"v$i"))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.backward(l, r, Seq("k" -> "rk"), "t", "rt")
    val expected = l.join(r, $"k" === $"rk" && $"rt" <= $"t", "left")
      .groupBy($"k", $"t").agg(max($"rt").as("best"))
    val got = out.select($"k", $"t", $"rt").orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    val want = expected.orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    got.toSeq shouldBe want.toSeq
  }
}
