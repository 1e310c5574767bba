package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BpeTrainer]] against the classic Sennrich et al. corpus, the
  * greedy-overlap convention, and train/apply parity. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // the ACL'16 example: word frequencies {low:5, lower:2, newest:6,
  // widest:3}, characters + an end-of-word marker as initial tokens
  private def classic = {
    val words = Seq.fill(5)("l o w </w>") ++ Seq.fill(2)("l o w e r </w>") ++
      Seq.fill(6)("n e w e s t </w>") ++ Seq.fill(3)("w i d e s t </w>")
    words.toDF("text").withColumn("toks", split($"text", " ")).drop("text")
  }

  test("learns the textbook merge sequence with deterministic tie-breaks") {
    val r = BpeTrainer.train(classic, "toks", 4)
    r.merges.map(m => (m.rank, m.a, m.b, m.count)) shouldBe Seq(
      (1, "e", "s", 9L),     // ties (e,s)/(s,t)/(t,</w>) → lexicographic a
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L))
    val corpus = r.corpus.select("toks").as[Seq[String]].collect()
    corpus should contain(Seq("lo", "w", "</w>"))           // low
    corpus should contain(Seq("n", "e", "w", "est</w>"))    // newest
    corpus should contain(Seq("w", "i", "d", "est</w>"))    // widest
    corpus should contain(Seq("lo", "w", "e", "r", "</w>")) // lower
  }

  test("greedy left-to-right merge: overlapping pairs never double-merge") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a")).toDF("toks")
    val merged = df.select(
      call_function("graft_pair_merge", $"toks", lit("a"), lit("a")).as("t"))
      .as[Seq[String]].collect()
    merged(0) shouldBe Seq("aa", "aa") // 2 merges, not 3
    merged(1) shouldBe Seq("aa", "a")  // trailing singleton survives
  }

  test("graft_pair_merge: null token elements are non-matching and pass through") {
    // the kernel is a registered SQL function — callers beyond
    // BpeTrainer can hand it arrays with null elements
    val df = Seq(Tuple1(Seq("a", null, "a", "a"))).toDF("toks")
    val merged = df.select(
      call_function("graft_pair_merge", $"toks", lit("a"), lit("a")).as("t"))
      .as[Seq[String]].collect()
    merged(0) shouldBe Seq("a", null, "aa")
  }

  test("applyMerges on the raw corpus reproduces the trained corpus") {
    val r = BpeTrainer.train(classic, "toks", 4)
    val applied = BpeTrainer.applyMerges(classic, "toks", r.merges)
      .select("toks").as[Seq[String]].collect().toSeq.sortBy(_.mkString(" "))
    val trained = r.corpus.select("toks").as[Seq[String]]
      .collect().toSeq.sortBy(_.mkString(" "))
    applied shouldBe trained
  }

  test("stops early when the corpus has no adjacent pairs left") {
    val tiny = Seq(Seq("x", "y")).toDF("toks")
    val r = BpeTrainer.train(tiny, "toks", 10)
    // round 1 merges (x,y) → one token; round 2 finds no pairs
    r.merges.map(m => (m.a, m.b)) shouldBe Seq(("x", "y"))
    r.corpus.select("toks").as[Seq[String]].head() shouldBe Seq("xy")
  }
}
