package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native kernels must be bit-identical to the SQL formulas they
  * replace — these specs pin that equivalence. */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    "key agg row scan slow fast table",
    "a b c",
    "x y" // shorter than the shingle width
  ).toDF("text").withColumn("w", split($"text", " "))

  test("graft_shingle_hash equals the md5/conv SQL pipeline") {
    val kernel = docs.select(
      call_function("graft_shingle_hash", $"w", lit(3)).as("xs"))
      .select(array_sort($"xs")).as[Seq[Long]].collect()
    // the SQL pipeline is only well-defined for size(w) >= 3 (ANSI
    // array indexing); the kernel returns empty below that
    val sql = docs.filter(org.apache.spark.sql.functions.size($"w") >= 3).select(expr(
      """array_sort(transform(
        |  array_distinct(transform(sequence(0, size(w)-3),
        |    i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))),
        |  s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % 2147483647L))
        |""".stripMargin).as("xs")).as[Seq[Long]].collect()
    kernel(0) shouldBe sql(0)
    kernel(1) shouldBe sql(1)
    kernel(2) shouldBe Seq.empty
  }

  test("graft_minhash equals k array_min(transform) scans") {
    val perms = graft.operators.TextDedup.minhashPerms(16)
    val xs = docs.limit(1)
      .select(call_function("graft_shingle_hash", $"w", lit(3)).as("xs"))
    val kernel = xs.select(call_function("graft_minhash", $"xs", lit(16)).as("sig"))
      .as[Seq[Long]].head()
    val sqlCols = perms.zipWithIndex.map { case ((a, b), i) =>
      expr(s"array_min(transform(xs, x -> ($a * x + $b) % 2147483647))").as(s"h$i")
    }
    val sql = xs.select(array(sqlCols.map(c => c): _*).as("sig")).as[Seq[Long]].head()
    kernel shouldBe sql
  }

  test("graft_shingle_seq: positional grams; distinct equals graft_shingle_hash") {
    val seq = docs.select(
      call_function("graft_shingle_seq", $"w", lit(3)).as("xs"))
      .as[Seq[Long]].collect()
    val dis = docs.select(
      call_function("graft_shingle_hash", $"w", lit(3)).as("xs"))
      .as[Seq[Long]].collect()
    // positional form: size(w) - 2 entries, order = document order
    seq(0).length shouldBe 5 // 7 words, 3-grams
    seq(0).distinct.sorted shouldBe dis(0).sorted
    seq(2) shouldBe Seq.empty // shorter than gram width
    // position i hashes words i..i+2 — check one by hand
    seq(0)(1) shouldBe ShingleHash.hashOne("agg row scan")
    // repeated grams are KEPT (the whole point vs the distinct set)
    val rep = Seq("a b c a b c a b").toDF("text")
      .withColumn("w", split($"text", " "))
      .select(call_function("graft_shingle_seq", $"w", lit(3)).as("xs"))
      .as[Seq[Long]].head()
    rep.length shouldBe 6
    rep(0) shouldBe rep(3) // "a b c" at positions 0 and 3
  }

  test("graft_winnow equals the array_distinct(transform(array_min(slice))) lambda") {
    // random-ish hash arrays incl. duplicates and short arrays
    val rows = Seq(
      (1L to 20L).map(i => (i * 2654435761L) % 97),        // collisions mod 97
      Seq(5L, 4L, 3L, 2L, 1L),                             // strictly decreasing
      Seq(7L, 7L, 7L, 7L),                                 // constant, one window min
      Seq(1L, 2L, 3L),                                     // shorter than window
      Seq.empty[Long])
      .toDF("hs")
    val kernel = rows.select(call_function("graft_winnow", $"hs", lit(4)).as("f"))
      .as[Seq[Long]].collect()
    // the lambda THROWS on short arrays (slice over sequence(0,
    // negative)) — t5's size filter used to protect it; compare on
    // the well-defined rows, pin the kernel's short-array contract
    // separately (empty, not an error — strictly more robust)
    val lambda = rows.filter(expr("size(hs) >= 4")).select(expr(
      "array_distinct(transform(sequence(0, size(hs)-4), i -> array_min(slice(hs, i+1, 4))))")
      .as("f")).as[Seq[Long]].collect()
    kernel(0) shouldBe lambda(0)
    kernel(1) shouldBe lambda(1)
    kernel(2) shouldBe lambda(2)
    kernel(3) shouldBe Seq.empty // m < w → no windows
    kernel(4) shouldBe Seq.empty
  }

  test("graft_count_in equals size(filter(...)) on the stopword predicate") {
    val stop = Seq("the", "a", "of")
    val pred = stop.map(w => s"x = '$w'").mkString(" OR ")
    val rows = Seq(
      "the cat of the house a", // duplicates counted per occurrence
      "no function words here",
      "the the the",
      "").toDF("text").withColumn("w", split($"text", " "))
    val kernel = rows.select(call_function("graft_count_in", $"w",
      array(stop.map(lit): _*)).as("c")).as[Long].collect()
    val lambda = rows.select(expr(s"size(filter(w, x -> $pred))")
      .cast("long").as("c")).as[Long].collect()
    kernel.toSeq shouldBe lambda.toSeq
    kernel(0) shouldBe 4L
    kernel(2) shouldBe 3L
  }

  test("kernels survive codegen over many rows") {
    val n = spark.range(2000)
      .select(split(concat_ws(" ", lit("a"), $"id", lit("b"), $"id" + 1, lit("c")), " ").as("w"))
      .select(call_function("graft_minhash",
        call_function("graft_shingle_hash", $"w", lit(3)), lit(16)).as("sig"))
      .select(explode($"sig")).distinct().count()
    n should be > 100L
  }
}
