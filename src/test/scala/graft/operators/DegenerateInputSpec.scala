package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input behavior of the library operators: empty corpora,
  * empty edge sets, single rows. Production pipelines hit these on
  * day one (an empty delta, a filter that drops everything) — every
  * operator must return an empty/identity result, not throw. */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")

  private def sigs(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("w", split(col("text"), " "))
    .withColumn("xs", TextDedup.shingleHashes("w", 3))
    .filter(org.apache.spark.sql.functions.size(col("xs")) > 0)
    .select(col("doc_id"), TextDedup.minhashSig("xs", 16).as("sig"))

  test("lshCandidates: empty and single-doc corpora yield no pairs") {
    TextDedup.lshCandidates(sigs(emptyDocs), "doc_id", 16, 4).count() shouldBe 0
    TextDedup.lshCandidates(sigs(oneDoc), "doc_id", 16, 4).count() shouldBe 0
  }

  test("lshCandidatesTwoSided: empty delta or empty index yields no pairs") {
    val one = sigs(oneDoc)
    val none = sigs(emptyDocs)
    TextDedup.lshCandidatesTwoSided(none, one, "doc_id", 16, 4).count() shouldBe 0
    TextDedup.lshCandidatesTwoSided(one, none, "doc_id", 16, 4).count() shouldBe 0
  }

  test("ConnectedComponents: empty edges -> every node a singleton; empty nodes -> empty") {
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val out = ConnectedComponents.run(noEdges, "s", "d", nodes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    out.toSeq shouldBe Seq((1L, 1L), (2L, 2L), (3L, 3L))

    val noNodes = Seq.empty[Long].toDF("id")
    ConnectedComponents.run(noEdges, "s", "d", noNodes, "id").count() shouldBe 0
  }

  test("repeatedSpans: empty corpus and too-short docs yield no spans") {
    def spans(df: org.apache.spark.sql.DataFrame) =
      TextDedup.repeatedSpans(
        df.withColumn("w", split(col("text"), " ")), "doc_id", "w",
        n = 8, maxDf = 10, minSpanWords = 20)
    spans(emptyDocs).count() shouldBe 0
    spans(oneDoc).count() shouldBe 0 // 8 words < gram-span minimum
  }

  test("BoundedPairs: empty input and all-singleton groups yield no pairs") {
    val empty = Seq.empty[(Long, Long)].toDF("g", "id")
    BoundedPairs.withinGroupPairs(empty, "g", "id", 4).count() shouldBe 0
    val singletons = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("g", "id")
    BoundedPairs.withinGroupPairs(singletons, "g", "id", 4).count() shouldBe 0
  }

  test("OffsetWindow.prefixSum: empty frame is empty; one row gets its own weight") {
    val empty = Seq.empty[(String, Long)].toDF("g", "w")
    OffsetWindow.prefixSum(empty, Seq("g"), lit(0), Seq(col("w")),
      col("w"), "cum").count() shouldBe 0
    val one = Seq(("a", 7L)).toDF("g", "w")
    OffsetWindow.prefixSum(one, Seq("g"), lit(0), Seq(col("w")),
      col("w"), "cum").select("cum").as[Long].head() shouldBe 7L
  }

  test("SaltedJoin: empty big side and empty small side both yield empty") {
    val big = Seq((1L, "x")).toDF("k", "v")
    val small = Seq((1L, 9L)).toDF("k", "s")
    val emptyBig = Seq.empty[(Long, String)].toDF("k", "v")
    val emptySmall = Seq.empty[(Long, Long)].toDF("k", "s")
    SaltedJoin.inner(emptyBig, small, Seq("k"), 4, col("v")).count() shouldBe 0
    SaltedJoin.inner(big, emptySmall, Seq("k"), 4, col("v")).count() shouldBe 0
  }
}
