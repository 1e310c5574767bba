package graft.operators

import graft.SparkSpec

/** Hash-min connected components vs a local union-find oracle. */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labeling: path-compress everything to its root (roots are
    // minimal by the max-points-to-min union rule above)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    val got = ConnectedComponents.run(
      edges.toDF("a", "b"), "a", "b",
      (0L until n.toLong).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe unionFind(n, edges)
  }

  test("chains, cliques, singletons all label to the min member") {
    check(10, Seq((0L, 1L), (1L, 2L), (2L, 3L), // 4-chain
      (5L, 6L), (6L, 7L), (5L, 7L)))            // triangle; 4, 8, 9 singletons
  }

  test("random graphs match union-find") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(30)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      withClue(s"trial $trial: ")(check(n, edges))
    }
  }

  test("a long chain still converges within maxIter") {
    // diameter 29 chain — worst case for hash-min propagation;
    // maxIter default must cover it or labels are wrong
    val n = 30
    check(n, (0 until n - 1).map(i => (i.toLong, i.toLong + 1)))
  }

  // the near-dup corpus shape: unions of small cliques
  private def cliqueEdges: Seq[(Long, Long)] =
    (0 until 5).flatMap { c =>
      val ids = (0 until 4).map(i => (c * 4 + i).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }

  test("convergence probe every 2 rounds: same labels, same round count on cliques") {
    val nodes = (0L until 20L).toDF("id")
    val every1 = ConnectedComponents.runWithStats(
      cliqueEdges.toDF("a", "b"), "a", "b", nodes, "id", convergeEvery = 1)
    val every2 = ConnectedComponents.runWithStats(
      cliqueEdges.toDF("a", "b"), "a", "b", nodes, "id", convergeEvery = 2)
    // cliques collapse in round 1 and round 2 is the idempotent
    // confirmation — both cadences observe the fixpoint at round 2,
    // cadence 2 with HALF the probe jobs
    every1.rounds shouldBe 2
    every2.rounds shouldBe every1.rounds
    every2.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      every1.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("reliable checkpoint dir: same result, checkpoint files on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-chk")
    val got = ConnectedComponents.runWithStats(
      cliqueEdges.toDF("a", "b"), "a", "b", (0L until 20L).toDF("id"), "id",
      checkpointDir = Some(dir.toString))
      .labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe unionFind(20, cliqueEdges)
    // the lineage cuts really went through the reliable path
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(dir).iterator().asScala
      .count(p => java.nio.file.Files.isRegularFile(p))
    files should be > 0L.toInt
  }
}
