package graft.queries

import graft.{QueryPack, Tables}
import graft.QueryPack.dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a training-data pipeline, over
  * `documents` (text) and `embeddings` (vectors).
  *
  * Hashing is identical in Spark and DuckDB by construction: a word
  * 3-shingle hashes to `conv(md5-hex[0:15], 16, 10) % p` (md5 is
  * bit-identical everywhere; 15 hex digits = 60 bits < int64), and
  * MinHash permutations are `(a*x + b) % p` with p = 2^31-1 and
  * baked-in (a, b) constants — all exact int64 arithmetic.
  *
  * Scale notes (100 TB):
  *  - d2 joins on the inverted shingle index (candidate pairs share a
  *    shingle) — no all-pairs blowup; frequency-capped shingles bound
  *    the worst key.
  *  - d3 is the LSH path: 16 minhashes → 4 bands of 4; only
  *    band-collisions are candidates, then signatures verify. Cost is
  *    linear in docs + collisions, the standard web-scale design.
  *  - d4 SimHash buckets by 8-bit blocks (pigeonhole: hamming ≤ 3 ⇒
  *    some block equal), so the pair join touches only block buckets.
  *  - d5 embedding near-dup is blocked by coarse quantization of the
  *    leading PCA-free dims would be the real path; here label blocks
  *    play that role via s2's IVF (see SimilarityQueries); at this SF
  *    the exact pair join is measured as the baseline.
  */
object DedupQueries extends QueryPack {

  private val P = graft.operators.TextDedup.P
  /** MinHash permutation constants, k=16 (odd multipliers, fixed). */
  private val perms: Seq[(Long, Long)] = graft.operators.TextDedup.minhashPerms(16)
  private val bands = 4 // 4 bands × 4 rows

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val shingleHashesSql =
    """list_transform(
      |  list_distinct(list_transform(range(1, len(w)-1),
      |    i -> w[i]||' '||w[i+1]||' '||w[i+2])),
      |  s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 2147483647)""".stripMargin

  private def withShinglesRaw(s: SparkSession, dir: String): DataFrame =
    TextArtifacts.toks(s, dir)
      .filter(col("n_words") >= 3)
      .withColumn("xs", graft.operators.TextDedup.shingleHashes("w", 3))

  /** Shared dedup artifacts — the per-doc shingle frame, the minhash
    * signature frame, and the confirmed d3 pair set. In production
    * these are persisted index artifacts (computed once per corpus
    * snapshot, read by every dedup/audit job); the registry mirrors
    * that lifecycle across d2/d3/d6/d10/d13/d17/t19 instead of
    * re-running the kernels per query. Keyed by (session, dir),
    * persisted + eagerly materialized (the jaccardPairsLeased
    * convention — parallel stages must not race the cache fill). */
  private object DocArtifacts {
    final case class Arts(shingles: DataFrame, sigs: DataFrame,
        pairs3: DataFrame, pairs2: DataFrame)
    // Bounded LRU residency + race-free release — see ArtifactRegistry
    private val reg = new graft.ArtifactRegistry[Arts](a =>
      Seq(a.shingles, a.sigs, a.pairs3, a.pairs2))

    def apply(s: SparkSession, dir: String): Arts = reg(s, dir)(build)

    /** Drop one corpus's cached artifacts (the [[graft.Leased]]
      * lifecycle: one-shot driver runs rely on session teardown; a
      * long-lived service releases snapshots it rotates past — and the
      * registry's LRU bound releases them unprompted past
      * [[graft.ArtifactRegistry.defaultMaxCorpora]] corpora). */
    def release(s: SparkSession, dir: String): Unit = reg.release(s, dir)

    private def build(s: SparkSession, dir: String): Arts = {
      // registry build contract: track persists, release on failure
      val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]
      def persistEager(df: DataFrame): DataFrame = {
        val p = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tracked += p
        p.count()
        p
      }
      try {
        val shingles = persistEager(withShinglesRaw(s, dir))
        val sigs = persistEager(shingles.select(col("doc_id"),
          graft.operators.TextDedup.minhashSig("xs", 16).as("sig")))
        val pairs3 = persistEager(graft.operators.TextDedup
          .lshCandidates(sigs, "doc_id", k = 16, bands = bands)
          .withColumn("sig_matches",
            call_function("graft_sig_matches", col("sig1"), col("sig2")))
          .filter(col("sig_matches") >= 12)
          .select(col("d1"), col("d2"), col("sig_matches")))
        val pairs2 = persistEager(graft.operators.TextDedup
          .jaccardPairs(shingles, "doc_id", "xs",
            threshold = 0.8, maxDf = d2MaxDf))
        Arts(shingles, sigs, pairs3, pairs2)
      } catch { case t: Throwable =>
        tracked.foreach(_.unpersist(blocking = false)); throw t }
    }
  }

  /** SimHash signature table (d4's train-once index) — its OWN
    * registry, not a DocArtifacts field: a d4-only run must not build
    * the MinHash/jaccard pair tables, and d1-d3 runs must not pay the
    * per-doc word explode + 32-bit-sum simhash aggregation they never
    * read. Bundle granularity = what a query family actually shares. */
  private object SimArtifacts {
    final case class Art(sigs: DataFrame, pairs: DataFrame)
    private val reg = new graft.ArtifactRegistry[Art](a =>
      Seq(a.sigs, a.pairs))

    def apply(s: SparkSession, dir: String): Art =
      reg(s, dir) { (s2, d) =>
        val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]
        def persistEager(df: DataFrame): DataFrame = {
          val p = df.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          tracked += p
          p.count()
          p
        }
        try {
          val sigs = persistEager(graft.operators.TextDedup.simhash(
            TextArtifacts.toks(s2, d)
              .select(col("doc_id"), explode(col("w")).as("__w"))
              .groupBy(col("doc_id"), col("__w"))
              .agg(count(lit(1)).as("__cnt")),
            "doc_id"))
          // The CONFIRMED pair set is an index artifact exactly like
          // DocArtifacts.pairs3 (d3) / pairs2 (d2): computed once per
          // corpus snapshot, read by every audit — the r18 change
          // stops d4 re-running the pigeonhole block join per call.
          val leased = graft.operators.TextDedup
            .simhashPairsLeased(sigs, "doc_id", maxHamming = 3, nBlocks = 4)
          val pairs = persistEager(leased.df)
          // pairs is materialized; the operator's internal projection
          // cache (a re-persist of the sigs frame above) can go.
          leased.release()
          Art(sigs, pairs)
        } catch { case t: Throwable =>
          tracked.foreach(_.unpersist(blocking = false)); throw t }
      }

    def release(s: SparkSession, dir: String): Unit = reg.release(s, dir)
  }

  /** Release the shared dedup index artifacts for one corpus dir —
    * the [[graft.Leased]] lifecycle hook for long-lived services
    * rotating corpus snapshots; queries lazily rebuild on next use. */
  def releaseArtifacts(s: SparkSession, dir: String): Unit = {
    ClusterArtifacts.release(s, dir)
    DeltaArtifacts.release(s, dir)
    DocArtifacts.release(s, dir)
    SimArtifacts.release(s, dir)
    SpanArtifacts.release(s, dir)
    spanForgetReg.release(s, dir)
  }

  /** TRAIN-ONCE near-dup CLUSTER LABELS `(doc_id, cluster)` — the
    * connected components of the d3 pair graph over all documents
    * (singletons included), the frame d6 (cluster report), d17
    * (keep-best), t19 (effective tokens) and b1 (corpus build) all
    * consume. Before this registry each of them re-ran the CC
    * pointer-jumping rounds per call — the one iterative stage in
    * their plans, and (like the quantizer/codebook artifacts) exactly
    * what a production pipeline computes once per corpus snapshot and
    * serves from storage. Labels are deterministic (min-id per
    * component), so memoizing cannot change any oracle-gated result.
    *
    * DURABLE since round 13 (the `graft_g_edgenv` treatment): the
    * labels are written ONCE per corpus snapshot as a doc_id-bucketed
    * managed table and every consumer — including a FRESH SESSION,
    * which the session-memory registry alone would force back through
    * the DocArtifacts build + CC rounds — attaches to the table scan.
    * The persist below is residency over that scan; eviction degrades
    * to a bucketed re-scan, never to re-clustering. Explicit release
    * retires the table (onRetire), matching the snapshot lifecycle. */
  private object ClusterArtifacts {
    private final case class Art(labels: DataFrame, table: String)
    private val reg = new graft.ArtifactRegistry[Art](a => Seq(a.labels),
      onRetire = a =>
        graft.etl.DurableArtifacts.drop(a.labels.sparkSession, a.table))

    /** Durable-table name for `dir`'s cluster labels (spec hook). */
    private[queries] def tableName(dir: String): String =
      s"graft_d_clusters_${graft.ArtifactRegistry.dirTag(dir)}"

    def apply(s: SparkSession, dir: String): DataFrame =
      reg(s, dir) { (s2, d) =>
        val nb = s2.conf.get("spark.sql.shuffle.partitions", "32").toInt
        val scan = graft.etl.DurableArtifacts.bucketedTable(
          s2, tableName(d), nb, Seq("doc_id"), Seq("doc_id")) {
          graft.operators.ConnectedComponents
            .run(DocArtifacts(s2, d).pairs3.select(col("d1"), col("d2")),
              "d1", "d2", docs(s2, d).select(col("doc_id")), "doc_id")
            .select(col("id").as("doc_id"), col("cluster"))
        }
        val labels = scan
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try { labels.count(); Art(labels, tableName(d)) }
        catch { case t: Throwable =>
          labels.unpersist(blocking = false); throw t }
      }.labels

    def release(s: SparkSession, dir: String): Unit = reg.release(s, dir)
  }

  /** Spec hooks for the durable-label lifecycle. */
  private[graft] def clusterTableName(dir: String): String =
    ClusterArtifacts.tableName(dir)

  /** The shared cluster-label frame (see [[ClusterArtifacts]]). */
  private[queries] def dupClusters(s: SparkSession, dir: String): DataFrame =
    ClusterArtifacts(s, dir)

  private def withShingles(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).shingles

  private val withShinglesSql =
    s"""SELECT doc_id, $shingleHashesSql AS xs
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  /** d1 — exact dedup summary: documents keyed by exact content hash
    * and by order-insensitive bag hash; the one-row profile a
    * pipeline logs before choosing a dedup strategy. */
  private def d1(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_exact_distinct"),
      countDistinct(md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " ")))))).as("n_bag_distinct"))
  }

  private val d1Sql =
    """SELECT COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_exact_distinct,
      |  COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')))
      |    AS n_bag_distinct
      |FROM documents""".stripMargin

  /** Shingle frequency cap for d2's candidate generation: shingles in
    * more than this many docs don't generate candidate pairs (they
    * still count in verification). On real corpora this is set ≫
    * typical df so only boilerplate is cut; this synthetic corpus has
    * max df 25, so 10 exercises the mechanism (cuts Σdf² ~2.7×) while
    * exact verification keeps recall at 100% (measured at sf0.1). */
  private val d2MaxDf = 10

  /** d2 — n-gram Jaccard near-dup via the inverted shingle index:
    * candidate pairs share ≥1 non-hot shingle (df ≤ [[d2MaxDf]]);
    * exact full-set Jaccard ≥ 0.8 confirms (clean separation: planted
    * pairs sit at ~0.98, background at ≤0.07 at sf0.01). */
  private def d2(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).pairs2.orderBy(col("d1"), col("d2"))

  /** d2's candidate pipeline built FRESH (bypassing the registry) —
    * for the plan audit, like [[d3FreshPlan]]. */
  private[graft] def d2FreshPlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextDedup
      .jaccardPairs(withShinglesRaw(s, dir), "doc_id", "xs",
        threshold = 0.8, maxDf = d2MaxDf)

  private val d2Sql =
    s"""WITH ws AS ($withShinglesSql),
      |sh AS (SELECT doc_id, unnest(xs) AS sh FROM ws),
      |hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > $d2MaxDf),
      |capped AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      |v AS (
      |  SELECT d1, d2, len(list_intersect(x.xs, y.xs)) AS common,
      |    len(x.xs) AS n1, len(y.xs) AS n2
      |  FROM cand JOIN ws x ON d1 = x.doc_id JOIN ws y ON d2 = y.doc_id)
      |SELECT d1, d2,
      |  ROUND(CAST(common AS DOUBLE)/(n1 + n2 - common), 6) AS jaccard
      |FROM v
      |WHERE ROUND(CAST(common AS DOUBLE)/(n1 + n2 - common), 6) >= 0.8
      |ORDER BY d1, d2""".stripMargin

  /** d3 — MinHash + LSH: 16-permutation signatures, 4 bands of 4;
    * pairs colliding in ≥1 band are candidates, confirmed when ≥12/16
    * signature positions agree (est. Jaccard ≥ 0.75). The linear-cost
    * scale path: no shingle-level join at all. */
  private def d3(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).pairs3.orderBy(col("d1"), col("d2"))

  /** The d3 candidate pipeline built FRESH (bypassing the registry) —
    * the plan audit locks the candidate-join shape the registry build
    * executes; the gated query itself reads the cached pair set. */
  private[graft] def d3FreshPlan(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextDedup.lshCandidates(
      withShinglesRaw(s, dir).select(col("doc_id"),
        graft.operators.TextDedup.minhashSig("xs", 16).as("sig")),
      "doc_id", k = 16, bands = bands)
      .withColumn("sig_matches",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("sig_matches") >= 12)
      .select(col("d1"), col("d2"), col("sig_matches"))

  /** Shared oracle prefix for d3/d10: minhash signatures + the
    * banded LSH index frame (sigs0 → sigs → banded CTEs). */
  private val lshBandedSqlPrefix = {
    val sigExprs = perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(xs, x -> ($a * x + $b) % $P)) AS h$i"
    }.mkString(",\n    ")
    val sigList = (0 until 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandStructs = (0 until bands).map(j =>
      s"{'band': $j, 'key': h${j * 4}||'-'||h${j * 4 + 1}||'-'||h${j * 4 + 2}||'-'||h${j * 4 + 3}}"
    ).mkString("[", ", ", "]")
    s"""WITH sigs0 AS (
      |  SELECT doc_id,
      |    $sigExprs
      |  FROM ($withShinglesSql)),
      |sigs AS (SELECT doc_id, $sigList AS sig, $bandStructs AS bks FROM sigs0),
      |banded AS (
      |  SELECT doc_id, sig, bk['band'] AS band, bk['key'] AS key
      |  FROM (SELECT doc_id, sig, unnest(bks) AS bk FROM sigs))""".stripMargin
  }

  private val sigMatchesSql =
    """list_sum(list_transform(list_zip(sig1, sig2),
      |    x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END))""".stripMargin

  private val d3Sql =
    s"""$lshBandedSqlPrefix,
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS sig1, b.sig AS sig2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      |SELECT d1, d2,
      |  CAST($sigMatchesSql AS BIGINT) AS sig_matches
      |FROM cands
      |WHERE $sigMatchesSql >= 12
      |ORDER BY d1, d2""".stripMargin

  /** d4 — SimHash: 32-bit weighted word-hash signature per doc;
    * near-dups have hamming distance ≤ 3. Pair generation via the
    * pigeonhole blocks (4 × 8-bit blocks; hd ≤ 3 ⇒ ≥1 equal block) —
    * the bucketed join that makes SimHash linear at scale. */
  private def d4(s: SparkSession, dir: String): DataFrame =
    SimArtifacts(s, dir).pairs
      .orderBy(col("d1"), col("d2"))

  private val d4Sql = {
    val bitSums = (0 until 32).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN cnt ELSE -cnt END) AS s$b"
    ).mkString(",\n    ")
    val sim = (0 until 32).map(b =>
      s"CASE WHEN s$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END").mkString(" + ")
    s"""WITH wc AS (
      |  SELECT doc_id, x, COUNT(*) AS cnt,
      |    CAST(('0x'||substr(md5(x),1,15)) AS BIGINT) % 2147483647 AS h
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS x FROM documents)
      |  GROUP BY doc_id, x),
      |sums AS (
      |  SELECT doc_id,
      |    $bitSums
      |  FROM wc GROUP BY doc_id),
      |sh AS (SELECT doc_id, $sim AS simhash FROM sums),
      |blocked AS (
      |  SELECT doc_id, simhash, j AS blk, (simhash >> (j * 8)) & 255 AS key
      |  FROM sh, (SELECT unnest([0,1,2,3]) AS j)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |    bit_count(xor(a.simhash, b.simhash)) AS hamming
      |  FROM blocked a JOIN blocked b
      |    ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)
      |SELECT d1, d2, CAST(hamming AS BIGINT) AS hamming
      |FROM pairs WHERE hamming <= 3
      |ORDER BY d1, d2""".stripMargin
  }

  /** d6 — near-dup CLUSTERS: connected components over the d3
    * (MinHash+LSH) pair graph via
    * [[graft.operators.ConnectedComponents]] hash-min propagation.
    * This is the step that turns pairs into dedup decisions: every
    * doc labels itself with the min doc id reachable through near-dup
    * edges; `keep` marks the canonical survivor per cluster (drop the
    * rest and the corpus is near-dup-free). Singletons keep
    * themselves. The oracle walks the same graph with a recursive
    * reachability CTE and takes MIN per doc. */
  private def d6(s: SparkSession, dir: String): DataFrame =
    dupClusters(s, dir)
      .select(col("doc_id"), col("cluster"),
        (col("cluster") === col("doc_id")).as("keep"))
      .orderBy(col("doc_id"))

  private val d6Sql =
    s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($d3Sql)),
      |sym AS (SELECT d1 AS s, d2 AS t FROM pairs
      |        UNION ALL SELECT d2, d1 FROM pairs),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.id, sym.t FROM reach JOIN sym ON reach.r = sym.s)
      |SELECT id AS doc_id, MIN(r) AS cluster, MIN(r) = id AS keep
      |FROM reach GROUP BY id
      |ORDER BY doc_id""".stripMargin

  /** The d3 candidate-pair frame / oracle, shared with t19's
    * effective-token rollup (one definition of "near-dup" across
    * the library). */
  private[queries] def d3Pairs(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).pairs3.select(col("d1"), col("d2"))
  private[queries] def d3OracleSql: String = d3Sql

  /** d17 — keep-BEST dedup: d6 picks each near-dup cluster's minimum
    * id (arrival order); real curation keeps the highest-QUALITY
    * member instead — the same clusters, but the keeper is the argmax
    * of t2's quality score (ties to the smaller id). Emits one row
    * per multi-member cluster with its keeper and score spread.
    *
    * Scale: clusters come from the shared pointer-jumping CC; the
    * argmax is a partial+final `max(struct(score, -id))` aggregation
    * (no per-cluster sort window); scores join in keyed on doc_id. */
  private def d17(s: SparkSession, dir: String): DataFrame = {
    val m = dupClusters(s, dir).join(TextQueries.docScores(s, dir), "doc_id")
    m.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("best"),
        min(col("score")).as("worst"))
      .filter(col("n_members") > 1)
      .select(col("cluster"), (-col("best.nid")).as("keeper"),
        col("n_members"), col("best.score").as("best_score"),
        round(col("best.score") - col("worst"), 6).as("spread"))
      .orderBy(col("cluster"))
  }

  private val d17Sql =
    s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($d3Sql)),
      |sym AS (SELECT d1 AS s, d2 AS t FROM pairs
      |        UNION ALL SELECT d2, d1 FROM pairs),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.id, sym.t FROM reach JOIN sym ON reach.r = sym.s),
      |clusters AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
      |scored AS (${TextQueries.docScoresSql}),
      |m AS (SELECT c.cluster, s.doc_id, s.score
      |      FROM clusters c JOIN scored s ON c.doc_id = s.doc_id),
      |agg AS (
      |  SELECT cluster, COUNT(*) AS n_members,
      |    MAX(score) AS best_score, MIN(score) AS worst
      |  FROM m GROUP BY cluster HAVING COUNT(*) > 1),
      |k AS (
      |  SELECT cluster, doc_id AS keeper FROM (
      |    SELECT cluster, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY cluster
      |        ORDER BY score DESC, doc_id) AS rn FROM m) t
      |  WHERE rn = 1)
      |SELECT agg.cluster, k.keeper, agg.n_members, agg.best_score,
      |  ROUND(agg.best_score - agg.worst, 6) AS spread
      |FROM agg JOIN k ON agg.cluster = k.cluster
      |ORDER BY agg.cluster""".stripMargin

  /** d18 — LSH operating-point sweep: pair volume at every signature-
    * agreement threshold 12..16 (est. Jaccard t/16) in one pass over
    * the shared pair artifact — the tuning table an operator reads
    * before picking d3's confirmation bar (tighter = fewer pairs to
    * verify downstream, lower recall). Costs one 5-row broadcast join
    * over the per-threshold histogram; the pair set itself is the
    * cached DocArtifacts frame. */
  private def d18(s: SparkSession, dir: String): DataFrame = {
    val byMatches = DocArtifacts(s, dir).pairs3
      .groupBy(col("sig_matches")).agg(count(lit(1)).as("n"))
    s.range(12, 17).select(col("id").as("t"))
      .join(broadcast(byMatches), col("sig_matches") >= col("t"))
      .groupBy(col("t"))
      .agg(sum(col("n")).as("n_pairs"))
      .select(col("t").as("min_matches"),
        round(col("t").cast("double") / 16, 4).as("est_jaccard"),
        col("n_pairs"))
      .orderBy(col("min_matches"))
  }

  private val d18Sql =
    s"""WITH p AS (SELECT sig_matches FROM ($d3Sql)),
      |r AS (SELECT UNNEST(generate_series(12, 16)) AS t)
      |SELECT r.t AS min_matches,
      |  ROUND(CAST(r.t AS DOUBLE) / 16, 4) AS est_jaccard,
      |  COUNT(*) AS n_pairs
      |FROM r JOIN p ON p.sig_matches >= r.t
      |GROUP BY r.t
      |ORDER BY min_matches""".stripMargin

  /** d5 — embedding-cosine near-dup: all pairs with cosine ≥ 0.45
    * over `embeddings` (float[64] → double before any arithmetic).
    * The exact-baseline pair join; the blocked/ANN path is
    * SimilarityQueries.s2.
    *
    * AUDIT-ONLY — declared O(n²) in its input, which is therefore
    * CAPPED: the audit corpus is the first [[d5SampleCap]] vectors in
    * deterministic md5-rank order (the s18 absolute-top-K treatment).
    * The cap exceeds every oracle-gated SF's full embedding count
    * (sf0.1 = 2 000 rows), so at sf ≤ 0.1 this IS the complete exact
    * baseline; at soak scale the ground truth is computed over a
    * content-hash-uniform subsample of fixed size — still the
    * statistically valid recall baseline for the blocked/ANN paths
    * (s2/s4/s9), at a bounded ≤ cap²/2 pairs instead of a quadratic
    * blowup that was 21× super-linear at 10× data (SCALING.md
    * round-13). It is NOT a production operator: nothing in
    * [[graft.etl.Curation]] (or any pipeline entry point) reaches it,
    * and Round9InvariantsSpec locks the curation flow to plans with
    * no nested-loop/cartesian pair join. At corpus scale, run s2
    * (IVF) or s4 (LSH) instead. */
  private[queries] val d5SampleCap = 4000

  private def d5(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(d5SampleCap)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("norm"))
    // The sampled-universe STAMP: every pair row carries the cap and
    // the realized sample size, so a downstream recall comparison
    // (s2/s4/s9 full-corpus ANN output vs this ground truth) can
    // DETECT the subsampled regime (n_sampled == sample_cap <
    // corpus) and restrict both sides to the same universe instead of
    // silently under-counting recall. One-row broadcast, no shape
    // change.
    val meta = e.agg(count(lit(1)).as("n_sampled"))
      .withColumn("sample_cap", lit(d5SampleCap.toLong))
    // Non-equi pair join = nested-loop with one side broadcast. The
    // corpus parquet is a single split, so without a repartition the
    // whole O(n²) stream runs in ONE task; spread it first.
    val nParts = s.sparkContext.defaultParallelism
    e.repartition(nParts).as("a")
      .join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", round(dot(col("a.v"), col("b.v")) /
        (col("a.norm") * col("b.norm")), 6))
      .filter(col("cos") >= 0.45)
      .crossJoin(broadcast(meta))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"), col("cos"),
        col("sample_cap"), col("n_sampled"))
      .orderBy(col("v1"), col("v2"))
  }

  private val d5Sql =
    s"""WITH samp AS (
      |  SELECT vec_id, embedding FROM (
      |    SELECT vec_id, embedding,
      |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
      |        AS rk
      |    FROM embeddings) WHERE rk <= $d5SampleCap),
      |meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
      |         CAST($d5SampleCap AS BIGINT) AS sample_cap FROM samp),
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM samp),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
      |  FROM e)
      |SELECT a.vec_id AS v1, b.vec_id AS v2,
      |  ROUND(list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |        / (a.norm * b.norm), 6) AS cos,
      |  meta.sample_cap, meta.n_sampled
      |FROM n a JOIN n b ON a.vec_id < b.vec_id, meta
      |WHERE ROUND(list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |        / (a.norm * b.norm), 6) >= 0.45
      |ORDER BY v1, v2""".stripMargin

  /** c1 — the COMPOSED curation pipeline ([[graft.etl.Curation]]:
    * normalize → language gate → quality gate → exact dedup →
    * MinHash/LSH near-dup clusters → canonical survivors) as a
    * driver-gated attrition report. The oracle re-derives every stage
    * in one recursive query, so the whole composition — not just the
    * pieces — is hash-checked against DuckDB. */
  private def c1(s: SparkSession, dir: String): DataFrame = {
    val r = graft.etl.Curation.run(docs(s, dir))
    import s.implicits._
    r.report.zipWithIndex
      .map { case (sc, i) => (i.toLong, sc.stage, sc.docs) }
      .toDF("ord", "stage", "docs")
      .orderBy(col("ord"))
  }

  private val c1Sql = {
    val stopList = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      .map(w => s"x = '$w'").mkString(" OR ")
    val sigExprs = perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(xs, x -> ($a * x + $b) % $P)) AS h$i"
    }.mkString(",\n    ")
    val sigList = (0 until 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandStructs = (0 until bands).map(j =>
      s"{'band': $j, 'key': h${j * 4}||'-'||h${j * 4 + 1}||'-'||h${j * 4 + 2}||'-'||h${j * 4 + 3}}"
    ).mkString("[", ", ", "]")
    s"""WITH RECURSIVE
      |nrm AS (
      |  SELECT doc_id AS id,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents),
      |w0 AS (SELECT id, norm, string_split(norm, ' ') AS w FROM nrm),
      |lang AS (SELECT * FROM w0
      |  WHERE CAST(len(list_filter(w, x -> $stopList)) AS DOUBLE) / len(w) >= 0.05),
      |qual AS (SELECT * FROM lang WHERE len(w) >= 10),
      |ex AS (SELECT id, norm, w FROM (
      |  SELECT *, MIN(id) OVER (PARTITION BY md5(norm)) AS kp FROM qual)
      |  WHERE id = kp),
      |sh AS (
      |  SELECT id, $shingleHashesSql AS xs FROM ex WHERE len(w) >= 3),
      |sigs0 AS (
      |  SELECT id, $sigExprs FROM sh WHERE len(xs) > 0),
      |sigs AS (SELECT id, $sigList AS sig, $bandStructs AS bks FROM sigs0),
      |banded AS (
      |  SELECT id, sig, bk['band'] AS band, bk['key'] AS key
      |  FROM (SELECT id, sig, unnest(bks) AS bk FROM sigs)),
      |cands AS (
      |  SELECT DISTINCT a.id AS d1, b.id AS d2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.id < b.id
      |  WHERE len(list_filter(list_zip(a.sig, b.sig), x -> x[1] = x[2])) >= 12),
      |sym AS (SELECT d1 AS s, d2 AS t FROM cands
      |        UNION ALL SELECT d2, d1 FROM cands),
      |reach(id, r) AS (
      |  SELECT id, id FROM ex
      |  UNION
      |  SELECT reach.id, sym.t FROM reach JOIN sym ON reach.r = sym.s),
      |nearkept AS (
      |  SELECT id FROM (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
      |  WHERE cluster = id)
      |SELECT * FROM (
      |  SELECT CAST(0 AS BIGINT) AS ord, 'input' AS stage, COUNT(*) AS docs FROM documents
      |  UNION ALL SELECT 1, 'lang_gate', COUNT(*) FROM lang
      |  UNION ALL SELECT 2, 'quality_gate', COUNT(*) FROM qual
      |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*) FROM ex
      |  UNION ALL SELECT 4, 'near_dedup', COUNT(*) FROM nearkept)
      |ORDER BY ord""".stripMargin
  }

  /** d7 — INTRA-document repetition (the Gopher/MassiveText-style
    * "repeated n-gram fraction" quality filter, the within-doc
    * complement of d1-d6's cross-doc dedup): per doc, the fraction of
    * word 3-grams that duplicate an earlier 3-gram of the SAME doc.
    * Highly repetitive docs (templated/looping text) are the classic
    * pretraining poison this flags.
    *
    * Scale: a single scan; every measure is per-row array math, no
    * joins, no shuffles except the final order — the cheapest filter
    * in the curation arsenal, which is why pipelines run it first.
    * Gram identity is the one-pass `graft_shingle_seq` kernel (the
    * former gram-string `transform` + per-gram concat evaluated
    * interpreted per element — the m3/d3/t5 pitfall); the oracle
    * hashes with the identical md5 formula, so a collision (if one
    * ever occurred) would fold the SAME two grams on both engines. */
  private def d7(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("n_grams", (size(col("w")) - 2).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(call_function("graft_shingle_seq", col("w"), lit(3))))
          .cast("long"))
      .withColumn("dup_ratio", round(
        lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        col("n_grams"), col("n_distinct"), col("dup_ratio"),
        (col("dup_ratio") > 0.02).as("repetitive"))
      .orderBy(col("doc_id"))

  private val d7Sql =
    """WITH g AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |t AS (
      |  SELECT doc_id, len(w) AS n_words, len(w) - 2 AS n_grams,
      |    len(list_distinct(list_transform(
      |      list_transform(range(1, len(w) - 1),
      |        i -> w[i]||' '||w[i+1]||' '||w[i+2]),
      |      s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 2147483647)))
      |      AS n_distinct
      |  FROM g WHERE len(w) >= 3)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS dup_ratio,
      |  (ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) > 0.02) AS repetitive
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** d10 — incremental (delta-vs-index) LSH near-dup: today's batch
    * (doc_id % 10 = 3 stands in for the new crawl) probed against the
    * persisted corpus signature index (the rest) via
    * [[graft.operators.TextDedup.lshCandidatesTwoSided]] — the batch
    * production flow where the corpus index is NOT recomputed per
    * run. Confirmation is d3's ≥12/16 signature agreement through
    * the `graft_sig_matches` kernel; d1 is always the delta doc. */
  private def d10(s: SparkSession, dir: String): DataFrame = {
    val sigs = DocArtifacts(s, dir).sigs
    val delta = sigs.filter(col("doc_id") % 10 === 3)
    val index = sigs.filter(col("doc_id") % 10 =!= 3)
    graft.operators.TextDedup
      .lshCandidatesTwoSided(delta, index, "doc_id", k = 16, bands = bands)
      .withColumn("sig_matches",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("sig_matches") >= 12)
      .select(col("d1"), col("d2"), col("sig_matches"))
      .orderBy(col("d1"), col("d2"))
  }

  private val d10Sql =
    s"""$lshBandedSqlPrefix,
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS sig1, b.sig AS sig2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key
      |   AND a.doc_id % 10 = 3 AND b.doc_id % 10 <> 3)
      |SELECT d1, d2,
      |  CAST($sigMatchesSql AS BIGINT) AS sig_matches
      |FROM cands
      |WHERE $sigMatchesSql >= 12
      |ORDER BY d1, d2""".stripMargin

  /** b2_corpus_delta's admission drop machinery (shared with the
    * d10/d3 pipelines so the incremental manifest and the standalone
    * dedup queries agree on what "duplicate" means). The arrival
    * batch is `doc_id % 7 = 3` excluding the benchmark split — a
    * residue DECORRELATED from the source key (doc_id % 20), so the
    * manifest covers every source (the % 10 split d10 uses would pin
    * arrivals to two sources on this corpus). */
  private[graft] def isDeltaArrival(c: org.apache.spark.sql.Column) =
    c % 7 === 3 && c % 10 =!= 7

  /** TRAIN-ONCE delta-admission probe artifacts — b2's two drop sets
    * from ONE banded candidate join. The standalone pipelines below
    * band the signature frame three times and run two LSH joins per
    * b2 call; this probe joins the arrival bands against ALL
    * non-benchmark bands once (the streaming twin's single-pass
    * shape: `d2` an index doc ⇒ index dup, `d2` another arrival ⇒
    * batch-internal pair) and memoizes both projections per corpus
    * snapshot — the probe a production admission job runs once per
    * arrival batch and serves to every consumer. The standalone
    * [[deltaIndexDupIds]]/[[deltaBatchDupPairs]] pipelines stay fresh
    * as the independent recomputation the specs compare against. */
  private object DeltaArtifacts {
    /** `idxPairs` keeps the PAIR evidence (d1 arrival, d2 index) —
      * round 14: the index-fold's delta edges need the pairs, and
      * b2's drop set (`idxDupIds`) is their distinct-d1 projection,
      * memoized too so each b2 call reads a persisted frame instead
      * of re-shuffling the distinct. */
    final case class Art(idxPairs: DataFrame, idxDupIds: DataFrame,
        batchPairs: DataFrame)
    private val reg = new graft.ArtifactRegistry[Art](
      a => Seq(a.idxPairs, a.idxDupIds, a.batchPairs))

    def apply(s: SparkSession, dir: String): Art =
      reg(s, dir) { (s2, d) =>
        val sigs = DocArtifacts(s2, d).sigs
        val arr = sigs.filter(isDeltaArrival(col("doc_id")))
        val rest = sigs.filter(col("doc_id") % 10 =!= 7)
        val hits = graft.operators.TextDedup
          .lshCandidatesTwoSided(arr, rest, "doc_id", k = 16, bands = bands)
          .withColumn("m",
            call_function("graft_sig_matches", col("sig1"), col("sig2")))
          .filter(col("m") >= 12)
          .select(col("d1"), col("d2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idx = hits.filter(!isDeltaArrival(col("d2")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val idxIds = idx.select(col("d1").as("doc_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = hits
          .filter(isDeltaArrival(col("d2")) && col("d1") < col("d2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          idx.count(); idxIds.count(); pairs.count()
          hits.unpersist(blocking = false) // folded into the projections
          Art(idx, idxIds, pairs)
        } catch { case t: Throwable =>
          Seq(hits, idx, idxIds, pairs)
            .foreach(_.unpersist(blocking = false))
          throw t
        }
      }

    def release(s: SparkSession, dir: String): Unit = reg.release(s, dir)
  }

  /** b2's memoized drop sets (see [[DeltaArtifacts]]). */
  private[graft] def deltaIdxDupArtifact(s: SparkSession, dir: String): DataFrame =
    DeltaArtifacts(s, dir).idxDupIds
  /** The arrival↔index pair evidence itself (the fold's delta edges). */
  private[graft] def deltaIdxPairsArtifact(s: SparkSession, dir: String): DataFrame =
    DeltaArtifacts(s, dir).idxPairs
  private[graft] def deltaBatchPairsArtifact(s: SparkSession, dir: String): DataFrame =
    DeltaArtifacts(s, dir).batchPairs

  /** Shared per-doc MinHash signature frame (round-14 fold hook). */
  private[queries] def docSigs(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).sigs
  /** The confirmed d3 pair artifact (round-14 fold hook). */
  private[queries] def d3PairsArtifact(s: SparkSession, dir: String): DataFrame =
    DocArtifacts(s, dir).pairs3

  /** Arrival docs with a confirmed (≥12/16) near-dup already in the
    * ingested index (non-arrival, non-benchmark) — d10's two-sided
    * probe with the drop set projected out. */
  private[graft] def deltaIndexDupIds(s: SparkSession, dir: String): DataFrame = {
    val sigs = DocArtifacts(s, dir).sigs
    val arr = sigs.filter(isDeltaArrival(col("doc_id")))
    val idx = sigs.filter(!isDeltaArrival(col("doc_id")) &&
      col("doc_id") % 10 =!= 7)
    graft.operators.TextDedup
      .lshCandidatesTwoSided(arr, idx, "doc_id", k = 16, bands = bands)
      .withColumn("m",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("m") >= 12)
      .select(col("d1").as("doc_id")).distinct()
  }

  /** Confirmed near-dup pairs WITHIN the arrival batch (d3's
    * candidate + agreement pipeline restricted to arrivals) — b2's
    * batch-internal clusters build on these. */
  private[graft] def deltaBatchDupPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextDedup.lshCandidates(
      DocArtifacts(s, dir).sigs.filter(isDeltaArrival(col("doc_id"))),
      "doc_id", k = 16, bands = bands)
      .withColumn("m",
        call_function("graft_sig_matches", col("sig1"), col("sig2")))
      .filter(col("m") >= 12)
      .select(col("d1"), col("d2"))

  /** Oracle fragments for b2 (DuckDB): the same two drop sets as
    * full SELECTs embeddable as subqueries (the t19/d3OracleSql
    * embedding convention). */
  private[queries] def deltaIndexDupSql: String =
    s"""$lshBandedSqlPrefix,
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, a.sig AS sig1, b.sig AS sig2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key
      |   AND a.doc_id % 7 = 3 AND a.doc_id % 10 <> 7
      |   AND NOT (b.doc_id % 7 = 3 AND b.doc_id % 10 <> 7)
      |   AND b.doc_id % 10 <> 7)
      |SELECT DISTINCT d1 AS doc_id FROM cands
      |WHERE $sigMatchesSql >= 12""".stripMargin

  private[queries] def deltaBatchPairsSql: String =
    s"""$lshBandedSqlPrefix,
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS sig1, b.sig AS sig2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      |   AND a.doc_id % 7 = 3 AND a.doc_id % 10 <> 7
      |   AND b.doc_id % 7 = 3 AND b.doc_id % 10 <> 7)
      |SELECT d1, d2 FROM cands
      |WHERE $sigMatchesSql >= 12""".stripMargin

  /** d13 — approximation audit: precision/recall of the LSH path
    * (d3: band collisions + ≥12/16 signature agreement) against the
    * exact inverted-index Jaccard pairs (d2: ≥0.8), as one report
    * row. This is q20's accuracy-contract philosophy applied to
    * dedup: before switching a 100 TB pipeline from the exact index
    * to the linear-cost LSH path, PROVE on a slice that the sketch
    * tracks the truth — and keep the audit running as the corpus
    * drifts.
    *
    * Scale: both operand pipelines are the already-bounded d2/d3
    * shapes; the comparison itself is a full-outer join on pair keys
    * (output-sized) and one global count row. */
  private def d13(s: SparkSession, dir: String): DataFrame = {
    val arts = DocArtifacts(s, dir)
    val exact = arts.pairs2.select(col("d1"), col("d2"), lit(1).as("e"))
    val lsh = arts.pairs3
      .select(col("d1"), col("d2"), lit(1).as("l"))
    exact.join(lsh, Seq("d1", "d2"), "full_outer")
      .agg(
        count(col("e")).as("n_exact"),
        count(col("l")).as("n_lsh"),
        count(when(col("e").isNotNull && col("l").isNotNull, 1)).as("n_both"))
      .select(col("n_exact"), col("n_lsh"), col("n_both"),
        round(col("n_both").cast("double") / col("n_lsh"), 6).as("prec"),
        round(col("n_both").cast("double") / col("n_exact"), 6).as("recall"))
  }

  private val d13Sql = {
    val sigExprs = perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(xs, x -> ($a * x + $b) % $P)) AS h$i"
    }.mkString(",\n    ")
    val sigList = (0 until 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandStructs = (0 until bands).map(j =>
      s"{'band': $j, 'key': h${j * 4}||'-'||h${j * 4 + 1}||'-'||h${j * 4 + 2}||'-'||h${j * 4 + 3}}"
    ).mkString("[", ", ", "]")
    s"""WITH ws AS ($withShinglesSql),
      |sh AS (SELECT doc_id, unnest(xs) AS sh FROM ws),
      |hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > $d2MaxDf),
      |capped AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      |v AS (
      |  SELECT d1, d2, len(list_intersect(x.xs, y.xs)) AS common,
      |    len(x.xs) AS n1, len(y.xs) AS n2
      |  FROM cand JOIN ws x ON d1 = x.doc_id JOIN ws y ON d2 = y.doc_id),
      |exactp AS (
      |  SELECT d1, d2 FROM v
      |  WHERE ROUND(CAST(common AS DOUBLE)/(n1 + n2 - common), 6) >= 0.8),
      |sigs0 AS (SELECT doc_id, $sigExprs FROM ws),
      |sigs AS (SELECT doc_id, $sigList AS sig, $bandStructs AS bks FROM sigs0),
      |banded AS (
      |  SELECT doc_id, sig, bk['band'] AS band, bk['key'] AS key
      |  FROM (SELECT doc_id, sig, unnest(bks) AS bk FROM sigs)),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS sig1, b.sig AS sig2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |lshp AS (
      |  SELECT d1, d2 FROM cands
      |  WHERE $sigMatchesSql >= 12),
      |j AS (
      |  SELECT COALESCE(e.d1, l.d1) AS d1, COALESCE(e.d2, l.d2) AS d2,
      |    e.d1 IS NOT NULL AS in_e, l.d1 IS NOT NULL AS in_l
      |  FROM exactp e FULL OUTER JOIN lshp l ON e.d1 = l.d1 AND e.d2 = l.d2)
      |SELECT
      |  CAST(SUM(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |  CAST(SUM(CASE WHEN in_l THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
      |  CAST(SUM(CASE WHEN in_e AND in_l THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |  ROUND(CAST(SUM(CASE WHEN in_e AND in_l THEN 1 ELSE 0 END) AS DOUBLE)
      |    / SUM(CASE WHEN in_l THEN 1 ELSE 0 END), 6) AS prec,
      |  ROUND(CAST(SUM(CASE WHEN in_e AND in_l THEN 1 ELSE 0 END) AS DOUBLE)
      |    / SUM(CASE WHEN in_e THEN 1 ELSE 0 END), 6) AS recall
      |FROM j""".stripMargin
  }

  /** d9 — substring-level cross-doc dedup: maximal runs of shared
    * 8-grams between document pairs, reported as spans ≥ 20 words —
    * [[graft.operators.TextDedup.repeatedSpans]] (positional gram
    * index → diagonal gaps-and-islands). Catches long boilerplate /
    * quoted passages that doc-level d2-d8 miss when the surrounding
    * documents differ. df cap 10 mirrors d2 (hot grams leave
    * candidate generation only). */
  private val d9MaxDf = 10
  private val d9MinSpan = 20

  /** The d9/d11 shared span index — one repeatedSpans mine
    * (positional-gram inverted index → diagonal islands) computed
    * ONCE per corpus snapshot and read by both the span REPORT (d9)
    * and the span SCRUB (d11): the production lifecycle — you never
    * re-mine spans to apply them. The mine is the whole cost of both
    * queries (20.2 s at sf3, vs DuckDB's 27.2 s for the same SQL —
    * measured; the span OUTPUT is only 6.6k rows there), and before
    * this registry the two consumers each re-ran it per call, the
    * second riding a plan-keyed cache coincidence (d11's internal
    * `rm` persist) instead of a declared artifact. */
  private object SpanArtifacts {
    private val reg = new graft.ArtifactRegistry[DataFrame](f => Seq(f))

    def apply(s: SparkSession, dir: String): DataFrame =
      reg(s, dir) { (s2, d) =>
        val p = graft.operators.TextDedup
          .repeatedSpans(
            TextArtifacts.toks(s2, d).filter(col("n_words") >= 8),
            "doc_id", "w", n = 8, maxDf = d9MaxDf,
            minSpanWords = d9MinSpan)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // single persist: unpersist defensively on a failed count()
        try { p.count(); p }
        catch { case t: Throwable =>
          p.unpersist(blocking = false); throw t }
      }

    def release(s: SparkSession, dir: String): Unit = reg.release(s, dir)
  }

  private def d9(s: SparkSession, dir: String): DataFrame =
    SpanArtifacts(s, dir)
      .orderBy(col("d1"), col("d2"), col("start1"), col("start2"))

  /** Shared oracle prefix for d9/d11/d21: positional grams → capped
    * inverted index → diagonal runs → spans CTE. `docPred` restricts
    * the mined universe (d21 mines the post-forget survivors; d9/d11
    * pass TRUE and emit byte-identical SQL to the pre-round-17 text
    * modulo the vacuous predicate). */
  private def spansSqlPrefixFor(docPred: String) =
    s"""WITH g AS (
      |  SELECT doc_id, list_transform(range(1, len(w)-6),
      |    i -> CAST(('0x'||substr(md5(array_to_string(w[i:i+7], ' ')),1,15)) AS BIGINT)
      |         % 2147483647) AS xs
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 8 AND ($docPred)),
      |pg AS (SELECT doc_id, generate_subscripts(xs, 1) - 1 AS pos, unnest(xs) AS gram
      |       FROM g),
      |hot AS (SELECT gram FROM pg GROUP BY gram
      |        HAVING COUNT(DISTINCT doc_id) > $d9MaxDf),
      |capped AS (SELECT * FROM pg WHERE gram NOT IN (SELECT gram FROM hot)),
      |m AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2,
      |    a.pos - b.pos AS diag
      |  FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id),
      |runs AS (
      |  SELECT d1, d2, diag, p1, p2,
      |    p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS isl
      |  FROM m),
      |spans AS (
      |  SELECT d1, d2, CAST(MIN(p1) AS INT) AS start1, CAST(MIN(p2) AS INT) AS start2,
      |    CAST(COUNT(*) + 7 AS BIGINT) AS span_words
      |  FROM runs GROUP BY d1, d2, diag, isl
      |  HAVING COUNT(*) + 7 >= $d9MinSpan)""".stripMargin

  private val spansSqlPrefix = spansSqlPrefixFor("TRUE")

  private val d9Sql =
    s"""$spansSqlPrefix
      |SELECT d1, d2, start1, start2, span_words
      |FROM spans
      |ORDER BY d1, d2, start1, start2""".stripMargin

  /** d21 — the POST-FORGET span mine (round 17, the forget cascade
    * reaching the d9/d11 artifact): the b5 forget batch's docs leave
    * the span index AND its derivative effects retract — pairs with a
    * forgotten endpoint die row-locally, and grams whose document
    * frequency drops back under the boilerplate cap (a forgotten doc
    * was holding them hot) surface the NEW candidate spans the cap
    * had suppressed. Served by [[graft.etl.Forget.retractSpans]]'
    * pair-pruned retraction off the CACHED pre-forget mine
    * ([[SpanArtifacts]]): untouched pairs carry verbatim, only pairs
    * sharing a newly-uncapped gram re-run the island fold (forget-
    * batch-sized, never a re-mine — the full self-join of a rebuild
    * never runs). The oracle re-mines the surviving corpus from
    * scratch in DuckDB, so retraction ≡ rebuild is hash-gated row by
    * row, including the uncapping side (ForgetSpec constructs the
    * uncapping case explicitly).
    *
    * The batch here is b5's forget set WIDENED by a second residue
    * (%13 = 1): on the gated corpus b5's %11 batch happens to miss
    * every span participant, which would gate only the carry leg —
    * the wider batch provably deletes live span rows at sf0.01, so
    * the oracle exercises retract-and-carry, not just carry. */
  /** d21's retraction result, once per (session, corpus) — the
    * retractSpans contract returns a persisted frame whose lifecycle
    * the caller owns; the registry is that owner (released with the
    * rest of the d-family artifacts). */
  private val spanForgetReg = new graft.ArtifactRegistry[DataFrame](f => Seq(f))

  private def d21(s: SparkSession, dir: String): DataFrame =
    spanForgetReg(s, dir) { (s2, d) =>
      graft.etl.Forget.retractSpans(
        TextArtifacts.toks(s2, d).filter(col("n_words") >= 8),
        "doc_id", "w",
        SpanArtifacts(s2, d),
        docs(s2, d).filter(
          (graft.queries.BuildQueries.isForgotten(col("doc_id")) ||
            (col("doc_id") % 13 === 1 && col("doc_id") % 10 =!= 7)))
          .select(col("doc_id")),
        n = 8, maxDf = d9MaxDf, minSpanWords = d9MinSpan)
    }.orderBy(col("d1"), col("d2"), col("start1"), col("start2"))

  private val d21Sql =
    s"""${spansSqlPrefixFor(
        "NOT ((doc_id % 11 = 5 OR doc_id % 13 = 1) AND doc_id % 10 <> 7)")}
      |SELECT d1, d2, start1, start2, span_words
      |FROM spans
      |ORDER BY d1, d2, start1, start2""".stripMargin

  /** d11 — span REMOVAL, the apply step of d9: for every repeated
    * span the copy in the LOWER doc id survives and the higher-id
    * doc's occurrence is scrubbed (Lee et al.'s remove-all-but-one
    * policy, keyed deterministically by id). Overlapping spans merge
    * naturally through the position-set union; output is the
    * per-affected-doc accounting plus an md5 of the scrubbed text
    * (text itself stays distributed — only the fingerprint leaves).
    *
    * Scale: the removal position set is bounded by total matched
    * span words (not corpus size), and the per-word positional frame
    * is built ONLY for affected docs — the doc-level semi-join runs
    * first, so the token-level explode/anti-join/re-fold never
    * touches the unaffected corpus (exploding every token of a
    * 100 TB corpus into a shuffle to scrub 1% of docs would be the
    * wrong order). */
  private def d11(s: SparkSession, dir: String): DataFrame = {
    val wdocs = docs(s, dir)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 8)
    val spans = SpanArtifacts(s, dir)
    // rm feeds two consumers (affected-doc list + position anti-join);
    // persist so the whole span pipeline runs once (eager count ends
    // the parallel cache-fill race — see jaccardPairsLeased)
    val rm = spans.select(col("d2").as("doc_id"),
        explode(sequence(col("start2").cast("long"),
          col("start2").cast("long") + col("span_words") - 1)).as("pos"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rm.count()
    val affected = rm.select("doc_id").distinct()
    val words = wdocs.join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "word")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("word"))
    words.join(rm, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        md5(expr("concat_ws(' ', transform(" +
          "array_sort(collect_list(struct(pos, word))), s -> s.word))"))
          .as("clean_md5"))
      .join(wdocs.select(col("doc_id"),
        size(col("w")).cast("long").as("n_words")), Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_kept"),
        (col("n_words") - col("n_kept")).as("n_removed"), col("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val d11Sql =
    s"""$spansSqlPrefix,
      |rm AS (
      |  SELECT DISTINCT d2 AS doc_id,
      |    unnest(range(start2, start2 + span_words)) AS pos
      |  FROM spans),
      |wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |words AS (
      |  SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS word
      |  FROM wd WHERE len(w) >= 8),
      |kept AS (
      |  SELECT wo.doc_id, wo.pos, wo.word
      |  FROM words wo LEFT JOIN rm ON wo.doc_id = rm.doc_id AND wo.pos = rm.pos
      |  WHERE rm.doc_id IS NULL),
      |affected AS (SELECT DISTINCT doc_id FROM rm)
      |SELECT k.doc_id, CAST(len(wd.w) AS BIGINT) AS n_words,
      |  COUNT(*) AS n_kept,
      |  CAST(len(wd.w) - COUNT(*) AS BIGINT) AS n_removed,
      |  md5(string_agg(k.word, ' ' ORDER BY k.pos)) AS clean_md5
      |FROM kept k
      |JOIN affected USING (doc_id)
      |JOIN wd ON k.doc_id = wd.doc_id
      |GROUP BY k.doc_id, len(wd.w)
      |ORDER BY k.doc_id""".stripMargin

  /** d14 — edit-distance-VERIFIED near-dup: LSH band collisions
    * (the d3 candidate generator) re-joined to the raw text and
    * confirmed by exact Levenshtein similarity
    * `1 − lev/max(len)` ≥ 0.8 — the strictest verification tier
    * (hash-sketch candidates, character-exact confirmation). MinHash
    * estimates set overlap and can pass reordered bags; edit
    * similarity certifies the documents really read the same, which
    * is the evidence tier a deletion decision wants.
    *
    * Scale: candidate generation is the linear LSH path; the text
    * re-join is two keyed shuffle joins against the corpus by doc id
    * (no index blowup — one row per candidate side); verification is
    * O(len²) per pair but only on the LSH-surviving sliver — and the
    * DP is CAPPED AND BIT-PARALLEL: `edit_sim ≥ 0.8 ⟺ lev ≤
    * 0.2·maxlen`, so `graft_lev_bound(l, r, maxDist)` returns −1
    * above `floor(0.2·maxlen)`, and computes the distance with
    * Myers' bit-vector recurrence ([[graft.functions.LevBound]]:
    * O(len·len/64) word ops vs the built-in's banded O(len·cap)
    * cells — ~25× less work at d14's cap). The cap is a strict
    * SUPERSET of the keep set
    * (double 0.2 rounds up, so the floor never under-caps), and
    * surviving pairs carry the exact distance — so the uncapped
    * DuckDB oracle (no capped variant exists there) still matches
    * bit-for-bit. Measured at sf1: 14.8 s → ~3 s. On top of the cap,
    * an identical-text pre-collapse (see the body comment) makes the
    * candidate + DP cost scale with DISTINCT texts instead of doc
    * copies — the r8 sf1 soak showed candidate density growing ~2×
    * faster than the corpus precisely because duplicated short docs
    * pair quadratically. */
  private def d14(s: SparkSession, dir: String): DataFrame = {
    // Identical-text pre-collapse (the d4 hd=0 trick at the character
    // tier): corpora with mass-duplicated docs — boilerplate pages,
    // replicated shards — grow candidate PAIRS quadratically in the
    // copy count, and every copy collides in every LSH band (identical
    // text ⇒ identical signature). Collapse each identical-text group
    // to its min-id representative BEFORE the LSH + DP path: the
    // signature is a function of the text alone, so two docs
    // band-collide iff their reps do, and lev(a, b) = lev(rep_a,
    // rep_b) — the result set is IDENTICAL by construction (md5
    // collision cryptographically nil), while candidate generation
    // and the capped DP run once per distinct text, not per copy.
    // Intra-group pairs are exactly the lev = 0 tier and are emitted
    // directly. The collapse is restricted to the signature universe
    // (docs that shingle, len(w) >= 3): a doc outside it never enters
    // the oracle's banded frame, so it must not enter the expansion.
    val t = docs(s, dir)
    val universe = withShingles(s, dir).select(col("doc_id"))
    val wFp = Window.partitionBy(col("fp"))
    val members = t.join(universe, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("rep", min(col("doc_id")).over(wFp))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    members.count() // eager: 4 consumers (reps, intra ×2, expansion ×2)

    val repIds = members.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"))
    val sigs = withShingles(s, dir)
      .join(repIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.operators.TextDedup.minhashSig("xs", 16).as("sig"))
    val cands = graft.operators.TextDedup
      .lshCandidates(sigs, "doc_id", k = 16, bands = bands)
      .select(col("d1"), col("d2"))
    val maxl = greatest(length(col("t1")), length(col("t2")))
    val verified = cands
      .join(t.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
      .join(t.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
      .withColumn("lev",
        call_function("graft_lev_bound", col("t1"), col("t2"),
          floor(maxl * lit(0.2)).cast("int")).cast("long"))
      .filter(col("lev") >= 0) // −1 = above cap = edit_sim < 0.8
      .withColumn("edit_sim",
        lit(1.0) - col("lev").cast("double") / maxl)
      .filter(col("edit_sim") >= 0.8) // the ORIGINAL double predicate
      .select(col("d1").as("r1"), col("d2").as("r2"),
        col("lev"), col("edit_sim"))

    // expansion back to doc pairs: same-text pairs are lev = 0 /
    // sim = 1 by definition (and always band-collide — every band key
    // equal); cross-group pairs inherit their reps' exact verdict
    val m = members.select(col("fp"), col("doc_id"), col("rep"))
    val intra = m.as("a").join(m.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit(0L).as("lev"), lit(1.0).as("edit_sim"))
    val inter = verified
      .join(m.select(col("rep").as("r1"), col("doc_id").as("a")), "r1")
      .join(m.select(col("rep").as("r2"), col("doc_id").as("b")), "r2")
      .select(least(col("a"), col("b")).as("d1"),
        greatest(col("a"), col("b")).as("d2"),
        col("lev"), col("edit_sim"))
    intra.unionAll(inter)
      .select(col("d1"), col("d2"), col("lev"),
        round(col("edit_sim"), 6).as("edit_sim"))
      .orderBy(col("d1"), col("d2"))
  }

  private val d14Sql =
    s"""$lshBandedSqlPrefix,
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |p AS (
      |  SELECT c.d1, c.d2, levenshtein(x.text, y.text) AS lev,
      |    GREATEST(length(x.text), length(y.text)) AS ml
      |  FROM cands c JOIN documents x ON c.d1 = x.doc_id
      |               JOIN documents y ON c.d2 = y.doc_id)
      |SELECT d1, d2, CAST(lev AS BIGINT) AS lev,
      |  ROUND(1.0 - CAST(lev AS DOUBLE) / ml, 6) AS edit_sim
      |FROM p WHERE 1.0 - CAST(lev AS DOUBLE) / ml >= 0.8
      |ORDER BY d1, d2""".stripMargin

  /** d15 — CONTAINMENT dedup (asymmetric): |A∩B| / |A| ≥ 0.9 flags
    * document A as (near-)contained in B — the quote/excerpt/subset
    * case symmetric Jaccard structurally misses (a 50-gram doc inside
    * a 500-gram doc has jaccard ≤ 0.1 but containment 1.0; the LSH
    * Ensemble / MMDS containment-search problem). Both directions are
    * emitted per candidate pair; mutually-contained pairs (exact
    * near-dups) appear twice, which is the honest report — the
    * DELETION decision differs by direction (drop the contained doc,
    * keep the container).
    *
    * Scale: same df-capped inverted-index candidate generation as d2
    * (Σ min(df, cap)² bound, shuffle_hash pinned); the verify step is
    * two keyed joins + per-pair set math. Containment of a SMALL doc
    * is immune to the d2 length-bias, which is exactly why this
    * operator exists. */
  private def d15(s: SparkSession, dir: String): DataFrame = {
    val ws = withShingles(s, dir).select(col("doc_id"), col("xs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ws.count() // eager: 4 consumers (hot, both join sides, verify)
    val sh = ws.select(col("doc_id"), explode(col("xs")).as("sh"))
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > d2MaxDf).select("sh")
    val capped = sh.join(broadcast(hot), Seq("sh"), "left_anti")
    val cands = capped.as("a").hint("shuffle_hash")
      .join(capped.as("b").hint("shuffle_hash"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // verify carries PACKED shingle sets (graft_pack_sorted: ~1-2
    // B/element vs 8 B array elements through both verify joins) and
    // counts the overlap with the zero-allocation merge-walk kernel
    // — same |A ∩ B| as array_intersect on these distinct sets (the
    // PackedAdjacencySpec differential), a fraction of the exchange
    // bytes and no per-pair hash set
    val wsp = ws.select(col("doc_id"),
      call_function("graft_pack_sorted", col("xs")).as("px"),
      org.apache.spark.sql.functions.size(col("xs")).as("nx"))
    val v = cands
      .join(wsp.select(col("doc_id").as("d1"), col("px").as("px1"),
        col("nx").as("nx1")), "d1")
      .join(wsp.select(col("doc_id").as("d2"), col("px").as("px2"),
        col("nx").as("nx2")), "d2")
      .withColumn("common",
        call_function("graft_packed_common", col("px1"), col("px2")))
    // both containment directions from ONE pass over v: a union of two
    // projections re-executes the whole candidate+verify cascade per
    // branch (Catalyst does not fuse union arms — the t28 lesson);
    // exploding a 2-struct array emits both rows per verified pair
    v.select(explode(array(
        struct(col("d1").as("contained"), col("d2").as("container"),
          round(col("common").cast("double") / col("nx1"), 6).as("containment")),
        struct(col("d2").as("contained"), col("d1").as("container"),
          round(col("common").cast("double") / col("nx2"), 6).as("containment"))))
        .as("r"))
      .select(col("r.contained"), col("r.container"), col("r.containment"))
      .filter(col("containment") >= 0.9)
      .orderBy(col("contained"), col("container"))
  }

  private val d15Sql =
    s"""WITH ws AS ($withShinglesSql),
      |sh AS (SELECT doc_id, unnest(xs) AS sh FROM ws),
      |hot AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > $d2MaxDf),
      |capped AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      |v AS (
      |  SELECT d1, d2, len(list_intersect(x.xs, y.xs)) AS common,
      |    len(x.xs) AS n1, len(y.xs) AS n2
      |  FROM cand JOIN ws x ON d1 = x.doc_id JOIN ws y ON d2 = y.doc_id),
      |dirs AS (
      |  SELECT d1 AS contained, d2 AS container,
      |    ROUND(CAST(common AS DOUBLE) / n1, 6) AS containment FROM v
      |  UNION ALL
      |  SELECT d2, d1, ROUND(CAST(common AS DOUBLE) / n2, 6) FROM v)
      |SELECT contained, container, containment
      |FROM dirs WHERE containment >= 0.9
      |ORDER BY contained, container""".stripMargin

  /** d19 — leakage-safe train/val/test split: documents are assigned
    * to splits by the HASH OF THEIR NEAR-DUP CLUSTER (d6's connected
    * components over the shared d3 LSH pair graph), never by their
    * own id — so a document and its near-duplicates land in the SAME
    * split by construction, and val/test can't leak paraphrases of
    * training docs (the split-contamination failure mode that
    * inflates eval numbers). The 52-bit md5 prefix of the cluster
    * representative (q23's exactly-double-representable recipe) mods
    * into 8/1/1 train/val/test. Emits per-split doc, cluster and
    * token masses plus `leaked_pairs` — the count of near-dup pairs
    * whose endpoints landed in different splits, provably 0 here and
    * the audit a pipeline would run when the split key ever changes.
    *
    * Scale: clusters come from the shared pointer-jumping CC
    * artifact; assignment is one hash expression per row; the audit
    * join is pair-frame-sized, keyed on doc id both ends. */
  private def d19(s: SparkSession, dir: String): DataFrame = {
    val edges = DocArtifacts(s, dir).pairs3.select(col("d1"), col("d2"))
    // the shared durable cluster-label artifact — identical CC input
    // (pairs3 over all docs), so reading it here is the "clusters
    // come from the shared artifact" the scaladoc promises, not a
    // per-call pointer-jumping re-run
    val assigned = dupClusters(s, dir)
      .withColumn("h",
        expr("conv(substring(md5(cast(cluster as string)), 1, 13), 16, 10)")
          .cast("long") % 10)
      .withColumn("split",
        when(col("h") < 8, "train").when(col("h") === 8, "val")
          .otherwise("test"))
      // three consumers (both leak-join sides + the split agg) — the
      // CC rounds are checkpointed but the assignment tail would
      // re-run per consumer; persist so it runs once (the d8 pattern)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    val toks = docs(s, dir).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val leaked = edges
      .join(assigned.select(col("doc_id").as("d1"), col("split").as("sp1")), "d1")
      .join(assigned.select(col("doc_id").as("d2"), col("split").as("sp2")), "d2")
      .agg(sum(when(col("sp1") =!= col("sp2"), 1L).otherwise(0L))
        .as("leaked_pairs"))
    assigned.join(toks, "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"),
        sum(col("n_tokens")).as("tokens"))
      .crossJoin(broadcast(leaked))
      .select(col("split"), col("n_docs"), col("n_clusters"), col("tokens"),
        col("leaked_pairs"))
      .orderBy(col("split"))
  }

  private val d19Sql =
    s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($d3Sql)),
      |sym AS (SELECT d1 AS s, d2 AS t FROM pairs
      |        UNION ALL SELECT d2, d1 FROM pairs),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.id, sym.t FROM reach JOIN sym ON reach.r = sym.s),
      |cl AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
      |assigned AS (
      |  SELECT doc_id, cluster,
      |    CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END
      |      AS split
      |  FROM (SELECT doc_id, cluster,
      |          CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 13))
      |               AS BIGINT) % 10 AS h
      |        FROM cl) t),
      |toks AS (SELECT doc_id,
      |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |         FROM documents),
      |leaked AS (
      |  SELECT CAST(SUM(CASE WHEN a1.split <> a2.split THEN 1 ELSE 0 END)
      |              AS BIGINT) AS leaked_pairs
      |  FROM pairs JOIN assigned a1 ON pairs.d1 = a1.doc_id
      |             JOIN assigned a2 ON pairs.d2 = a2.doc_id)
      |SELECT a.split, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT a.cluster) AS n_clusters,
      |  CAST(SUM(t.n_tokens) AS BIGINT) AS tokens,
      |  leaked.leaked_pairs
      |FROM assigned a JOIN toks t ON a.doc_id = t.doc_id, leaked
      |GROUP BY a.split, leaked.leaked_pairs
      |ORDER BY a.split""".stripMargin

  /** d20 — INCREMENTAL near-dup clusters: yesterday's cluster labels
    * + today's delta edges → today's labels WITHOUT re-walking the
    * old pair graph. The old solution folds in as STAR edges (member
    * → its cluster representative — connectivity-preserving and
    * depth-1 by construction), unioned with the delta-touching pairs
    * (d10's delta-vs-index flow one level up); hash-min CC over that
    * union provably equals the full recompute — the oracle IS d6's
    * full-graph recursive CTE, so the incremental-maintenance law
    * `CC(star(CC(G)) ∪ Δ) = CC(G ∪ Δ)` is hash-gated, not asserted.
    *
    * Scale: this is how a daily crawl maintains corpus-wide dup
    * clusters — the star frame is node-sized (not edge-sized), the
    * delta frame is today-sized, and the merged CC converges in ~2
    * rounds because star chains are already depth 1. The full
    * recompute exists only as the audit. */
  private def d20(s: SparkSession, dir: String): DataFrame = {
    val all = docs(s, dir)
    val pairsAll = DocArtifacts(s, dir).pairs3.select(col("d1"), col("d2"))
    val isNew = (c: org.apache.spark.sql.Column) => c % 10 === 3
    val oldLabels = graft.operators.ConnectedComponents
      .run(pairsAll.filter(!isNew(col("d1")) && !isNew(col("d2"))),
        "d1", "d2", all.filter(!isNew(col("doc_id"))), "doc_id")
      .select(col("id"), col("cluster"))
    val starEdges = oldLabels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("d1"), col("cluster").as("d2"))
    val deltaEdges = pairsAll.filter(isNew(col("d1")) || isNew(col("d2")))
    graft.operators.ConnectedComponents
      .run(starEdges.unionByName(deltaEdges), "d1", "d2", all, "doc_id")
      .select(col("id").as("doc_id"), col("cluster"),
        (col("cluster") === col("id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  // the incremental path must land EXACTLY on the full recompute —
  // d6's full-graph oracle, verbatim
  private def d20Sql = d6Sql

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d21_forget_spans"  -> d21,
    "d20_incr_clusters" -> d20,
    "d19_leakage_split" -> d19,
    "d15_containment"   -> d15,
    "d14_edit_dedup"    -> d14,
    "d10_incremental_lsh" -> d10,
    "d11_span_scrub"    -> d11,
    "d13_lsh_audit"     -> d13,
    "d9_substring_dedup" -> d9,
    "d1_exact_dedup"    -> d1,
    "d2_ngram_jaccard"  -> d2,
    "d3_minhash_lsh"    -> d3,
    "d4_simhash"        -> d4,
    "d5_embedding_dup"  -> d5,
    "d6_dup_clusters"   -> d6,
    "d17_keep_best"     -> d17,
    "d18_lsh_sweep"     -> d18,
    "d7_intradoc_repeat" -> d7,
    "c1_curation_report" -> c1)

  override def oracle: Map[String, String] = Map(
    "d21_forget_spans"  -> d21Sql,
    "d20_incr_clusters" -> d20Sql,
    "d19_leakage_split" -> d19Sql,
    "d15_containment"   -> d15Sql,
    "d14_edit_dedup"    -> d14Sql,
    "d10_incremental_lsh" -> d10Sql,
    "d11_span_scrub"    -> d11Sql,
    "d13_lsh_audit"     -> d13Sql,
    "d9_substring_dedup" -> d9Sql,
    "d1_exact_dedup"    -> d1Sql,
    "d2_ngram_jaccard"  -> d2Sql,
    "d3_minhash_lsh"    -> d3Sql,
    "d4_simhash"        -> d4Sql,
    "d5_embedding_dup"  -> d5Sql,
    "d6_dup_clusters"   -> d6Sql,
    "d17_keep_best"     -> d17Sql,
    "d18_lsh_sweep"     -> d18Sql,
    "d7_intradoc_repeat" -> d7Sql,
    "c1_curation_report" -> c1Sql)
}
