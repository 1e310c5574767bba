package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-or-attach lifecycle for DURABLE train-once artifacts — the
  * missing half of [[graft.ArtifactRegistry]]'s story. The registry
  * memoizes per (session, corpus-dir): a FRESH SparkSession (new
  * registry key) re-runs the whole build even when the artifact it
  * would produce already sits on disk from a sibling session. For
  * cache-shaped artifacts that is correct (a persist is session
  * residency), but for artifacts whose build is the expensive part —
  * connected-component labels, quarantine drop sets, the graph
  * closure tables — production writes them ONCE per corpus snapshot
  * as tables and every later consumer (same session, next session,
  * next JOB on a real cluster) attaches to the table instead of
  * retraining. `graft_g_edgenv` pioneered the durable-table shape;
  * this helper adds the attach-if-present step so the durability is
  * actually consumed across sessions.
  *
  * Sessions of one JVM share the catalog (SharedState), and artifact
  * table names carry [[graft.ArtifactRegistry.processTag]], so
  * existence in the catalog ⇒ THIS process wrote it for THIS corpus
  * dir (md5 dir tag) — attaching is always sound. Build-or-attach is
  * serialized PER TABLE (striped locks): two sessions racing the same
  * artifact build it exactly once (the registry's per-cell lock only
  * covers one session's cell, so without this the second session
  * could DROP/rewrite the table mid-scan of the first), while builds
  * of unrelated artifacts — another corpus, another family — proceed
  * in parallel.
  *
  * Determinism contract (caller's): only memoize frames whose content
  * is a pure function of the corpus (min-id CC labels, threshold drop
  * sets, degree-oriented edges) — attach must be indistinguishable
  * from rebuild. A crashed partial MULTI-table build is safe under
  * the same contract: the next build attaches the tables that landed
  * and derives the missing ones from those same scans.
  */
object DurableArtifacts {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    locks.computeIfAbsent(table, _ => new Object)

  /** Build count per table name — spec instrumentation for the
    * cold-start contract ("a second session attaches, not rebuilds"),
    * monotone and process-local. */
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def buildCount(table: String): Long =
    builds.getOrDefault(table, 0L)

  /** If `table` exists in the process-shared catalog, return its
    * (bucketed) scan; else evaluate `df` once, write it as a bucketed
    * + sorted managed table, register exit-time cleanup, and return
    * the scan. The returned frame's recompute lineage roots on the
    * table scan — cheap under cache eviction, never the build. */
  def bucketedTable(s: SparkSession, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String])(
      df: => DataFrame): DataFrame = lockFor(table).synchronized {
    if (!s.catalog.tableExists(table)) {
      CorpusLayout.writeBucketed(df, table, buckets, bucketCols, sortCols)
      builds.merge(table, 1L, (a, b) => a + b)
      graft.ArtifactRegistry.deleteDirOnExit(
        CorpusLayout.managedTablePath(s, table).toString)
    }
    s.table(table)
  }

  /** Retire the durable side-artifact (explicit-release path — the
    * caller asserts no session still reads it; DROP on a managed
    * table also deletes its directory). Process-wide: the table is
    * shared by every session of this JVM, so releasing it in one
    * session retires the corpus snapshot for all of them. */
  def drop(s: SparkSession, table: String): Unit =
    lockFor(table).synchronized {
      s.sql(s"DROP TABLE IF EXISTS `$table`")
      ()
    }
}
