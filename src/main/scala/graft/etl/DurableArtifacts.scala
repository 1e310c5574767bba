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

  /** Sessions currently ATTACHED to each table (guarded by the
    * table's stripe lock). The table is process-shared — every
    * session of this JVM reads the same catalog entry — but releases
    * are per-session (each session's registry cell retires
    * independently), so [[drop]] refcounts: it detaches only the
    * calling session and DROPs the table when the LAST attached
    * session releases. Without this, one session's explicit release
    * deleted the managed directory under sibling sessions whose
    * persisted frames still root their recompute lineage on the
    * table scan. A session that stops WITHOUT releasing stays in the
    * set and pins the table for the JVM's lifetime — bounded by the
    * corpora a process touches and reclaimed at exit
    * ([[graft.ArtifactRegistry.deleteDirOnExit]]). */
  private val attached =
    new java.util.concurrent.ConcurrentHashMap[
      String, scala.collection.mutable.Set[SparkSession]]()
  private def attachSet(table: String) =
    attached.computeIfAbsent(table,
      _ => scala.collection.mutable.Set.empty[SparkSession])

  /** Attached-session count (spec hook for the refcount contract). */
  private[graft] def attachCount(table: String): Int =
    lockFor(table).synchronized(attachSet(table).size)

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
    attachSet(table) += s
    s.table(table)
  }

  /** Arrival-sized APPEND of a delta to an existing durable bucketed
    * table — the maintain-loop's write shape (fold a batch into the
    * index; never rewrite the index). Serialized on the same stripe
    * lock as build-or-attach/drop, with an idempotence predicate
    * evaluated under the lock (`alreadyFolded(currentScan)`) so a
    * retried fold lands the delta at most once. Returns true when the
    * append actually ran. */
  def appendBucketed(s: SparkSession, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String],
      alreadyFolded: DataFrame => Boolean)(delta: => DataFrame): Boolean =
    lockFor(table).synchronized {
      if (alreadyFolded(s.table(table))) false
      else {
        CorpusLayout.appendBucketed(delta, table, buckets, bucketCols,
          sortCols)
        true
      }
    }

  /** Detach ONE session from the durable side-artifact; the table is
    * DROPped (managed-table DROP also deletes its directory) only when
    * no attached session remains. The caller asserts ITS OWN reads are
    * done — sibling sessions' cached frames stay safe because their
    * attach pins the table until they release too. A drop for a table
    * no session ever attached (cleanup of an orphan) drops
    * immediately. */
  def drop(s: SparkSession, table: String): Unit =
    lockFor(table).synchronized {
      val set = attachSet(table)
      set -= s
      if (set.isEmpty) {
        s.sql(s"DROP TABLE IF EXISTS `$table`")
        ()
      }
    }
}
