package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded, (session, corpus-dir)-keyed registry of train-once
  * artifact bundles (persisted frames: dedup indexes, PQ codebooks,
  * graph edges). Mirrors the production lifecycle — an index is built
  * once per corpus snapshot and read by every query — while bounding
  * residency: at most `maxCorpora` snapshots stay resident per
  * registry; inserting beyond the cap RELEASES the least-recently-
  * used bundle's persisted frames (LRU by last access, not insert).
  * Corpus count is the practical byte proxy here — each bundle's
  * frames are O(one corpus index); a long-lived service rotating
  * snapshots gets bounded cache memory without manual `release`
  * calls, and an unpersisted-but-in-use frame degrades to lazy
  * recompute, never to wrong results.
  *
  * Concurrency: the registry lock covers MAP ACCESS only; each
  * bundle builds under its own cell lock, so different corpus dirs
  * build in parallel while same-key callers build exactly once. Every
  * cell state transition holds the cell lock, so a release/eviction
  * racing an in-flight build WAITS for the build and then unpersists
  * (a @volatile-flag design no-ops in that window and leaks the
  * frames), and a get racing a completed release observes the
  * retired cell and re-resolves a fresh one.
  *
  * Build contract: a build that THROWS must first unpersist whatever
  * frames it already materialized (use a tracked persist — see
  * GraphArtifacts.build) — the registry cannot know a failed build's
  * partial frames, and without cleanup every retry would persist
  * fresh copies. `onRetire` runs after the frames are unpersisted on
  * release/eviction — the hook for durable side-artifacts (bucketed
  * tables, serving directories) that must not outlive the bundle.
  */
final class ArtifactRegistry[A](frames: A => Seq[DataFrame],
    maxCorpora: Int = ArtifactRegistry.defaultMaxCorpora,
    onRetire: A => Unit = (_: A) => ()) {
  require(maxCorpora >= 1, "registry must admit at least one corpus")

  private final class Cell(s: SparkSession, dir: String,
      build: (SparkSession, String) => A) {
    private var built: Option[A] = None
    private var retired = false
    /** None ⇒ this cell was released/evicted while we waited. */
    def get(): Option[A] = synchronized {
      if (retired) None
      else Some(built.getOrElse { val a = build(s, dir); built = Some(a); a })
    }
    def retire(): Unit = synchronized {
      built.foreach { a =>
        frames(a).foreach(_.unpersist(blocking = false))
        onRetire(a)
      }
      built = None
      retired = true
    }
  }

  // LinkedHashMap iteration order = insertion order; re-inserting on
  // every access makes head the least-recently-USED entry.
  private val reg =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), Cell]

  def apply(s: SparkSession, dir: String)(
      build: (SparkSession, String) => A): A = {
    val key = (s, dir)
    val (cell, evicted) = synchronized {
      val c = reg.remove(key).getOrElse(new Cell(s, dir, build))
      reg.put(key, c) // MRU position — never evicts itself below
      val ev = List.newBuilder[Cell]
      while (reg.size > maxCorpora) {
        val lru = reg.head._1
        ev += reg.remove(lru).get
      }
      (c, ev.result())
    }
    evicted.foreach(_.retire()) // outside the map lock: retire may wait
    cell.get() match {
      case Some(a) => a
      case None => // lost the race to a release/eviction: drop ONLY
        // that defunct cell, then resolve a fresh one
        synchronized { if (reg.get(key).contains(cell)) reg.remove(key) }
        apply(s, dir)(build)
    }
  }

  def release(s: SparkSession, dir: String): Unit = {
    val c = synchronized { reg.remove((s, dir)) }
    c.foreach(_.retire())
  }

  /** Resident corpus count (for specs/monitoring). */
  def size: Int = synchronized(reg.size)
}

object ArtifactRegistry {
  /** Default residency bound per registry, env-tunable. */
  val defaultMaxCorpora: Int =
    sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_CORPORA", "4").toInt

  /** Collision-safe on-disk tag for a corpus dir. `String.hashCode`
    * collides easily (32 bits, trivial constructions), and a collision
    * in a table/directory name silently crossed two corpora's durable
    * artifacts — md5 makes that probability cryptographically nil. */
  def dirTag(dir: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(dir.getBytes("UTF-8"))
    .take(8).map("%02x".format(_)).mkString
}
