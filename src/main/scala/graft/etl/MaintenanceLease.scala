package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Exclusive WRITER LEASE for the storage-lifecycle swaps. The swap
  * protocols ([[Maintenance.vacuumInPlace]],
  * [[CorpusLayout.compactPartitioned]]) are crash-safe but were
  * documented "not isolated": two concurrent runs on one tree — or a
  * maintenance run racing a streaming sink's appends — can interleave
  * renames (one run's recovery rolling back the other's in-flight
  * staging, a sink appending into a directory mid-swap). The lease
  * makes "run under the snapshot lifecycle" enforceable instead of
  * aspirational:
  *
  *  - IN-PROCESS: a striped monitor per qualified path (the
  *    [[DurableArtifacts]] per-table stripe-lock precedent) —
  *    concurrent same-JVM holders serialize, never fail;
  *  - CROSS-PROCESS: a lease FILE at `<path>.lease`, acquired by
  *    atomic create-no-overwrite + hsync, carrying holder id and an
  *    expiry wall-clock. A live foreign lease fails fast
  *    ([[MaintenanceLease.HeldException]] — the caller's scheduler
  *    retries later); an EXPIRED lease is broken and re-acquired
  *    (the holder crashed mid-run; the swap protocols' own crash
  *    recovery repairs whatever it left).
  *
  * The TTL must exceed the longest step run under the lease (default
  * 15 min; compactions sized by `minFilesToCompact` stay well under).
  * There is no mid-run refresh — a deliberate simplification: a
  * refresh loop that dies still leaves a stale lease, while a
  * generous TTL plus idempotent recovery bounds the damage to one
  * delayed run. Streaming sinks that append into a maintained tree
  * wrap each micro-batch's write in [[withLease]] with the same path,
  * so appends and swaps serialize on the same token
  * (MaintenanceLeaseSpec drives both races).
  */
object MaintenanceLease {

  final class HeldException(msg: String) extends RuntimeException(msg)

  /** FENCING TOKEN handed to [[withLeaseFenced]] bodies: `check()`
    * re-reads the lease file and throws [[HeldException]] unless this
    * run still owns it. The swap protocols call it immediately before
    * each rename batch, so a holder that outlived its TTL — whose
    * lease a breaker has legitimately fenced and replaced — stops
    * renaming instead of interleaving with the new holder's swap. The
    * check-then-rename window is still a race (a breaker completing
    * its whole break between the read and the rename), but it shrinks
    * the unfenced exposure from the rest-of-run to one rename batch;
    * closing it fully needs a filesystem with atomic conditional
    * renames (a table format's commit protocol). */
  final class Fence private[MaintenanceLease] (fs: FileSystem,
      lease: HPath, holder: String) {
    def check(): Unit = {
      val (who, _) = readLease(fs, lease)
      if (who != holder)
        throw new HeldException(
          s"fencing check failed: lease $lease now held by $who, " +
            s"not $holder — this run outlived its TTL; abandoning the swap")
    }
  }

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def fsOf(s: SparkSession, p: HPath): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Run `body` holding the exclusive lease for `path`. Same-JVM
    * contenders block until the holder finishes; a live lease from
    * another process throws [[HeldException]]; a stale one is broken. */
  def withLease[T](s: SparkSession, path: String,
      ttlMs: Long = 15L * 60 * 1000,
      holder: String = s"${graft.ArtifactRegistry.processTag}-" +
        s"${Thread.currentThread().getId}")(body: => T): T =
    withLeaseFenced(s, path, ttlMs, holder)(_ => body)

  /** [[withLease]] with the body handed a [[Fence]] token — swap
    * protocols call `fence.check()` before each rename batch so a
    * TTL-expired holder's late renames are rejected rather than
    * interleaved with the new holder's run. */
  def withLeaseFenced[T](s: SparkSession, path: String,
      ttlMs: Long = 15L * 60 * 1000,
      holder: String = s"${graft.ArtifactRegistry.processTag}-" +
        s"${Thread.currentThread().getId}")(body: Fence => T): T = {
    val p = new HPath(path)
    val fs = fsOf(s, p)
    val key = fs.makeQualified(p).toString
    val mon = locks.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val lease = new HPath(path + ".lease")
      acquireFile(fs, lease, holder, ttlMs)
      try body(new Fence(fs, lease, holder))
      finally releaseOwned(fs, lease, holder)
    }
  }

  /** Release only what this run still OWNS — and do it through the
    * same rename fence stale breaks use. A plain read-then-delete has
    * a window: this run outlived its TTL, a breaker fences the stale
    * lease and creates its own BETWEEN our ownership read and our
    * delete, and we delete the breaker's live lease (the third-writer
    * race the ownership check exists to prevent). Renaming first makes
    * the handoff single-winner: a lost rename means ownership already
    * passed; a won rename whose tombstone turns out foreign (the
    * breaker completed its whole fence+create inside our read→rename
    * window) is renamed back. Unreadable content is left in place —
    * the TTL reclaims it. */
  private def releaseOwned(fs: FileSystem, lease: HPath,
      holder: String): Unit = {
    val (who, _) = readLease(fs, lease)
    if (who != holder) return // ownership already passed (or unreadable)
    val tomb = new HPath(lease.getParent,
      lease.getName + ".release-" + java.util.UUID.randomUUID())
    if (!fs.rename(lease, tomb)) return // lost the race: already passed
    val (tw, _) = readLease(fs, tomb)
    if (tw == holder) fs.delete(tomb, false)
    else if (!fs.rename(tomb, lease))
      // a third lease appeared while we held the foreign one renamed
      // aside — put the displaced lease's content back is impossible
      // without clobbering; leave the tombstone (its holder loses only
      // its own release; the live lease file governs the path)
      ()
  }

  /** Create-no-overwrite claim with a FENCED stale break: an expired
    * lease is first RENAMED to a unique tombstone — rename-of-missing
    * fails, so of N breakers exactly one wins and the rest re-enter
    * the loop (where the winner's fresh lease now reads as live).
    * Without the fence, two processes that both read the same expired
    * lease would each delete-and-create, the second deleting the
    * first's LIVE lease. Content lands before hsync, so a lease is
    * never durable without its holder/expiry; a reader that still
    * catches the empty-file window falls back to the file's mtime
    * (see [[readLease]]) instead of treating it as expired.
    *
    * ATOMICITY of the claim itself: on the `file:` scheme Hadoop's
    * RawLocal/ChecksumFileSystem implements create-no-overwrite as a
    * non-atomic exists-check-then-create — two processes can race past
    * the check and the second FileOutputStream truncates the first's
    * lease. There the claim goes through
    * `java.nio.file.Files.createFile` (O_CREAT|O_EXCL, genuinely
    * atomic), and the content is written + forced afterwards (a reader
    * catching the created-but-empty window is covered by the mtime
    * fallback). Elsewhere `fs.create(overwrite = false)` is kept:
    * atomic on HDFS (namenode-arbitrated); on object stores without
    * conditional puts cross-process exclusion degrades to the TTL
    * bound, which is the documented ceiling. */
  private def acquireFile(fs: FileSystem, lease: HPath, holder: String,
      ttlMs: Long): Unit = {
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      try {
        val payload = s"$holder ${System.currentTimeMillis() + ttlMs}"
          .getBytes(StandardCharsets.UTF_8)
        if (fs.getScheme == "file") {
          val local = java.nio.file.Paths
            .get(fs.makeQualified(lease).toUri.getPath)
          java.nio.file.Files.createDirectories(local.getParent)
          java.nio.file.Files.createFile(local) // atomic O_CREAT|O_EXCL
          val ch = java.nio.channels.FileChannel.open(local,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            ch.write(java.nio.ByteBuffer.wrap(payload))
            ch.force(true)
          } finally ch.close()
        } else {
          val out = fs.create(lease, false)
          try {
            out.write(payload)
            out.hsync()
          } finally out.close()
        }
        return
      } catch {
        case _: java.io.IOException =>
          // somebody holds it — live or stale?
          val (who, expiry) = readLease(fs, lease, ttlMs)
          if (System.currentTimeMillis() <= expiry)
            throw new HeldException(
              s"maintenance lease on ${lease} held by $who until $expiry")
          // stale: the holder crashed mid-run. Fence the break — only
          // the process whose rename wins may reclaim; losers loop and
          // find the winner's fresh lease live.
          val tombstone = new HPath(lease.getParent,
            lease.getName + ".stale-" + java.util.UUID.randomUUID())
          if (fs.rename(lease, tombstone)) fs.delete(tombstone, false)
      }
    }
    throw new HeldException(s"could not acquire $lease after stale breaks")
  }

  /** (holder, expiryMillis). A file whose content is missing/corrupt
    * (the create-to-write window, or a torn write) is judged by its
    * MODIFICATION TIME instead: fresh ⇒ live (conservative — never
    * break a lease someone may be mid-writing), older than the ttl ⇒
    * expired. A vanished file reads as expired. */
  private def readLease(fs: FileSystem, lease: HPath,
      ttlMs: Long = 15L * 60 * 1000): (String, Long) =
    try {
      val in = fs.open(lease)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val parts = txt.trim.split(' ')
      (parts(0), parts(1).toLong)
    } catch {
      case _: Exception =>
        try ("unknown", fs.getFileStatus(lease).getModificationTime + ttlMs)
        catch { case _: Exception => ("unknown", Long.MinValue) }
    }
}
