package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side layout contracts for a curated corpus — the storage
  * half of the scale story. At 100 TB the NEXT job's cost is decided
  * when THIS job writes: partition directories make calendar/source
  * filters partition-pruned scans, bounded file sizes keep task
  * planning sane (no 10 GB files, no 10 M tiny ones), in-file sort
  * order gives parquet min/max row-group pruning on range
  * predicates, and bucketed tables delete the shuffle from every
  * future equi-join on the bucket key (see BucketingSpec for the
  * no-exchange plan proof).
  */
object CorpusLayout {

  /** Parquet tree partitioned by `partitionCols` (one directory per
    * value combination — keep cardinality directory-scale, e.g.
    * source/date, never doc id), each file capped at
    * `maxRecordsPerFile` rows and sorted by `sortCols` so range
    * predicates prune row groups via parquet min/max stats.
    *
    * The `repartition(partitionCols)` before the write routes each
    * output partition's rows to one task — without it every task
    * holds an open writer per directory (memory) and emits a file
    * per (task × directory) — small-file storm at scale. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Int): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(path)
  }

  /** One partition's compaction outcome: leaf-relative dir, data
    * files before, data files after. */
  final case class CompactedPartition(dir: String, before: Int, after: Int)
  final case class CompactionReport(partitions: Seq[CompactedPartition],
      skipped: Int) {
    def filesBefore: Int = partitions.map(_.before).sum
    def filesAfter: Int = partitions.map(_.after).sum
  }

  /** BIN-PACK COMPACTION for a [[writePartitioned]] tree that a
    * continuous sink has fragmented — per-micro-batch appends land
    * one small file per partition per batch, and a month of 1-minute
    * triggers turns a day's directory into ~43k files whose open/plan
    * overhead dwarfs the scan (round 14, the maintenance job the
    * serving layout was missing).
    *
    * Only partitions holding at least `minFilesToCompact` data files
    * are touched (SELECTIVE — the already-compact bulk of a 100 TB
    * tree is never rewritten, so the job is sized by the fragmented
    * tail, not the table). One Spark job reads exactly those
    * directories (basePath keeps the partition columns), rewrites
    * them through the [[writePartitioned]] routing (one task per
    * directory, in-file sort restored, `maxRecordsPerFile` cap) into
    * a staging tree, then swaps each fragmented directory's data
    * files. The swap is per-partition rename with a commit-marker
    * protocol — metadata-cheap, and crash-RECOVERABLE: originals move
    * (never delete) into the staged leaf's `.orig`, a `_COMMIT`
    * marker is the durability point, and the next run's
    * [[recoverInterruptedCompaction]] rolls an interrupted swap
    * forward (marker present) or back (marker absent) before
    * touching anything else. It is still not isolated: run it under
    * the snapshot lifecycle (no concurrent readers of the fragmented
    * partitions), the same contract every compaction outside a table
    * format carries.
    * Readers' plans are unchanged: same directories, same partition
    * values, fewer files — PruneFileSourcePartitions sees the
    * identical tree (CorpusLayoutSpec locks pruned-scan parity). */
  def compactPartitioned(s: org.apache.spark.sql.SparkSession,
      path: String, partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Int, minFilesToCompact: Int = 2,
      fence: Option[MaintenanceLease.Fence] = None): CompactionReport = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact-staging")
    recoverInterruptedCompaction(fs, root, staging)
    val counted = leaves(fs, root)
      .map(d => d -> fs.listStatus(d).count(isData))
    val (frag, compactAlready) =
      counted.partition(_._2 >= minFilesToCompact)
    if (frag.isEmpty) return CompactionReport(Nil, compactAlready.size)

    val staged = s.read.option("basePath", path)
      .parquet(frag.map(_._1.toString): _*)
    val done = stageAndSwapLeaves(s, path, frag, staged, partitionCols,
      sortCols, maxRecordsPerFile, fence, allowEmptyLeaf = false)
    CompactionReport(done, compactAlready.size)
  }

  /** Data-bearing leaf directories of a partitioned tree (the root
    * itself for an unpartitioned one). */
  private def leaves(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val st = fs.listStatus(p).filterNot(x =>
      x.getPath.getName.startsWith("_") || x.getPath.getName.startsWith("."))
    val dirs = st.filter(_.isDirectory)
    if (dirs.isEmpty) Seq(p)
    else dirs.toSeq.flatMap(d => leaves(fs, d.getPath))
  }

  /** The shared STAGE-AND-SWAP engine under [[compactPartitioned]] and
    * [[scrubPartitioned]]: writes `stagedFrame` through the
    * [[writePartitioned]] routing into `<path>.compact-staging`, then
    * swaps each target leaf's data files with the commit-marker
    * protocol (originals RENAME into the staged leaf's `.orig`, a
    * hsync'd `_COMMIT` is the durability point, staged files rename
    * into the live directory; [[recoverInterruptedCompaction]] rolls
    * any crash point forward or back — one recovery path for both
    * callers). `allowEmptyLeaf` is the scrub-only case: a partition
    * whose every row was deleted stages ZERO files and the swap
    * legitimately empties the live directory; for compaction an empty
    * staged leaf can only be a bug and stays fatal. */
  private[etl] def stageAndSwapLeaves(s: org.apache.spark.sql.SparkSession,
      path: String,
      targets: Seq[(org.apache.hadoop.fs.Path, Int)],
      stagedFrame: DataFrame,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Int, fence: Option[MaintenanceLease.Fence],
      allowEmptyLeaf: Boolean): Seq[CompactedPartition] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact-staging")
    stagedFrame
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("overwrite")
      .parquet(staging.toString)
    // staged data must be durable BEFORE any leaf's _COMMIT marker:
    // the marker licenses roll-forward, and roll-forward trusts the
    // staged bytes (one recursive pass covers every leaf's files)
    syncStagedTree(fs, staging)

    // leaf dirs come back fully qualified (file:/…); strip the
    // qualified root PREFIX to get the partition-relative path —
    // URI.relativize silently returns the ABSOLUTE uri on any
    // scheme/prefix mismatch, which would alias staging onto the
    // destination itself
    val done = targets.map { case (d, before) =>
      val rel = relLeaf(fs, root, d)
      val stagedDir = new org.apache.hadoop.fs.Path(staging, rel)
      val staged =
        if (fs.exists(stagedDir)) fs.listStatus(stagedDir).filter(isData)
        else Array.empty[org.apache.hadoop.fs.FileStatus]
      if (staged.isEmpty) {
        require(allowEmptyLeaf, s"compaction staged no files for $rel")
        // an all-rows-deleted partition: materialize the staged leaf
        // so the marker protocol (and its recovery) applies unchanged
        if (!fs.exists(stagedDir))
          require(fs.mkdirs(stagedDir), s"mkdirs failed: $stagedDir")
      }
      // Crash-safe swap (roll-forward/roll-back via
      // [[recoverInterruptedCompaction]]): originals RENAME into
      // .orig under the staged leaf (metadata move, never a delete of
      // the only copy), a _COMMIT marker makes the swap durable, and
      // only then do the staged files rename into the live directory.
      // Any crash before the marker rolls back (originals restored);
      // any crash after it rolls forward (remaining renames finish).
      // fencing (round 17): a holder that outlived its TTL must not
      // start THIS leaf's swap — the new lease holder may be mid-run
      // on the same tree. Checked ONCE per leaf, strictly BEFORE the
      // leaf's marker: pre-marker aborts roll BACK (originals restored
      // by recovery); past the marker the swap is committed and must
      // finish — a post-marker abort would only manufacture the
      // committed-but-unapplied state for no isolation gain.
      fence.foreach(_.check())
      val orig = new org.apache.hadoop.fs.Path(stagedDir, ".orig")
      require(fs.mkdirs(orig), s"mkdirs failed: $orig")
      fs.listStatus(d).filter(isData).foreach(f =>
        renameOrThrow(fs, f.getPath,
          new org.apache.hadoop.fs.Path(orig, f.getPath.getName)))
      val marker = new org.apache.hadoop.fs.Path(stagedDir, "_COMMIT")
      // create + hsync before close: createNewFile alone leaves the
      // durability point process-crash-safe only — on a machine/power
      // crash a buffered marker can vanish AFTER staged renames began,
      // and recovery's roll-back branch would then restore .orig
      // originals alongside already-landed staged files (duplicates).
      // hsync persists the marker (and, on HDFS, its length) before
      // the first live-dir rename, so the marker's existence is
      // ordered ahead of every roll-forward effect it licenses.
      val out = fs.create(marker, false)
      try out.hsync() finally out.close()
      staged.foreach(f => renameOrThrow(fs, f.getPath,
        new org.apache.hadoop.fs.Path(d, f.getPath.getName)))
      fs.delete(stagedDir, true)
      CompactedPartition(rel, before, staged.length)
    }
    fs.delete(staging, true)
    done
  }

  /** DELETE-BY-KEY SCRUB of a [[writePartitioned]] serving tree — the
    * forget cascade's storage leg ([[Forget]]'s scaladoc; a compliance
    * deletion is incomplete while the forgotten docs' bytes still sit
    * in the partitioned serving copy). SELECTIVE like the compaction:
    * one semi-join finds the partitions that actually HOLD a forgotten
    * key (metadata-scale collect — one row per affected partition
    * value), only those leaves are rewritten (anti-join against the
    * broadcast forget set), and the swap rides the same staged
    * commit-marker protocol + recovery as [[compactPartitioned]]. A
    * partition with no forgotten key keeps its files BYTE-IDENTICAL —
    * at 100 TB the job is sized by the partitions the forget batch
    * touches, never the tree. Run it under
    * [[MaintenanceLease.withLeaseFenced]] on the tree's path (same
    * token as the sink's appends and the compaction).
    *
    * `forget` must be a small keyed frame (one `idCol` column,
    * batch-sized — it broadcasts twice). Partition VALUES must
    * round-trip through their directory-name encoding (strings
    * without URI-escaped characters, integers — the serving trees
    * here partition by source/day). */
  def scrubPartitioned(s: org.apache.spark.sql.SparkSession,
      path: String, partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Int, forget: DataFrame, idCol: String,
      fence: Option[MaintenanceLease.Fence] = None): CompactionReport = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact-staging")
    recoverInterruptedCompaction(fs, root, staging)
    val all = leaves(fs, root)
    val tree = s.read.option("basePath", path).parquet(path)
    val hitRows = tree
      .join(broadcast(forget.select(col(idCol))), Seq(idCol), "left_semi")
      .select(partitionCols.map(col): _*).distinct().collect()
    val hitRels = hitRows.map(r => partitionCols.indices
      .map(i => s"${partitionCols(i)}=${r.get(i)}").mkString("/")).toSet
    val targets = all
      .filter(d => hitRels.contains(relLeaf(fs, root, d)))
      .map(d => d -> fs.listStatus(d).count(isData))
    // a hit partition whose VALUE doesn't round-trip its directory
    // encoding (URI-escaped chars, type-inference re-formatting,
    // __HIVE_DEFAULT_PARTITION__) would silently never rewrite — in a
    // compliance deletion that is a silent NON-deletion, so it must
    // fail loudly, not land in `skipped`
    if (targets.size != hitRels.size) {
      val matched = targets.map(t => relLeaf(fs, root, t._1)).toSet
      throw new java.io.IOException(
        "scrubPartitioned: partitions holding forgotten keys have no " +
          s"matching leaf directory (value/dir-name round-trip failed): " +
          (hitRels -- matched).mkString(", "))
    }
    if (targets.isEmpty)
      return CompactionReport(Nil, all.size)
    val kept = s.read.option("basePath", path)
      .parquet(targets.map(_._1.toString): _*)
      .join(broadcast(forget.select(col(idCol))), Seq(idCol), "left_anti")
    val done = stageAndSwapLeaves(s, path, targets, kept, partitionCols,
      sortCols, maxRecordsPerFile, fence, allowEmptyLeaf = true)
    CompactionReport(done, all.size - targets.size)
  }

  private[etl] def isData(f: org.apache.hadoop.fs.FileStatus): Boolean =
    f.isFile && !f.getPath.getName.startsWith("_") &&
      !f.getPath.getName.startsWith(".")

  /** Persist already-written staged files before a commit marker is
    * created — the marker's durability is only meaningful if the data
    * it licenses a roll-forward onto is at least as durable. On a
    * local/POSIX filesystem Spark's parquet writes land through
    * buffered streams whose pages may still sit in the page cache
    * when the stream closes, so a power crash can persist the
    * (hsync'd) marker while the staged data it points at is
    * truncated. Here every data file under `dir` (recursively) is
    * re-opened and fsync'd, then each directory entry is fsync'd too.
    * Non-`file:` schemes are a no-op: on HDFS `close()` only returns
    * after the last packet is acknowledged by the datanode pipeline,
    * which is the durability contract these swaps rely on there. */
  private[etl] def syncStagedTree(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    if (fs.getScheme != "file") return
    def localPath(p: org.apache.hadoop.fs.Path): java.nio.file.Path =
      java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
    def walk(p: org.apache.hadoop.fs.Path): Unit = {
      val st = fs.listStatus(p)
      st.filter(isData).foreach { f =>
        val ch = java.nio.channels.FileChannel.open(
          localPath(f.getPath), java.nio.file.StandardOpenOption.READ)
        try ch.force(true) finally ch.close()
      }
      st.filter(_.isDirectory).foreach(d => walk(d.getPath))
      val dch = java.nio.channels.FileChannel.open(
        localPath(p), java.nio.file.StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    }
    walk(dir)
  }

  /** true iff every data file directly under `dir` is a plausibly
    * COMPLETE parquet file (non-empty, ends with the `PAR1` footer
    * magic). Recovery's roll-forward validation: a durable marker
    * normally implies durable staged data (see [[syncStagedTree]]),
    * but on filesystems outside that guarantee this cheap footer
    * probe is the difference between rolling forward onto truncated
    * files — silent data loss once the original tree is dropped —
    * and rolling back to the intact original. */
  private[etl] def parquetLeafReadable(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean = {
    val magic = "PAR1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val files = fs.listStatus(dir).filter(isData)
    files.nonEmpty && files.forall { f =>
      f.getLen >= 8L && {
        // any read/seek failure (truncation, checksum mismatch on a
        // ChecksumFileSystem whose .crc outlived the data pages) IS
        // the corruption the probe exists to detect
        try {
          val in = fs.open(f.getPath)
          try {
            in.seek(f.getLen - 4L)
            val buf = new Array[Byte](4)
            in.readFully(buf)
            java.util.Arrays.equals(buf, magic)
          } finally in.close()
        } catch { case _: java.io.IOException => false }
      }
    }
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Leaf path relative to `base`. Qualified-prefix strip, NOT
    * URI.relativize — relativize silently returns the ABSOLUTE uri on
    * any scheme/prefix mismatch, which would alias staging onto the
    * destination itself. */
  private def relLeaf(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      leaf: org.apache.hadoop.fs.Path): String = {
    val baseQ = fs.makeQualified(base).toString
    val leafQ = fs.makeQualified(leaf).toString
    require(leafQ.startsWith(baseQ), s"leaf $leafQ outside root $baseQ")
    leafQ.stripPrefix(baseQ).stripPrefix("/")
  }

  /** Standalone recovery entry point: repairs a compaction of `path`
    * that was interrupted mid-swap, without running a new compaction.
    * A serving process should call this at startup (and a reader may
    * call it on suspicion) — recovery otherwise only happens as a
    * side effect of the NEXT compaction, and a committed-but-
    * unapplied swap leaves the live partition empty until then.
    * No-op when no staging tree exists. */
  def recoverCompaction(s: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    recoverInterruptedCompaction(fs, root,
      new org.apache.hadoop.fs.Path(path + ".compact-staging"))
  }

  /** Repairs a compaction interrupted mid-swap, then removes the
    * staging tree. Per staged leaf: a `_COMMIT` marker means the swap
    * was durable — roll FORWARD (finish renaming staged data files
    * into the live directory; the displaced originals in `.orig` are
    * dead). No marker means the swap never committed — roll BACK
    * (restore any originals already moved into `.orig`; the staged
    * output is discarded). A staging tree from a crash during the
    * staging WRITE itself (no `.orig`, no marker) is simply deleted —
    * the live directories were never touched. Idempotent: a crash
    * during recovery re-enters the same case on the next run. */
  private def recoverInterruptedCompaction(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(staging)) return
    def walk(p: org.apache.hadoop.fs.Path): Unit = {
      val st = fs.listStatus(p)
      val marker = new org.apache.hadoop.fs.Path(p, "_COMMIT")
      val orig = new org.apache.hadoop.fs.Path(p, ".orig")
      val live = {
        val rel = relLeaf(fs, staging, p)
        if (rel.isEmpty) root else new org.apache.hadoop.fs.Path(root, rel)
      }
      if (fs.exists(marker)) {
        // roll-forward VALIDATION (the vacuum probe applied here too):
        // a durable marker normally implies durable staged data
        // (syncStagedTree ordered them), but on a filesystem outside
        // that guarantee the staged files can be truncated. Probe what
        // is still in staging before renaming it into the live dir.
        val stagedData = st.filter(isData)
        val liveHasData = fs.exists(live) &&
          fs.listStatus(live).exists(isData)
        if (stagedData.isEmpty || parquetLeafReadable(fs, p)) {
          require(fs.mkdirs(live), s"mkdirs failed: $live")
          stagedData.foreach(f => renameOrThrow(fs, f.getPath,
            new org.apache.hadoop.fs.Path(live, f.getPath.getName)))
        } else if (!liveHasData && fs.exists(orig)) {
          // no staged file reached the live dir yet → the originals in
          // .orig are intact and unambiguous: roll BACK
          require(fs.mkdirs(live), s"mkdirs failed: $live")
          fs.listStatus(orig).filter(_.isFile).foreach(f =>
            renameOrThrow(fs, f.getPath,
              new org.apache.hadoop.fs.Path(live, f.getPath.getName)))
        } else if (liveHasData && (!fs.exists(orig) ||
            !fs.listStatus(orig).exists(_.isFile))) {
          // .orig absent/empty with the live leaf populated → no
          // original was ever displaced (the marker persisted but the
          // .orig renames didn't — reachable only outside the
          // syncStagedTree guarantee, same class as the corrupt
          // staging itself): the live files ARE the untouched
          // originals. Roll back automatically by discarding the
          // corrupt staged leaf instead of paging an operator for a
          // recoverable state; the exception below stays reserved for
          // the genuinely mixed partial roll-forward.
          fs.delete(p, true)
        } else {
          // mixed state (some staged files already live, the rest
          // truncated) — restoring .orig would duplicate rows and
          // rolling forward would land corrupt files. Refuse to
          // destroy either copy; this state is only reachable on a
          // filesystem with neither POSIX-fsync nor HDFS-close
          // durability AND partially-persisted renames.
          throw new java.io.IOException(
            s"compaction recovery: staged leaf $p is corrupt after a " +
              "partial roll-forward — manual reconciliation required " +
              "(originals quarantined in its .orig)")
        }
      } else if (fs.exists(orig)) {
        require(fs.mkdirs(live), s"mkdirs failed: $live")
        fs.listStatus(orig).filter(_.isFile).foreach(f =>
          renameOrThrow(fs, f.getPath,
            new org.apache.hadoop.fs.Path(live, f.getPath.getName)))
      }
      st.filter(s => s.isDirectory && s.getPath.getName != ".orig")
        .foreach(d => walk(d.getPath))
    }
    walk(staging)
    fs.delete(staging, true)
  }

  /** Morton bit-spread: inserts a 0 between each of the low 16 bits
    * (x₁₅…x₀ → 0x₁₅0x₁₄…0x₀) — the classic interleave mask ladder,
    * pure column bit math (codegen'd, no UDF). */
  private def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key over two numeric columns, each range-scaled
    * to 16 bits against caller-supplied [lo, hi] bounds (one stats
    * pass, or domain knowledge). Nulls and out-of-range values clamp
    * to the domain edges — they land in the first/last z-stripe
    * instead of corrupting the curve. */
  def zorderKey(a: Column, aLo: Column, aHi: Column,
      b: Column, bLo: Column, bHi: Column): Column = {
    def bucket(x: Column, lo: Column, hi: Column): Column = {
      val clamped = least(greatest(coalesce(x.cast("double"), lo), lo), hi)
      when(hi === lo, lit(0L)).otherwise(
        floor((clamped - lo) / (hi - lo) * 65535).cast("long"))
    }
    spread16(bucket(a, aLo, aHi))
      .bitwiseOR(shiftleft(spread16(bucket(b, bLo, bHi)), 1))
  }

  /** Parquet files laid out on the Z-order curve of (`colA`, `colB`):
    * a stats pass finds the domain, every row gets its interleaved-bit
    * Morton key, and files are range-partitioned + sorted on it. Each
    * file then covers a RECTANGLE in (A, B) space instead of a full
    * stripe, so parquet min/max footer stats prune files for range
    * predicates on EITHER column (or both) — the multi-dimensional
    * generalization of `writePartitioned`'s single-axis in-file sort,
    * and the standard lakehouse answer (Delta/Iceberg `ZORDER BY`)
    * re-expressed as plain Spark column math.
    *
    * `repartitionByRange`'s sampled boundaries are fine HERE (unlike
    * the OffsetWindow rank pattern): layout needs no cross-pass
    * boundary agreement, only that each file holds a contiguous
    * z-range. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int): Unit = {
    val stats = df.agg(
      min(col(colA).cast("double")).as("alo"), max(col(colA).cast("double")).as("ahi"),
      min(col(colB).cast("double")).as("blo"), max(col(colB).cast("double")).as("bhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zorderKey(col(colA), col("alo"), col("ahi"),
        col(colB), col("blo"), col("bhi")))
      .drop("alo", "ahi", "blo", "bhi")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed + sorted table: co-locates `bucketCols` keys at write
    * time so every later equi-join or aggregation on them plans
    * without an exchange (and sort-merge joins without a sort). Spark
    * bucketing requires the table catalog (`saveAsTable`). */
  /** Catalog-resolved location of managed table `table` in the
    * session's CURRENT database — where `saveAsTable(table)` will
    * write. A `<warehouse>/<table>` guess is only right for the
    * default database at its default location; under a non-default
    * database it misses the real path (or hits an unrelated
    * same-named one). */
  def managedTablePath(s: org.apache.spark.sql.SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table)))

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String]): Unit = {
    // True overwrite across JVM restarts: the in-memory catalog
    // forgets the table between sessions but its managed LOCATION
    // survives on disk, and CREATE then fails with
    // LOCATION_ALREADY_EXISTS — drop the stale entry AND the orphaned
    // directory before writing.
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = managedTablePath(s, table)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Route each bucket's rows to one task before the write: Spark's
    // repartition hash IS the bucket hash (Murmur3), so this yields
    // ONE file per bucket instead of tasks × buckets small files —
    // at 1000 executors the difference between a bounded table and a
    // small-file storm.
    df.repartition(buckets, bucketCols.map(col): _*)
      .write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** APPEND a delta to an existing bucketed table with the same
    * bucket spec — the maintain-loop write shape: folding an arrival
    * batch into a durable index is an arrival-sized append (each
    * bucket gains one delta file), never an index-sized rewrite.
    * Bucket pruning and bucketed-join co-location stay valid because
    * the delta is hashed with the table's own bucket spec. Callers
    * serialize through [[graft.etl.DurableArtifacts]]' per-table
    * stripe lock. */
  def appendBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String]): Unit = {
    df.repartition(buckets, bucketCols.map(col): _*)
      .write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("append")
      .saveAsTable(table)
  }
}
