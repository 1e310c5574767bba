package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared lineage-cut for iterative operators (graph rounds, MMR
  * greedy rounds): truncate the plan tree each round so a frame
  * referenced k times per round doesn't grow the tree k^rounds.
  *
  * Two modes, one switch:
  *  - `SPARK_GRAFT_CHECKPOINT_DIR` set (production clusters): RELIABLE
  *    `df.checkpoint()` into that directory — replayable after
  *    executor loss, the [[ConnectedComponents]] `checkpointDir`
  *    contract. `localCheckpoint` is NOT safe there: its truncated
  *    lineage lives in executor block storage, and losing an executor
  *    makes the frame unrecoverable mid-job.
  *  - unset (single-node runs, tests): eager `localCheckpoint(true)`
  *    — no FS round-trip, same plan truncation.
  *
  * Every iterative query in the library routes its cuts through here
  * so the reliable-mode parity test covers all of them at once
  * (Round9InvariantsSpec's executor-loss parity gate).
  */
object Lineage {

  /** Test hook: force the reliable-checkpoint mode without touching
    * the environment. Production sets `SPARK_GRAFT_CHECKPOINT_DIR`. */
  @volatile private[graft] var checkpointDirOverride: Option[String] = None

  def cut(df: DataFrame): DataFrame =
    checkpointDirOverride.orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")) match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir qualifies the path and appends a random UUID
        // subdirectory, so exact equality against the raw base would
        // never match and every cut() would mint a fresh subdir (one
        // driver-FS round-trip per cut, and it clobbers a dir the host
        // app set). A substring match is wrong the other way: a base
        // that is a string prefix of another (/tmp/chk vs /tmp/chk2)
        // false-positives and silently leaves checkpoints in the old
        // directory. Compare the PARENT of the current qualified
        // checkpoint path (strip the UUID leaf) against the qualified
        // base — exact, so the dir is set once per configured base.
        val qualified = {
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
        }
        val currentBase = sc.getCheckpointDir.map(
          c => new org.apache.hadoop.fs.Path(c).getParent.toString)
        if (!currentBase.contains(qualified)) sc.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
}
