package graft

import org.apache.spark.sql.DataFrame

/** A DataFrame result plus the intermediate caches its plan reads.
  *
  * Multi-consumer operators (the dedup candidate-generation pipelines,
  * the curation stages) persist diamond-reused subtrees; the persisted
  * blocks must outlive every action on the RESULT, so the operator
  * cannot unpersist them itself. For one-shot driver runs that's fine
  * (session teardown frees everything), but a long-lived service
  * accumulates MEMORY_AND_DISK blocks. The leased form makes the
  * lifecycle explicit: consume `df`, then `release()`.
  */
final case class Leased(df: DataFrame, cached: Seq[DataFrame]) {
  /** Drop every intermediate cache backing `df`. Call once all actions
    * on `df` have run — afterwards `df` still EVALUATES correctly but
    * recomputes its inputs from scratch. */
  def release(): Unit = cached.foreach(_.unpersist(blocking = true))
}
