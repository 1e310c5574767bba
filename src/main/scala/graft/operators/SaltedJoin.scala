package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-proof equi-join by key salting — the join-side counterpart of
  * [[SaltedAgg]] (which salts aggregations).
  *
  * When the join key has few distinct values (or a handful of hot
  * ones), a plain shuffle join lands each key on ONE reducer: key
  * cardinality below cluster parallelism caps the join at
  * #distinct-keys tasks, and one hot key (the classic web-corpus
  * boilerplate domain, the null-bucket, the "unknown" agent) turns
  * into a straggler that runs as long as the whole rest of the stage.
  *
  * The fix is the standard salt-and-replicate: the BIG side appends
  * `__salt = pmod(hash(saltBy), salts)` (a deterministic row hash —
  * NOT rand(), so retried/speculated tasks re-derive identical
  * output), the SMALL side is exploded `salts`× (one copy per salt
  * value), and the join key becomes (keys…, __salt). Each original
  * key now spreads over `salts` reducers; the small side grows
  * `salts`×, which is the explicit, bounded price (small side must
  * stay broadcast-or-small — that's the use case).
  *
  * Result is EXACTLY the plain inner join (every big row meets every
  * matching small row exactly once — the salt pairs each big row with
  * the single small copy carrying its salt), which is what the driver
  * oracle checks on e16.
  */
object SaltedJoin {

  /** Inner equi-join of `big` ⋈ `small` on `keys`, salted `salts`
    * ways. `saltBy` is any big-side expression that varies WITHIN a
    * join key (a row id, a fine-grained column) — it only needs to
    * spread rows, not be unique. */
  def inner(big: DataFrame, small: DataFrame, keys: Seq[String],
            salts: Int, saltBy: Column): DataFrame =
    apply(big, small, keys, salts, saltBy, "inner")

  /** Big-side-preserving join types only: each big row carries
    * exactly ONE salt, so inner/left_outer/left_semi/left_anti are
    * exact. Right/full would surface every unmatched SMALL copy
    * `salts` times — structurally wrong, hence rejected (salt the
    * other way around for a skewed right side). */
  private val okTypes = Set("inner", "left_outer", "left", "left_semi",
    "semi", "left_anti", "anti")

  def apply(big: DataFrame, small: DataFrame, keys: Seq[String],
            salts: Int, saltBy: Column, joinType: String): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(okTypes(joinType),
      s"salted join preserves only the big side; got joinType=$joinType")
    val b = big.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val sm = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    b.join(sm, keys :+ "__salt", joinType).drop("__salt")
  }
}
