package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join via key salting.
  *
  * At 100 TB a shuffle join on a skewed key sends every row of the
  * hot key to ONE reducer — the classic straggler. Salting splits
  * each hot key's rows across `salts` reducers: the large (skewed)
  * side gets a deterministic salt in [0, salts); the small side is
  * replicated once per salt value; the join key becomes
  * (key, salt). Results are identical to the plain join — only the
  * physical distribution changes.
  *
  * When to prefer what:
  *  - AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  *    default) handles sort-merge-join skew transparently by
  *    splitting oversized partitions at runtime — use it first.
  *  - Manual salting (this operator) is the fallback when AQE can't
  *    help: broadcast-ineligible dimension, skewed aggregation
  *    feeding the join, or engines/stages where AQE doesn't apply.
  *
  * The salt must be deterministic for oracle-reproducible results —
  * we derive it from a hash of the large side's full row key, NOT
  * `rand()`.
  *
  * `AqeSkewSpec` measures the two head to head on the same hot-key
  * join: AQE's runtime split marks the join `skew=true` and collapses
  * the max per-task shuffle read ~4x, unsalted — so salting is the
  * fallback, not the default. The fallback matters where AQE cannot
  * split: a skewed AGGREGATION key (one group is still one reducer),
  * or skew materializing after a non-join exchange.
  */
object SkewJoin {

  /** Join `large` (skew-prone) with `small` on `key`, spreading each
    * key over `salts` partitions. `saltBy` must be a column of the
    * large side with high cardinality (e.g. its primary key). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: String, salts: Int = 8): DataFrame = {
    val l = large.withColumn("_salt", pmod(hash(col(saltBy)), lit(salts)))
    val r = small.withColumn("_salt", explode(
      sequence(lit(0), lit(salts - 1))))
    // shuffle_hash hint: salting only matters when the small side is
    // NOT broadcastable; without the hint Catalyst would broadcast a
    // small `small` side locally and the salt would exercise nothing
    l.join(r.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
