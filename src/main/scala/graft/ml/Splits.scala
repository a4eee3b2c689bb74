package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/test splitting — replaces the reference's
  * UNSEEDED `Splitter.trainTestSplit` (`/root/reference/.../Test.scala:39`,
  * FlinkML default random seed), which made reference runs
  * non-reproducible (SURVEY §7 risk 2). Two flavors:
  *  - [[byKey]]: stable hash of a key column — reproducible across
  *    engines/runs/partitionings, the form the DuckDB oracle can
  *    replay (`q_split_deterministic` uses the modulo special case);
  *  - [[seededRandom]]: Spark's randomSplit with an explicit seed —
  *    reproducible within Spark only.
  */
object Splits {

  /** train = rows where hash64(key, salt) mod 100 >= testPct. */
  def byKey(df: DataFrame, key: Column, testPct: Int = 25,
            salt: Long = 42L): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(key, lit(salt)), lit(100L))
    (df.filter(bucket >= testPct), df.filter(bucket < testPct))
  }

  /** Simple keyed modulo split (integer keys), oracle-portable. */
  def byModulo(df: DataFrame, key: Column, mod: Int = 4): (DataFrame, DataFrame) =
    (df.filter(pmod(key, lit(mod)) =!= 0), df.filter(pmod(key, lit(mod)) === 0))

  def seededRandom(df: DataFrame, trainFrac: Double = 0.75,
                   seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(trainFrac, 1.0 - trainFrac), seed)
    (tr, te)
  }
}
