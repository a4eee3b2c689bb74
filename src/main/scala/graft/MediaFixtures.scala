package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-memoized parquet materialization of PLANTED MEDIA
  * fixtures. The driver's testdata carries no media columns, so the
  * media-dedup gate keys synthesize them deterministically from
  * doc_ids (plant → decode → perturb → re-encode, a pure function of
  * the corpus) — which made every bench attempt re-run a JVM codec
  * pipeline that is INPUT synthesis, not operator work (~2.5 s of
  * the 9 s video key, ~1.5 s each of the image/audio keys at sf0.1).
  * The first caller writes the planted table to a session temp
  * parquet ([[IndexMemo]] owns locking + cleanup); afterwards the
  * keys read it like any other input table, so their measured cost
  * is fingerprint + dedup — the operator. Verify and the bench see
  * identical bytes either way: the plant is deterministic.
  */
object MediaFixtures {

  /** The planted table for (`name`, `sfDir`): parquet-backed after
    * first use. `plant` must be a pure function of the fixture —
    * encode every parameter that matters into `name`. */
  def memo(spark: SparkSession, name: String, sfDir: String)
          (plant: => DataFrame): DataFrame = {
    val dir = IndexMemo.dir(s"mediafix|$name|$sfDir") { d =>
      plant.write.parquet(d)
    }
    spark.read.parquet(dir)
  }
}
