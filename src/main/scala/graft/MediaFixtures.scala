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
      // spread the fixture across the session's parallelism before
      // writing (r17): the planted tables inherit the source table's
      // 1-2 input splits, so every DOWNSTREAM DECODE of the memo ran
      // as 1-2 tasks on a 32-core session (measured: the fingerprint
      // cache fill of q_dedup_video was one 0.6 s task). A doc_id
      // hash repartition at plant time (once per session) gives every
      // repeated decode scan `defaultParallelism` splits — and the
      // count derives from the session, never a pinned constant
      val p = plant
      val n = math.max(1, spark.sparkContext.defaultParallelism)
      val spread =
        if (p.columns.contains("doc_id"))
          p.repartition(n, org.apache.spark.sql.functions.col("doc_id"))
        else p
      spread.write.parquet(d)
    }
    spark.read.parquet(dir)
  }
}
