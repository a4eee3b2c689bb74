package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: corpus-scale
  * train/eval carving and per-stratum downsampling (e.g. keep 30% of
  * English, 10% of everything else) that is REPRODUCIBLE — the same
  * row always lands on the same side of the cut, on any engine.
  *
  * The sampling decision is a pure-arithmetic LCG mix of the row id,
  * not `rand()` (unseeded, irreproducible across retries/partitions)
  * and not `hash()` (murmur — engine-specific, so an external system
  * auditing the sample couldn't recompute membership). The id is
  * first reduced mod a prime so the multiply never overflows int64:
  * overflow wraps silently in (non-ANSI) Spark but ERRORS in e.g.
  * DuckDB, and cross-engine reproducibility is the whole point.
  *
  * Scale shape: a codegen'd per-row filter on the scan — no shuffle,
  * no state, pushes down column pruning; at 100 TB the sample is one
  * pass and the cut can be audited row-by-row from the id alone.
  */
object Sampling {

  private val IdPrime = 1000003L // (IdPrime-1)·1103515245 + 12345 < 2^63

  /** Pseudo-uniform bucket in [0, buckets): LCG over id mod a prime. */
  def deterministicBucket(id: Column, buckets: Int = 1000): Column =
    pmod(pmod(id, lit(IdPrime)) * lit(1103515245L) + lit(12345L), lit(buckets.toLong))

  /** Keep each row iff its bucket < rate·1000 for its stratum.
    * `rates` maps stratum value → sampling fraction (3 decimals of
    * resolution); strata not listed use `defaultRate`. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def perMille(r: Double) = {
      require(r >= 0.0 && r <= 1.0, s"rate $r out of [0,1]")
      lit(math.round(r * 1000))
    }
    val threshold = rates.foldLeft(perMille(defaultRate)) {
      case (acc, (k, v)) => when(col(strataCol) === k, perMille(v)).otherwise(acc)
    }
    df.filter(deterministicBucket(col(idCol)) < threshold)
  }

  /** Deterministic training-order shuffle + sharding: assign every
    * row a pseudo-random order key (the same LCG family as the
    * sampling cut — auditable from the id alone on any engine), a
    * shard = key mod `nShards`, and its 0-based position within the
    * shard. This is the reproducible "global shuffle" a pretraining
    * run applies before packing: the same corpus always yields the
    * same shard files in the same order, on any engine, after any
    * retry.
    *
    * Scale shape: the key and shard are codegen'd per-row arithmetic
    * on the scan; the position is ONE analytic window partitioned by
    * shard (one hash exchange on ~nShards keys + in-partition sort) —
    * never a global single-partition ordering. At 100 TB pick
    * nShards ≈ output file count so each shard sorts ~corpus/nShards
    * rows in one task. Key collisions tie-break by id, so positions
    * stay total and deterministic. */
  def trainOrder(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("okey"), col(idCol))
    df.withColumn("okey", deterministicBucket(col(idCol), IdPrime.toInt))
      .withColumn("shard", pmod(col("okey"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Deterministic per-group reservoir: EXACTLY min(k, |group|) rows
    * per group — the "k examples per source/language for eval or
    * inspection" cut, where [[stratified]]'s rate-based cut only hits
    * an expected count. Rows are ranked inside each group by the same
    * auditable LCG key as the other cuts (id tie-break keeps the rank
    * total), so membership is reproducible on any engine from the id
    * alone — unlike a true reservoir, whose result depends on
    * traversal order.
    *
    * Scale shape: one hash exchange on the group key; the rank
    * filter is a top-k window, which Spark runs with WindowGroupLimit
    * — each map task pre-prunes to its local top k BEFORE the
    * exchange, so the shuffle carries ≤ k·partitions rows per group,
    * not the group. */
  def perGroupSample(df: DataFrame, idCol: String, groupCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__okey"), col(idCol))
    df.withColumn("__okey", deterministicBucket(col(idCol), IdPrime.toInt))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("__okey")
  }

  /** Source-rebalanced mixture sampling with DATA-DERIVED rates: cap
    * every stratum at `targetPerStratum` expected rows — the "don't
    * let one crawl dominate the mixture" rebalance a pretraining run
    * applies before packing. Per-stratum keep rate (in permille) is
    * min(1000, target·1000 ÷ n) in INTEGER arithmetic, so the rates —
    * and therefore exact sample membership — are reproducible on any
    * engine from the counts alone.
    *
    * Scale shape: one aggregate pass builds the stratum-cardinality
    * table (strata-sized, broadcast back), then the keep decision is
    * the same codegen'd LCG-bucket filter as [[stratified]] — the
    * corpus itself is never shuffled. */
  def rebalanced(df: DataFrame, idCol: String, strataCol: String,
                 targetPerStratum: Long): DataFrame = {
    require(targetPerStratum > 0, s"target must be positive, got $targetPerStratum")
    val rates = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(strataCol),
        least(lit(1000L), expr(s"${targetPerStratum * 1000L} div __n")).as("__rate_pm"))
    df.join(broadcast(rates), strataCol)
      .filter(deterministicBucket(col(idCol)) < col("__rate_pm"))
      .drop("__rate_pm")
  }

  /** TOKEN-budget mixture targeting — the "mix sources to target
    * proportions" step of a pretraining corpus build (Pile/Dolma
    * style), one level above [[rebalanced]]'s per-stratum ROW cap:
    * given target mixture weights (permille) and a global token
    * budget, each stratum is down-sampled at the integer permille
    * rate that lands its EXPECTED token mass on budget·weight, capped
    * at keep-everything for strata too small to fill their slot
    * (under-filled slots are visible in the output rates — no silent
    * reweighting of the other strata).
    *
    * All arithmetic is INTEGER (permille weights, token counts, the
    * same LCG id cut as [[stratified]]), so exact sample membership —
    * not just the rates — is reproducible on any engine from
    * (id, stratum, token) columns alone. Strata absent from
    * `weightsPermille` get weight 0 and drop out.
    *
    * Scale shape: one aggregate pass builds the strata-sized token
    * table (broadcast back), then the keep decision is a codegen'd
    * per-row filter on the scan — the corpus never shuffles. */
  def mixtureBudget(df: DataFrame, idCol: String, strataCol: String,
                    tokens: Column, weightsPermille: Map[String, Long],
                    budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(weightsPermille.values.forall(_ >= 0), "weights must be >= 0")
    val wExpr = weightsPermille.foldLeft(lit(0L)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val tok = df.withColumn("__tk", tokens)
    val rates = tok.groupBy(col(strataCol))
      .agg(sum(col("__tk")).as("__tokn"))
      .withColumn("__wpm", wExpr)
      .select(col(strataCol),
        least(lit(1000L),
          expr(s"(($budgetTokens * __wpm) div 1000) * 1000 div __tokn"))
          .as("__rate_pm"))
    tok.join(broadcast(rates), strataCol)
      .filter(deterministicBucket(col(idCol)) < col("__rate_pm"))
  }
}
