package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Loaders for the driver-generated parquet star schema + LLM-pipeline
  * tables (TESTDATA.md / FIXTURES.md §A). One parquet file per table
  * under `$sfDir/`. All reads are plain `spark.read.parquet` so
  * Catalyst gets full pushdown/pruning on the vectorized reader.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in two fixture vintages: parquet
    * TIMESTAMP(NANOS) (Spark's reader rejects it → read nanos as long
    * and truncate to micros, the same truncation DuckDB applies), or
    * plain TIMESTAMP(MICROS) without tz (Spark reads TIMESTAMP_NTZ →
    * cast to session-tz timestamp; the session is pinned UTC so the
    * wall-clock instant matches DuckDB's reading exactly). Dispatch on
    * the observed schema so either fixture loads identically. Integer
    * `div` avoids double-precision loss on ~1.7e18 nano values. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Repartition ONLY when the input is narrower than the cluster.
    * The driver's sf parquet is written as a single row group, so its
    * scan arrives as ONE split and anything CPU-heavy downstream runs
    * on one core unless spread; but at 100 TB the scan arrives as
    * thousands of splits, where an unconditional `repartition` is a
    * full shuffle of the entire input for nothing. Gate on the
    * observed partition count: wide inputs pass through with no
    * Exchange in the plan. (`ds.rdd.getNumPartitions` plans the query
    * but launches no job.) */
  private[graft] def spreadIfNarrow[T](ds: Dataset[T]): Dataset[T] = {
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < want) ds.repartition(want) else ds
  }
}
