package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Loaders for the driver-generated parquet star schema + LLM-pipeline
  * tables (TESTDATA.md / FIXTURES.md §A). One parquet file per table
  * under `$sfDir/`. All reads are plain `spark.read.parquet` so
  * Catalyst gets full pushdown/pruning on the vectorized reader.
  *
  * VINTAGE TOLERANCE: the driver can regenerate the fixtures between
  * rounds with a different writer, silently changing physical parquet
  * types (round 8: `events.ts` flipped TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)-NTZ and all 12 events queries dropped out of the
  * correctness gate as analysis errors). Every temporal column
  * therefore goes through a dispatch-on-observed-type normalizer so
  * any plausible vintage loads to the SAME canonical type the query
  * surface was written against. `nanosAsLong` is set before every
  * load — it is a no-op unless a column is physically TIMESTAMP(NANOS).
  */
object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{DataType, DateType, LongType, TimestampNTZType, TimestampType}

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize one temporal column to `want` (TimestampNTZType or
    * TimestampType), whatever vintage it arrived in: nanos-as-long
    * (÷1000 → micros, DuckDB's truncation), DATE (midnight), or the
    * other timestamp flavor (session tz is pinned UTC everywhere, so
    * NTZ↔LTZ casts preserve the wall-clock reading DuckDB reports). */
  private def normTemporal(df: DataFrame, c: String, want: DataType): DataFrame = {
    if (!df.columns.contains(c)) return df
    df.schema(c).dataType match {
      case t if t == want => df
      case LongType =>
        df.withColumn(c, expr(s"timestamp_micros($c div 1000)").cast(want))
      case DateType | TimestampType | TimestampNTZType =>
        df.withColumn(c, col(c).cast(want))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    normTemporal(load(s, d, "orders"), "o_orderdate", TimestampNTZType)
  def lineitem(s: SparkSession, d: String): DataFrame =
    normTemporal(load(s, d, "lineitem"), "l_shipdate", TimestampNTZType)
  /** `events.ts` has shipped in two fixture vintages already —
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS)-NTZ; its canonical type is
    * session-tz TimestampType (the session is pinned UTC so the
    * wall-clock instant matches DuckDB's reading exactly). Integer
    * `div` in the nanos branch avoids double-precision loss on
    * ~1.7e18 nano values. */
  def events(s: SparkSession, d: String): DataFrame =
    normTemporal(load(s, d, "events"), "ts", TimestampType)
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
