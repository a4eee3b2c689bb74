package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RefQueries, RelationalQueries, SketchQueries, SparkSqlTwins}

/** Driver contract — see /root/repo/SURVEY.md §2.5/§7 + the builder
  * prompt. Queries are assembled from three catalogs:
  *  - [[RefQueries]]       Group A: reference-surface (scan/parse/
  *                         broadcast/split/gradient/loss/SGD/sketch)
  *  - [[RelationalQueries]] Group B: relational core + event-time
  *  - [[PipelineQueries]]  Group B: LLM-pipeline (dedup/similarity/
  *                         text/multimodal)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (lossy sketch, engine-hash
    * MinHash/SimHash) get the rows-only check. */
  def oracleSql: Map[String, String] =
    RefQueries.oracleSql ++ RelationalQueries.oracleSql ++
      PipelineQueries.oracleSql ++ SketchQueries.oracleSql

  /** Spark-dialect SQL twins for the oracle statements that are
    * DuckDB-only dialect. Used by SqlParitySpec to prove the whole
    * catalog through `spark.sql` text as well. */
  def sparkSql: Map[String, String] = SparkSqlTwins.map
}
