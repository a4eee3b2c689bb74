package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SkewJoin

/** Measures the three physical strategies for the skewed
  * lineitem ⋈ supplier join behind `q_join_skew`, to document when
  * the manual salt should be dropped (PLANS.md "skew-join strategy"):
  *
  *  A. manual salt + shuffle_hash     (the operator under test)
  *  B. plain join, AQE skew handling  (what Spark does by itself)
  *  C. plain join, broadcast allowed  (what Catalyst picks when the
  *                                     dim side fits the threshold)
  *
  * A and B run with broadcast disabled (threshold -1) to model the
  * broadcast-INELIGIBLE dimension that motivates salting at all;
  * C is the control showing the default pick. Each variant is timed
  * min-of-N with the canary protocol's spirit (min favors clean
  * windows). Usage: runMain graft.tools.SkewStudy <sfDir> [reps]
  */
object SkewStudy {

  private def agg(joined: DataFrame): DataFrame =
    joined.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_extendedprice"))
    def sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))

    def salted = agg(SkewJoin.saltedJoin(li, sup, key = "suppkey",
      saltBy = "l_orderkey", salts = 8))
    def plain = agg(li.join(sup, Seq("suppkey")))

    // warm the scans
    li.selectExpr("max(hash(struct(*)))").collect()
    sup.selectExpr("max(hash(struct(*)))").collect()

    def time(name: String, mk: => DataFrame,
             confs: Map[String, String]): Unit = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skew] $name%-28s min ${secs.min}%.3f s  runs ${secs.map(s => f"$s%.3f").mkString(", ")}")
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }

    val noBroadcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    time("A salted+shuffle_hash", salted, noBroadcast)
    time("B plain join, AQE skew", plain,
      noBroadcast ++ Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true"))
    time("C plain join, broadcast", plain, Map.empty)

    println("[skew] --- physical plans ---")
    println("A salted+shuffle_hash:")
    println(salted.queryExecution.executedPlan.toString.linesIterator
      .take(18).mkString("\n"))
    println("C plain (default pick):")
    println(plain.queryExecution.executedPlan.toString.linesIterator
      .take(10).mkString("\n"))
    spark.stop()
  }
}
