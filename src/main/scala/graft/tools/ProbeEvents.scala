package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run the 12 events-table queries at a given sf dir
  * and report pass/fail (round-8 correctness dropped exactly these keys).
  */
object ProbeEvents {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("q_asof_join", "q_event_gaps", "q_event_sessions",
      "q_event_windows", "q_fill_forward", "q_funnel", "q_json_extract",
      "q_latest_state", "q_outliers", "q_range_join", "q_retention",
      "q_rolling_range")
    keys.foreach { k =>
      try {
        val n = graft.SparkEntry.queries(k)(spark, dir).count()
        println(s"PROBE OK   $k rows=$n")
      } catch { case e: Throwable =>
        println(s"PROBE FAIL $k : ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(400))
      }
    }
    spark.stop()
  }
}
