package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** AQE skew-join vs manual salting ([[SkewJoin]]), head to head on
  * the same hot-key join — the evidence behind SkewJoin's "use AQE
  * first, salt as the fallback" guidance:
  *
  *  - with `spark.sql.adaptive.skewJoin.enabled` (the default), the
  *    UNSALTED shuffle join's oversized partition is split at
  *    runtime — the final adaptive plan carries the `skew=true`
  *    marker and the per-task shuffle-read spread collapses;
  *  - with it disabled, the same plan ships every hot-key row to one
  *    task (the 100 TB straggler);
  *  - both produce exactly the plain join's rows, as does the salted
  *    path.
  *
  * Salting remains necessary where AQE cannot see or split the skew:
  * a skewed AGGREGATION key (AQE splits join partitions, not
  * hash-aggregate groups — one group is still one reducer), or a
  * stage whose skew materializes after a non-join exchange. */
class AqeSkewSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the unsalted hot key; disabled, one task reads it all") {
    import spark.implicits._
    // 40k of 40.7k fact rows share key 1, each with a ~100 B payload
    // → the key-1 shuffle partition is MBs while the median is ~KB
    val pad = "x" * 100
    val fact = (1 to 40700).map(i =>
      (if (i <= 40000) 1L else (i % 7).toLong, i.toLong, pad))
      .toDF("k", "pk", "payload")
    val dim = (0 to 7).map(k => (k.toLong, s"name$k")).toDF("k", "name")

    val taskBytes = ArrayBuffer[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.totalBytesRead > 0)
          taskBytes.synchronized { taskBytes += m.shuffleReadMetrics.totalBytesRead }
      }
    }

    def run(skewOn: Boolean): (Long, Long, String) = {
      var maxB = 0L; var cnt = 0L; var plan = ""
      withConf(
        "spark.sql.adaptive.skewJoin.enabled" -> skewOn.toString,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        taskBytes.synchronized(taskBytes.clear())
        spark.sparkContext.addSparkListener(listener)
        try {
          val joined = fact.join(dim.hint("merge"), Seq("k"))
          // execute THIS DataFrame (count() would plan a separate
          // aggregate query and leave joined's adaptive plan unrun)
          cnt = joined.collect().length.toLong
          plan = joined.queryExecution.executedPlan.toString
          // let straggling TaskEnd events drain before reading
          val deadline = System.currentTimeMillis() + 10000
          var last = -1
          while (System.currentTimeMillis() < deadline &&
                 taskBytes.synchronized(taskBytes.size) != last) {
            last = taskBytes.synchronized(taskBytes.size)
            Thread.sleep(200)
          }
          maxB = taskBytes.synchronized(if (taskBytes.isEmpty) 0L else taskBytes.max)
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      (cnt, maxB, plan)
    }

    val (cntOff, maxOff, planOff) = run(skewOn = false)
    val (cntOn, maxOn, planOn) = run(skewOn = true)

    // identical results either way (and the row count is the join's)
    assert(cntOn == cntOff && cntOn == 40700L)
    // the adaptive plan visibly split the skewed partition
    assert(planOn.contains("skew=true"),
      s"AQE did not mark the join skew-handled:\n$planOn")
    assert(!planOff.contains("skew=true"),
      "control run unexpectedly skew-split with the feature disabled")
    // and the biggest task's shuffle read collapsed: the disabled run
    // funnels the hot key's MBs into one task, the split run bounds
    // every task near the advisory size
    info(s"max task shuffle-read bytes: skewJoin off=$maxOff on=$maxOn")
    assert(maxOn * 3 <= maxOff,
      s"expected ≥3x spread reduction from the skew split: off=$maxOff on=$maxOn")

    // the salted fallback produces the same rows as the plain join
    val plain = fact.join(dim, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n")).orderBy("k").collect()
    val salted = SkewJoin.saltedJoin(fact, dim, key = "k", saltBy = "pk")
      .groupBy("k", "name").agg(count(lit(1)).as("n")).orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
