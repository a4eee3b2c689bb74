package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time profiler for a single `SparkEntry.queries` key —
  * the measurement step the optimization guide (§1) prescribes before
  * touching an operator: which of the key's Spark actions (jobs) own
  * the wall, how many stages/tasks each schedules, and how much time
  * the driver spends BETWEEN jobs (planning, collects, driver-side
  * loops). Runs the key twice; the second run is steady state (memo
  * caches hot, codegen cached). Usage:
  * `SPARK_GRAFT_CPUS=32 runMain graft.tools.JobProf <sfDir> <key>...`
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProf <sfDir> <key>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()

    case class Job(id: Int, desc: String, start: Long,
                   var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    case class Stg(id: Int, name: String, tasks: Int, ms: Long, taskMs: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[Stg]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, d.take(60), e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(0L)
        val rdds = si.rddInfos.map(_.name).filter(_ != null).distinct
          .mkString(",").take(120)
        stages.add(Stg(si.stageId, (si.name.take(40) + " | " + rdds).take(160),
          si.numTasks, ms, si.taskMetrics.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.drop(1).foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown key $key"))
      (1 to 2).foreach { run =>
        jobs.clear()
        stages.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the async listener bus drain
        val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.start)
        // jobs whose end event never arrived keep end == 0 (the 300 ms
        // drain sleep is not a guarantee) — summing them would inject
        // large negative durations (ADVICE r16)
        val jobSum = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
        val ss = stages.toArray(Array.empty[Stg])
        println(f"[jobprof] $key run$run: wall $wall%.2f s, " +
          f"jobs ${js.length}, in-job $jobSum%.2f s, " +
          f"stages ${ss.length}, stage-wall ${ss.map(_.ms).sum / 1e3}%.2f s, " +
          f"task-time ${ss.map(_.taskMs).sum / 1e3}%.2f s ($n rows)")
        if (run == 2) {
          println("  [top stages by wall]")
          ss.sortBy(-_.ms).take(20).foreach { s =>
            println(f"  stage ${s.id}%4d ${s.ms / 1e3}%7.3f s  " +
              f"tasks ${s.tasks}%3d taskTime ${s.taskMs / 1e3}%7.3f s  ${s.name}")
          }
          println(f"  [tasks histogram] 1-task stages: " +
            f"${ss.count(_.tasks == 1)}, 2-31: " +
            f"${ss.count(s => s.tasks > 1 && s.tasks < 32)}, 32+: " +
            f"${ss.count(_.tasks >= 32)}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
