package graft

/** `Tables.spreadIfNarrow` contract: the single-row-group workaround
  * repartition must vanish (no Exchange in the physical plan) when
  * the input already arrives as parallel splits — at 100 TB an
  * unconditional repartition would shuffle the whole input. */
class SpreadSpec extends SparkTestBase {

  test("already-parallel input passes through with no Exchange") {
    val wide = spark.range(10000).toDF() // local[4] range ⇒ 4 splits
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    val out = Tables.spreadIfNarrow(wide)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(out.rdd.getNumPartitions == wide.rdd.getNumPartitions)
  }

  test("narrow input is spread to defaultParallelism") {
    val narrow = spark.range(10000).coalesce(1).toDF()
    assert(narrow.rdd.getNumPartitions == 1)
    val out = Tables.spreadIfNarrow(narrow)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 10000)
  }
}
