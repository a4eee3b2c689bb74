package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call SQL registration for every custom Catalyst expression in
  * the engine, so the sketch/vector surface is first-class SQL text —
  * a user can write
  *
  *   SELECT gradient_sketch_sum(grad, 'None') FROM gradients
  *   SELECT dot_product(a, b), centroid_cosines(v, array(array(...)))
  *
  * without touching the Column API. Registration is per-session and
  * idempotent (`createOrReplaceTempFunction`).
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    DotProduct.register(spark)
    DotProductInt8.register(spark)
    CentroidCosines.register(spark)
    SketchGradientSum.register(spark)
    HeavyHitters.register(spark)
  }
}
