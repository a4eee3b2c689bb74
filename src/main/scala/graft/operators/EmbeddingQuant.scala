package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization of embedding vectors: per-vector
  * scale = max|x| / 127, stored as (tinyint array, float scale) —
  * 4× smaller than float32, ~8× smaller than the float64 compute
  * form. At 100 TB corpus scale this is the difference between an
  * ANN index that fits in cluster memory and one that doesn't; the
  * cosine distortion of symmetric int8 on unit-ish vectors is < 1%,
  * which [[quantReport]] asserts per vector rather than assuming.
  * Same design as the SketchML gradient codec (SURVEY §2.4): lossy
  * compression wrapped in a checked error bound.
  */
object EmbeddingQuant {

  /** embedding (array<double/float>) → (qv array<tinyint>, scale).
    * A zero vector has scale 0 — under ANSI mode the division would
    * throw DIVIDE_BY_ZERO, so it is guarded to quantize to zeros.
    *
    * NOTE: convenience column form for narrow arrays / single rows.
    * The lambda references `scale`, and because Spark HOF lambdas
    * have no let-binding, projection collapse inlines the whole
    * `array_max(transform(...))` expression PER ELEMENT — O(dim²)
    * interpreted work. Bulk paths must use [[quantReport]]'s
    * explode shape instead. */
  def quantize(emb: Column): (Column, Column) = {
    val d = emb.cast("array<double>")
    val scale = array_max(transform(d, x => abs(x))) / 127.0
    val qv = transform(d, x =>
      when(scale === 0, lit(0.0)).otherwise(round(x / scale)).cast("tinyint"))
    (qv, scale)
  }

  /** (qv, scale) → array<double> approximation. */
  def dequantize(qv: Column, scale: Column): Column =
    transform(qv, q => q.cast("double") * scale)

  /** Quantize + dequantize every embedding and report the cosine
    * similarity between original and reconstruction. `minCos` is the
    * per-vector acceptance bound (emitted as a boolean so the whole
    * report is deterministic and oracle-checkable).
    *
    * A zero vector has norm 0 and an undefined cosine — under ANSI
    * mode the division throws, and with NaN Spark's ordering would
    * let `cos >= minCos` vacuously PASS exactly the vectors whose
    * quantization is meaningless. Zero vectors quantize exactly
    * (0 → 0) so they pass explicitly; the cosine is only evaluated
    * for nonzero norms, and a null/NaN cosine fails.
    *
    * Null/empty embeddings: `explode_outer` keeps a row for a null or
    * zero-length array (plain `explode` would silently DROP the
    * vector from the report, making downstream row counts lie), and
    * such vectors pass explicitly — there is nothing to quantize, so
    * the round-trip is vacuously exact. */
  def quantReport(embeddings: DataFrame, minCos: Double = 0.995): DataFrame = {
    // Explode shape, not nested HOFs: Spark HOF lambdas are
    // interpreted (CodegenFallback) and have no let-binding, so
    // referencing the scale expression inside a transform re-derives
    // array_max per ELEMENT — O(dim²) per vector, measured 10×+ on
    // 128-dim embeddings. Exploded, every step is a codegen'd scalar
    // expression; the window max and the final aggregate shuffle on
    // vec_id once (same key ⇒ AQE coalesces to a single exchange).
    val ex = embeddings.select(col("vec_id"),
      explode_outer(col("embedding").cast("array<double>")).as("x"))
    val scale = max(abs(col("x"))).over(Window.partitionBy(col("vec_id"))) / 127.0
    ex.withColumn("scale", scale)
      .withColumn("dq",
        when(col("scale") === 0, lit(0.0))
          .otherwise(round(col("x") / col("scale")).cast("tinyint")
            .cast("double") * col("scale")))
      .groupBy(col("vec_id"))
      .agg(sum(col("x") * col("dq")).as("xy"),
        sum(col("x") * col("x")).as("xx"),
        sum(col("dq") * col("dq")).as("yy"))
      .select(col("vec_id"),
        // zero vector (xx = 0) quantizes exactly and a null/empty
        // vector (xx null) has nothing to quantize → explicit pass;
        // otherwise a null/NaN cosine must FAIL, not vacuously pass
        when(col("xx").isNull || col("xx") === 0, lit(true))
          .otherwise(coalesce(
            nanvl(col("xy") / (sqrt(col("xx")) * sqrt(col("yy"))), lit(-1.0)) >= minCos,
            lit(false))).as("quant_ok"))
  }
}
