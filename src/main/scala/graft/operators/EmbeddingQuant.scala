package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

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
    * throw DIVIDE_BY_ZERO, so it is guarded to quantize to zeros. */
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
    * for nonzero norms, and a null/NaN cosine fails. */
  def quantReport(embeddings: DataFrame, minCos: Double = 0.995): DataFrame = {
    val (qv, scale) = quantize(col("embedding"))
    val dq = dequantize(col("qv"), col("scale"))
    val normProd = VectorOps.l2Norm(col("v")) * VectorOps.l2Norm(dq)
    embeddings
      .withColumn("qv", qv).withColumn("scale", scale)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("cos",
        when(normProd > 0, VectorOps.dotArr(col("v"), dq) / normProd))
      .select(col("vec_id"),
        when(VectorOps.l2Norm(col("v")) === 0, lit(true))
          .otherwise(coalesce(nanvl(col("cos"), lit(-1.0)) >= minCos,
            lit(false))).as("quant_ok"))
  }
}
