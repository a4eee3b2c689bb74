package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>` in parquet, cast to `array<double>` for math).
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small)
  *   query set against the full corpus — one scan, no shuffle except
  *   the final per-query top-k window.
  * - [[lshTopK]] is the scale path: seeded random-hyperplane buckets
  *   prune the corpus to same-bucket candidates before scoring, so
  *   the scored pair count drops from |Q|·|C| to |Q|·|C|/2^bits on
  *   average — the shape that survives a 100 TB corpus (bucket join
  *   instead of broadcast cross product).
  */
object Similarity {

  /** Exact cosine top-k for each query vector (queries must be small
    * enough to broadcast; corpus side streams). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
        VectorOps.asDoubleArray(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv"))))
    val c = corpus.select(col("vec_id"),
        VectorOps.asDoubleArray(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.l2Norm(col("cv")))
    c.join(q, col("qid") =!= col("vec_id"))
      .withColumn("score",
        VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

  /** Deterministic random hyperplanes: `bits` planes × `dim`, seeded. */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id from the hyperplane dots (columnar). */
  def lshBucket(vecCol: org.apache.spark.sql.Column,
                planes: Array[Array[Double]]): org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.dotArr(vecCol, array(p.map(lit).toSeq: _*)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** ANN top-k restricted to same-hyperplane-bucket candidates.
    * Recall < 1 by construction; bucket join instead of cross join. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val c = corpus.select(col("vec_id"),
        VectorOps.asDoubleArray(col("embedding")).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
      .withColumn("cn", VectorOps.l2Norm(col("cv")))
    val q = queries.select(col("vec_id").as("qid"),
        VectorOps.asDoubleArray(col("embedding")).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
      .withColumn("qn", VectorOps.l2Norm(col("qv")))
    c.join(q, Seq("bucket")).filter(col("qid") =!= col("vec_id"))
      .withColumn("score",
        VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score"))
  }
}
