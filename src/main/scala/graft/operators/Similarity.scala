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
        when(col("qn") * col("cn") > 0,
          VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn"))))
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
      when(VectorOps.dotArr(vecCol, lit(p)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** IVF-style ANN: the corpus is coarse-partitioned by nearest of
    * `nlist` centroids (deterministically sampled from the corpus);
    * each query probes its `nProbe` nearest centroids' inverted lists
    * only. The scored candidate count drops from |Q|·|C| to
    * ~|Q|·|C|·nProbe/nlist, and the candidate join is a hash join on
    * centroid id — the partition-pruned shape that survives a 100 TB
    * corpus (a real deployment would bucket the corpus BY cid on
    * disk so probes prune file groups). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col("vec_id"),
        VectorOps.asDoubleArray(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.l2Norm(col("cv")))
    // deterministic centroid sample: first nlist by vec_id
    val centroids = c.orderBy(col("vec_id")).limit(nlist)
      .select(col("vec_id"), col("cv"), col("cn")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def centroidScores(vecCol: org.apache.spark.sql.Column,
                       normCol: org.apache.spark.sql.Column) =
      array(centroids.map { case (_, cv, cn) =>
        // zero-norm guard: ANSI mode throws on division by zero, and
        // a zero vector (row or sampled centroid) is legal input
        if (cn == 0) lit(null).cast("double")
        else when(normCol > 0, VectorOps.dotArr(vecCol, lit(cv)) / (normCol * lit(cn)))
      }.toSeq: _*)
    // corpus side: assign to argmax-cosine centroid
    val assigned = c.withColumn("cs", centroidScores(col("cv"), col("cn")))
      .withColumn("cid", expr("array_position(cs, array_max(cs))").cast("int"))
      .drop("cs")
    // query side: nProbe nearest centroids each
    val q = broadcast(queries.select(col("vec_id").as("qid"),
        VectorOps.asDoubleArray(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.l2Norm(col("qv")))
      .withColumn("cs", centroidScores(col("qv"), col("qn")))
      .select(col("qid"), col("qv"), col("qn"), posexplode(col("cs")).as(Seq("cpos", "cscore")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cscore"), col("cpos"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), (col("cpos") + 1).cast("int").as("cid")))
    assigned.join(q, Seq("cid")).filter(col("qid") =!= col("vec_id"))
      .withColumn("score",
        when(col("qn") * col("cn") > 0,
          VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score"))
  }

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
        when(col("qn") * col("cn") > 0,
          VectorOps.dotArr(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("score"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("score"))
  }
}
