package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk embedding-column operators beyond quantization
  * ([[EmbeddingQuant]]) and search ([[Similarity]]).
  *
  * Same scale lesson as `EmbeddingQuant.quantReport`: bulk vector
  * math is done in the posexplode shape — every hot expression is a
  * codegen'd scalar, aggregation is partial (map-side combine) before
  * the one group-key shuffle — never nested higher-order functions,
  * which are interpreted and re-evaluate inner expressions per
  * element.
  */
object EmbeddingOps {

  /** Flat per-(group, position) centroid components (the k-means
    * "update" half, and the class-prototype primitive for semantic
    * dedup / clustering): posexplode → per-(group, pos) mean,
    * partial-aggregated map-side before the one (group, pos) shuffle
    * — at 100 TB the corpus is read once and only groups × dim
    * already-aggregated rows move. The mean accumulates as
    * DECIMAL(38,18) (exact, order-independent — the repo convention
    * for order-stable sums) before one double division and a 6 dp
    * round, so the result is bit-stable across engines and
    * partitionings; a double `avg` would be accumulation-order
    * dependent and could flip a value landing on a rounding boundary.
    * `pos` is 0-based and long-typed (portable across engines).
    */
  def centroidComponents(emb: DataFrame, groupCol: String = "label",
                         vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos").cast("long").as("pos"))
      .agg(
        round(sum(col("x").cast("decimal(38,18)")).cast("double")
          / count(lit(1)), 6).as("v"),
        count(lit(1)).as("n_vecs"))

  /** Per-group mean vector reassembled into one array row per group
    * (the operator-API shape): one extra shuffle of groups-many rows
    * on top of [[centroidComponents]]. */
  def centroids(emb: DataFrame, groupCol: String = "label",
                vecCol: String = "embedding"): DataFrame =
    centroidComponents(emb, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(
        max(col("n_vecs")).as("n_vecs"), // every pos has the same count
        transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("centroid"))

  /** Johnson–Lindenstrauss random-SIGN projection (Achlioptas 2003:
    * ±1 entries preserve pairwise distances like Gaussian ones) from
    * the native dim down to `outDim` — the dimensionality-reduction
    * front of an ANN / clustering pipeline when the full vectors are
    * too wide to shuffle.
    *
    * The sign matrix is IMPLICIT — `sign(pos, j)` is a MIXING hash
    * of the (input, output) index pair, so nothing is broadcast and
    * any executor regenerates any entry: the property that makes the
    * operator embarrassingly parallel at 100 TB. The mix is two
    * multiply rounds with xor-shift folds between them (the
    * xorshift-multiply family): a single affine `(a·key+b) mod p`
    * step leaves adjacent output dims' sign vectors ~94% identical
    * (affine in (pos, j) ⇒ the outDim coordinates are near-copies,
    * collapsing the effective dimension), while the folded mix
    * measures ~50% pairwise agreement, i.e. actually independent
    * signs. Every intermediate stays < 2^52, so the arithmetic is
    * exact in any engine with 64-bit integers (DuckDB raises on
    * BIGINT overflow — the reduction to a 20-bit value before the
    * second multiply is what keeps it safe there). Per-element
    * values are floor-quantized to e6 integers BEFORE the signed
    * sum, so the projection is exact integer math
    * (order-independent, bit-portable) — the repo's cross-engine
    * convention.
    *
    * Shape: posexplode → `outDim` conditional integer sums under ONE
    * (vec_id)-keyed aggregation. All hot expressions are codegen'd
    * scalars (no interpreted higher-order functions); map-side
    * partial aggregation collapses each vector inside its input
    * partition, so the shuffle moves only `outDim` longs per vector.
    * `carryCols` ride through the aggregation as extra group keys
    * (functionally dependent on `vec_id`), so an index build can
    * attach a precomputed partition column (e.g. the IVF cell id in
    * [[Similarity.projIndex]]) in the SAME pass instead of re-joining
    * it afterwards.
    */
  def projectSigned(emb: DataFrame, outDim: Int = 8,
                    vecCol: String = "embedding",
                    carryCols: Seq[String] = Nil): DataFrame = {
    val keys = col("vec_id") +: carryCols.map(col)
    val ex = emb.select(keys :+
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")): _*)
      .select(keys :+ col("pos").cast("long").as("pos") :+
        floor(col("x") * lit(1e6)).cast("long").as("q"): _*)
    val sums = (0 until outDim).map { j =>
      val h1 = (col("pos") * 131 + lit(j.toLong)) * lit(2654435761L) + lit(12345L)
      val h2 = (h1.bitwiseXOR(shiftright(h1, 13)) % lit(1048573L)) *
        lit(2654435761L) + lit(999983L)
      val mixed = h2.bitwiseXOR(shiftright(h2, 17))
      sum(when(mixed % 2 === 0, col("q")).otherwise(-col("q"))).as(s"p${j}_e6")
    }
    ex.groupBy(keys: _*).agg(sums.head, sums.tail: _*)
  }
}
