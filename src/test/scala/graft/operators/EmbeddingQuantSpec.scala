package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EmbeddingQuantSpec extends SparkTestBase {

  test("int8 roundtrip keeps cosine >= 0.995 on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val rep = EmbeddingQuant.quantReport(df).collect()
    assert(rep.length == 200)
    assert(rep.forall(_.getBoolean(1)), "a vector exceeded the distortion bound")
  }

  test("zero vector passes explicitly; NaN cosine cannot pass vacuously") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),   // zero vector: quantizes exactly
      (2L, Array(1.0f, -0.5f, 0.25f))) // normal vector
      .toDF("vec_id", "embedding")
    val rep = EmbeddingQuant.quantReport(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rep(1L), "zero vector should pass: 0 -> 0 is exact")
    assert(rep(2L))
  }

  test("null and empty embeddings stay in the report and pass explicitly") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array.empty[Float]),
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val rep = EmbeddingQuant.quantReport(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rep.size == 3, "a null/empty vector was dropped from the report")
    assert(rep(1L) && rep(2L) && rep(3L))
  }

  test("quantized values are genuine int8 and scale reconstructs max") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val (qv, scale) = EmbeddingQuant.quantize(col("embedding"))
    val r = df.select(qv.as("qv"), scale.as("s")).head()
    val q = r.getSeq[Byte](0)
    assert(q.forall(b => b >= -127 && b <= 127))
    assert(q(1) == -127) // max-magnitude element maps to ±127
    assert(math.abs(r.getDouble(1) - 1.0 / 127.0) < 1e-12)
  }
}
