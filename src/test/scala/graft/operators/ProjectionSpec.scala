package graft.operators

import graft.SparkTestBase

/** JL signed random projection: exactness vs a scalar reference,
  * linearity, and the distance-preservation property the projection
  * exists for. */
class ProjectionSpec extends SparkTestBase {

  private def sign(pos: Long, j: Long): Long = {
    val h1 = (pos * 131 + j) * 2654435761L + 12345L
    val h2 = ((h1 ^ (h1 >> 13)) % 1048573L) * 2654435761L + 999983L
    if (((h2 ^ (h2 >> 17)) % 2) == 0) 1L else -1L
  }

  private def refProject(v: Seq[Float], outDim: Int): Seq[Long] =
    (0 until outDim).map { j =>
      v.zipWithIndex.map { case (x, i) =>
        sign(i.toLong, j.toLong) * math.floor(x.toDouble * 1e6).toLong
      }.sum
    }

  test("projection matches the scalar reference exactly") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f, 0.25f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, (0 until 64).map(i => (i * 0.01f - 0.3f)))
    )
    val df = vecs.toDF("vec_id", "embedding")
    val got = EmbeddingOps.projectSigned(df, outDim = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(c => r.getLong(c)).toSeq).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refProject(v, 8), s"vec $id")
    }
  }

  test("pairwise distances are roughly preserved (the JL contract)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, (0 until 64).map(_ => rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = EmbeddingOps.projectSigned(df, outDim = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(c => r.getLong(c).toDouble / 1e6).toSeq)
      .toMap
    def norm2(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    // E[||Pv||^2] = outDim * ||v||^2 for +-1 signs: after the
    // 1/sqrt(outDim) normalization the ratio concentrates near 1
    val ratios = vecs.map { case (id, v) =>
      val orig = norm2(v.map(_.toDouble))
      val p = norm2(proj(id)) / math.sqrt(8.0)
      p / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.25, s"mean norm ratio $mean")
    assert(ratios.count(r => r > 0.4 && r < 1.8) >= 36,
      s"too many distorted norms: ${ratios.sortBy(identity).take(5)}")
  }

  test("projection of a sum is the sum of projections (linearity)") {
    import spark.implicits._
    val a = Seq(0.5f, -1.5f, 2.0f, 0.125f)
    val b = Seq(1.0f, 1.0f, -1.0f, 0.5f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((0L, a), (1L, b), (2L, ab)).toDF("vec_id", "embedding")
    val got = EmbeddingOps.projectSigned(df, outDim = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(c => r.getLong(c)).toSeq).toMap
    // exact because all values are exactly representable in e6 ints
    assert(got(2) == got(0).zip(got(1)).map { case (x, y) => x + y })
  }
}
