package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Two-level (coarse → fine) cell assignment: the HierCellId
  * expression against a hand-computed argmax, ragged-block offsets,
  * zero-norm/null semantics, the task-local fine Lloyd, and
  * end-to-end semanticDedup over the hier path (nlist ≥ the switch). */
class HierAssignSpec extends SparkTestBase {

  private val coarse = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0))
  // ragged: block 0 has 2 fine centroids (global cids 1,2),
  // block 1 has 1 (global cid 3)
  private val fine = Array(
    Array(Array(1.0, 0.1, 0.0, 0.0), Array(1.0, -0.1, 0.0, 0.0)),
    Array(Array(0.0, 1.0, 0.2, 0.0)))

  private def assignOne(v: Seq[Double]): Option[Int] = {
    import spark.implicits._
    Similarity.assignCellsHier(
        Seq((1L, v)).toDF("vec_id", "embedding"), coarse, fine)
      .select(col("cid")).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
  }

  test("global cid = block offset + within-block argmax, first-max ties") {
    assert(assignOne(Seq(1.0, 0.05, 0.0, 0.0)).contains(1))  // coarse 0, fine 0
    assert(assignOne(Seq(1.0, -0.05, 0.0, 0.0)).contains(2)) // coarse 0, fine 1
    assert(assignOne(Seq(0.0, 1.0, 0.0, 0.0)).contains(3))   // coarse 1, only fine
    // exact tie between fine 0 and fine 1 of coarse 0 → FIRST index,
    // the array_position(cs, array_max(cs)) rule of the flat path
    assert(assignOne(Seq(1.0, 0.0, 0.0, 0.0)).contains(1))
  }

  test("zero-norm and null vectors get a null cid") {
    assert(assignOne(Seq(0.0, 0.0, 0.0, 0.0)).isEmpty)
    import spark.implicits._
    val withNull = Seq((1L, Some(Seq(1.0, 0.0, 0.0, 0.0))), (2L, None))
      .toDF("vec_id", "embedding")
    val got = Similarity.assignCellsHier(withNull, coarse, fine)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(!got(1L) && got(2L))
  }

  test("expression matches an interpreted re-computation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(64)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian())))
    val got = Similarity.assignCellsHier(
        vecs.toDF("vec_id", "embedding"), coarse, fine)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val offsets = fine.scanLeft(1)(_ + _.length).init
    def cos(v: Seq[Double], c: Array[Double]) = {
      val d = v.zip(c).map { case (a, b) => a * b }.sum
      d / math.sqrt(c.map(x => x * x).sum) // query norm drops out of argmax
    }
    vecs.foreach { case (id, v) =>
      val ci = coarse.map(cos(v, _)).zipWithIndex.maxBy(t => (t._1, -t._2))._2
      val fi = fine(ci).map(cos(v, _)).zipWithIndex.maxBy(t => (t._1, -t._2))._2
      assert(got(id) == offsets(ci) + fi, s"vec $id")
    }
  }

  test("localSphericalKmeans separates well-separated angular clusters") {
    val a = Array.tabulate(20)(i => Array(1.0, 0.001 * i, 0.0))
    val b = Array.tabulate(20)(i => Array(0.0, 1.0, 0.001 * i))
    val cs = Similarity.localSphericalKmeans(a ++ b, 2)
    assert(cs.length == 2)
    // one center per cluster: each cluster axis dominates one center
    assert(cs.exists(c => c(0) > 0.9) && cs.exists(c => c(1) > 0.9))
    // zero-norm inputs are dropped, not NaN-poisoning
    val cs2 = Similarity.localSphericalKmeans(
      a :+ Array(0.0, 0.0, 0.0), 1)
    assert(cs2.length == 1 && cs2(0)(0) > 0.9)
  }

  test("hierCentroids covers every coarse cell with a non-empty block") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(600) { i =>
      val base = i % 3 match {
        case 0 => Array(1.0, 0.0, 0.0, 0.0)
        case 1 => Array(0.0, 1.0, 0.0, 0.0)
        case _ => Array(0.0, 0.0, 1.0, 0.0)
      }
      (i.toLong, base.map(_ + rnd.nextGaussian() * 0.05).toSeq)
    }
    val (c, f) = Similarity.hierCentroids(
      rows.toDF("vec_id", "embedding"), nlist = 9, seed = 42L)
    assert(c.length == 3 && f.length == 3)
    assert(f.forall(_.nonEmpty))
    // every row lands in a well-defined 1-based dense cid
    val total = f.map(_.length).sum
    val cids = Similarity.assignCellsHier(
        rows.toDF("vec_id", "embedding"), c, f)
      .select(col("cid")).collect().map(_.getInt(0))
    assert(cids.forall(x => x >= 1 && x <= total))
  }

  test("semanticDedup over the hier path drops planted near-dups only") {
    // nlist 256 ≥ the HierNlist switch, so this exercises the
    // two-level fit + HierCellId assignment end to end
    import spark.implicits._
    // random 32-dim Gaussians: pairwise cosine concentrates near 0
    // (std ≈ 1/√32), so no incidental pair clears 0.95 — the only
    // near-dups are the planted ones
    val rnd = new scala.util.Random(3)
    val base = Seq.tabulate(512) { i =>
      (i.toLong, Seq.fill(32)(rnd.nextGaussian()))
    }
    // plant 32 near-dups (cos ≈ 0.9999 to their source)
    val planted = base.take(32).map { case (id, v) =>
      (id + 100000L, v.map(_ + 0.001))
    }
    val res = Dedup.semanticDedup(
        (base ++ planted).toDF("vec_id", "embedding"),
        nlist = 256, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val dropped = res.filter(!_._2).keySet
    val plantedIds = planted.map(_._1).toSet
    // SOUND exactly: a drop needs an exact-verified cosine > 0.95
    // witness, and the fixture has no incidental near-dups — so only
    // planted ids can drop, and of each pair only the LARGER id
    // (keep-min rule). Recall is the cell-scoped approximation the
    // operator actually promises (gate contract ≥ 0.8): a pair whose
    // 0.57° perturbation straddles a fine-cell Voronoi boundary is
    // legitimately missed, so assert ≥ 90%, not 100%.
    assert(dropped.subsetOf(plantedIds), s"extra drops: ${dropped -- plantedIds}")
    assert(dropped.size >= (plantedIds.size * 0.9).toInt,
      s"recall ${dropped.size}/${plantedIds.size}; missed ${plantedIds -- dropped}")
  }
}
