package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pairs → clusters → keep/drop: connected components must walk
  * multi-hop paths (not just echo the input pairs), merge components
  * that share a node, leave isolated docs as their own component,
  * and — end-to-end — turn MinHash LSH candidate pairs over planted
  * near-duplicates into the planted duplicate groups. */
class DedupGroupsSpec extends SparkTestBase {

  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph collapses to the minimum label (multi-hop propagation)") {
    // 1-2-3-4-5 as a chain: node 5 is three hops from the minimum
    val cc = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components, star shapes, and shared-node merges") {
    val cc = components(Seq(
      (11L, 10L), (12L, 10L), (13L, 10L), // star around 10
      (20L, 21L),                         // separate pair
      (30L, 31L), (31L, 32L), (32L, 20L)))// chain that merges into {20,21}
    assert(cc(10L) == 10L && cc(11L) == 10L && cc(12L) == 10L && cc(13L) == 10L)
    assert(Seq(20L, 21L, 30L, 31L, 32L).map(cc).forall(_ == 20L))
  }

  test("self-pairs and duplicate/reversed edges are harmless") {
    val cc = components(Seq((3L, 3L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("convergence contract: rounds reported, converged flag honest") {
    // a 5-chain needs >1 round but converges well inside 25
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = Dedup.connectedComponentsStats(pairs)
    assert(r.converged, "chain should reach the fixpoint")
    assert(r.rounds >= 2 && r.rounds <= 5, s"unexpected round count ${r.rounds}")
    assert(r.labels.collect().map(_.getLong(1)).forall(_ == 1L))
    // starved iteration budget must NOT claim convergence
    val starvedBudget = Dedup.connectedComponentsStats(pairs, maxIter = 1)
    assert(!starvedBudget.converged,
      "one round cannot prove a 4-hop chain's fixpoint")
  }

  test("resolveDuplicates keeps the component minimum and isolated docs") {
    val docs = Seq(1L, 2L, 3L, 4L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val out = Dedup.resolveDuplicates(docs, pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)),
      3L -> ((3L, true)), 4L -> ((3L, false)),
      99L -> ((99L, true))))
  }

  test("resolveDuplicatesBy keeps the best-scoring doc, not the min id") {
    import org.apache.spark.sql.functions.col
    // component {1,2,3}: doc 2 has the top score; {7,8}: tie → min id 7;
    // isolated 99 keeps itself
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 20L), (7L, 5L), (8L, 5L), (99L, 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = Dedup.resolveDuplicatesBy(docs, pairs, col("quality"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(
      1L -> ((1L, false)), 2L -> ((1L, true)), 3L -> ((1L, false)),
      7L -> ((7L, true)), 8L -> ((7L, false)),
      99L -> ((99L, true))))
  }

  test("planted near-duplicates resolve into their groups via MinHash LSH") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val perturbed = base.replace("tok30", "changed")
    val others = (0 until 4).map { j =>
      (100L + j, (1 to 60).map(i => s"other${j}w${(i * 7 + j) % 97}").mkString(" "))
    }
    val docs = (Seq(
      (1L, base), (2L, base), (3L, base), // identical triple
      (4L, perturbed)                     // near-dup of the triple
    ) ++ others).toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(Dedup.minhash(docs))
    val out = Dedup.resolveDuplicates(docs, cand)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // the planted group clusters to component 1 with only doc 1 kept
    assert(Seq(1L, 2L, 3L, 4L).map(k => out(k)._1).forall(_ == 1L),
      s"planted group split: $out")
    assert(out(1L)._2 && !out(2L)._2 && !out(3L)._2 && !out(4L)._2)
    // unrelated docs stay their own kept components
    others.foreach { case (id, _) => assert(out(id) == ((id, true)), s"doc $id: ${out(id)}") }
  }
}
