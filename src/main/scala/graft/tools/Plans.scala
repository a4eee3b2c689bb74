package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries into
  * PLANS.md, with the scale rationale per query. Regenerate after
  * plan-affecting changes: `runMain graft.tools.Plans <sfDir>`.
  */
object Plans {

  // query -> why this physical plan is the one we want at 100 TB
  private val rationale: Seq[(String, String)] = Seq(
    "q_scan_filter" ->
      ("Both predicates reach the parquet reader (`PushedFilters: " +
        "GreaterThan(l_quantity,30.0), LessThan(l_discount,0.05)`) and " +
        "`ReadSchema` carries only the 5 projected columns — at 100 TB " +
        "row groups failing min/max stats are never read."),
    "q_join_agg" ->
      ("customer/nation/region are broadcast (3 BroadcastHashJoins, no " +
        "shuffle of the fact side); the rollup is partial+final " +
        "HashAggregate, so the only full shuffle carries pre-aggregated " +
        "(r_name, n_name) groups — constant-size regardless of fact rows."),
    "q_window_topk" ->
      ("Spark 4 `WindowGroupLimit` prunes each partition to its top 3 " +
        "BEFORE the shuffle — the exchange carries ≤ 3·partitions rows " +
        "per segment, not the whole join output."),
    "q_join_skew" ->
      ("The salted join runs as ShuffledHashJoin on (suppkey, _salt): " +
        "a hot supplier's rows land on 8 reducers instead of 1. " +
        "Identical results to the plain join (oracle-verified)."),
    "q_asof_join" ->
      ("Union + single window pass: ONE exchange on user_id and one " +
        "sort replace an inequality join that would materialize every " +
        "(event, earlier-order) pair — the difference between |L|+|R| " +
        "and |L|·|R| per key."),
    "q_range_join" ->
      ("The band predicate runs as a hash join on the time bucket " +
        "(right side exploded onto 3 candidate buckets) + an exact " +
        "|Δt| refine — no BroadcastNestedLoopJoin anywhere in the " +
        "plan, linear shuffle volume."),
    "q_dedup_minhash" ->
      ("Shingling is explode + codegen'd projections; signatures are " +
        "32 min() aggregates with map-side partial aggregation — the " +
        "shuffle carries one 32-long signature per (doc, shingle-hash) " +
        "group, never raw text."),
    "q_rollup" ->
      ("Catalyst expands the ROLLUP into one Expand node (3 grouping " +
        "sets) feeding a partial+final HashAggregate — all three " +
        "subtotal levels ride a single shuffle of pre-aggregated " +
        "groups; the dimension tables broadcast exactly as in " +
        "q_join_agg."),
    "q_pivot" ->
      ("Enumerated pivot values compile to two cascaded partial+final " +
        "aggregations over a SINGLE scan — no distinct-value discovery " +
        "job; both shuffles carry pre-aggregated (priority[, status]) " +
        "groups, constant-size regardless of fact rows."),
    "q_sample_stratified" ->
      ("The LCG bucket predicate is codegen'd scalar arithmetic fused " +
        "into the scan stage — no shuffle, no state, ReadSchema pruned " +
        "to (doc_id, lang); the sample is one streaming pass at any " +
        "scale and membership is auditable from the id alone."),
    "q_embed_quant" ->
      ("Explode → window-max → single hash aggregate: every " +
        "per-element step is codegen'd scalar math (no interpreted HOF " +
        "lambdas — the nested-transform form re-derived the scale per " +
        "element, O(dim²) per vector); window and aggregate both key " +
        "on vec_id, so the exploded rows shuffle once."),
    "q_dedup_groups" ->
      ("Connected components by min-label propagation with pointer " +
        "jumping: every round shuffles (id, label) pairs keyed by " +
        "id/label — a giant duplicate cluster costs its edge count, " +
        "never its square — and rounds grow as O(log diameter). Each " +
        "round re-enters SQL through a cached LogicalRDD so the plan " +
        "stays flat instead of nesting exponentially."),
    "q_similarity_topk" ->
      ("Exact baseline, so the BroadcastNestedLoopJoin is deliberate: " +
        "the (small) query side is broadcast and the corpus streams " +
        "through one codegen'd dot-product scan (native DotProduct " +
        "expression), then per-query top-k via WindowGroupLimit. The " +
        "scale paths that avoid the cross product are q_similarity_lsh " +
        "(bucket join) and q_similarity_ivf (centroid-pruned join)."))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = new StringBuilder
    out ++= "# PLANS — physical plans of the headline queries\n\n"
    out ++= s"Generated by `graft.tools.Plans` against `$sfDir`.\n"
    out ++= "For each query: why this is the plan we want at 100 TB, then\n"
    out ++= "the `explain(\"formatted\")` output (AQE initial plan).\n"

    rationale.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out ++= s"\n## $name\n\n$why\n\n```\n$plan```\n"
    }

    val pw = new PrintWriter("PLANS.md", "UTF-8")
    try pw.write(out.toString) finally pw.close()
    println(s"[plans] wrote PLANS.md (${rationale.size} queries)")
    spark.stop()
  }
}
