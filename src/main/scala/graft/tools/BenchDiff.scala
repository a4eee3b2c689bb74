package graft.tools

/** Bench-drift triage: compare two pinned per-query bench JSONs and
  * flag queries whose wall moved more than `ratio` (default 1.5×) in
  * either direction, with the canary-health context of BOTH pins
  * attached — the manual min-merge analysis that cost two rounds on
  * the `q_similarity_proj` sf10 false regression, as one command.
  *
  * A flagged query under HEALTHY canaries on both sides is a real
  * candidate; a flagged query whose faster pin carried materially
  * stronger canaries is window drift first, structure second (the
  * BASELINE.md protocol note).
  *
  * `runMain graft.tools.BenchDiff <before.json> <after.json> [ratio]`
  *
  * Parsing is deliberately dependency-free (the repo has no JSON
  * library): a field scanner specialized to the flat one-line object
  * `graft.Bench` emits — top-level scalars plus the `"queries"`
  * sub-object of name→seconds.
  */
object BenchDiff {

  /** Flat numeric fields + the queries map of a Bench JSON line. */
  private[tools] def parse(text: String): (Map[String, Double], Map[String, Double]) = {
    def numFields(s: String): Map[String, Double] =
      "\"([A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)".r
        .findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val qStart = text.indexOf("\"queries\"")
    if (qStart < 0) return (numFields(text), Map.empty)
    val open = text.indexOf('{', qStart)
    require(open >= 0, s"malformed pin: no '{' after \"queries\"")
    var depth = 0; var i = open; var close = -1
    while (i < text.length && close < 0) {
      text.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close >= 0, "malformed pin: unbalanced braces after \"queries\"")
    val queries = numFields(text.substring(open, close + 1))
    val top = numFields(text.substring(0, qStart) + text.substring(close + 1))
    (top, queries)
  }

  private def canaryLine(tag: String, top: Map[String, Double]): String = {
    def f(k: String) = top.get(k).map(v => f"$v%.0f").getOrElse("?")
    s"  $tag canary ${f("canary_mops_pre")}/${f("canary_mops_post")} mops " +
      s"(floor ${f("canary_floor")}), par ${f("par_mops_pre")}/${f("par_mops_post")} " +
      s"(floor ${f("par_floor")}), total ${top.get("value").map(v => f"$v%.1f s").getOrElse("?")}"
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <before.json> <after.json> [ratio]")
    val ratio = if (args.length >= 3) args(2).toDouble else 1.5
    val (beforeTop, before) = parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))))
    val (afterTop, after) = parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(1)))))
    println(s"bench-diff ${args(0)} -> ${args(1)} (flag > ${ratio}x)")
    println(canaryLine("before", beforeTop))
    println(canaryLine("after ", afterTop))
    val shared = before.keySet.intersect(after.keySet).toSeq
    val flagged = shared.flatMap { q =>
      val (b, a) = (before(q), after(q))
      // sub-100ms walls are scheduler noise, never structure
      if (math.max(b, a) < 0.1) None
      else {
        val r = a / math.max(b, 1e-9)
        if (r > ratio || r < 1.0 / ratio) Some((q, b, a, r)) else None
      }
    }.sortBy { case (_, _, _, r) => -math.max(r, 1.0 / r) }
    if (flagged.isEmpty) println(s"no drift > ${ratio}x across ${shared.size} shared queries")
    else flagged.foreach { case (q, b, a, r) =>
      val dir = if (r > 1) "SLOWER" else "faster"
      println(f"  $q%-28s $b%8.2f s -> $a%8.2f s  (${r}%.2fx $dir)")
    }
    val only = (before.keySet.diff(after.keySet), after.keySet.diff(before.keySet))
    if (only._1.nonEmpty) println(s"  only in before: ${only._1.toSeq.sorted.mkString(", ")}")
    if (only._2.nonEmpty) println(s"  only in after:  ${only._2.toSeq.sorted.mkString(", ")}")
    // non-zero exit when drift is flagged, so a round script can gate on it
    if (flagged.nonEmpty) sys.exit(2)
  }
}
