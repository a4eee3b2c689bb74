package graft.tools

/** Machine-health probe: prints the single-thread and 8-thread
  * aggregate CPU canaries [[graft.Bench]] gates on, so a session can
  * check whether the host is in a starvation window BEFORE spending
  * minutes on a bench run (or trust/distrust one it just made).
  * Healthy (BASELINE.md): ~1,500-1,900 single, ~10-14k parallel.
  * Slow-core window: both low. Reduced-core window: single healthy,
  * parallel at 1-3k — local[32] timings there are garbage.
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    for (i <- 1 to (if (args.nonEmpty) args(0).toInt else 3)) {
      val s = graft.Bench.probeSingle()
      val p = graft.Bench.probeParallel()
      println(f"[canary] round $i: single $s%.1f mops, 8-thread $p%.1f mops (ratio ${p / s}%.1f)")
    }
  }
}
