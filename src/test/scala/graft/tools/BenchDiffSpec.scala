package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free Bench-JSON field scanner behind BenchDiff. */
class BenchDiffSpec extends AnyFunSuite {

  private val sample =
    """{"metric":"total","value":110.763,"unit":"sec","queries":{"q_a":0.133,
      |"q_b":3.668,"q_c":4.88},"canary_mops_pre":1507.5,"canary_mops_post":1394.5,
      |"par_mops_pre":44578.5,"canary_floor":600.0,"starved":[],"failed":[],
      |"sf":"/root/repo/data/sf1"}""".stripMargin.replace("\n", "")

  test("queries sub-object and top-level scalars parse separately") {
    val (top, queries) = BenchDiff.parse(sample)
    assert(queries === Map("q_a" -> 0.133, "q_b" -> 3.668, "q_c" -> 4.88))
    assert(top("value") === 110.763)
    assert(top("canary_mops_pre") === 1507.5)
    assert(top("canary_floor") === 600.0)
    // query names must NOT leak into the top-level map
    assert(!top.contains("q_a"))
  }

  test("a pin with no queries object yields empty queries") {
    val (top, queries) = BenchDiff.parse("""{"value":1.5,"unit":"sec"}""")
    assert(queries.isEmpty)
    assert(top("value") === 1.5)
  }
}
