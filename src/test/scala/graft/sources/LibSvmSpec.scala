package graft.sources

import graft.SparkTestBase

/** Parser parity with the reference's semantics
  * (/root/reference/.../Test.scala:128-155) — FIXTURES.md §B.1. */
class LibSvmSpec extends SparkTestBase {

  test("basic line: 1-based indices shift to 0-based") {
    val Some(p) = LibSvm.parseLine("1.5 1:2.0 3:4.0")
    assert(p.label == 1.5)
    assert(p.indices.toSeq == Seq(0, 2))
    assert(p.values.toSeq == Seq(2.0, 4.0))
  }

  test("comment suffix is stripped (Test.scala:135)") {
    val Some(p) = LibSvm.parseLine("2.0 1:1.0 # a comment 5:9")
    assert(p.indices.toSeq == Seq(0))
  }

  test("blank and comment-only lines are skipped (Test.scala:137)") {
    assert(LibSvm.parseLine("").isEmpty)
    assert(LibSvm.parseLine("   ").isEmpty)
    assert(LibSvm.parseLine("# nothing here").isEmpty)
  }

  test("malformed idx:val pair throws (Test.scala:143)") {
    intercept[IllegalArgumentException](LibSvm.parseLine("1.0 3"))
    intercept[IllegalArgumentException](LibSvm.parseLine("1.0 3:4:5"))
    intercept[IllegalArgumentException](LibSvm.parseLine("1.0 3::4"))
    intercept[IllegalArgumentException](LibSvm.parseLine("1.0 5:"))
  }

  test("trailing colons are dropped like String.split(':') does") {
    // "3:4:".split(':') == Array("3","4") in Scala — the reference
    // accepted such tokens, so we must too
    val Some(p) = LibSvm.parseLine("1.0 3:4:")
    assert(p.indices.toSeq == Seq(2) && p.values.toSeq == Seq(4.0))
    val Some(p2) = LibSvm.parseLine("1.0 3:4::")
    assert(p2.indices.toSeq == Seq(2) && p2.values.toSeq == Seq(4.0))
  }

  test("maxDim filters features; all-filtered row dropped (Test.scala:150-152)") {
    val Some(p) = LibSvm.parseLine("1.0 1:1.0 9:9.0", maxDim = 4)
    assert(p.indices.toSeq == Seq(0))
    assert(LibSvm.parseLine("1.0 9:9.0", maxDim = 4).isEmpty)
  }

  test("dataset parse + dimension inference + sparse vectors (Test.scala:157-174)") {
    import spark.implicits._
    val lines = Seq("1.0 1:1.0 5:2.0", "0.0 2:3.0", "", "# c", "2.0 7:1.0").toDS()
    val parsed = LibSvm.parse(lines)
    assert(parsed.count() == 3)
    val dim = LibSvm.inferDim(parsed)
    assert(dim == 7) // max 0-based index 6 + 1
    val lv = LibSvm.toLabeledVectors(parsed, dim).collect()
    assert(lv.forall(_.features.size == 7))
    assert(lv.map(_.label).sorted.toSeq == Seq(0.0, 1.0, 2.0))
  }

  test("inferDim of empty input is 0") {
    import spark.implicits._
    assert(LibSvm.inferDim(LibSvm.parse(Seq("", "# x").toDS())) == 0)
  }
}
