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

  /** The reference's split-based parse (Test.scala:128-155 semantics),
    * reimplemented naively as the differential-oracle for the
    * hand-rolled char-scan parser. */
  private def splitParse(line: String, maxDim: Int): Option[(Double, Seq[(Int, Double)])] = {
    val hash = line.indexOf('#')
    val noComment = if (hash >= 0) line.substring(0, hash) else line
    val trimmed = noComment.trim
    if (trimmed.isEmpty) None
    else {
      val parts = trimmed.split("\\s+")
      val label = parts.head.toDouble
      val feats = parts.tail.toSeq.map { tok =>
        val kv = tok.split(':')
        require(kv.length == 2, s"malformed '$tok'")
        (kv(0).toInt - 1, kv(1).toDouble)
      }.filter(_._1 < maxDim)
      if (feats.isEmpty) None else Some((label, feats))
    }
  }

  test("property: char-scan parser is equivalent to split-based semantics") {
    val rnd = new scala.util.Random(11)
    def tok(): String = {
      val idx = rnd.nextInt(20) + 1
      val v = math.round(rnd.nextDouble() * 1000) / 100.0
      val tail = if (rnd.nextInt(10) == 0) ":" else "" // trailing colon
      s"$idx:$v$tail"
    }
    (1 to 500).foreach { _ =>
      val nFeat = rnd.nextInt(6)
      val ws = if (rnd.nextBoolean()) " " else "  "
      val comment = if (rnd.nextInt(4) == 0) " # c o m" else ""
      val lead = if (rnd.nextInt(5) == 0) "  " else ""
      val line = lead + (f"${rnd.nextDouble() * 10}%.4f" +:
        Seq.fill(nFeat)(tok())).mkString(ws) + comment
      val maxDim = if (rnd.nextBoolean()) Int.MaxValue else rnd.nextInt(20) + 1
      val exp = splitParse(line, maxDim)
      val got = LibSvm.parseLine(line, maxDim)
        .map(p => (p.label, p.indices.toSeq.zip(p.values.toSeq)))
      assert(got == exp, s"line='$line' maxDim=$maxDim")
    }
  }
}
