package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.linalg.{Vector, Vectors}

/** LibSVM text ingestion with the reference's exact parsing semantics.
  *
  * Reference: `/root/reference/src/main/scala/de/tub/dima/bdapro/sketchml/flink/Test.scala:126-176`
  * (`readLibSVMDimension`): readTextFile → flatMap parse → global
  * max-reduce for the feature dimension → broadcast dim → build
  * sparse vectors. Semantics reproduced here:
  *  - strip `#` comments (Test.scala:135)
  *  - skip blank lines (Test.scala:137)
  *  - whitespace-split tokens (Test.scala:138)
  *  - `require` on malformed `idx:val` pairs (Test.scala:143)
  *  - 1-based → 0-based index shift (Test.scala:146)
  *  - drop features with shifted index >= maxDim (Test.scala:150)
  *  - drop rows whose features were all filtered out (Test.scala:151-152)
  *  - dimension = global max shifted-index + 1 (Test.scala:157-160)
  *
  * Spark-first shape: the parse is a `Dataset.flatMap` (one pass, no
  * driver involvement); the dimension is a 1-row aggregate collected
  * once and closure-captured (replacing Flink's withBroadcastSet at
  * Test.scala:162-174 — a scalar needs no broadcast join).
  */
object LibSvm {

  final case class Parsed(label: Double, indices: Array[Int], values: Array[Double])
  final case class LabeledVec(label: Double, features: Vector)

  /** Parse one line. Returns None for blank / comment-only /
    * all-features-filtered lines. Throws on malformed pairs, as the
    * reference does (Test.scala:143).
    *
    * Hand-rolled char scan, no regex: `String.split("\\s+")` compiles
    * a Pattern per call, and at ~600k calls per partition the regex
    * machinery both dominates the profile and is exposed to JIT
    * deopt pathologies (observed 30× per-row slowdowns under codegen
    * class churn). A char scan is allocation-light and stable. */
  def parseLine(line: String, maxDim: Int = Int.MaxValue): Option[Parsed] = {
    val hash = line.indexOf('#')
    val end = if (hash >= 0) hash else line.length
    var i = 0
    // skip leading whitespace
    while (i < end && line.charAt(i) <= ' ') i += 1
    if (i >= end) None
    else {
      // label token
      var j = i
      while (j < end && line.charAt(j) > ' ') j += 1
      val label = java.lang.Double.parseDouble(line.substring(i, j))
      val idxBuf = Array.newBuilder[Int]
      val valBuf = Array.newBuilder[Double]
      i = j
      while (i < end) {
        while (i < end && line.charAt(i) <= ' ') i += 1
        if (i < end) {
          j = i
          while (j < end && line.charAt(j) > ' ') j += 1
          // `split(':')` drops trailing empty strings, so "3:4:" parses
          // as ("3","4") in the reference — mirror that by ignoring
          // trailing colons before requiring exactly one separator
          var j2 = j
          while (j2 > i && line.charAt(j2 - 1) == ':') j2 -= 1
          var colon = -1
          var nColons = 0
          var p = i
          while (p < j2) {
            if (line.charAt(p) == ':') { colon = p; nColons += 1 }
            p += 1
          }
          require(nColons == 1 && colon > i,
            s"malformed feature '${line.substring(i, j)}'")
          val idx = Integer.parseInt(line.substring(i, colon)) - 1 // 1-based → 0-based (Test.scala:146)
          if (idx < maxDim) {
            idxBuf += idx
            valBuf += java.lang.Double.parseDouble(line.substring(colon + 1, j2))
          }
          i = j
        }
      }
      val idxs = idxBuf.result()
      if (idxs.isEmpty) None // Test.scala:151-152
      else Some(Parsed(label, idxs, valBuf.result()))
    }
  }

  /** Lines → DataFrame(label double, indices array<int>, values array<double>). */
  def parse(lines: Dataset[String], maxDim: Int = Int.MaxValue): Dataset[Parsed] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.flatMap(parseLine(_, maxDim))
  }

  def read(spark: SparkSession, path: String, maxDim: Int = Int.MaxValue): Dataset[Parsed] =
    parse(spark.read.textFile(path), maxDim)

  /** Global feature dimension = max 0-based index + 1 (Test.scala:157-160).
    * One 1-row aggregate; Catalyst does the partial max map-side. */
  def inferDim(parsed: Dataset[Parsed]): Int = {
    val row = parsed.toDF()
      .agg(max(array_max(col("indices"))).as("m")).head()
    if (row.isNullAt(0)) 0 else row.getInt(0) + 1
  }

  /** Parsed rows → MLlib-style (label, SparseVector) dataset
    * (Test.scala:162-174, SparseVector.fromCOO). `dim` is
    * closure-captured — the Spark analogue of the reference's
    * broadcast-scalar pattern. */
  def toLabeledVectors(parsed: Dataset[Parsed], dim: Int): Dataset[LabeledVec] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.map(p => LabeledVec(p.label, Vectors.sparse(dim, p.indices, p.values)))
  }
}
