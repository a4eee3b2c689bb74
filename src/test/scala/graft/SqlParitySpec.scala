package graft

import org.apache.spark.sql.DataFrame

/** SQL-text parity: every `SparkEntry.oracleSql` statement that is
  * valid Spark SQL must, run through `spark.sql` over the registered
  * tables, produce EXACTLY the DataFrame query's rows. This proves
  * the engine's own SQL-text surface end-to-end (the oracle strings
  * double as the SQL API), not just the DataFrame API.
  *
  * Oracles written in DuckDB-only dialect (epoch_us, string_split,
  * list_*, `//` division, …) can't parse in Spark and are SKIPPED —
  * the spec asserts the parseable subset is substantial (≥25 keys)
  * and that NOTHING parseable mismatches, so dialect drift can only
  * shrink the covered set, never hide a wrong result. */
class SqlParitySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def canonical(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val sel = df.select(cols.head, cols.tail: _*)
    sel.collect().map(_.toSeq.map {
      case null => "\u0000"
      case d: Double => f"$d%.9g" // tolerate last-ulp float noise
      case f: Float => f"$f%.6g"
      case x => x.toString
    }.mkString("|")).sorted.toSeq
  }

  test("every oracle statement (or its Spark-dialect twin) matches its DataFrame twin") {
    val s = spark
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(s, sfDir, t).createOrReplaceTempView(t)
    }
    Tables.events(s, sfDir).createOrReplaceTempView("events")
    var compared = 0
    val skipped = scala.collection.mutable.ListBuffer[String]()
    val mismatched = scala.collection.mutable.ListBuffer[String]()
    // twin-rot guard bookkeeping: each sparkSql twin must ITSELF
    // execute (not merely share a name with an oracle that ran) — a
    // twin whose oracle text also parses in Spark would otherwise
    // never run and could rot undetected
    val twinRan = scala.collection.mutable.Set[String]()
    val twinBroken = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val oracleRowsOpt =
        try Some(canonical(s.sql(sql)))
        catch { case _: Throwable => None }
      val twinRowsOpt = SparkEntry.sparkSql.get(name).flatMap { q =>
        try { val r = canonical(s.sql(q)); twinRan += name; Some(r) }
        catch { case e: Throwable =>
          twinBroken += name
          info(s"$name twin failed: ${e.getClass.getSimpleName}")
          None
        }
      }
      val ran = oracleRowsOpt.toSeq ++ twinRowsOpt.toSeq
      if (ran.isEmpty) skipped += name
      else {
        val dfRows = canonical(SparkEntry.queries(name)(s, sfDir))
        compared += 1
        if (ran.exists(_ != dfRows)) {
          mismatched += name
          info(s"$name: sql=${ran.head.take(3)} df=${dfRows.take(3)}")
        }
      }
    }
    info(s"compared $compared, skipped ${skipped.size}: " + skipped.mkString(", "))
    assert(mismatched.isEmpty, s"SQL-text mismatches: $mismatched")
    assert(compared >= 90, s"only $compared oracle statements ran through spark.sql")
    assert(twinBroken.isEmpty, s"sparkSql twins that failed to run: $twinBroken")
    val rotted = SparkEntry.sparkSql.keySet.diff(twinRan)
    assert(rotted.isEmpty, s"sparkSql twins that never ran: $rotted")
  }
}
