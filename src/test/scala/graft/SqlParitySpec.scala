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
    val comparedNames = scala.collection.mutable.Set[String]()
    val skipped = scala.collection.mutable.ListBuffer[String]()
    val mismatched = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      // prefer the DuckDB-oracle text when Spark can run it; fall
      // back to the hand-written Spark-dialect twin otherwise
      val candidates = Seq(sql) ++ SparkEntry.sparkSql.get(name)
      val sqlRowsOpt = candidates.view.flatMap { q =>
        try Some(canonical(s.sql(q)))
        catch { case _: Throwable => None }
      }.headOption
      sqlRowsOpt match {
        case None => skipped += name
        case Some(sqlRows) =>
          val dfRows = canonical(SparkEntry.queries(name)(s, sfDir))
          compared += 1
          comparedNames += name
          if (sqlRows != dfRows) {
            mismatched += name
            info(s"$name: sql=${sqlRows.take(3)} df=${dfRows.take(3)}")
          }
      }
    }
    info(s"compared $compared, skipped ${skipped.size}: " + skipped.mkString(", "))
    assert(mismatched.isEmpty, s"SQL-text mismatches: $mismatched")
    assert(compared >= 90, s"only $compared oracle statements ran through spark.sql")
    // twin-rot guard: every hand-written Spark twin must actually run
    val rotted = SparkEntry.sparkSql.keySet.diff(comparedNames)
    assert(rotted.isEmpty, s"sparkSql twins that never ran: $rotted")
  }
}
