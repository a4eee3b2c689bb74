package graft.tools

/** Prints the declared queries/oracle counts (driver-contract sanity). */
object KeyCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracled=${o.size} rows_only=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphan = o -- q
    if (orphan.nonEmpty) println(s"ORPHAN ORACLES: ${orphan.toSeq.sorted.mkString(",")}")
  }
}
