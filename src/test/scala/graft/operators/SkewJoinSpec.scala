package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {

  test("salted join returns exactly the plain join result") {
    import spark.implicits._
    // skewed fact: 900 of 1000 rows share key 1
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 7).toLong, i.toLong, i * 1.5))
      .toDF("k", "pk", "v")
    val dim = (0 to 7).map(k => (k.toLong, s"name$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = SkewJoin.saltedJoin(fact, dim, key = "k", saltBy = "pk", salts = 4)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt actually spreads the hot key across distinct salt values") {
    import spark.implicits._
    val fact = (1 to 100).map(i => (1L, i.toLong)).toDF("k", "pk")
    val saltCount = fact
      .withColumn("_salt", pmod(hash(col("pk")), lit(4)))
      .select("_salt").distinct().count()
    assert(saltCount == 4)
  }
}
