package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pair left and right rows whose event times lie
  * within `bandSeconds` of each other (|lt − rt| ≤ band).
  *
  * The naive encoding is a pure inequality theta-join —
  * BroadcastNestedLoopJoin in Spark, O(|L|·|R|) comparisons, dead at
  * scale. This implementation bucketizes time into band-width bins
  * and turns the predicate into an EQUI-join on the bucket id: a row
  * in bucket b can only match rows in buckets {b−1, b, b+1}, so the
  * right side is exploded 3× onto neighboring buckets, the join is a
  * hash join on `_bucket`, and the exact |Δt| ≤ band predicate
  * refines the candidates. Shuffle volume: 3·|R| + |L| rows hashed
  * by bucket — linear, partition-parallel, no nested loop. The same
  * shape handles any numeric band predicate (price bands, geo tiles).
  */
object RangeJoin {

  /** Inner banded join on event time. Returns left rows paired with
    * every right row within the band (self-pairs included — filter
    * them at the call site for self-joins). Column names from both
    * sides survive — prefix/alias before calling on self-joins. */
  def bandJoin(left: DataFrame, right: DataFrame,
               leftTime: String, rightTime: String,
               bandSeconds: Long): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    val l = left.withColumn("_lus", unix_micros(col(leftTime)))
      .withColumn("_bucket", floor(col("_lus") / bandUs))
    val r = right.withColumn("_rus", unix_micros(col(rightTime)))
      .withColumn("_b0", floor(col("_rus") / bandUs))
      .withColumn("_bucket",
        explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    l.join(r, Seq("_bucket"))
      .filter(abs(col("_lus") - col("_rus")) <= bandUs)
      .drop("_bucket", "_lus", "_rus")
  }
}
