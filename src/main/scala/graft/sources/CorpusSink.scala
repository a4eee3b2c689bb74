package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus writer — the sink side of the pipeline (the reference's
  * only sinks are collect + a CSV log line, `Test.scala:66-77` in
  * /root/reference; a Spark-native corpus additionally needs a
  * columnar, partitioned, statistics-bearing layout).
  *
  * Layout contract for 100 TB:
  *  - `partitionBy(shardCol)`: directory-level partition pruning —
  *    a per-source read never touches other sources' files.
  *  - `repartition(shard, saltedFileBucket)`: each output file is
  *    written by exactly one task, and `filesPerShard` bounds the
  *    file count per partition dir (a skewed source gets the same
  *    bounded fan-out, spread over that many parallel writers).
  *  - `sortWithinPartitions(sortCol)`: rows inside every file are
  *    id-ordered, so parquet row-group min/max stats prune id-range
  *    scans and downstream packing reads each shard already in
  *    layout order.
  */
object CorpusSink {

  def writeParquet(docs: DataFrame, path: String,
                   shardCol: String = "source", sortCol: String = "doc_id",
                   filesPerShard: Int = 4): Unit = {
    require(filesPerShard > 0, s"filesPerShard must be positive, got $filesPerShard")
    docs
      .repartition(col(shardCol), pmod(hash(col(sortCol)), lit(filesPerShard)))
      .sortWithinPartitions(col(shardCol), col(sortCol))
      .write
      .mode("overwrite")
      .partitionBy(shardCol)
      .parquet(path)
  }

  /** Incremental APPEND: add `docs`'s rows as new files inside their
    * shard partitions, leaving every existing file untouched (no
    * listing, no rewrite — the ingest path for batches whose rows are
    * NEW, e.g. freshly admitted vectors joining a stored ANN index).
    * Same bounded fan-out and in-file sort as [[writeParquet]]; the
    * per-partition file count grows by ≤`filesPerShard` per append,
    * so a deployment compacts periodically via [[refreshShards]].
    * Rows whose shard key equals an existing partition land as extra
    * files IN that directory — use [[refreshShards]] instead when the
    * batch REPLACES rows. */
  def appendShards(docs: DataFrame, path: String,
                   shardCol: String = "source", sortCol: String = "doc_id",
                   filesPerShard: Int = 4): Unit = {
    require(filesPerShard > 0, s"filesPerShard must be positive, got $filesPerShard")
    docs
      .repartition(col(shardCol), pmod(hash(col(sortCol)), lit(filesPerShard)))
      .sortWithinPartitions(col(shardCol), col(sortCol))
      .write
      .mode("append")
      .partitionBy(shardCol)
      .parquet(path)
  }

  /** Incremental refresh: overwrite ONLY the shard partitions present
    * in `docs` (dynamic partition overwrite), leaving every other
    * shard's directory and files byte-for-byte untouched. This is the
    * re-curation path at 100 TB — refreshing one source must not
    * rewrite (or even list) the other 99; same bounded fan-out and
    * in-file sort as [[writeParquet]], so the refreshed partitions
    * keep the full layout contract. */
  def refreshShards(docs: DataFrame, path: String,
                    shardCol: String = "source", sortCol: String = "doc_id",
                    filesPerShard: Int = 4): Unit = {
    require(filesPerShard > 0, s"filesPerShard must be positive, got $filesPerShard")
    docs
      .repartition(col(shardCol), pmod(hash(col(sortCol)), lit(filesPerShard)))
      .sortWithinPartitions(col(shardCol), col(sortCol))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(shardCol)
      .parquet(path)
  }
}
