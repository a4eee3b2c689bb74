package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** The shard-partition VALUES under `path` whose directory holds
    * more than `maxFiles` parquet data files — the compaction
    * candidates after a run of [[appendShards]] calls (each append
    * adds ≤`filesPerShard` files to every shard it touches, so file
    * counts grow with batch count until a [[refreshShards]] rewrite
    * folds them back). Driver-side listing of the partition
    * DIRECTORIES only — one RPC per shard dir, never a row read, so
    * the check is free at any corpus size. */
  def oversizedShards(spark: SparkSession, path: String, shardCol: String,
                      maxFiles: Int): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$shardCol="))
      .filter { s =>
        fs.listStatus(s.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) > maxFiles
      }
      .map(_.getPath.getName.stripPrefix(s"$shardCol="))
  }

  /** COMPACTION WRITE: materialize `docs` (the replacement rows for
    * the named shard partitions) into a sibling temp directory with
    * the full layout contract, then atomically swap each listed
    * partition directory into place and drop the temp dir. This is
    * the write shape a compactor needs when its replacement rows are
    * COMPUTED FROM the very path being rewritten — a direct dynamic
    * overwrite of a path the plan also reads is rejected by Spark
    * (and would be unsafe anyway); staging to a sibling and swapping
    * per-directory keeps readers of untouched shards unaffected and
    * makes each shard's cutover a single filesystem rename.
    * `shardDirs` are the partition directory names to swap, e.g.
    * `Seq("term_bucket=3", "term_bucket=7")` — `docs` must contain
    * exactly those partitions' rows.
    *
    * A listed shard with NO replacement rows writes no temp directory
    * at all (`partitionBy` materializes only observed partition
    * values), so a missing src is ambiguous: for a compactor it means
    * rows were lost mid-write (fail LOUDLY, and BEFORE the
    * destination is deleted), while for a tombstone purge it is the
    * legitimate fully-drained case — every row of the shard was
    * deleted, and the swap's job is to remove the directory. Callers
    * state which they are via `dropDrained`; defaulting to the strict
    * read keeps a buggy compactor from silently erasing data. */
  def swapShards(docs: DataFrame, path: String, shardDirs: Seq[String],
                 shardCol: String = "source", sortCol: String = "doc_id",
                 filesPerShard: Int = 4, dropDrained: Boolean = false): Unit = {
    val tmp = s"$path._compact_tmp"
    writeParquet(docs, tmp, shardCol, sortCol, filesPerShard)
    val fs = new Path(path).getFileSystem(
      docs.sparkSession.sessionState.newHadoopConf())
    shardDirs.foreach { d =>
      val dst = new Path(path, d)
      val src = new Path(tmp, d)
      if (fs.exists(src)) {
        fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"compaction swap failed for $d")
      } else if (dropDrained) {
        // the shard lost its last row: removing the directory IS the swap
        fs.delete(dst, true)
      } else {
        // refuse BEFORE touching dst — the old files stay servable
        fs.delete(new Path(tmp), true)
        throw new java.io.IOException(
          s"compaction produced no rows for $d (pass dropDrained=true only for purges)")
      }
    }
    fs.delete(new Path(tmp), true)
  }

  /** ID-KEYED UPSERT into a shard-partitioned store — replace-or-
    * insert `rows` by `idCol`, touching ONLY the shard directories
    * the batch lands in: current rows of the touched shards minus
    * the batch's ids, unioned with the batch, staged and swapped
    * per-directory ([[swapShards]] — computed-from-self safe, every
    * untouched shard's files byte-identical). This is the missing
    * replace semantics of a parquet row store: [[appendShards]] can
    * only add, so a re-embedding / re-curation stream would
    * otherwise accumulate stale versions that any downstream refit
    * or exact re-rank would read. `rows` must already carry
    * `shardCol` (callers derive it from the id — e.g.
    * `pmod(hash(id), nBuckets)` — so a replacement lands in the SAME
    * shard as the row it replaces). Batch ids must be unique.
    * Bootstraps an absent store. Returns the touched shard values.
    * Cost: O(batch + touched-shard rows), never O(store). */
  def upsertShards(rows: DataFrame, path: String,
                   shardCol: String = "source", idCol: String = "doc_id",
                   filesPerShard: Int = 4): Seq[String] = {
    val spark = rows.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) {
      writeParquet(rows, path, shardCol, idCol, filesPerShard)
      return rows.select(col(shardCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }
    val touched = rows.select(col(shardCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val cur = spark.read.parquet(path)
      .filter(col(shardCol).cast("string").isin(touched: _*))
      .join(rows.select(col(idCol)), Seq(idCol), "left_anti")
    swapShards(cur.unionByName(rows.select(cur.columns.map(col): _*)),
      path, touched.map(v => s"$shardCol=$v"), shardCol, idCol,
      filesPerShard)
    touched
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
