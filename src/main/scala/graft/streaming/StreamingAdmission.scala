package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Dedup.incremental` — the live ingest path: a
  * stream of new documents is admitted against the STATIC fingerprint
  * index of the curated corpus. The index side is a stream-static
  * left join (the corpus never streams, only its fp column is read),
  * and the within-stream "first claimant wins" rule is one boolean of
  * state per novel fingerprint, hash-partitioned by fp — the same
  * footprint any streaming dedup carries. A real deployment
  * periodically folds that state delta into the stored index and
  * restarts the query against it.
  *
  * Semantics contract: in BATCH mode events sort by doc_id within a
  * fingerprint, so the min-doc_id claimant matches `Dedup.incremental`
  * exactly (parity-checked in StreamingAdmissionSpec). In streaming,
  * the claimant is the first ARRIVAL (earlier micro-batch wins;
  * doc_id breaks ties only within a batch) — arrival order IS the
  * admission order a live ingest wants.
  */
object StreamingAdmission {

  case class AdmissionEvent(doc_id: Long, fp: String, in_index: Boolean)

  case class AdmissionRow(doc_id: Long, fp: String, status: String, keep: Boolean)

  /** Claim-fold for one fingerprint's new events. State = "has this
    * fp already been claimed by a novel doc" (nothing else — index
    * membership rides each event from the stream-static join). */
  def updateAdmission(fpKey: String, events: Iterator[AdmissionEvent],
                      state: GroupState[Boolean]): Iterator[AdmissionRow] = {
    val evs = events.toArray.sortBy(_.doc_id)
    if (evs.isEmpty) return Iterator.empty
    var claimed = state.getOption.getOrElse(false)
    val out = evs.map { e =>
      val status =
        if (e.in_index) graft.operators.Dedup.DupOfIndex
        else if (!claimed) { claimed = true; graft.operators.Dedup.Novel }
        else graft.operators.Dedup.DupInBatch
      AdmissionRow(e.doc_id, e.fp, status, status == graft.operators.Dedup.Novel)
    }
    state.update(claimed)
    out.iterator
  }

  /** Streaming (or batch) admission verdicts. `docs` must carry
    * `doc_id`; `fp` is evaluated against it; `index` is a static
    * DataFrame with an `fp` column (the stored output of a previous
    * curation run). */
  def admission(docs: DataFrame, index: DataFrame,
                fp: org.apache.spark.sql.Column): Dataset[AdmissionRow] = {
    docs.withColumn("fp", fp)
      .join(graft.operators.Dedup.indexFps(index), Seq("fp"), "left")
      .select(col("doc_id").cast("long").as("doc_id"), col("fp"),
        coalesce(col("in_index"), lit(false)).as("in_index"))
      .as[AdmissionEvent](Encoders.product[AdmissionEvent])
      .groupByKey(_.fp)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateAdmission)(Encoders.scalaBoolean, Encoders.product[AdmissionRow])
  }
}
