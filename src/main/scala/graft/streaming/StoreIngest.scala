package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.TsStore

/** Streaming ingest into the chunked store — the `writeStream` twin of
  * the corintick write path (the reference only ever ingested batches;
  * a 100 TB pipeline tails a feed). Each micro-batch runs the
  * partition-pruned, manifest-committed [[TsStore.upsert]], so:
  *
  *   - per-batch cost scales with the batch's partitions, not the store;
  *   - the store is crash-atomic per batch (a killed batch leaves the
  *     previous manifest live);
  *   - REPLAY IS IDEMPOTENT: foreachBatch is at-least-once across
  *     restarts (a batch can be re-delivered when the failure lands
  *     between epoch commit and checkpoint write), and latest-wins MERGE
  *     maps the re-delivered rows onto the same winners — the store
  *     converges to the exactly-once state. Pinned in StreamingSpec by
  *     deleting a checkpoint commit marker and restarting.
  *
  * Versioning comes from the DATA (`versionCol`, e.g. the event ts or an
  * upstream sequence number), NOT from the batch id — a re-delivered
  * batch must carry identical versions for idempotency to hold.
  */
object StoreIngest {

  /** `checkpointInterval` (per-store, recorded in the manifest log):
    * streaming ingest commits one manifest version per non-empty batch,
    * so a minutes-cadence feed pays a full O(live-files) checkpoint
    * every [[graft.sources.StoreLog.CheckpointInterval]] commits by
    * default — a small interval bounds delta-resolution depth, a large
    * one amortizes checkpoint IO. Only effective when this ingest
    * CREATES the store's log; an existing log keeps its recorded value.
    */
  def start(stream: DataFrame, path: String,
            keyCols: Seq[String], versionCol: String,
            tsCol: String, uidCols: Seq[String],
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow(),
            checkpointInterval: Option[Int] = None): StreamingQuery = {
    checkpointInterval.foreach(i => graft.sources.StoreLog.ensure(path, i))
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          TsStore.upsert(batch.sparkSession, path, batch,
            keyCols = keyCols, versionCol = versionCol,
            tsCol = tsCol, uidCols = uidCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** CDC ingest — the takedown-feed twin of [[start]]: the stream
    * carries an `opCol` whose value `'D'` marks a delete of that row's
    * key; every other row merges latest-wins like [[start]]. Per
    * micro-batch: ONE manifest-committed upsert for the non-delete
    * rows, then ONE file-granular [[TsStore.delete]] for the delete
    * keys (collected driver-side — bounded by the batch's takedown
    * count), so a key both updated and deleted within a batch ends
    * deleted. Re-delivery converges: replayed upserts map onto the same
    * winners and a replayed delete matches nothing — a batch replayed
    * from its start may transiently resurrect a key its later delete
    * removes again, i.e. at-least-once inside the batch, exactly-once
    * at batch completion (pinned in StreamingSpec by a mid-stream
    * checkpoint-marker crash).
    *
    * This is the GDPR/decontamination shape at 100 TB: takedowns arrive
    * as a feed, each lands as one atomic manifest version, deleted rows
    * stay auditable via `asOf` until vacuum.
    */
  def startCdc(stream: DataFrame, path: String, opCol: String,
               keyCols: Seq[String], versionCol: String,
               tsCol: String, uidCols: Seq[String],
               checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit, not}
        // null op = upsert: a bare `op =!= 'D'` is null-valued on null
        // ops and would silently DROP those rows from both branches
        val isDelete = coalesce(col(opCol) === "D", lit(false))
        val ups = batch.filter(not(isDelete)).drop(opCol)
        if (!ups.isEmpty)
          TsStore.upsert(batch.sparkSession, path, ups,
            keyCols = keyCols, versionCol = versionCol,
            tsCol = tsCol, uidCols = uidCols)
        val delKeys = batch.filter(isDelete)
          .select(keyCols.map(col): _*).distinct().collect().toSeq
        if (delKeys.nonEmpty)
          TsStore.delete(batch.sparkSession, path,
            TsStore.keyPredicate(delKeys, keyCols),
            tsCol = tsCol, uidCols = uidCols)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
