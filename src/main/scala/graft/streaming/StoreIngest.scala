package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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
            checkpointInterval: Option[Int] = None,
            autoCompactFilesPerPartition: Option[Int] = None): StreamingQuery = {
    checkpointInterval.foreach(i => graft.sources.StoreLog.ensure(path, i))
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        autoCompactFilesPerPartition match {
          case None =>
            // no isEmpty pre-probe: upsert's own fused probe decides
            // emptiness in the same job that validates and plans the
            // merge — a dedicated limit-1 action would be a second
            // scan of the batch for nothing (guide §1.2)
            TsStore.upsert(batch.sparkSession, path, batch,
              keyCols = keyCols, versionCol = versionCol,
              tsCol = tsCol, uidCols = uidCols) : Unit
          case Some(cap) if !batch.isEmpty =>
            // the guard stays when compaction is wired: an empty batch
            // must not trigger maintenance
            TsStore.upsert(batch.sparkSession, path, batch,
              keyCols = keyCols, versionCol = versionCol,
              tsCol = tsCol, uidCols = uidCols)
            autoCompact(batch.sparkSession, path, cap, tsCol, uidCols)
          case _ => ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The auto-compaction policy behind `autoCompactFilesPerPartition`:
    * after each batch's upsert, read the LATEST manifest (driver-side
    * metadata only), count live files per partition directory, and
    * compact every partition over the cap as ONE additional
    * CAS-committed maintenance txn ([[TsStore.compactPartitions]]).
    * This closes the small-file loop streaming ingest opens — steady
    * ingest accretes one file set per micro-batch, and without a bound
    * the per-partition file count (and with it planning cost and read
    * amplification) grows with feed age, not data size. A compaction
    * losing its CAS to a concurrent writer is SKIPPED (the next batch
    * re-checks the same counts); ingest itself never fails on it.
    *
    * The same hook also fires on DELETION-VECTOR DENSITY
    * ([[TsStore.dvDensePrefixes]], threshold `dvRatio`, default 20%):
    * a store absorbing steady merge-on-read DML accumulates sidecars
    * that tax every read until a rewrite materializes them — the
    * manifest-recorded cardinalities make the trigger a zero-IO
    * driver check, and compaction already materializes vectors by
    * contract. `dvRatio <= 0` disables the density trigger.
    */
  private[graft] def autoCompact(spark: SparkSession, path: String, cap: Int,
                                 tsCol: String, uidCols: Seq[String],
                                 dvRatio: Double = 0.2): Unit = {
    require(cap >= 1, s"autoCompactFilesPerPartition must be >= 1, got $cap")
    graft.sources.StoreLog.latestVersion(path).foreach { v =>
      // streaming fold, not a snapshot resolution: the hook runs after
      // EVERY epoch and must stay O(live prefixes) on the driver
      val counts = scala.collection.mutable.Map.empty[String, Int]
      graft.sources.StoreLog.foldFiles(path, v)(()) { (_, e) =>
        val i = e.path.lastIndexOf('/')
        if (i > 0) {
          val p = e.path.substring(0, i)
          counts(p) = counts.getOrElse(p, 0) + 1
        }
      }
      val over = counts.collect { case (p, n) if n > cap => p }.toSeq
      val dense = TsStore.dvDensePrefixesAt(path, v, dvRatio)
      val targets = (over ++ dense).distinct.sorted
      if (targets.nonEmpty)
        try TsStore.compactPartitions(spark, path, targets, tsCol, uidCols,
          maxFilesPerPartition = cap) : Unit
        catch { case _: graft.sources.StoreLog.CommitConflict => () }
    }
  }

  /** Append-only streaming ingest — the O(batch) write path for
    * IMMUTABLE feeds (tick data, event logs, crawl output). [[start]]'s
    * upsert gives latest-wins merge semantics but pays a rewrite of
    * every touched partition per batch; an append-only feed needs
    * neither merge nor rewrite, so each micro-batch lands as ONE
    * manifest-committed file addition (`TsStore.write(Append)` through
    * the staged-txn path) whose IO is the batch's own bytes, whatever
    * the partition has accumulated.
    *
    * Exactly-once WITHOUT keys: an append cannot rely on latest-wins
    * idempotency, so each batch's commit carries a TAG
    * (`<feedId>-<batchId>`, the public Delta/Iceberg txn-appId design)
    * and a re-delivered batch finds its tag in the recent manifest
    * chain ([[graft.sources.StoreLog.findTag]]) and skips — replays
    * become no-ops instead of duplicate rows (pinned in StreamingSpec
    * by the same commit-marker crash drill as the upsert path).
    *
    * This is exactly where steady ingest ACCRETES small files (one set
    * per batch, forever), so `autoCompactFilesPerPartition` defaults ON
    * here: partitions over the cap are compacted as their own
    * CAS-committed maintenance txns right after the batch commit.
    * `feedId` must be unique per logical feed writing the store (two
    * feeds sharing an id would dedup each other's batches).
    */
  def startAppend(stream: DataFrame, path: String,
                  tsCol: String, uidCols: Seq[String],
                  checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow(),
                  checkpointInterval: Option[Int] = None,
                  autoCompactFilesPerPartition: Option[Int] = Some(8),
                  feedId: String = "feed"): StreamingQuery = {
    graft.sources.StoreLog.ensure(path,
      checkpointInterval.getOrElse(graft.sources.StoreLog.CheckpointInterval))
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val tag = s"$feedId-$batchId"
        if (!batch.isEmpty &&
            graft.sources.StoreLog.findTag(path, tag).isEmpty) {
          TsStore.write(batch, path, tsCol = tsCol, uidCols = uidCols,
            mode = org.apache.spark.sql.SaveMode.Append,
            overlapPolicy = TsStore.OverlapPolicy.Allow,
            commitTag = Some(tag))
          autoCompactFilesPerPartition.foreach(cap =>
            autoCompact(batch.sparkSession, path, cap, tsCol, uidCols))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Store-to-store incremental sync: tail `srcPath`'s manifest through
    * the [[graft.sources.StoreChangeSource]] streaming source (one
    * micro-batch per upstream commit, reading only each commit's added
    * files) and apply every batch to `dstPath` with the same
    * latest-wins, manifest-committed upsert as [[start]]. Carried-over
    * copy-on-write survivors and re-delivered batches map onto the same
    * winners, so the downstream store CONVERGES to the upstream live
    * view (deletions excepted — see the source's doc; propagate
    * takedowns by running the CDC feed into both stores).
    *
    * This is how a 100 TB training-data pipeline chains stages without
    * full recompute: each downstream stage's per-cycle cost is its
    * upstream's commit footprint, and the streaming checkpoint carries
    * the consumer's position (a manifest version) across restarts.
    */
  def follow(spark: SparkSession, srcPath: String, dstPath: String,
             keyCols: Seq[String], versionCol: String,
             tsCol: String, uidCols: Seq[String],
             checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow(),
             startingVersion: Long = 1L): StreamingQuery = {
    val feed = spark.readStream.format("graft-store-changes")
      .option("path", srcPath)
      .option("startingVersion", startingVersion)
      .load()
      .drop(graft.sources.StoreChangeSource.VersionCol)
    start(feed, dstPath, keyCols, versionCol, tsCol, uidCols, checkpoint, trigger)
  }

  /** Cap on how many takedown keys one [[TsStore.delete]] pass inlines
    * as literals. A million-key takedown batch must not build a
    * million-literal predicate off the driver collect — the plan's size
    * (and the analyzer's walk over it) would be unbounded by anything
    * but the feed. Batches over the cap switch to the join-based
    * anti-merge ([[TsStore.deleteKeys]]): the key set rides as DATA
    * (broadcast into the find scan and the survivor rewrite), so the
    * plan stays O(1) whatever the batch size, and the whole takedown is
    * ONE file-granular pass and one manifest commit.
    */
  private[graft] val MaxKeysPerDeletePass = 1000

  /** CDC ingest — the takedown-feed twin of [[start]]: the stream
    * carries an `opCol` whose value `'D'` marks a delete of that row's
    * key; every other row merges latest-wins like [[start]]. A
    * DataFrame has no recoverable arrival order, so within a batch the
    * delete-vs-upsert race is resolved by VERSION, same as the merge
    * itself: a delete at version v removes rows with `versionCol <= v`
    * (the store's current rows included), while an upsert of the same
    * key at a HIGHER version — a reinsert after the delete — survives
    * both the upsert filter and the delete's rewrite. On a version tie
    * the delete wins. Per micro-batch: ONE manifest-committed upsert
    * for the surviving non-delete rows, then ONE takedown commit — a
    * literal-predicate delete up to [[MaxKeysPerDeletePass]] keys, the
    * join-based [[TsStore.deleteKeys]] anti-merge above it (plan size
    * O(1) in the key count). A delete row carrying a NULL key component is rejected
    * loudly — `===` can never match it, so it would otherwise silently
    * no-op. Re-delivery converges: replayed upserts map onto the same
    * winners and a replayed versioned delete removes only what it
    * removed before — at-least-once inside the batch, exactly-once at
    * batch completion (pinned in StreamingSpec by a mid-stream
    * checkpoint-marker crash).
    *
    * This is the GDPR/decontamination shape at 100 TB: takedowns arrive
    * as a feed, each lands as one atomic manifest version, deleted rows
    * stay auditable via `asOf` until vacuum.
    *
    * `deleteMode` routes the takedown commit: `"cow"` (default) is the
    * file-granular copy-on-write pass above; `"dv"` lands DELETION
    * VECTORS instead ([[TsStore.deleteVectors]] below the key cap,
    * [[TsStore.deleteKeysVectors]] above it) — O(deleted rows) sidecar
    * bytes and ONE commit per batch where cow pays O(affected files)
    * rewrite IO. The dv route is what a SCATTERED takedown feed wants
    * at 100 TB: a thousand keys spread over a thousand chunks rewrite
    * nothing. Row-for-row semantics are identical (version-resolved,
    * reinserts survive; pinned in StreamingSpec); re-delivery converges
    * the same way (the dv find is dv-aware, so a replayed batch
    * re-deletes nothing). Accumulated vector density triggers the same
    * auto-compaction cue as every other dv writer.
    */
  def startCdc(stream: DataFrame, path: String, opCol: String,
               keyCols: Seq[String], versionCol: String,
               tsCol: String, uidCols: Seq[String],
               checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow(),
               bloomKeys: Seq[String] = Nil,
               deleteMode: String = "cow"): StreamingQuery = {
    require(deleteMode == "cow" || deleteMode == "dv",
      s"deleteMode must be 'cow' or 'dv', got '$deleteMode'")
    // a takedown feed probes by MERGE KEY — per-column parquet blooms on
    // those keys let the per-batch find scan skip row groups even where
    // min/max bounds can't (keys uncorrelated with the ts sort order).
    // Recorded as a store property BEFORE the first batch so every
    // upsert/delete rewrite inherits it. Like checkpointInterval, the
    // property is set at store CREATION only — on an existing store the
    // manifest's recorded bloomCols win (ensure returns the live
    // snapshot untouched), so a mismatched arg here cannot silently
    // fork the store's layout contract.
    if (bloomKeys.nonEmpty)
      graft.sources.StoreLog.ensure(path, bloomCols = bloomKeys)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        import org.apache.spark.sql.functions.{coalesce, col, lit, max, not}
        import org.apache.spark.sql.functions.{count, struct, when}
        // null op = upsert: a bare `op =!= 'D'` is null-valued on null
        // ops and would silently DROP those rows from both branches
        val isDelete = coalesce(col(opCol) === "D", lit(false))
        // per-key highest delete version. Pinned once (evaluated by the
        // supersession join and the takedown) — and NEVER collected
        // whole: a million-key takedown batch must not materialize its
        // key set on the driver. LAZY pin + ONE probe job (the
        // TsStore.upsert pattern): the aggregate below materializes the
        // pin, counts the keys, AND carries at most one null-key
        // violation example — previously three actions (eager
        // checkpoint + take(1) audit + capped count). The exact count
        // is still one driver-side long; only boundedness is acted on.
        val delMax = batch.filter(isDelete)
          .groupBy(keyCols.map(col): _*)
          .agg(max(col(versionCol)).as("__del_v"))
          .localCheckpoint(false)
        val nullKey = keyCols.map(col(_).isNull).reduce(_ || _)
        val probe = delMax.agg(
          count(lit(1)).as("__n"),
          max(when(nullKey, struct(keyCols.map(col): _*))).as("__bad")).head()
        require(probe.isNullAt(1),
          s"CDC delete row with null key component (${keyCols.mkString(",")} = " +
            s"${probe.get(1)}) — a null key can never " +
            "match a stored row; fix the feed")
        val delN = probe.getLong(0)
        val smallDelete = delN <= MaxKeysPerDeletePass
        val ups0 = batch.filter(not(isDelete)).drop(opCol)
        // drop upsert rows a same-key delete supersedes (version <= the
        // delete's); the join keeps this fully distributed — broadcast
        // is only HINTED when the key set is known small (over-cap sets
        // are left to the planner/AQE, which sizes the build side).
        // No isEmpty pre-probe on the result: upsert's fused probe
        // decides emptiness in the job that plans the merge.
        val ups =
          if (delN == 0) ups0
          else ups0.join(if (smallDelete) delMax.hint("broadcast") else delMax,
              keyCols, "left_outer")
            .filter(col("__del_v").isNull || col(versionCol) > col("__del_v"))
            .drop("__del_v")
        TsStore.upsert(batch.sparkSession, path, ups,
          keyCols = keyCols, versionCol = versionCol,
          tsCol = tsCol, uidCols = uidCols)
        // small takedowns inline as one literal-predicate delete pass
        // (no broadcast job) — the only point keys ever reach the
        // driver, bounded by the cap. Anything larger runs as ONE
        // join-based anti-merge (TsStore.deleteKeys): the key set rides
        // as DATA, plan size O(1) in the key count, one find scan + one
        // rewrite + one manifest commit.
        if (delN > 0) {
          if (deleteMode == "dv") {
            // merge-on-read takedown: position sidecars + one commit,
            // O(deleted rows) IO whatever the affected-file spread
            if (smallDelete)
              TsStore.deleteVectors(batch.sparkSession, path,
                TsStore.versionedKeyPredicate(delMax.collect().toSeq, keyCols, versionCol))
            else
              TsStore.deleteKeysVectors(batch.sparkSession, path, delMax,
                keyCols = keyCols, deleteVersionCol = "__del_v",
                versionCol = versionCol)
            // the dv writer defers its rewrite to compaction — run the
            // density cue so steady takedown churn self-heals
            autoCompact(batch.sparkSession, path, Int.MaxValue, tsCol, uidCols)
          } else if (smallDelete)
            TsStore.delete(batch.sparkSession, path,
              TsStore.versionedKeyPredicate(delMax.collect().toSeq, keyCols, versionCol),
              tsCol = tsCol, uidCols = uidCols)
          else
            TsStore.deleteKeys(batch.sparkSession, path, delMax,
              keyCols = keyCols, deleteVersionCol = "__del_v",
              versionCol = versionCol, tsCol = tsCol, uidCols = uidCols)
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
