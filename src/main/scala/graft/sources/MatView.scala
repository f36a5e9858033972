package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a keyed
  * [[TsStore]] — the "downstream stage that keeps up instead of
  * recomputing" role (Delta/Materialize incremental-view maintenance,
  * driven purely by the store's manifest chain).
  *
  * The view holds `sum_e4` (an exact scaled-integer sum of a caller
  * measure) and `cnt` per group. [[refresh]] reads the upstream
  * change feed ([[TsStore.changes]] with update PREIMAGES), folds each
  * change row into a signed contribution (+ for insert/update, − for
  * delete/update_preimage — integer arithmetic, so application order
  * can never change the result), aggregates the window's net delta per
  * group, and upserts `old + delta` for EXACTLY the touched groups in
  * one atomic manifest commit. Cost per refresh is the upstream
  * window's commit footprint + the touched groups — never the store,
  * never the whole view.
  *
  * Exactly-once without a side channel: every view row carries the
  * upstream version its last write applied (`applied_v`, the view
  * store's own merge version), so the resume point is
  * `max(applied_v)` over the view — a crashed refresh either committed
  * (the max moved) or didn't (re-run re-derives the identical delta).
  * A group whose count reaches zero keeps a `cnt = 0` row (filtered by
  * [[read]]) so the refresh stays ONE commit, not an upsert + delete.
  *
  * Scale shape: the view is partitioned by a hash bucket of the group
  * key (stable per key, so upserts partition-prune), the change feed is
  * file-diff-bounded, and the old-state join touches only the buckets
  * the delta lands in. The view itself is an aggregate — orders of
  * magnitude smaller than the store it summarizes.
  */
object MatView {

  val AppliedCol = "applied_v"
  val BucketCol = "__bucket"

  private def bucketOf(groupCols: Seq[String], nBuckets: Int): Column =
    pmod(hash(groupCols.map(col): _*), lit(nBuckets)).cast("int")

  /** Build the view from a FULL aggregate of the upstream live state —
    * the one-time base case. Records the upstream version it reflects;
    * subsequent [[refresh]] calls are incremental from there. `tsCol`
    * names the timestamp column the view store sorts on (views are
    * keyed aggregates; a constant epoch is fine and is the default).
    */
  def init(spark: SparkSession, storePath: String, viewPath: String,
           groupCols: Seq[String], measureE4: Column,
           nBuckets: Int = 16): Long = {
    val storeV = StoreLog.ensure(storePath).version
    // read the SNAPSHOT at the recorded version, not the live view: a
    // commit landing between the two would be baked into the aggregate
    // yet fall inside the next refresh's window — double-counted
    val live = TsStore.load(spark, storePath, asOf = Some(storeV))
    val agg = live.groupBy(groupCols.map(col): _*)
      .agg(sum(measureE4).cast("long").as("sum_e4"), count(lit(1)).as("cnt"))
      .withColumn(AppliedCol, lit(storeV))
      .withColumn("ts", to_timestamp(lit(0)))
      .withColumn(BucketCol, bucketOf(groupCols, nBuckets))
    TsStore.write(agg, viewPath, tsCol = "ts", uidCols = Seq(BucketCol))
    StoreLog.ensure(viewPath)
    storeV
  }

  /** Apply the upstream window `(lastApplied, current]` to the view.
    * Returns the upstream version now reflected (unchanged when the
    * window is empty). Idempotent: re-running after a crash re-derives
    * the same delta or finds the window empty.
    *
    * Concurrent refreshers CONVERGE: two racers read the same view
    * snapshot and derive the same merged rows, so whichever commits
    * first wins and the loser either commits identical content or
    * aborts with [[StoreLog.CommitConflict]] when its touched
    * partitions were replaced under it (the upsert's rebase rule) —
    * treat like any maintenance conflict: skip, the other racer already
    * applied the window (MatViewSpec pins the race).
    */
  def refresh(spark: SparkSession, storePath: String, viewPath: String,
              storeKeyCols: Seq[String], storeVersionCol: String,
              groupCols: Seq[String], measureE4: Column,
              nBuckets: Int = 16): Long = {
    val storeV = StoreLog.ensure(storePath).version
    val view = TsStore.load(spark, viewPath)
    val lastApplied = view.agg(coalesce(max(col(AppliedCol)), lit(0L)))
      .first().getLong(0)
    if (storeV <= lastApplied) return lastApplied
    val ch = TsStore.changes(spark, storePath, lastApplied, storeV,
      storeKeyCols, storeVersionCol, preimages = true)
    val sign = when(col("change_type").isin("insert", "update"), 1L)
      .otherwise(-1L) // delete | update_preimage
    val delta = ch.groupBy(groupCols.map(col): _*)
      .agg(sum(sign * measureE4).cast("long").as("d_sum"),
        sum(sign).as("d_cnt"))
    // old state for EXACTLY the touched groups: bucket partition pruning
    // bounds the view read, the join is delta-sized
    val withBucket = delta.withColumn(BucketCol, bucketOf(groupCols, nBuckets))
    val buckets = withBucket.select(BucketCol).distinct().collect()
      .map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return lastApplied
    val old = view.filter(col(BucketCol).isin(buckets: _*))
      .select((groupCols.map(col) :+ col("sum_e4") :+ col("cnt")): _*)
    // null-SAFE key equality: a null group value is a legitimate group
    // (the change aggregate and the upsert window both treat it as one);
    // plain `=` would never rejoin it to its old state and the view
    // would fork a fresh row per refresh
    val joinCond = groupCols.map(c => withBucket(c) <=> old(c)).reduce(_ && _)
    val merged = withBucket.join(old, joinCond, "left_outer")
      .select((groupCols.map(withBucket(_)) :+
        (coalesce(old("sum_e4"), lit(0L)) + col("d_sum")).as("sum_e4") :+
        (coalesce(old("cnt"), lit(0L)) + col("d_cnt")).as("cnt") :+
        lit(storeV).as(AppliedCol) :+
        to_timestamp(lit(0)).as("ts") :+
        withBucket(BucketCol)): _*)
    TsStore.upsert(spark, viewPath, merged, keyCols = groupCols,
      versionCol = AppliedCol, tsCol = "ts", uidCols = Seq(BucketCol))
    storeV
  }

  /** The view's live rows (groups whose count net to zero are dropped —
    * they persist as `cnt = 0` tombstones so refresh stays one commit).
    */
  def read(spark: SparkSession, viewPath: String,
           groupCols: Seq[String]): DataFrame =
    TsStore.load(spark, viewPath)
      .filter(col("cnt") > 0)
      .select((groupCols.map(col) :+ col("sum_e4") :+ col("cnt")): _*)

  /** CONTINUOUS maintenance: tail the upstream store's commit stream
    * (the `graft-store-changes` source — one micro-batch per manifest
    * version) and run [[refresh]] on each batch. The batch CONTENT is
    * deliberately ignored: the stream is the commit-cadence trigger,
    * while refresh diffs the manifest from its own resume point — so a
    * re-delivered batch (crash window) is a no-op by refresh's
    * idempotence, and a refresh that runs ahead of its trigger (the
    * store committed again meanwhile) just makes the next batches
    * no-ops. Exactly-once falls out of the view's own applied-version
    * bookkeeping; the checkpoint only bounds re-reads of the source.
    * Call [[init]] before starting. The view lags the store by at most
    * one trigger interval.
    */
  def follow(spark: SparkSession, storePath: String, viewPath: String,
             storeKeyCols: Seq[String], storeVersionCol: String,
             groupCols: Seq[String], measureE4: Column,
             checkpoint: String,
             nBuckets: Int = 16,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-store-changes").load(storePath)
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        refresh(spark, storePath, viewPath, storeKeyCols, storeVersionCol,
          groupCols, measureE4, nBuckets)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
