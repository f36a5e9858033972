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
  * Exactly-once without a side channel: the upstream version the view
  * reflects rides the view store's own manifest as a per-store property
  * ([[AppliedProp]]), written in the SAME commit as the refresh upsert
  * — so the resume point is an O(1) manifest read, never a view scan,
  * and a crashed refresh either committed (the property moved) or
  * didn't (re-run re-derives the identical delta). Every view row also
  * carries `applied_v` (the view store's merge version); a pre-upgrade
  * view without the property falls back to `max(applied_v)` over one
  * scan, and the property rides its next refresh commit. A group whose
  * count reaches zero keeps a `cnt = 0` row (filtered by [[read]]) so
  * the refresh stays ONE commit, not an upsert + delete.
  *
  * Refreshes are SERIALIZED by a lock under the view's log directory:
  * two refreshers reading the upstream at DIFFERENT versions could
  * otherwise interleave unsoundly (racer A applies window (3,5]'s
  * insert of key k; racer B's wider (3,9] window — read before A
  * committed — sees k inserted-then-deleted as a cancelled no-change,
  * both commit on disjoint buckets, and the resume point jumps to 9
  * with k's compensating delete skipped forever). Under the lock each
  * refresh derives its window from the LAST COMMITTED resume point, so
  * windows never overlap. A contended refresh waits briefly, then
  * throws the clean [[StoreLog.CommitConflict]] maintenance signal; a
  * crashed holder's lock expires by age.
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

  /** Manifest property carrying the upstream version the view reflects
    * — the O(1) resume point (the checkpointInterval/bloomCols
    * mechanism; written in the same commit as the refresh upsert).
    */
  val AppliedProp = "graft.matview.applied_v"

  /** How long a contended [[refresh]] waits for the refresh lock before
    * throwing [[StoreLog.CommitConflict]]; a crashed holder's lock
    * expires after [[LockStaleMs]] by mtime. A HEALTHY holder never
    * expires: a daemon heartbeat touches the lock every
    * [[LockHeartbeatMs]] while the body runs (the same renewal pattern
    * as [[StoreLog.withWriterLease]]), so staleness means the holder's
    * JVM died — not that its refresh was merely slow.
    */
  val LockWaitMs: Long = 60L * 1000
  val LockStaleMs: Long = 10L * 60 * 1000

  /** Heartbeat cadence for the refresh lock — well inside
    * [[LockStaleMs]]. Test seam: specs shrink it to exercise renewal.
    */
  @volatile private[graft] var LockHeartbeatMs: Long = LockStaleMs / 4

  private def bucketOf(groupCols: Seq[String], nBuckets: Int): Column =
    pmod(hash(groupCols.map(col): _*), lit(nBuckets)).cast("int")

  /** The upstream version the view currently reflects: the manifest
    * property when present (zero data IO, zero jobs), else one
    * O(view) scan of the per-row `applied_v` max (pre-upgrade views —
    * the property rides their next refresh commit).
    */
  def lastApplied(spark: SparkSession, viewPath: String): Long = {
    val snap = StoreLog.ensure(viewPath)
    snap.props.get(AppliedProp).map(_.toLong).getOrElse {
      TsStore.load(spark, viewPath)
        .agg(coalesce(max(col(AppliedCol)), lit(0L))).first().getLong(0)
    }
  }

  /** Serialize view maintenance: acquire `.refresh_lock` under the
    * view's log directory (publish-if-absent CAS — dot-prefixed, so the
    * version listing and vacuum's lease scan never see it), run `body`,
    * release. A stale lock (DEAD holder — the heartbeat keeps a live
    * one fresh) is taken over; a contended acquire waits up to
    * [[LockWaitMs]] then throws the maintenance-conflict signal callers
    * already handle.
    *
    * Two races a naive delete-then-publish takeover admits, both closed:
    * (1) two waiters judge the same lock stale; A deletes + publishes,
    * then B's queued delete removes A's FRESH lock and B publishes too —
    * so the stale delete re-reads the lock and removes it only while its
    * content still equals the bytes the staleness was measured on (a
    * successor's token never matches); (2) the narrower interleaving
    * where B's content check passes just before A publishes — so every
    * successful publish is VERIFIED: after a short settle delay the
    * holder re-reads the lock and proceeds only if it still carries its
    * own token, retrying otherwise. `body` additionally receives an
    * `owned()` check to call immediately before its commit — the last
    * line of defense if a holder's JVM froze past [[LockStaleMs]] with
    * the heartbeat thread frozen alongside it.
    */
  private[graft] def withRefreshLock[T](viewPath: String)(body: (() => Boolean) => T): T = {
    val io = CommitIo.forPath(viewPath).getOrElse(
      throw new IllegalArgumentException(
        s"matview needs a loggable view path; '$viewPath' has no commit backend"))
    val lock = s"${StoreLog.logDir(viewPath)}/.refresh_lock"
    // the lock carries its holder's token: release deletes ONLY its own
    // lock, so a holder that stalls past LockStaleMs, loses the lock to
    // a stale takeover, and then finishes cannot delete its SUCCESSOR's
    // lock (which would let a third maintainer in under the successor)
    val token = java.util.UUID.randomUUID().toString.getBytes("UTF-8")
    def owned(): Boolean =
      try io.exists(lock) && java.util.Arrays.equals(io.readBytes(lock), token)
      catch { case scala.util.control.NonFatal(_) => false }
    val deadline = System.currentTimeMillis() + LockWaitMs
    var acquired = false
    while (!acquired) {
      if (io.publishIfAbsent(lock, token)) {
        // verified acquire: a racing waiter whose staleness read predates
        // this publish may still delete it — give any such in-flight
        // takeover a beat to land, then proceed only on our own token
        Thread.sleep(50)
        acquired = owned()
        // a TRANSIENT owned() failure must not orphan our published
        // lock (it would block every refresher until staleness): if the
        // lock still carries our token on a re-check, release it before
        // looping; an unreadable lock is left for mtime expiry
        if (!acquired) {
          try {
            if (io.exists(lock) && java.util.Arrays.equals(io.readBytes(lock), token))
              io.deleteFile(lock)
          } catch { case scala.util.control.NonFatal(_) => () }
        }
      }
      if (!acquired) {
        if (System.currentTimeMillis() > deadline)
          throw new StoreLog.CommitConflict(
            s"matview refresh lock held at $viewPath — another maintainer " +
              "is refreshing; retry later")
        // (content, staleness) observed together; the delete below is
        // conditioned on the content still matching
        val staleContent: Option[Array[Byte]] =
          try {
            if (io.exists(lock) &&
                System.currentTimeMillis() - io.mtimeMs(lock) > LockStaleMs)
              Some(io.readBytes(lock))
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        staleContent match {
          case Some(c) =>
            try {
              if (io.exists(lock) && java.util.Arrays.equals(io.readBytes(lock), c))
                io.deleteFile(lock)
            } catch { case scala.util.control.NonFatal(_) => () }
            // fall through to the next acquire attempt after a beat —
            // never a tight spin even if the delete keeps failing
            Thread.sleep(50)
          case None =>
            Thread.sleep(100)
        }
      }
    }
    // heartbeat-renew while the body runs: a healthy refresh running
    // longer than LockStaleMs must not be reclaimed as dead
    val stop = new java.util.concurrent.CountDownLatch(1)
    val hb = new Thread(() => {
      while (!stop.await(LockHeartbeatMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try { if (owned()) io.touch(lock) }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }, "graft-matview-lock-heartbeat")
    hb.setDaemon(true)
    hb.start()
    try body(() => owned()) finally {
      stop.countDown()
      hb.join(2000)
      try { if (owned()) io.deleteFile(lock) }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

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
    // record the resume point as a manifest property right away (one
    // metadata-only commit) so the first refresh is already O(1)
    val cur = StoreLog.ensure(viewPath)
    StoreLog.commit(viewPath, cur.version, Seq.empty, cur.files,
      parent = Some(cur), setProps = Map(AppliedProp -> storeV.toString))
    storeV
  }

  /** Apply the upstream window `(lastApplied, current]` to the view.
    * Returns the upstream version now reflected (unchanged when the
    * window is empty — decided from MANIFEST METADATA alone: an
    * up-to-date view costs two manifest reads, zero data files, zero
    * jobs; MatViewSpec pins the zero-job path). Idempotent: re-running
    * after a crash re-derives the same delta or finds the window empty.
    *
    * Refreshes SERIALIZE on the view's refresh lock (see the class
    * doc): each refresh derives its window from the last COMMITTED
    * resume point, so two maintainers' windows can never overlap — the
    * unsound different-version interleaving is structurally excluded.
    * A contended refresh throws [[StoreLog.CommitConflict]] after a
    * bounded wait; callers treat it like any maintenance conflict
    * (skip — the holder is applying the window; MatViewSpec pins both
    * the race and the held-lock signal).
    */
  def refresh(spark: SparkSession, storePath: String, viewPath: String,
              storeKeyCols: Seq[String], storeVersionCol: String,
              groupCols: Seq[String], measureE4: Column,
              nBuckets: Int = 16): Long = {
    val storeV = StoreLog.ensure(storePath).version
    // lock-free fast path: an empty window is visible from the manifest
    // property alone — no lock traffic, no data IO for the steady state
    val quick = lastApplied(spark, viewPath)
    if (storeV <= quick) return quick
    withRefreshLock(viewPath) { owned =>
      // a commit computed under a lost lock (frozen JVM thawed past
      // LockStaleMs, successor already refreshing) must not land — the
      // successor's window overlaps ours
      def assertOwned(): Unit =
        if (!owned()) throw new StoreLog.CommitConflict(
          s"matview refresh lock at $viewPath was lost mid-refresh " +
            "(holder stalled past staleness; a successor took over) — retry")
      // re-derive UNDER the lock: the holder we waited on may have
      // advanced the resume point past our pre-lock read
      val last = lastApplied(spark, viewPath)
      if (storeV <= last) last
      else {
        val view = TsStore.load(spark, viewPath)
        val ch = TsStore.changes(spark, storePath, last, storeV,
          storeKeyCols, storeVersionCol, preimages = true)
        val sign = when(col("change_type").isin("insert", "update"), 1L)
          .otherwise(-1L) // delete | update_preimage
        val delta = ch.groupBy(groupCols.map(col): _*)
          .agg(sum(sign * measureE4).cast("long").as("d_sum"),
            sum(sign).as("d_cnt"))
        // old state for EXACTLY the touched groups: bucket partition
        // pruning bounds the view read, the join is delta-sized.
        // persist(MEMORY_AND_DISK) pins the aggregated delta ONCE — it
        // is read twice (the bucket probe below, the merge join), and
        // without the pin each read re-runs the whole change-feed scan
        // + aggregate. The pin is touched-groups-sized and LAZY (the
        // bucket-probe distinct doubles as the materialization job).
        // Failure-mode choice (r20): a RECOMPUTABLE persist, not a
        // localCheckpoint — the delta lineage is deterministic (a
        // grouped aggregate over fixed file lists), so keeping it
        // preserves executor-loss recovery at cluster scale for free;
        // unpersisted before return, so nothing leaks past the refresh.
        val withBucket = delta.withColumn(BucketCol, bucketOf(groupCols, nBuckets))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        val buckets = withBucket.select(BucketCol).distinct().collect()
          .map(_.getInt(0)).toSeq
        if (buckets.isEmpty) {
          // the window's changes net to nothing (carried-over survivors
          // only) — advance the resume point with a metadata-only
          // commit so the window is never re-derived
          assertOwned()
          val cur = StoreLog.ensure(viewPath)
          StoreLog.commit(viewPath, cur.version, Seq.empty, cur.files,
            parent = Some(cur), setProps = Map(AppliedProp -> storeV.toString))
          storeV
        } else {
          val old = view.filter(col(BucketCol).isin(buckets: _*))
            .select((groupCols.map(col) :+ col("sum_e4") :+ col("cnt")): _*)
          // null-SAFE key equality: a null group value is a legitimate
          // group (the change aggregate and the upsert window both treat
          // it as one); plain `=` would never rejoin it to its old state
          // and the view would fork a fresh row per refresh
          val joinCond = groupCols.map(c => withBucket(c) <=> old(c)).reduce(_ && _)
          val merged = withBucket.join(old, joinCond, "left_outer")
            .select((groupCols.map(withBucket(_)) :+
              (coalesce(old("sum_e4"), lit(0L)) + col("d_sum")).as("sum_e4") :+
              (coalesce(old("cnt"), lit(0L)) + col("d_cnt")).as("cnt") :+
              lit(storeV).as(AppliedCol) :+
              to_timestamp(lit(0)).as("ts") :+
              withBucket(BucketCol)): _*)
          // the resume point rides the SAME manifest commit as the
          // upserted rows — atomically exactly-once, O(1) to read back
          assertOwned()
          TsStore.upsert(spark, viewPath, merged, keyCols = groupCols,
            versionCol = AppliedCol, tsCol = "ts", uidCols = Seq(BucketCol),
            setProps = Map(AppliedProp -> storeV.toString))
          storeV
        }
        } finally withBucket.unpersist(blocking = false)
      }
    }
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
