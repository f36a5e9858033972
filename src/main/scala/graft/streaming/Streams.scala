package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.DeclaredQuery
import graft.sources.Tables

/** A sparse tick: `value=None` plays a gap to be forward-filled. */
case class Tick(user_id: Long, ts: java.sql.Timestamp, value: Option[Double])
case class FilledTick(user_id: Long, ts: java.sql.Timestamp, v_filled: Option[Double])

/** §2.9 — Structured Streaming surface. The *declared* queries run the
  * batch twin on `events.parquet` (so the DuckDB oracle applies); the
  * same `agg` builders are applied to a streaming source (MemoryStream)
  * with a watermark in StreamingSpec — one definition, two execution
  * modes, which is exactly Structured Streaming's contract: a streaming
  * query is the incremental execution of the equivalent batch plan.
  *
  * Scale: tumbling/sliding/session windows keyed by (window, type) /
  * (user, session) — state per group is O(1) aggregates, evicted by
  * watermark; no per-event state.
  */
object Streams {

  /** Tumbling 1h aggregation — shared by batch twin and streaming test. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sv"))

  /** Sliding 1h/15min aggregation. */
  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** 30-minute OHLC bars per event_type — the corintick flagship
    * aggregation as a streaming-compatible window agg. open/close via
    * min_by/max_by on the (ts, event_id) struct: deterministic (event_id
    * unique) AND merge-friendly — bar state is O(1) per (window, type)
    * regardless of tick volume, evicted by watermark in streaming mode.
    */
  def ohlcAgg(events: DataFrame): DataFrame = {
    val aggs = graft.Q.ohlcAggs(col("ts"), col("event_id"), col("value")) :+
      count(lit(1)).as("n")
    events.groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("bar_ts"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
  }

  /** Session windows, 30-minute inactivity gap, per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n"), col("sv"))

  /** Streaming twin used by StreamingSpec: same builders over a stream
    * with a 10-minute watermark (late rows beyond it are dropped).
    */
  def withWatermark(streamingEvents: DataFrame): DataFrame =
    streamingEvents.withWatermark("ts", "10 minutes")

  /** Streaming LOCF — the custom-state op (SURVEY §4.3.5): carries the
    * last non-null value per key across micro-batches in a GroupState.
    * State per key is ONE Option[Double].
    *
    * `expireAfter` (e.g. `"1 hour"`) bounds total state on an infinite
    * stream: a key idle past the expiry — measured in EVENT time against
    * the stream's watermark, so reprocessing old data cannot mass-evict —
    * has its state dropped, and a later tick for that key starts from
    * empty (its leading gap fills with null until a value arrives, the
    * same cold-start semantics as a brand-new key). Without it state is
    * O(all keys ever seen), which no infinite stream survives.
    * EventTimeTimeout requires `withWatermark` upstream on `ts`, and —
    * Spark's documented timeout semantics — ALSO arms the operator's
    * late-row filter: ticks older than the watermark are dropped from
    * the OUTPUT entirely, not merely barred from evicting state. With
    * `expireAfter = None` such late ticks still flow through. Choose
    * expiry only when the watermark already defines your lateness
    * contract.
    *
    * `expireAfter = None` keeps NoTimeout (bounded key domains / batch).
    * Works identically on a batch Dataset (state starts empty, one
    * "batch", timeouts never fire — Spark's documented batch contract).
    */
  def locfPerKey(ticks: Dataset[Tick],
                 expireAfter: Option[String] = None): Dataset[FilledTick] = {
    import ticks.sparkSession.implicits._
    val timeoutConf =
      if (expireAfter.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ticks.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[Double], FilledTick](
        OutputMode.Append, timeoutConf) {
        (uid: Long, it: Iterator[Tick], state: GroupState[Option[Double]]) =>
          if (state.hasTimedOut) {
            // idle past expiry: drop the carried value; emit nothing
            state.remove()
            Iterator.empty
          } else {
            var last: Option[Double] = state.getOption.flatten
            val rows = it.toSeq.sortBy(_.ts.getTime)
            val out = rows.map { t =>
              if (t.value.nonEmpty) last = t.value
              FilledTick(uid, t.ts, last)
            }
            state.update(last)
            expireAfter.foreach { d =>
              if (rows.nonEmpty)
                state.setTimeoutTimestamp(rows.last.ts.getTime, d)
            }
            out.iterator
          }
      }
  }

  /** Streaming deduplication by business key — the training-pipeline
    * ingest guard (a re-delivered document must not enter the corpus
    * twice). `dropDuplicatesWithinWatermark` keys the state on `keyCols`
    * and, unlike plain `dropDuplicates`, EVICTS each key once the
    * watermark passes it — O(keys-in-watermark-window) state instead of
    * unbounded, which is the only shape that survives an infinite stream.
    * On a batch Dataset (where Spark REJECTS the within-watermark
    * variant outright) it falls back to `dropDuplicates(keyCols)` — the
    * batch semantics the streaming operator incrementalizes.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String,
                           keyCols: Seq[String]): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Stream-stream interval join: each purchase joined to the same
    * user's views within [p.ts − 10 min, p.ts]. BOTH sides carry a
    * watermark and the join condition bounds event-time distance — that
    * pair is what lets Spark evict buffered rows (state is the last ~10
    * minutes per side, not the whole history), the only stream-stream
    * join shape that survives an unbounded stream.
    */
  def streamIntervalJoin(purchases: DataFrame, views: DataFrame,
                         intervalMinutes: Int = 10): DataFrame = {
    val p = purchases.withWatermark("p_ts", "10 minutes")
    // the view side must be retained long enough to cover the trailing
    // interval plus the purchase side's own allowed lateness
    val v = views.withWatermark("v_ts", s"${intervalMinutes + 10} minutes")
    p.join(v,
      expr(s"p_user = v_user AND v_ts >= p_ts - INTERVAL $intervalMinutes MINUTES AND v_ts <= p_ts"))
  }

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "stream_ingest" -> DeclaredQuery(
      // The streaming WRITE path, oracle-gated end-to-end and actually
      // executed as a stream (deterministic: file source + AvailableNow
      // = one replayable batch, unlike the watermark-timing queries
      // whose declared form is the batch twin): land the events table
      // in a parquet dir, readStream it through StoreIngest (foreach-
      // Batch → manifest-committed TsStore.upsert), then read the STORE
      // back. The oracle is the plain events table — any row the
      // ingest dropped, duplicated, or mis-partitioned breaks the hash.
      // StreamingSpec separately proves the restart/re-delivery
      // idempotency of the same path.
      (s, d) => {
        // txn-unique root: a checkpoint may never be reused against a
        // fresh landing dir (offsets would point at dead files)
        val root = graft.Q.scratchTempDir("stream_ingest_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        Tables.events(s, d).select(cols.map(col): _*)
          .withColumn("version", lit(1L))
          .write.mode("overwrite").parquet(s"$root/src")
        val src = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING, version BIGINT")
          .parquet(s"$root/src")
        val q = StoreIngest.start(src, s"$root/store",
          keyCols = Seq("event_id"), versionCol = "version",
          tsCol = "ts", uidCols = Seq("event_type"),
          checkpoint = s"$root/ckpt")
        q.awaitTermination()
        graft.sources.TsStore.read(s, s"$root/store")
          .select((cols :+ "version").map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, ts, user_id, event_type, value, props, " +
        "CAST(1 AS BIGINT) AS version FROM events ORDER BY event_id"),
      "streaming ingest into the store: readStream → foreachBatch upsert → read back"),

    "stream_sink_native" -> DeclaredQuery(
      // The NATIVE sink face of the same write path: `writeStream
      // .format("graft-store")` — a full DSv2 streaming write
      // (SupportsWrite + STREAMING_WRITE, epoch commits), no
      // user-written foreachBatch anywhere. mode=upsert runs the
      // identical partition-pruned manifest-committed merge; the
      // exactly-once story is unchanged (latest-wins on the data's
      // versionCol; StreamingSpec pins the re-delivery drill through
      // the sink, append mode's tag dedup included). Oracle = the
      // events table, same gate as stream_ingest.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_sink_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        Tables.events(s, d).select(cols.map(col): _*)
          .withColumn("version", lit(1L))
          .write.mode("overwrite").parquet(s"$root/src")
        val q = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING, version BIGINT")
          .parquet(s"$root/src")
          .writeStream.format("graft-store")
          .option("path", s"$root/store").option("mode", "upsert")
          .option("keys", "event_id").option("versionCol", "version")
          .option("tsCol", "ts").option("uids", "event_type")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.sources.TsStore.read(s, s"$root/store")
          .select((cols :+ "version").map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, ts, user_id, event_type, value, props, " +
        "CAST(1 AS BIGINT) AS version FROM events ORDER BY event_id"),
      "native streaming sink: writeStream.format(graft-store) → manifest-committed upsert → read back"),

    "stream_cdc" -> DeclaredQuery(
      // CDC/takedown-feed ingest, oracle-gated end-to-end: the landed
      // feed carries every event as an upsert PLUS a delete row for
      // each event_id % 13 == 0 — the GDPR-erasure shape. One
      // AvailableNow batch applies the upserts as one manifest commit
      // and the takedowns as one file-granular delete commit (deletes
      // win within a batch); the oracle is events WHERE NOT the
      // takedown predicate, so a resurrected or leaked row breaks the
      // hash. StreamingSpec separately drives the multi-batch and
      // re-delivery (crash) behavior of the same path.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_cdc_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        val base = Tables.events(s, d).select(cols.map(col): _*)
          .withColumn("version", lit(1L))
        base.withColumn("op", lit("U"))
          .unionByName(base.filter(col("event_id") % 13 === 0)
            .withColumn("version", lit(2L)).withColumn("op", lit("D")))
          .write.mode("overwrite").parquet(s"$root/src")
        val src = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING, version BIGINT, op STRING")
          .parquet(s"$root/src")
        val q = StoreIngest.startCdc(src, s"$root/store", opCol = "op",
          keyCols = Seq("event_id"), versionCol = "version",
          tsCol = "ts", uidCols = Seq("event_type"),
          checkpoint = s"$root/ckpt", bloomKeys = Seq("event_id"))
        q.awaitTermination()
        graft.sources.TsStore.read(s, s"$root/store")
          .select((cols :+ "version").map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, ts, user_id, event_type, value, props, " +
        "CAST(1 AS BIGINT) AS version FROM events " +
        "WHERE NOT (event_id % 13 = 0) ORDER BY event_id"),
      "CDC ingest: a takedown feed of upserts + deletes applied as manifest commits"),

    "stream_cdc_dv" -> DeclaredQuery(
      // The SAME CDC/takedown feed routed MERGE-ON-READ
      // (deleteMode=dv): the takedown lands as deletion-vector
      // sidecars + ONE manifest commit instead of a copy-on-write
      // rewrite — O(deleted rows) IO where cow pays O(affected files),
      // the 100-TB scattered-GDPR-feed shape. Self-pins the
      // merge-on-read contract (the takedown moved NO data file;
      // vectors live; the zero-IO metadata count stays exact) and
      // shares stream_cdc's oracle, so the two routes are gated
      // row-for-row equal by the driver hash.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_cdc_dv_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        val base = Tables.events(s, d).select(cols.map(col): _*)
          .withColumn("version", lit(1L))
        // the store is ALREADY POPULATED when the takedown feed arrives
        // (the GDPR regime: erasure requests target data at rest) — so
        // the dv route must vector rows inside live files, not no-op.
        // Store population and the feed dump are independent sinks —
        // overlapped (guide §2.6)
        graft.Q.inParallel(
          () => graft.sources.TsStore.write(base, s"$root/store",
            tsCol = "ts", uidCols = Seq("event_type")),
          () => base.filter(col("event_id") % 13 === 0)
            .withColumn("version", lit(2L)).withColumn("op", lit("D"))
            .write.mode("overwrite").parquet(s"$root/src"))
        val filesBefore = graft.sources.StoreLog.latest(s"$root/store").get.files
        val src = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING, version BIGINT, op STRING")
          .parquet(s"$root/src")
        val q = StoreIngest.startCdc(src, s"$root/store", opCol = "op",
          keyCols = Seq("event_id"), versionCol = "version",
          tsCol = "ts", uidCols = Seq("event_type"),
          checkpoint = s"$root/ckpt", deleteMode = "dv")
        q.awaitTermination()
        val snap = graft.sources.StoreLog.latest(s"$root/store").get
        require(snap.dvs.nonEmpty,
          "the dv-routed takedown must have committed deletion vectors")
        require(snap.files == filesBefore,
          "the dv-routed takedown must move no data file")
        require(graft.sources.TsStore.countAt(s"$root/store").contains(
          snap.files.flatMap(snap.liveRows).sum),
          "the zero-IO metadata count must stay exact under the takedown vectors")
        graft.sources.TsStore.read(s, s"$root/store")
          .select((cols :+ "version").map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, ts, user_id, event_type, value, props, " +
        "CAST(1 AS BIGINT) AS version FROM events " +
        "WHERE NOT (event_id % 13 = 0) ORDER BY event_id"),
      "CDC takedowns as deletion vectors: sidecars + one commit, no file rewritten"),

    "stream_follow" -> DeclaredQuery(
      // Store-CHAIN incremental sync, oracle-gated end-to-end: an
      // upstream store takes a write + an upsert (two manifest
      // versions), then StoreIngest.follow tails it through the
      // graft-store-changes STREAMING SOURCE — one micro-batch per
      // upstream commit, each reading only that commit's added files —
      // and applies every batch to a downstream store with the same
      // latest-wins upsert. The declared result is the DOWNSTREAM live
      // view; the oracle is the merged upstream view (write_upsert's),
      // so a dropped batch, a re-applied file that changed outcomes, or
      // a leaked dead file all break the hash. StreamingSpec separately
      // pins the per-version batch cadence and checkpointed restart.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_follow_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
        val base = Tables.events(s, d)
          .select(cols.map(col) :+ lit(1L).as("version"): _*)
        graft.sources.TsStore.write(base, s"$root/src",
          tsCol = "ts", uidCols = Seq("event_type"))
        val delta = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            (col("value") + 1000.0).as("value"), lit(2L).as("version"))
          .unionByName(Tables.events(s, d)
            .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
            .select((col("event_id") + 10000000L).as("event_id"), col("ts"),
              col("user_id"), col("event_type"), col("value"), lit(2L).as("version")))
        graft.sources.TsStore.upsert(s, s"$root/src", delta,
          keyCols = Seq("event_id"), versionCol = "version",
          tsCol = "ts", uidCols = Seq("event_type"))
        val q = StoreIngest.follow(s, s"$root/src", s"$root/dst",
          keyCols = Seq("event_id"), versionCol = "version",
          tsCol = "ts", uidCols = Seq("event_type"),
          checkpoint = s"$root/ckpt")
        q.awaitTermination()
        graft.sources.TsStore.read(s, s"$root/dst")
          .select((cols :+ "version").map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("WITH base AS (SELECT event_id, ts, user_id, event_type, value, 1 AS version, 0 AS src FROM events), " +
        "delta AS (SELECT event_id, ts, user_id, event_type, value + 1000.0 AS value, 2 AS version, 1 AS src " +
        "FROM events WHERE event_type = 'purchase' AND event_id % 10 = 0 " +
        "UNION ALL SELECT event_id + 10000000, ts, user_id, event_type, value, 2, 1 " +
        "FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0), " +
        "u AS (SELECT * FROM base UNION ALL SELECT * FROM delta), " +
        "m AS (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY version DESC, src DESC) AS rn FROM u) " +
        "SELECT event_id, ts, user_id, event_type, value, CAST(version AS BIGINT) AS version " +
        "FROM m WHERE rn = 1 ORDER BY event_id"),
      "store-chain sync: tail a store's manifest as a streaming source, apply per-commit batches downstream"),

    "stream_append" -> DeclaredQuery(
      // Append-only ingest, oracle-gated end-to-end: the O(batch) write
      // path for immutable feeds — each micro-batch lands as ONE tagged
      // manifest-committed file addition (no merge, no partition
      // rewrite), and the auto-compact policy bounds the small files
      // the append regime accretes. The landed feed is the events
      // table; the oracle is the same table — a dropped batch, a
      // double-applied replay, or a compaction losing rows breaks the
      // hash. StreamingSpec separately drives the multi-batch cadence,
      // the cap bound, and the tagged re-delivery no-op.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_append_")
        val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        Tables.events(s, d).select(cols.map(col): _*)
          .write.mode("overwrite").parquet(s"$root/src")
        val src = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
          .parquet(s"$root/src")
        val q = StoreIngest.startAppend(src, s"$root/store",
          tsCol = "ts", uidCols = Seq("event_type"),
          checkpoint = s"$root/ckpt")
        q.awaitTermination()
        graft.sources.TsStore.read(s, s"$root/store")
          .select(cols.map(col): _*)
          .orderBy(col("event_id"))
      },
      Some("SELECT event_id, ts, user_id, event_type, value, props " +
        "FROM events ORDER BY event_id"),
      "append-only ingest: tagged O(batch) manifest commits + auto-compaction"),

    "stream_tumbling" -> DeclaredQuery(
      (s, d) => tumblingAgg(Tables.events(s, d))
        .orderBy(col("win_start"), col("event_type")),
      Some("SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n, " +
        "round(sum(value), 4) AS sv FROM events GROUP BY 1, 2 ORDER BY win_start, event_type"),
      "1-hour tumbling window counts/sums per event_type (batch twin)"),

    "stream_sliding" -> DeclaredQuery(
      // Spark emits one row per (aligned 15-min start, type) with ≥1
      // event in [start, start+1h); the oracle reproduces the epoch-
      // aligned grid with generate_series and an interval join (inner
      // join ≙ only-non-empty-windows).
      (s, d) => slidingAgg(Tables.events(s, d))
        .orderBy(col("win_start"), col("event_type")),
      Some("WITH b AS (SELECT date_trunc('hour', min(ts)) - INTERVAL 1 HOUR AS lo, max(ts) AS hi FROM events), " +
        "grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS ws FROM b) " +
        "SELECT g.ws AS win_start, e.event_type, count(*) AS n " +
        "FROM grid g JOIN events e ON e.ts >= g.ws AND e.ts < g.ws + INTERVAL 1 HOUR " +
        "GROUP BY 1, 2 ORDER BY win_start, event_type"),
      "1-hour window sliding every 15 min (batch twin)"),

    "stream_session" -> DeclaredQuery(
      // Session semantics: a gap of ≥ 30 min starts a new session;
      // session end = last event + gap (Spark session_window contract).
      // Oracle = gaps-and-islands with the same ≥ comparison.
      (s, d) => sessionAgg(Tables.events(s, d))
        .orderBy(col("user_id"), col("sess_start")),
      Some("WITH x AS (SELECT user_id, ts, value, " +
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS ns FROM events), " +
        "y AS (SELECT user_id, ts, value, sum(ns) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x) " +
        "SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end, user_id, " +
        "count(*) AS n, round(sum(value), 4) AS sv FROM y GROUP BY user_id, sid " +
        "ORDER BY user_id, sess_start"),
      "session windows, 30-min inactivity gap, per user (batch twin)"),

    "stream_ohlc" -> DeclaredQuery(
      // The flagship corintick aggregation, streaming edition: 30-minute
      // OHLC bars via the same builder StreamingSpec drives over a
      // MemoryStream with a watermark. window() aligns to the epoch, so
      // the oracle reproduces buckets with the shared epoch-floor idiom.
      (s, d) => ohlcAgg(Tables.events(s, d))
        .orderBy(col("bar_ts"), col("event_type")),
      Some("SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 * 1000000) AS bar_ts, " +
        "event_type, first(value ORDER BY ts, event_id) AS open, max(value) AS high, " +
        "min(value) AS low, last(value ORDER BY ts, event_id) AS close, count(*) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY bar_ts, event_type"),
      "30-min OHLC bars per event_type (streaming window agg, batch twin)"),

    "stream_dedup" -> DeclaredQuery(
      // Batch twin of dedupWithinWatermark (the ingest re-delivery
      // guard): the projection is EXACTLY the dedup key, so the batch
      // semantics are DISTINCT — deterministic regardless of which
      // physical row the dedup keeps — and the oracle is plain SELECT
      // DISTINCT. StreamingSpec drives the same builder over a
      // MemoryStream and proves watermark-eviction of the key state.
      (s, d) => dedupWithinWatermark(
          Tables.events(s, d).select(col("ts"), col("user_id"), col("event_type")),
          "10 minutes", Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type")) // dedup keyed exactly on these → already distinct
        .orderBy(col("user_id"), col("event_type")),
      Some("SELECT DISTINCT user_id, event_type FROM events " +
        "ORDER BY user_id, event_type"),
      "streaming dedup by business key (batch twin: distinct survivors)"),

    "stream_join" -> DeclaredQuery(
      // Batch twin of streamIntervalJoin: purchases × same-user views
      // within the trailing 4-hour interval. The equi prefix
      // (user) + bounded event-time range is both the only
      // stream-stream join shape with evictable state AND the batch
      // plan that avoids a cross product (sort-merge with residual).
      (s, d) => {
        val e = Tables.events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("p_id"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
        streamIntervalJoin(p, v, intervalMinutes = 240)
          .select(col("p_id"), col("v_id"), col("p_user"), col("p_ts"), col("v_ts"))
          .orderBy(col("p_id"), col("v_id"))
      },
      Some("SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id AS p_user, " +
        "p.ts AS p_ts, v.ts AS v_ts " +
        "FROM events p JOIN events v ON p.event_type = 'purchase' " +
        "AND v.event_type = 'view' AND v.user_id = p.user_id " +
        "AND v.ts >= p.ts - INTERVAL 240 MINUTE AND v.ts <= p.ts " +
        "ORDER BY p_id, v_id"),
      "stream-stream interval join (batch twin: bounded-range equi join)"),

    "stream_matview" -> DeclaredQuery(
      // CONTINUOUSLY-maintained materialized view: the upstream store
      // takes the same lifecycle as store_incremental_view (base write,
      // upsert with updates + inserts, keyed delete — three manifest
      // versions), but the view is refreshed by MatView.follow tailing
      // the commit STREAM (graft-store-changes source, one micro-batch
      // per version) instead of explicit refresh calls. The batch
      // content is only the trigger; refresh diffs the manifest from
      // the view's own applied-version resume point, so re-delivered
      // or coalesced batches converge identically. Oracle = the full
      // recompute over the final state — same as the batch IVM query,
      // so the two maintenance modes can never drift apart.
      (s, d) => {
        val root = graft.Q.scratchTempDir("stream_matview_")
        val dir = s"$root/store"; val vdir = s"$root/view"
        val base = graft.sources.Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value"), lit(1L).as("version"))
        graft.sources.TsStore.write(base, dir, tsCol = "ts", uidCols = Seq("event_type"))
        graft.sources.StoreLog.ensure(dir)
        val measure = round(col("value") * 10000).cast("long")
        graft.sources.MatView.init(s, dir, vdir,
          groupCols = Seq("user_id"), measureE4 = measure)
        val delta = graft.sources.Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            (col("value") + 1000.0).as("value"), lit(2L).as("version"))
          .unionByName(graft.sources.Tables.events(s, d)
            .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
            .select((col("event_id") + 10000000L).as("event_id"), col("ts"),
              col("user_id"), col("event_type"), col("value"), lit(2L).as("version")))
        graft.sources.TsStore.upsert(s, dir, delta, keyCols = Seq("event_id"),
          versionCol = "version", tsCol = "ts", uidCols = Seq("event_type"))
        graft.sources.TsStore.delete(s, dir,
          col("event_type") === "click" && col("event_id") % 7 === 0,
          tsCol = "ts", uidCols = Seq("event_type"))
        val q = graft.sources.MatView.follow(s, dir, vdir,
          storeKeyCols = Seq("event_id"), storeVersionCol = "version",
          groupCols = Seq("user_id"), measureE4 = measure,
          checkpoint = s"$root/ckpt")
        q.awaitTermination()
        graft.sources.MatView.read(s, vdir, Seq("user_id")).orderBy(col("user_id"))
      },
      Some("WITH fin AS (SELECT event_id, user_id, " +
        "CASE WHEN event_type = 'purchase' AND event_id % 10 = 0 " +
        "THEN value + 1000.0 ELSE value END AS value " +
        "FROM events WHERE NOT (event_type = 'click' AND event_id % 7 = 0) " +
        "UNION ALL SELECT event_id + 10000000, user_id, value FROM events " +
        "WHERE event_type = 'purchase' AND event_id % 97 = 0) " +
        "SELECT user_id, CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_e4, " +
        "count(*) AS cnt FROM fin GROUP BY user_id ORDER BY user_id"),
      "continuously-maintained materialized view: MatView.follow tails the commit stream")
  )
}
