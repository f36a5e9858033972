package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.{StoreLog, TsStore}

/** The store as a NATIVE streaming sink — `writeStream.format("graft-
  * store")` lands micro-batches as manifest-committed store writes with
  * no user-written foreachBatch:
  *
  * {{{
  *   df.writeStream.format("graft-store")
  *     .option("path", dir).option("tsCol", "ts").option("uids", "sym")
  *     .option("feedId", "ticks")                       // append (default)
  *     .start()
  *
  *   df.writeStream.format("graft-store")
  *     .option("path", dir).option("mode", "upsert")
  *     .option("keys", "event_id").option("versionCol", "version")
  *     .option("uids", "event_type")
  *     .start()
  * }}}
  *
  * Exactly-once matches the [[StoreIngest]] contracts it wraps:
  * `mode=append` tags each batch's manifest commit `<feedId>-<batchId>`
  * and a re-delivered batch finds its tag ([[StoreLog.findTag]]) and
  * skips — the public Delta/Iceberg txn-appId design; `mode=upsert`
  * converges through latest-wins merge (re-delivered rows map onto the
  * same winners), versioned by the DATA's `versionCol`. Both paths
  * auto-compact partitions over `autoCompact` files (append defaults
  * on — steady append ingest accretes one file set per batch forever;
  * upsert rewrites its touched partitions and defaults off).
  *
  * Implementation note: the v1 `Sink.addBatch` seam (the one every
  * table format shipped its streaming sink through before DSv2 write
  * support matured) — one method per micro-batch, the incoming frame
  * re-wrapped as a batch DataFrame before the store's ordinary logged
  * write paths re-plan it. Options, not schema state: the sink is
  * stateless, the store's manifest carries everything.
  */
class GraftStoreSinkProvider extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-store"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-store sink needs a store path: .option(\"path\", dir)"))
    val tsCol = parameters.getOrElse("tsCol", "ts")
    // .partitionBy(...) on the writer and .option("uids", ...) are the
    // same declaration; the option wins when both appear
    val uids = parameters.get("uids")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(partitionColumns)
    val mode = parameters.getOrElse("mode", "append").toLowerCase
    mode match {
      case "append" =>
        new GraftAppendSink(path, tsCol, uids,
          feedId = parameters.getOrElse("feedId", "feed"),
          autoCompact = parameters.get("autoCompact").map(_.toInt).orElse(Some(8)),
          checkpointInterval = parameters.get("checkpointInterval").map(_.toInt))
      case "upsert" =>
        val keys = parameters.getOrElse("keys",
          throw new IllegalArgumentException(
            "graft-store upsert sink needs .option(\"keys\", \"k1,k2\")"))
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        new GraftUpsertSink(path, tsCol, uids, keys,
          versionCol = parameters.getOrElse("versionCol",
            throw new IllegalArgumentException(
              "graft-store upsert sink needs .option(\"versionCol\", col)")),
          autoCompact = parameters.get("autoCompact").map(_.toInt),
          checkpointInterval = parameters.get("checkpointInterval").map(_.toInt))
      case other => throw new IllegalArgumentException(
        s"graft-store sink mode must be append|upsert, got '$other'")
    }
  }
}

/** Append-only native sink: one TAGGED manifest commit per non-empty
  * batch; re-delivered batches skip on their tag. The exactly-once
  * mechanism is the MANIFEST's (findTag), not the checkpoint's — a
  * fresh checkpoint replaying the source still converges.
  */
private[streaming] class GraftAppendSink(path: String, tsCol: String,
    uids: Seq[String], feedId: String, autoCompact: Option[Int],
    checkpointInterval: Option[Int]) extends Sink {

  StoreLog.ensure(path,
    checkpointInterval.getOrElse(StoreLog.CheckpointInterval))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val tag = s"$feedId-$batchId"
    val df = org.apache.spark.sql.GraftShim.batchDf(data)
    if (!df.isEmpty && StoreLog.findTag(path, tag).isEmpty) {
      TsStore.write(df, path, tsCol = tsCol, uidCols = uids,
        mode = SaveMode.Append,
        overlapPolicy = TsStore.OverlapPolicy.Allow,
        commitTag = Some(tag))
      autoCompact.foreach(cap =>
        StoreIngest.autoCompact(df.sparkSession, path, cap, tsCol, uids))
    }
  }
}

/** Latest-wins upsert native sink: per batch one partition-pruned,
  * manifest-committed MERGE ([[TsStore.upsert]]); idempotent under
  * re-delivery because versions come from the data.
  */
private[streaming] class GraftUpsertSink(path: String, tsCol: String,
    uids: Seq[String], keys: Seq[String], versionCol: String,
    autoCompact: Option[Int], checkpointInterval: Option[Int]) extends Sink {

  checkpointInterval.foreach(i => StoreLog.ensure(path, i))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val df = org.apache.spark.sql.GraftShim.batchDf(data)
    if (!df.isEmpty) {
      TsStore.upsert(df.sparkSession, path, df,
        keyCols = keys, versionCol = versionCol,
        tsCol = tsCol, uidCols = uids)
      autoCompact.foreach(cap =>
        StoreIngest.autoCompact(df.sparkSession, path, cap, tsCol, uids))
    }
  }
}
