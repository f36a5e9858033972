package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Streams, Tick}

/** The streaming state surface under the RocksDB StateStore provider —
  * the 100 TB insurance for every op whose keyed state outgrows executor
  * heap (dedup key sets, stream-stream join buffers, per-key LOCF
  * state): the default HDFS-backed provider holds ALL state on-heap, the
  * RocksDB provider spills it to local disk with bounded memory (the
  * public Spark production recommendation for large-state queries).
  * These cases replay the state-heavy StreamingSpec shapes with the
  * provider flipped and PIN that RocksDB actually engaged (rocksdb*
  * custom metrics on the state operators) — provider-portability proof,
  * not a second copy of the semantics suite.
  *
  * Caveat pinned by construction: the provider class is baked into a
  * query's CHECKPOINT at first start (OffsetSeqMetadata) — the restart
  * case runs both runs under the flipped conf, matching how a real
  * deployment must flip it (new checkpoint or both-runs-same-provider).
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val old = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally old match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** Proof the query's state operators ran on RocksDB: the provider
    * exports rocksdb* custom metrics the HDFS-backed one never emits.
    */
  private def assertRocksDbEngaged(q: StreamingQuery): Unit = {
    val ops = q.recentProgress.flatMap(_.stateOperators)
    assert(ops.nonEmpty, "the query must have state operators")
    assert(ops.exists(_.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb"))),
      s"state operators must report rocksdb metrics, got: " +
        ops.flatMap(_.customMetrics.keySet.asScala).distinct.mkString(","))
  }

  test("dedupWithinWatermark: bounded keyed dedup state on RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[(Timestamp, Long, Double)]
      val deduped = Streams.dedupWithinWatermark(
        input.toDF().toDF("ts", "doc_id", "value"), "10 minutes", Seq("doc_id"))
      val q = deduped.writeStream.format("memory").queryName("rdb_dd")
        .outputMode("append").start()
      try {
        input.addData(
          (ts("2024-01-01 10:00:00"), 1L, 1.0),
          (ts("2024-01-01 10:01:00"), 1L, 1.0),
          (ts("2024-01-01 10:02:00"), 2L, 2.0))
        q.processAllAvailable()
        input.addData((ts("2024-01-01 10:03:00"), 1L, 1.0),
          (ts("2024-01-01 10:04:00"), 3L, 3.0))
        q.processAllAvailable()
        // advance event time far enough that key 1's state is evicted,
        // then re-deliver: the post-eviction row is allowed back
        input.addData((ts("2024-01-01 11:00:00"), 9L, 9.0))
        q.processAllAvailable()
        input.addData((ts("2024-01-01 10:59:00"), 1L, 10.0))
        q.processAllAvailable()
        val ids = spark.table("rdb_dd").as[(Timestamp, Long, Double)]
          .collect().toSeq.map(_._2)
        assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1 &&
          ids.count(_ == 9L) == 1)
        assert(ids.count(_ == 1L) == 2,
          "watermark-window dedup + post-eviction readmission must hold on RocksDB")
        assertRocksDbEngaged(q)
      } finally q.stop()
    }
  }

  test("stream-stream interval join buffers across micro-batches on RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val pIn = MemoryStream[(Timestamp, Long, Long)]
      val vIn = MemoryStream[(Timestamp, Long, Long)]
      val joined = Streams.streamIntervalJoin(
        pIn.toDF().toDF("p_ts", "p_user", "p_id"),
        vIn.toDF().toDF("v_ts", "v_user", "v_id"))
        .select($"p_id", $"v_id")
      val q = joined.writeStream.format("memory").queryName("rdb_ssj")
        .outputMode("append").start()
      try {
        vIn.addData((ts("2024-01-01 10:00:00"), 1L, 11L),
          (ts("2024-01-01 10:08:00"), 1L, 12L),
          (ts("2024-01-01 09:30:00"), 1L, 13L),
          (ts("2024-01-01 10:05:00"), 2L, 21L))
        q.processAllAvailable()
        pIn.addData((ts("2024-01-01 10:09:00"), 1L, 100L))
        q.processAllAvailable()
        val rows = spark.table("rdb_ssj").as[(Long, Long)].collect().toSet
        assert(rows == Set((100L, 11L), (100L, 12L)),
          "cross-batch join buffering must hold on RocksDB")
        assertRocksDbEngaged(q)
      } finally q.stop()
    }
  }

  test("LOCF flatMapGroupsWithState: carry + event-time expiry on RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Tick]
      val ticks = input.toDS().withWatermark("ts", "0 seconds").as[Tick]
      val q = Streams.locfPerKey(ticks, expireAfter = Some("30 minutes"))
        .writeStream.format("memory").queryName("rdb_locf")
        .outputMode("append").start()
      try {
        input.addData(Tick(1L, ts("2024-01-01 10:00:00"), Some(5.0)),
          Tick(1L, ts("2024-01-01 10:01:00"), None))
        q.processAllAvailable()
        input.addData(Tick(2L, ts("2024-01-01 12:00:00"), Some(1.0)))
        q.processAllAvailable()
        input.addData(Tick(2L, ts("2024-01-01 12:10:00"), None))
        q.processAllAvailable()
        input.addData(Tick(1L, ts("2024-01-01 12:20:00"), None))
        q.processAllAvailable()
        val k1 = spark.table("rdb_locf").as[(Long, Timestamp, Option[Double])]
          .collect().filter(_._1 == 1L).sortBy(_._2.getTime).map(_._3)
        assert(k1.toSeq === Seq(Some(5.0), Some(5.0), None),
          "carry-across-batches + expired-state-must-not-leak must hold on RocksDB")
        assertRocksDbEngaged(q)
      } finally q.stop()
    }
  }

  test("checkpoint restart resumes RocksDB-backed window state") {
    import spark.implicits._
    withRocksDb {
      val root = java.nio.file.Files.createTempDirectory("graft_rdb_fsrc").toString
      val schema = "ts TIMESTAMP, event_type STRING, event_id LONG, value DOUBLE"
      def startQuery() = {
        val src = spark.readStream.schema(schema).parquet(s"$root/src")
        Streams.ohlcAgg(src.withWatermark("ts", "10 minutes"))
          .writeStream.format("parquet")
          .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      Seq((ts("2024-01-01 10:05:00"), "view", 1L, 1.0),
          (ts("2024-01-01 10:20:00"), "view", 2L, 2.0))
        .toDF("ts", "event_type", "event_id", "value")
        .write.mode("append").parquet(s"$root/src")
      val q1 = startQuery(); q1.awaitTermination()
      assertRocksDbEngaged(q1)
      Seq((ts("2024-01-01 12:00:00"), "click", 3L, 5.0))
        .toDF("ts", "event_type", "event_id", "value")
        .write.mode("append").parquet(s"$root/src")
      val q2 = startQuery(); q2.awaitTermination()
      val rows2 = q2.recentProgress.map(_.numInputRows).sum
      assert(rows2 === 1, s"restart reprocessed committed files ($rows2 rows)")
      val out = spark.read.parquet(s"$root/out")
        .select("bar_ts", "event_type", "open", "high", "low", "close", "n")
        .as[(Timestamp, String, Double, Double, Double, Double, Long)]
        .collect().toSeq
      assert(out === Seq((ts("2024-01-01 10:00:00"), "view", 1.0, 2.0, 1.0, 2.0, 2L)),
        s"restart lost or duplicated RocksDB-checkpointed window state: $out")
    }
  }
}
