package graft

import org.apache.spark.sql.SparkSession

/** Child-process entry for the CROSS-PROCESS streaming proof: a separate
  * JVM with its OWN SparkSession tails the parent's store through the
  * `graft-store-changes` source ([[graft.streaming.StoreIngest.follow]],
  * AvailableNow) into a downstream store, resuming from whatever the
  * shared checkpoint says. Everything the single-process StreamingSpec
  * proves — per-version batches, latest-wins convergence, checkpointed
  * resume — is exercised here with no shared JVM state: fresh
  * FileSystem instances, fresh manifest reads, a checkpoint written by
  * one process and resumed by another. Exit 0 = the run completed.
  */
object XProcFollowMain {
  def main(args: Array[String]): Unit = {
    val Array(srcPath, dstPath, checkpoint) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("xproc-follow")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val q = graft.streaming.StoreIngest.follow(spark, srcPath, dstPath,
        keyCols = Seq("event_id"), versionCol = "version",
        tsCol = "ts", uidCols = Seq("event_type"),
        checkpoint = checkpoint)
      q.awaitTermination()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"xproc-follow failed: $e")
        sys.exit(5)
    } finally spark.stop()
  }
}
