package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bundles

/** The reference-shaped client facade: named series in collections,
  * append-write, sliced read with metadata filters, uid listing.
  */
class BundlesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("corintick-shaped workflow: write two series, slice, filter meta, list") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_bundles").toString
    val ct = new Bundles(spark, base)

    val aapl = Seq(
      (ts("2024-01-01 09:30:00"), 100.0), (ts("2024-01-01 09:31:00"), 101.0),
      (ts("2024-01-01 09:32:00"), 102.0)).toDF("ts", "price")
    val msft = Seq(
      (ts("2024-01-01 09:30:00"), 400.0), (ts("2024-01-01 09:31:00"), 401.0))
      .toDF("ts", "price")

    ct.write("AAPL", aapl, metadata = Map("source" -> "nyse"))
    ct.write("MSFT", msft, metadata = Map("source" -> "nasdaq"))
    // second chunk for AAPL — append like a later corintick write
    ct.write("AAPL", Seq((ts("2024-01-01 09:33:00"), 103.0)).toDF("ts", "price"),
      metadata = Map("source" -> "nyse"))

    // full read of one uid
    assert(ct.read("AAPL").count() === 4)
    // inclusive slice
    val sliced = ct.read("AAPL", start = Some(ts("2024-01-01 09:31:00")),
      end = Some(ts("2024-01-01 09:32:00")))
    assert(sliced.count() === 2)
    // projection keeps ts + requested columns
    assert(ct.read("AAPL", columns = Seq("price")).columns.toSeq === Seq("ts", "price"))
    // metadata filter
    assert(ct.read("AAPL", meta = Map("source" -> "nasdaq")).count() === 0)
    assert(ct.read("MSFT", meta = Map("source" -> "nasdaq")).count() === 2)
    // listing
    val uids = ct.listUids().orderBy("__uid").collect()
    assert(uids.map(_.getString(0)).toSeq === Seq("AAPL", "MSFT"))
    assert(uids.map(_.getAs[Long]("n_rows")).toSeq === Seq(4L, 2L))
    // uid filter prunes partitions at plan time
    val plan = ct.read("AAPL").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }
}
