package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomFilter
import graft.sources.Tables

/** The clean-room Bloom aggregator + Column probe: zero false negatives
  * (the correctness-critical property — a false negative would make
  * join_bloom drop real matches), bounded false-positive rate, and the
  * plan shapes the scaladoc claims.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bloomOver(keys: org.apache.spark.sql.DataFrame, keyCol: String,
                        mBits: Int = BloomFilter.DefaultBits) = {
    val (h1, h2) = BloomFilter.probes(col(keyCol))
    val agg = udaf(BloomFilter.agg(mBits), Encoders.product[BloomFilter.Probes])
    keys.select(h1.as("h1"), h2.as("h2"))
      .agg(agg(col("h1"), col("h2")).as("bf"))
      .select(col("bf.bits").as("__bits"))
  }

  test("no false negatives: every inserted key probes true") {
    val dim = Tables.customer(spark, TestSpark.sf001)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val misses = dim.join(broadcast(bloomOver(dim, "c_custkey")))
      .filter(!BloomFilter.mightContain($"__bits", $"c_custkey"))
      .count()
    assert(misses == 0L)
  }

  test("probe derives m from the bitmap itself — non-default sizing stays exact") {
    val members = spark.range(0, 500).select(($"id" * 3).as("k"))
    val misses = members.join(broadcast(bloomOver(members, "k", mBits = 1 << 12)))
      .filter(!BloomFilter.mightContain($"__bits", $"k"))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate stays tiny at the declared sizing") {
    // members: even longs 0..2k; probes: odd longs (all non-members)
    val members = spark.range(0, 2000).select(($"id" * 2).as("k"))
    val probesDf = spark.range(0, 50000).select(($"id" * 2 + 1).as("k"))
    val fp = probesDf.join(broadcast(bloomOver(members, "k")))
      .filter(BloomFilter.mightContain($"__bits", $"k"))
      .count()
    // 2k keys in 2^17 bits with K=5 → expected fpp ~1e-5; allow 100×
    assert(fp <= 50, s"false positives: $fp / 50000")
  }

  test("join_bloom: probe actually prunes the fact side pre-join") {
    val all = Tables.orders(spark, TestSpark.sf001).count()
    val dim = Tables.customer(spark, TestSpark.sf001)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val kept = Tables.orders(spark, TestSpark.sf001)
      .join(broadcast(bloomOver(dim, "c_custkey")))
      .filter(BloomFilter.mightContain($"__bits", $"o_custkey"))
      .count()
    // BUILDING is ~1/5 of customers — the bloom must drop most orders
    assert(kept < all / 2, s"bloom kept $kept of $all fact rows")
  }

  test("plan: build is an ObjectHashAggregate, probe stays in codegen") {
    val df = Registry.all("join_bloom").fn(spark, TestSpark.sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(!p.toLowerCase.contains("batchevalpython"))
  }
}
