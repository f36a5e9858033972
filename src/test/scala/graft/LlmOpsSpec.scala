package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps
import graft.sources.Tables

/** Property checks for the no-oracle LLM ops (SURVEY §5.2.3). */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact shingle-set Jaccard for ALL pairs, computed on the driver —
    * fine at sf0.001 (500 docs), the ground truth for recall checks.
    */
  private lazy val exactPairs: Map[(Long, Long), Double] = {
    val sets = TextOps.docShingles(Tables.documents(spark, TestSpark.sf001), 3)
      .groupBy("doc_id").agg(collect_set("sh").as("shs"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, shs) => id -> shs.toSet }.sortBy(_._1)
    (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      inter = (sa & sb).size
      if inter > 0
    } yield (a, b) -> inter.toDouble / (sa | sb).size).toMap
  }

  test("MinHash-LSH candidates cover every pair with exact Jaccard >= 0.8") {
    val got = Registry.all("llm_dedup_near").fn(spark, TestSpark.sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val want = exactPairs.collect { case (p, j) if j >= 0.8 => p }.toSet
    assert(want.nonEmpty, "fixture should contain planted near-dups")
    assert(want.subsetOf(got),
      s"missed ${ (want -- got).take(5) } of ${want.size} true near-dup pairs")
  }

  test("llm_dedup_near reported jaccard equals exact jaccard") {
    val got = Registry.all("llm_dedup_near").fn(spark, TestSpark.sf001)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    got.foreach { case (a, b, j) =>
      assert(math.abs(j - exactPairs((a, b))) < 1e-5)
    }
  }

  test("simhash near-dup pairs are exactly the high-similarity pairs at sf0.001") {
    val got = Registry.all("llm_dedup_simhash").fn(spark, TestSpark.sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every reported pair should be genuinely similar (exact jaccard high)
    got.foreach { p =>
      assert(exactPairs.getOrElse(p, 0.0) >= 0.3,
        s"simhash pair $p has low true similarity ${exactPairs.getOrElse(p, 0.0)}")
    }
  }

  test("LSH hot-bucket cap: a planted mega-bucket cannot go quadratic") {
    // 1000 docs sharing one band value — the boilerplate bucket every real
    // corpus produces; uncapped it alone yields 499_500 candidate pairs.
    val mega = (0 until 1000).map(i => (i.toLong, 777L))
    val small = (0 until 10).flatMap(p =>
      Seq((2000L + 2 * p, 1000L + p), (2001L + 2 * p, 1000L + p)))
    val bands = (mega ++ small).toDF("doc_id", "b")
    val capped = Q.capBuckets(bands, "b", cap = 64)
    assert(capped.filter($"b" === 777L).count() == 0, "mega-bucket must be dropped")
    assert(capped.count() == small.size, "small buckets must survive intact")
    val cand = capped.as("x").join(capped.as("y"),
      $"x.b" === $"y.b" && $"x.doc_id" < $"y.doc_id")
    assert(cand.count() == 10, "candidates stay O(n) after the cap")
  }

  test("hot-bucket cap leaves the fixture's dedup outputs unchanged") {
    // At fixture scale no bucket comes near the cap, so the guard must be
    // a no-op on results: the recall/exactness tests above plus this row
    // sanity pin that the capped queries still surface the planted dups.
    val near = Registry.all("llm_dedup_near").fn(spark, TestSpark.sf001).count()
    val sim = Registry.all("llm_dedup_simhash").fn(spark, TestSpark.sf001).count()
    assert(near > 0 && sim > 0)
  }

  test("hll approx distinct within 5% of exact per event_type") {
    val approx = Registry.all("agg_hll").fn(spark, TestSpark.sf001)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, TestSpark.sf001)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.05, s"$k: ${approx(k)} vs $n")
    }
  }

  test("hll daily-sketch union reaggregates to within 5% of exact totals") {
    val approx = Registry.all("agg_hll_union").fn(spark, TestSpark.sf001)
      .select("event_type", "approx_users")
      .as[(String, Double)].collect().toMap
    val exact = Tables.events(spark, TestSpark.sf001)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) / n <= 0.05, s"$k: ${approx(k)} vs $n")
    }
  }

  test("ann results: 8 query groups, ranks bounded, scores in [-1,1]") {
    val rows = Registry.all("llm_ann_lsh").fn(spark, TestSpark.sf001)
      .select(col("q_id"), col("rnk"), col("cos")).collect()
    assert(rows.map(_.getLong(0)).toSet === (0L until 8L).toSet)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 3)
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("cosine is symmetric and self-similarity is 1") {
    val e = Tables.embeddings(spark, TestSpark.sf001).limit(20)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val f = e.select(col("id_a").as("id_b"), col("ea").as("eb"))
    val pairs = e.crossJoin(f)
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorOps.cosine(col("ea"), col("eb")).as("c"))
      .as[(Long, Long, Double)].collect()
    val m = pairs.map { case (a, b, c) => (a, b) -> c }.toMap
    pairs.foreach { case (a, b, c) =>
      assert(math.abs(c - m((b, a))) < 1e-12)
      if (a == b) assert(math.abs(c - 1.0) < 1e-9)
    }
  }
}
