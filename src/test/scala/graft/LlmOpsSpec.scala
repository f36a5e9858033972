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

  test("LSH hot-bucket guard: a planted mega-bucket yields linear star edges, not B²") {
    // 1000 docs sharing one band value — the boilerplate bucket every real
    // corpus produces; uncapped it alone yields 499_500 candidate pairs.
    val mega = (0 until 1000).map(i => (i.toLong, 777L))
    val small = (0 until 10).flatMap(p =>
      Seq((2000L + 2 * p, 1000L + p), (2001L + 2 * p, 1000L + p)))
    val bands = (mega ++ small).toDF("doc_id", "b")
    val cand = Q.bucketCandidates(bands, "b", "doc_id", cap = 64)
    // over-cap bucket → B-1 star edges anchored at the min id, O(B) not B²
    val megaPairs = cand.filter($"doc_b" < 2000L)
    assert(megaPairs.count() === 999)
    assert(megaPairs.filter($"doc_a" =!= 0L).count() === 0,
      "star edges must anchor at the bucket's canonical (min) id")
    // under-cap buckets keep exact all-pairs semantics
    assert(cand.filter($"doc_b" >= 2000L).count() === 10)
    // the A/B drop variant reproduces the old guard: mega-bucket vanishes
    assert(Q.bucketCandidates(bands, "b", "doc_id", cap = 64, salvage = false)
      .count() === 10)
  }

  test("over-cap salvage: a 200-member dup cluster collapses to one survivor; dropping fragments it") {
    // 200 near-identical docs (40 shared tokens + a unique suffix):
    // pairwise shingle Jaccard ≈ 0.86, and every LSH band bucket holds
    // ~200 members — far over the 64 cap, the case where drop semantics
    // lose the cluster entirely.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 200).map(i => (i.toLong, s"$base suffix$i"))
      .toDF("doc_id", "text")
    val linked = graft.operators.Llm.minhashDupPairs(docs, tau = 0.5)
    val labels = graft.operators.Llm.connectedComponents(
      linked.select($"doc_a".as("u"), $"doc_b".as("v"))).collect()
    assert(labels.length === 200, "salvage must link every cluster member")
    assert(labels.map(_.getLong(1)).toSet === Set(0L),
      "the cluster must collapse to its canonical min-id survivor")
    // A/B: with drop semantics the over-cap buckets vanish and the
    // cluster fragments — most members get no edge at all
    val dropped = graft.operators.Llm.minhashDupPairs(docs, tau = 0.5, salvage = false)
    val droppedNodes = graft.operators.Llm.connectedComponents(
      dropped.select($"doc_a".as("u"), $"doc_b".as("v"))).count()
    assert(droppedNodes < 200,
      s"drop semantics unexpectedly covered all 200 members ($droppedNodes)")
  }

  test("planted far-apart dup pair: window-bounded clusters miss it, LSH clusters catch it") {
    // Near-identical docs whose ids differ by ≫200 — outside
    // jaccardDupPairs' candidate window, so llm_dup_clusters is blind to
    // the pair by construction; the MinHash edge set has no id-locality
    // assumption and must resolve it.
    val base = (1 to 25).map(i => s"word$i").mkString(" ")
    val docs = (Seq((0L, s"$base ending"), (100000L, s"$base finale")) ++
      (1 to 20).map(i => (i.toLong, (1 to 30).map(j => s"filler${i}_$j").mkString(" "))))
      .map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_far").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val windowed = Registry.all("llm_dup_clusters").fn(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(!windowed.contains(100000L),
      "the id-window edge source should miss the far-apart pair (else this pin is stale)")
    val lsh = Registry.all("llm_dup_clusters_lsh").fn(spark, dir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(lsh.get(0L).contains(0L) && lsh.get(100000L).contains(0L),
      s"LSH clusters must link the far-apart pair to canonical 0: $lsh")
  }

  test("hot-bucket guard leaves the fixture's dedup outputs unchanged") {
    // At fixture scale no bucket comes near the cap, so the guard must be
    // a no-op on results: the recall/exactness tests above plus this row
    // sanity pin that the guarded queries still surface the planted dups.
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

  test("IVF index with Lloyd refinement keeps the layout and probe contract") {
    // Training quality is orthogonal to the access path: a k-means-
    // refined build must produce the same index SHAPE (K centroids,
    // every vector in exactly one cell-partitioned list) and the probe
    // must still answer every query with bounded ranks.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_lloyd").toString
    val e = Tables.embeddings(spark, TestSpark.sf001)
    graft.sources.IvfIndex.build(e, dir, k = 16, lloydRounds = 2)
    assert(spark.read.parquet(s"$dir/centroids").count() === 16)
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() === e.count())
    assert(cells.select("vec_id").distinct().count() === e.count())
    val queries = e.filter(col("vec_id") >= 16 && col("vec_id") < 24)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val res = graft.sources.IvfIndex.probe(spark, dir, queries, nprobe = 2, topK = 3)
      .collect()
    assert(res.map(_.getAs[Long]("q_id")).toSet === (16L until 24L).toSet)
    res.foreach(r => assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 3))
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

  test("cms token counts are overestimate-only within eps*N of exact") {
    val got = Registry.all("llm_cms_counts").fn(spark, TestSpark.sf001)
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val exact = Tables.documents(spark, TestSpark.sf001)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").count()
      .as[(String, String, Long)].collect()
      .map { case (l, t, n) => (l, t) -> n }.toMap
    got.foreach { case (lang, tok, est, nTokens) =>
      val ex = exact.getOrElse((lang, tok), 0L)
      assert(est >= ex, s"CMS underestimated ($lang,$tok): $est < $ex")
      assert(est <= ex + math.ceil(0.001 * nTokens).toLong,
        s"CMS violated the eps*N bound ($lang,$tok): est=$est exact=$ex n=$nTokens")
    }
  }

  test("boundedCellPairs: a planted mega-cell emits n·cap pairs, not n²; small cells stay exact") {
    val n = 600; val cap = 100
    val mega = spark.range(n).select(col("id").as("vec_id"), lit(0L).as("cell"))
    val small = spark.range(50).select((col("id") + 10000L).as("vec_id"), lit(1L).as("cell"))
    val df = mega.unionByName(small)
    val capped = graft.Q.boundedCellPairs(df, "cell", "vec_id", cap)
    // each rank-r row compares to its min(r-1, cap) nearest predecessors
    val expectMega = (0 until n).map(r => math.min(r, cap).toLong).sum
    assert(capped.filter(col("cell") === 0L).count() === expectMega)
    assert(expectMega < n.toLong * (n - 1) / 2 / 3,
      "cap did not bound the mega-cell meaningfully below quadratic")
    // an under-cap cell is the exact all-pairs self-join
    assert(capped.filter(col("cell") === 1L).count() === 50L * 49 / 2)
    // and raising the cap past the cell size recovers exact everywhere
    val exact = graft.Q.boundedCellPairs(df, "cell", "vec_id", n)
    assert(exact.filter(col("cell") === 0L).count() === n.toLong * (n - 1) / 2)
  }

  test("semdedup cap leaves the fixture result identical to unbounded all-pairs") {
    import graft.functions.VectorOps
    import graft.sources.IvfIndex
    val declared = Registry.all("llm_semdedup").fn(spark, TestSpark.sf001)
    // the same pipeline with the rank bound effectively OFF (cap ≫ n):
    // any difference means some fixture cell exceeded the declared cap —
    // i.e. the oracle-checked semantics silently changed
    val cells = IvfIndex.assign(Tables.embeddings(spark, TestSpark.sf001), 16)
      .withColumn("nrm", VectorOps.norm(col("embedding")))
    val scored = graft.Q.boundedCellPairs(cells, "cell", "vec_id", 1 << 20)
      .select(col("vec_id_a").as("id_a"), col("vec_id_b").as("id_b"),
        round(VectorOps.dot(col("embedding_a"), col("embedding_b")) /
          (col("nrm_a") * col("nrm_b")), 6).as("cos"))
    val dominated = graft.Q
      .aggFilterBarrier(scored, Seq("id_a", "id_b"), "cos", col("cos") >= 0.3)
      .select(col("id_b"), lit(1).as("__dom")).distinct()
    val unbounded = cells.select(col("vec_id"), col("cell"))
      .join(dominated, col("vec_id") === col("id_b"), "left")
      .select(col("vec_id"), col("cell"), col("__dom").isNull.as("keep"))
    assert(declared.count() === unbounded.count())
    assert(declared.except(unbounded).count() === 0)
    assert(unbounded.except(declared).count() === 0)
  }
}
