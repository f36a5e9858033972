package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import graft.sources.Tables

/** Native codegen vector expressions vs their HOF twins: bit-identical
  * values (same widening, same accumulation order), same null contract,
  * and SQL-name availability via GraftExtensions.
  */
class VecExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs = {
    val e = Tables.embeddings(spark, TestSpark.sf001)
      .select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    q.crossJoin(e.filter($"vec_id" >= 5 && $"vec_id" < 50))
  }

  test("native dot/normsq/cosine are bit-identical to the HOF spellings") {
    val d = pairs.select(
      VectorOps.dot($"q_emb", $"embedding").as("n_dot"),
      VectorOps.dotHof($"q_emb", $"embedding").as("h_dot"),
      VectorOps.normSq($"embedding").as("n_nsq"),
      VectorOps.normSqHof($"embedding").as("h_nsq"),
      VectorOps.cosine($"q_emb", $"embedding").as("n_cos"),
      VectorOps.cosineHof($"q_emb", $"embedding").as("h_cos"))
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    assert(d.nonEmpty)
    d.foreach { case (nd, hd, nn, hn, nc, hc) =>
      // == not ~=: the contract is identical operation order, not closeness
      assert(nd == hd, s"dot: $nd != $hd")
      assert(nn == hn, s"normSq: $nn != $hn")
      assert(nc == hc, s"cosine: $nc != $hc")
    }
  }

  test("null contract: mismatched lengths and null elements yield null") {
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),      // ok
      (Array(1f, 2f), Array(3f, 4f, 5f))   // length mismatch
    ).toDF("a", "b")
    val out = df.select(VectorOps.dot($"a", $"b").as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(11.0))
    assert(out(1).isEmpty)
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d")
      .as[Option[Double]].collect()
    assert(withNullElem(0).isEmpty)
  }

  test("SQL names registered by GraftExtensions match the DataFrame API") {
    Tables.embeddings(spark, TestSpark.sf001).limit(100)
      .createOrReplaceTempView("ve_emb")
    val sqlRows = spark.sql(
      "SELECT vec_id, round(graft_cosine(embedding, embedding), 6) AS c, " +
        "round(graft_normsq(embedding), 6) AS n FROM ve_emb ORDER BY vec_id")
      .as[(Long, Double, Double)].collect()
    assert(sqlRows.nonEmpty)
    sqlRows.foreach { case (_, c, _) => assert(c == 1.0) } // self-cosine
    val dfRows = Tables.embeddings(spark, TestSpark.sf001).limit(100)
      .select($"vec_id", round(VectorOps.normSq($"embedding"), 6).as("n"))
      .orderBy($"vec_id").as[(Long, Double)].collect()
    assert(sqlRows.map(r => (r._1, r._3)).toSeq == dfRows.toSeq)
  }

  test("wrong SQL arity is a clean analysis error, not an index crash") {
    Tables.embeddings(spark, TestSpark.sf001).limit(1)
      .createOrReplaceTempView("ve_arity")
    Seq("SELECT graft_dot(embedding) FROM ve_arity",
        "SELECT graft_cosine(embedding, embedding, embedding) FROM ve_arity",
        "SELECT graft_normsq(embedding, embedding) FROM ve_arity").foreach { q =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("graft_"), s"$q → ${e.getMessage.take(120)}")
    }
  }

  test("native LSH bucket equals the unrolled Column spelling on every vector") {
    val rows = Tables.embeddings(spark, TestSpark.sf001)
      .select($"vec_id",
        VectorOps.lshBucket($"embedding").as("native"),
        VectorOps.lshBucketUnrolled($"embedding").as("unrolled"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, u) => assert(n == u, s"vec $id: $n != $u") }
    // short vector → every plane zeroed (matches unrolled null-sum planes)
    val short = Seq(Tuple1(Array(1f, 2f))).toDF("v")
      .select(VectorOps.lshBucket($"v").as("b")).as[Long].collect()
    assert(short(0) == 0L)
  }

  test("optimizer rule rewrites graft_dot(a, a) to graft_normsq(a)") {
    val plan = Tables.embeddings(spark, TestSpark.sf001)
      .select(VectorOps.dot($"embedding", $"embedding").as("d"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_normsq") && !plan.contains("graft_dot"), plan)
    // and the rewrite preserves values
    val rows = Tables.embeddings(spark, TestSpark.sf001).limit(50)
      .select(VectorOps.dot($"embedding", $"embedding").as("d"),
        VectorOps.normSq($"embedding").as("n"))
      .as[(Double, Double)].collect()
    rows.foreach { case (d, n) => assert(d == n) }
  }

  test("native expressions stay inside whole-stage codegen (no fallback)") {
    val df = pairs.select(VectorOps.cosine($"q_emb", $"embedding").as("c"))
    df.collect() // finalize the AQE plan so codegen markers are visible
    val plan = df.queryExecution.executedPlan.toString
    // the Project carrying the expression must sit under WholeStageCodegen
    assert(plan.contains("*(") && plan.contains("graft_cosine"),
      s"expected the expression inside a WholeStageCodegen stage in:\n$plan")
    val hofPlan = pairs.select(VectorOps.cosineHof($"q_emb", $"embedding").as("c"))
    // cross-check: both produce identical results over the same input
    val a = pairs.select(VectorOps.cosine($"q_emb", $"embedding")).as[Double].collect().sorted
    val b = hofPlan.select("c").as[Double].collect().sorted
    assert(a.sameElements(b))
  }
}
