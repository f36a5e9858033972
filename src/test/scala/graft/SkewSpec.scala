package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation / replicated salted join must equal their
  * plain spellings on a synthetically skewed dataset (one key holds 90%
  * of rows).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val skewed = {
    import spark.implicits._
    val hot = (1 to 9000).map(i => ("hot", i.toLong, i * 0.5))
    val cold = (1 to 1000).map(i => (s"k${i % 50}", i.toLong, i * 2.0))
    (hot ++ cold).toDF("key", "id", "v")
  }

  test("saltedAgg(sum, count) equals plain groupBy on a 90%-skewed key") {
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val salted = Q.saltedAgg(skewed, Seq("key"), buckets = 8,
      partials = Seq(sum("v").as("psv"), count(lit(1)).as("pn")),
      merges = Seq(sum("psv").as("sv"), sum("pn").as("n")))
    assert(salted.count() === plain.count())
    // compare on rounded sums (salting changes double add order)
    val p = plain.select(col("key"), round(col("sv"), 6).as("sv"), col("n"))
    val s = salted.select(col("key"), round(col("sv"), 6).as("sv"),
      col("n").cast("long").as("n"))
    assert(s.except(p).count() === 0 && p.except(s).count() === 0)
  }

  test("join_range shape stays linear and equi-keyed under a planted hot user") {
    import spark.implicits._
    // One user owns EVERY row — the worst key skew a bounded-range join
    // can see. 20k alternating purchase/view ticks one minute apart:
    // uncapped, the hot key's P×V pair space is 10^8; the ±5-minute band
    // must bound actual output to ~6 matches per purchase (the views at
    // ±1/±3/±5 min), i.e. linear in input, and the join itself must plan
    // as a shuffled EQUI join on user_id (band as a post-join condition),
    // never a nested loop — so AQE's skew-split can still carve the hot
    // partition at scale.
    val n = 20000
    val baseMs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ticks = (0 until n).map { i =>
      (i.toLong, new java.sql.Timestamp(baseMs + i * 60000L), 1L,
        if (i % 2 == 0) "purchase" else "view")
    }.toDF("event_id", "ts", "user_id", "event_type")
    val p = ticks.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
    val v = ticks.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
    val joined = p.join(v, $"user_id" === $"v_user" &&
      $"v_ts" >= $"p_ts" - expr("INTERVAL 5 MINUTES") &&
      $"v_ts" <= $"p_ts" + expr("INTERVAL 5 MINUTES"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"hot-user band join fell back to a non-equi plan:\n${plan.take(800)}")
    val out = joined.count()
    // exact: interior purchases match 6 views; the 3 edge purchases on
    // each side match fewer — far under the 10^8 uncapped pair space
    assert(out <= 6L * n / 2, s"band join output not linear: $out")
    assert(out >= 5L * n / 2, s"band join lost matches: $out")
  }

  test("saltedJoin equals plain join on the skewed key") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .map(k => (k, s"name_$k")).toDF("key", "name")
    val plain = skewed.join(dim, Seq("key")).select("key", "id", "name")
    val salted = Q.saltedJoin(skewed, dim, "key", buckets = 8)
      .select("key", "id", "name")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
  }
}
