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
