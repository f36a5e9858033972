package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error bound for the no-oracle agg_percentile_approx (same pattern as
  * the agg_hll accuracy check in LlmOpsSpec): the GK sketch at accuracy
  * 10000 guarantees rank error ≤ n/10000, which at fixture sizes must
  * land each approximate percentile within a tight relative band of the
  * exact interpolated value from agg_percentile.
  */
class PercentileApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx percentiles within 1% of exact per return flag") {
    val approx = Registry.all("agg_percentile_approx").fn(spark, TestSpark.sf001)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = Registry.all("agg_percentile").fn(spark, TestSpark.sf001)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (e50, e95, e99)) =>
      val (a50, a95, a99) = approx(flag)
      Seq(("p50", a50, e50), ("p95", a95, e95), ("p99", a99, e99)).foreach {
        case (name, a, e) =>
          assert(math.abs(a - e) / e <= 0.01,
            s"$flag $name: approx $a vs exact $e (>1% off)")
      }
    }
  }

  test("rows-only shape: one row per return flag, ordered") {
    val rows = Registry.all("agg_percentile_approx").fn(spark, TestSpark.sf001).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
  }
}
