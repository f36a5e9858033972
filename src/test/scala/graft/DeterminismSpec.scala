package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Offset, Project, Sort}
import org.scalatest.funsuite.AnyFunSuite

/** Contract meta-test (SURVEY §0 determinism rules): EVERY declared query
  * must end in a global total-order Sort — the property the driver's
  * positional hash-compare rests on. Catches a future query that forgets
  * its ORDER BY at declaration time instead of as a flaky hash mismatch.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def endsInGlobalSort(p: LogicalPlan): Boolean = p match {
    case s: Sort => s.global
    case l: GlobalLimit => endsInGlobalSort(l.child)
    case l: LocalLimit => endsInGlobalSort(l.child)
    case o: Offset => endsInGlobalSort(o.child)
    case pr: Project => endsInGlobalSort(pr.child)
    case _ => false
  }

  /** An UNGROUPED global aggregate yields exactly one row — trivially
    * totally ordered, an ORDER BY would be dead weight.
    */
  private def isGlobalAggregate(p: LogicalPlan): Boolean = p match {
    case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
      a.groupingExpressions.isEmpty
    case pr: Project => isGlobalAggregate(pr.child)
    case _ => false
  }

  test("every declared query plan ends in a global ORDER BY") {
    val bad = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q.fn(spark, TestSpark.sf001).queryExecution.analyzed
      if (endsInGlobalSort(plan) || isGlobalAggregate(plan)) None else Some(name)
    }
    assert(bad.isEmpty, s"queries without a top-level total order: ${bad.mkString(", ")}")
  }

  test("every oracle belongs to a declared query and columns are stated on both sides") {
    val qNames = Registry.queries.keySet
    val orphan = Registry.oracleSql.keySet -- qNames
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    // every declared-but-unoracled query is one of the known sketch/hash ops
    val unoracled = qNames -- Registry.oracleSql.keySet
    assert(unoracled == Set("agg_hll", "agg_hll_union", "agg_percentile_approx",
      "llm_ann_lsh", "llm_ann_recall_trained", "llm_cms_counts",
      "llm_dedup_near", "llm_dedup_simhash", "llm_dup_clusters_lsh"),
      s"unexpected oracle-less queries: $unoracled")
  }
}
