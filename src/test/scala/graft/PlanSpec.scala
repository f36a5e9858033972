package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the 100 TB design claims, checked against
  * what Catalyst actually planned (SURVEY §4): broadcast where declared,
  * filters/projection pushed into the parquet scan, top-k as
  * TakeOrderedAndProject (never a global sort).
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    Registry.all(name).fn(spark, TestSpark.sf001)
      .queryExecution.executedPlan.toString

  test("join_broadcast plans a BroadcastHashJoin (fact side never shuffles)") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("meta_filter pushes the metadata predicate into the parquet scan") {
    val p = plan("meta_filter")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("projection is pruned at the scan (ts_slice_proj reads 3 columns, not props)") {
    val p = plan("ts_slice_proj")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"), readSchema)
    assert(!readSchema.contains("event_type"), readSchema)
  }

  test("global top-k plans as TakeOrderedAndProject, not a total sort") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("agg_group uses two-phase hash aggregation (partial before shuffle)") {
    val p = plan("agg_group")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }
}
