package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Llm

/** Connected-component label propagation (llm_dup_clusters' engine). */
class CcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Llm.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("a transitive chain collapses to one cluster (A~B, B~C, A!~C)") {
    // 1-2, 2-3: no direct 1-3 edge, yet all three must share a canonical
    val got = labelsOf(Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep distinct min-id labels") {
    val got = labelsOf(Seq((5L, 4L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(got == Map(4L -> 4L, 5L -> 4L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a 12-hop path converges within the round cap (diameter bound)") {
    // worst case for min-propagation: a path graph, min label at one end;
    // label reaches the far end in ~diameter rounds, not maxRounds
    val path = (0L until 12L).map(i => (i, i + 1))
    val got = labelsOf(path)
    assert(got.values.toSet == Set(0L) && got.size == 13)
  }

  test("a 300-hop path converges inside the cap (pointer-jump doubling)") {
    // the sf0.1 regression shape: chained near-dups form a path whose
    // diameter exceeds the round cap; plain neighbor-min would need ~300
    // rounds, path doubling needs ~log2(300) ≈ 9
    val path = (0L until 300L).map(i => (i + 1, i))
    val got = labelsOf(path)
    assert(got.values.toSet == Set(0L) && got.size == 301)
  }

  test("matches brute-force components on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val want = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(find(_) == root).min
    }.toMap
    assert(labelsOf(edges) == want)
  }
}
