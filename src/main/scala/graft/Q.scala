package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, min}

/** Query-shaping helpers shared by operator modules. */
object Q {

  /** Filter on an expensive derived column WITHOUT predicate pushdown.
    *
    * Spark pushes deterministic predicates through projects and into join
    * conditions (`PushPredicateThroughJoin`), where a heavy expression
    * (e.g. a 64-term cosine) is then evaluated per candidate pair in
    * interpreted mode — measured 22s vs ~1.5s for llm_dedup_embed at
    * sf0.1. Optimizer tricks (nondeterministic barrier column, OR-rand
    * padding) get folded away in Spark 4, so the barrier is SEMANTIC: an
    * interposed per-key aggregate. `keys` are unique per row, so
    * `min(value) == value` and results are unchanged, while a filter on
    * an aggregate output can never be pushed below the aggregation.
    *
    * The explicit `repartition(keys)` before the groupBy is load-bearing
    * twice over: (1) the heavy value is computed in the codegen'd map-side
    * Project BELOW the exchange — as the direct child of a grouped
    * HashAggregate, a several-hundred-node expression silently falls out
    * of whole-stage codegen and runs interpreted (measured 12.7s vs 1.5s
    * at sf0.1); (2) the aggregate above the exchange sees a plain
    * attribute and reuses the partitioning (no second shuffle). Cost: one
    * shuffle of (keys, value) — a few MB against tens of seconds saved.
    */
  def aggFilterBarrier(df: DataFrame, keys: Seq[String], value: String,
                       cond: Column): DataFrame =
    df.repartition(keys.map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(min(col(value)).as(value))
      .filter(cond)
}
