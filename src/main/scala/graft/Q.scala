package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Two-phase (salted) aggregation for skewed keys — the 100 TB answer
    * to one hot key melting a single reducer. Phase 1 aggregates on
    * (key, salt) — the hot key's rows spread over `buckets` reducers —
    * phase 2 merges the partials per key. Only algebraic partials
    * (sum/count/min/max) compose this way; the caller passes both the
    * per-(key,salt) partial aggs and the per-key merge aggs.
    *
    * The salt is `pmod(hash(all columns), buckets)` — deterministic (no
    * rand), uniform, and computed map-side. With AQE's skew handling this
    * is rarely needed for joins, but aggregation skew still bites.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** LSH hot-bucket guard: drop every row whose bucket has more than
    * `cap` members, BEFORE the candidate self-join. A band self-join on a
    * bucket of B docs emits B² candidate pairs — fine for genuine
    * near-dup clusters (B small), quadratic death for the mega-bucket a
    * boilerplate-heavy corpus always produces (every page sharing one
    * templated shingle band; at 100 TB a single hot band value can hold
    * millions of docs). Capping is the standard LSH guard: exact
    * duplicates are caught upstream by digest dedup (llm_dedup_exact /
    * llm_corpus_clean), true near-dup pairs inside a dropped bucket
    * usually still share one of the other bands, and what a mega-bucket
    * overwhelmingly holds is banding-hash false positives that exact
    * verification would discard after O(B²) wasted work.
    *
    * Implementation: a count window over the bucket key. The window's
    * required distribution (hashpartitioning(bucket)) is exactly what
    * the downstream self-join needs, so EnsureRequirements inserts no
    * second exchange — the guard costs one sort within the shuffle the
    * join was going to pay anyway.
    */
  def capBuckets(bands: DataFrame, bucketCol: String, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(bucketCol))
    bands.withColumn("__bucket_n", count(lit(1)).over(w))
      .filter(col("__bucket_n") <= cap)
      .drop("__bucket_n")
  }

  /** Replicated-right salted equi-join for a skewed left key: the left
    * side gets a deterministic salt in [0, buckets); the right side is
    * exploded `buckets`× so every (key, salt) bucket finds its match.
    * Use when the right side is too big to broadcast but small enough to
    * replicate `buckets`×, and AQE's skew split is unavailable (e.g.
    * under a required distribution).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** THE OHLC aggregate columns — the one definition of the bar
    * determinism contract, shared by `agg_ohlc`, the flagship
    * `SparkEntry.entry` and the streaming `Streams.ohlcAgg`: open/close
    * via min_by/max_by over the (ts, id) struct (id unique ⇒
    * deterministic even on equal timestamps), high/low plain extremes.
    * All four are O(1)-mergeable state per bar, so the same spelling is
    * valid batch-side and as watermark-evicted streaming state.
    */
  def ohlcAggs(tsCol: Column, idCol: Column, vCol: Column): Seq[Column] = Seq(
    min_by(vCol, struct(tsCol, idCol)).as("open"),
    max(vCol).as("high"),
    min(vCol).as("low"),
    max_by(vCol, struct(tsCol, idCol)).as("close"))
}
