package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-shaping helpers shared by operator modules. */
object Q {

  /** Process-scoped scratch root, deleted on JVM exit. Two properties the
    * naive alternatives lack: a FIXED /tmp path races when two processes
    * (e.g. Bench and Verify) overwrite the same dataset at once, while a
    * fresh createTempDirectory per INVOCATION leaks a full dataset copy
    * per query run — a long verify/bench loop fills /tmp. One root per
    * process gives isolation across processes, reuse (mode-overwrite)
    * within one, and cleanup when it ends.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile); ()
    }))
    p
  }

  /** Stable scratch dir for `name` within this process (created on first
    * use; callers write with mode overwrite).
    */
  def scratchDir(name: String): String = {
    val d = scratchRoot.resolve(name)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Unique scratch dir under the process root — for staging that must
    * not collide across concurrent invocations in one process. Still
    * reclaimed by the shutdown hook (callers may also delete eagerly).
    */
  def scratchTempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  /** Filter on an expensive derived column WITHOUT predicate pushdown.
    *
    * Spark pushes deterministic predicates through projects and into join
    * conditions (`PushPredicateThroughJoin`), where a heavy expression
    * (e.g. a 64-term cosine) is then evaluated per candidate pair in
    * interpreted mode — measured 22s vs ~1.5s for llm_dedup_embed at
    * sf0.1. Column-level tricks (OR-rand padding, rand-based barrier
    * columns) get folded away in Spark 4, so the fence must be an
    * expression the optimizer is FORBIDDEN to move past.
    *
    * Through round 19 that fence was an interposed per-key aggregate
    * (`repartition(keys) + groupBy(keys).agg(min(value))` — sound
    * because `keys` are unique per row, so min(value) == value), but it
    * paid a full extra Exchange + two HashAggregates over EVERY
    * candidate pair just to hold the line: at sf0.1 the llm_dedup_embed
    * barrier alone shuffled ~4M scored pairs. Round 20 replaces it with
    * [[graft.functions.expressions.OptimizerBarrier]] — an identity
    * pass-through that REPORTS itself non-deterministic, the
    * Scala-expression twin of guide §4.4's `udf.asNondeterministic()`.
    * The optimizer may not push predicates below, duplicate, or fold a
    * non-deterministic expression, so the heavy value is computed ONCE,
    * map-side, inside the join stage's codegen'd Project, the filter
    * stays above it, and the pair-sized exchange disappears outright
    * (guide §2.4). Evaluation is the child's bit-for-bit on every call
    * and retry (the flag is a declaration, not a behavior), so results
    * — and the SPARK-38388 retry-safety story — are unchanged.
    *
    * Contract unchanged from the aggregate spelling: `keys` must be
    * unique per row (callers' join shapes emit each key pair at most
    * once), and the output schema is exactly `keys :+ value`.
    */
  def aggFilterBarrier(df: DataFrame, keys: Seq[String], value: String,
                       cond: Column): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column => ofExpr, expression => toExpr}
    df.withColumn(value,
        ofExpr(graft.functions.expressions.OptimizerBarrier(toExpr(col(value)))))
      .filter(cond)
      .select((keys :+ value).map(col): _*)
  }

  /** Run INDEPENDENT Spark actions concurrently from driver threads
    * (guide §2.6 — actions are only sequential because driver code calls
    * them sequentially): the later job's tasks back-fill executors freed
    * by the earlier job's straggler tail. Use ONLY for actions with no
    * data or commit dependency on each other (e.g. two store writes to
    * different paths). Propagates the first failure after all actions
    * finish — no half-started action is abandoned mid-flight.
    */
  def inParallel(actions: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = actions.map(a => new Thread(() =>
      try a() catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start())
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

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

  /** LSH candidate-pair generation with an over-cap bucket guard. A band
    * self-join on a bucket of B docs emits B² candidate pairs — fine for
    * genuine near-dup clusters (B small), quadratic death for the
    * mega-bucket a boilerplate-heavy corpus always produces (every page
    * sharing one templated shingle band; at 100 TB a single hot band
    * value can hold millions of docs). Buckets at or under `cap` emit
    * all pairs (B² bounded by cap²); buckets OVER the cap emit STAR
    * edges only: every member paired with the bucket's min-`idCol`
    * representative — B−1 edges, linear in bucket size.
    *
    * Why stars beat dropping: a genuine 10k-copy boilerplate dup cluster
    * over-caps EVERY band simultaneously, so dropping loses it entirely
    * (each copy survives dedup). A star still links every member to the
    * cluster's canonical doc, so connected components collapses the
    * whole cluster to one survivor — while the worst case (a mega-bucket
    * of banding false positives) costs O(B) verification work instead of
    * the O(B²) the uncapped join would pay; exact verification upstream
    * of any dedup decision discards the false edges.
    *
    * One count+min window over the bucket key (same hashpartitioning the
    * small-bucket self-join needs → no extra exchange), then a union of
    * the two regimes. `salvage = false` reproduces the drop behavior for
    * A/B tests. Output: distinct (doc_a < doc_b) candidate id pairs.
    */
  def bucketCandidates(bands: DataFrame, bucketCol: String, idCol: String,
                       cap: Int, salvage: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(bucketCol))
    val annotated = bands.select(col(bucketCol), col(idCol))
      .withColumn("__bucket_n", count(lit(1)).over(w))
      .withColumn("__bucket_min", min(col(idCol)).over(w))
    val small = annotated.filter(col("__bucket_n") <= cap)
    val smallPairs = small.as("x").join(small.as("y"),
        col(s"x.$bucketCol") === col(s"y.$bucketCol") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
    val pairs =
      if (!salvage) smallPairs
      else smallPairs.unionByName(
        annotated.filter(col("__bucket_n") > cap &&
            col(idCol) =!= col("__bucket_min"))
          .select(col("__bucket_min").as("doc_a"), col(idCol).as("doc_b")))
    pairs.distinct()
  }

  /** Rank-bounded within-cell self-pairs — the cluster-then-compare
    * quadratic, CAPPED (the SemDeDup cell analog of what
    * [[bucketCandidates]] does for LSH buckets). Every row gets a rank
    * (`row_number` by `idCol` within its `cellCol`); pairs are emitted
    * for 0 < rank(b) − rank(a) ≤ cap. For cells of size ≤ cap+1 that is
    * EXACTLY the all-pairs `id_a < id_b` self-join — the oracle-checked
    * fixture regime — while an over-cap cell (the mega-cluster a
    * boilerplate-heavy corpus always produces; the SemDeDup paper grows
    * K with corpus size for exactly this reason) emits ≤ n·cap pairs
    * instead of n², each row compared to its cap nearest-ranked
    * predecessors.
    *
    * The rank-distance band is realized as an EQUI-join on (cell, rank
    * block) with each left row exploded to its own and the next block —
    * same shape as llm_dedup_embed's id-window join — so the planner
    * builds a hash join, never a nested loop. Returns every non-cell
    * column twice, suffixed `_a`/`_b`, plus `cellCol` once.
    */
  def boundedCellPairs(df: DataFrame, cellCol: String, idCol: String,
                       cap: Int): DataFrame = {
    // cap = 0 would divide by zero in the block key (error under ANSI,
    // silently-empty pairs otherwise); negative caps silently emit nothing
    require(cap >= 1, "boundedCellPairs needs a positive rank cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(cellCol)).orderBy(col(idCol))
    val r = df.withColumn("__rn", row_number().over(w))
    val others = df.columns.filterNot(_ == cellCol).toSeq
    val a = r.select(col(cellCol) +: others.map(c => col(c).as(s"${c}_a")) :+
      col("__rn").as("__rn_a") :+
      explode(array(floor(col("__rn") / cap), floor(col("__rn") / cap) + 1))
        .as("__jblk"): _*)
    val b = r.select(col(cellCol).as("__cell_b") +:
      others.map(c => col(c).as(s"${c}_b")) :+
      col("__rn").as("__rn_b") :+ floor(col("__rn") / cap).as("__jblk_b"): _*)
    a.join(b, col(cellCol) === col("__cell_b") && col("__jblk") === col("__jblk_b") &&
        col("__rn_b") > col("__rn_a") && col("__rn_b") <= col("__rn_a") + cap)
      .drop("__cell_b", "__jblk", "__jblk_b", "__rn_a", "__rn_b")
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
