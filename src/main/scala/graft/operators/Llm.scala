package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.DeclaredQuery
import graft.functions.{TextOps, VectorOps}
import graft.sources.{IvfIndex, Tables}

/** §2.10 — LLM-data-pipeline operators (north-star extension): exact and
  * near deduplication, similarity search, text analysis. Everything is a
  * composition of codegen'd built-ins / higher-order functions — zero
  * black-box UDFs — so Catalyst sees through every expression and each
  * query is an ordinary shuffle-bounded DAG at 100 TB.
  *
  * Scale notes per operator are inline; the common theme: the exact O(n²)
  * variants bound their candidate sets explicitly (same-source window,
  * fixed query set), while the scale paths (MinHash bands, SimHash bands,
  * random-hyperplane LSH buckets) generate candidates by equi-join on a
  * hash key — shuffle volume O(n·bands), never a cross product.
  *
  * Fixture reality (FIXTURES.md, verified): the documents table has a
  * ~31-token vocabulary, so token-set similarity is high across all docs
  * (median pair Jaccard ≈ 0.63) while 3-shingle similarity isolates the
  * planted near-duplicates (max ≈ 0.99 vs median 0). Near-dup ops
  * therefore shingle at k=3; token-level ops are the text-stats family.
  */
object Llm {

  /** Tokens appearing in the fixture vocabulary that play the stopword
    * role for quality scoring / language ID (English function words).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private val StopSqlList = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
    * punctuation — the classic GPT-2-style coarse split, minus unicode
    * categories (fixture text is ascii word soup). Spelled with a literal
    * space class so the pattern survives BOTH engines' SQL-literal escape
    * rules unchanged (Spark eats `\s` backslashes inside expr() strings).
    */
  val BpeIshPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private def toks = TextOps.tokens(col("text"))

  /** Deterministic-hash recipe pieces shared by llm_train_split,
    * llm_sample_mix and llm_pipeline_full — Scala Column and DuckDB SQL
    * spellings side by side, so a recipe change cannot desynchronize the
    * composed pipeline from its component queries. Split uses md5 nibble
    * POSITION 1, mixing nibble POSITION 2: a doc's split and its mixing
    * survival stay uncorrelated.
    */
  private def splitNib = substring(md5(col("doc_id").cast("string")), 1, 1)
  private def splitCol: Column =
    when(splitNib.isin("c", "d"), "val")
      .when(splitNib.isin("e", "f"), "test").otherwise("train")
  private val SplitCaseSql: String =
    "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val' " +
      "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test' " +
      "ELSE 'train' END"
  private def mixRate16: Column =
    (regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 4 + 1) * 4
  private def mixNibPos: Column = expr(
    "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1))")
  private val MixRate16Sql: String =
    "(CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 4 + 1) * 4"
  private val MixNibPosSql: String =
    "instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))"

  /** One Lloyd assignment step, k=8 (centroids = vectors 0..7): the
    * shared stage of llm_kmeans (reports assignments) and llm_centroids
    * (computes the updated means). Centroids broadcast; dist² =
    * |v|² + |c|² − 2v·c with norms computed once per side and the dot
    * via the codegen'd native expression; the argmin is a
    * PARTIAL-aggregatable min(struct) so the n×k fan-out collapses
    * map-side (each vector's k candidates are co-located by
    * construction) and the one exchange carries n partials, never n×k.
    * Ties break to the lowest cluster id via the struct order on the
    * ROUNDED dist — the oracle repeats both the rounding and the order.
    * The embedding rides through the aggregate as a first() (every row
    * of a vec_id group carries the same array), so consumers that need
    * it avoid a rescan + self-join.
    */
  private def kmeansAssign(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        VectorOps.normSq(col("embedding")).as("nsq"))
    val c = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("__c"), col("embedding").as("cvec"),
        col("nsq").as("cnsq"))
    e.join(broadcast(c))
      .select(col("vec_id"), col("embedding"),
        round(col("nsq") + col("cnsq") -
          lit(2.0) * VectorOps.dot(col("embedding"), col("cvec")), 6).as("__d2"),
        col("__c"))
      .groupBy("vec_id")
      .agg(min(struct(col("__d2").as("d"), col("__c").as("c"))).as("__m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("__m.c").as("cluster"), col("__m.d").as("d2"),
        col("embedding"))
  }

  /** DuckDB spelling of [[kmeansAssign]]'s assignment CTEs (`e`, `c`,
    * `p`, `asg`) — shared verbatim by both consumers' oracles. */
  private val KmeansAssignSql: String = {
    def ss(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"e AS (SELECT vec_id, embedding, ${ss("embedding", "embedding")} AS nsq FROM embeddings), " +
      "c AS (SELECT vec_id AS cl, embedding AS cvec, nsq AS cnsq FROM e WHERE vec_id < 8), " +
      s"p AS (SELECT vec_id, round(nsq + cnsq - 2.0 * ${ss("e.embedding", "cvec")}, 6) AS d2, cl " +
      "FROM e, c), " +
      "asg AS (SELECT vec_id, min({'d': d2, 'c': cl}).c AS cluster, " +
      "min({'d': d2, 'c': cl}).d AS d2 FROM p GROUP BY vec_id)"
  }

  /** DuckDB spelling of [[TextOps.tokens]] — the empty-token filter is
    * mirrored so an empty/whitespace-only document tokenizes to [] on
    * BOTH sides (bare string_split_regex yields [''], length 1).
    */
  val ToksSql: String =
    "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"

  /** Verified near-dup pairs (doc_a < doc_b, rounded Jaccard >= 0.7) —
    * the ONE definition of the dup edge set, shared by llm_jaccard_pairs
    * (which reports the pairs) and llm_dup_clusters (which resolves them
    * into components), so the two queries cannot drift apart. Candidates
    * are bounded to same-source + a doc_id window (linear growth); the
    * agg barrier keeps the heavy set-scoring expressions map-side.
    */
  private def jaccardDupPairs(s: SparkSession, d: String): DataFrame = {
    // pinned: both sides of the self-join below re-tokenize the corpus
    // otherwise (the window join cannot reuse one side's exchange).
    // Failure-mode choice (r20): stays a localCheckpoint, NOT a
    // recomputable persist — the pin feeds the RETURNED frame, so a
    // session-lived cache entry could never be unpersisted inside the
    // query and would leak reuse across queries (and bench timings);
    // checkpoint blocks are per-invocation and GC-reclaimed. Executor
    // loss ⇒ query retry, the price every pin site here accepts.
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), array_distinct(toks).as("tk"))
      .localCheckpoint()
    val a = t.select(col("doc_id").as("doc_a"), col("source"), col("tk").as("tk_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("source").as("source_b"), col("tk").as("tk_b"))
    val scored = a.join(b, col("source") === col("source_b") && col("doc_b") > col("doc_a") &&
        col("doc_b") <= col("doc_a") + 200)
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("tk_a"), col("tk_b"))).cast("double") /
          size(array_union(col("tk_a"), col("tk_b"))).cast("double"), 6).as("jaccard"))
    graft.Q.aggFilterBarrier(scored, Seq("doc_a", "doc_b"), "jaccard", col("jaccard") >= 0.7)
  }

  /** DuckDB spelling of [[jaccardDupPairs]] as a CTE chain ending in
    * `p(doc_a, doc_b, jaccard)` — prefix for both queries' oracles.
    */
  private val DupPairsSql: String =
    "t AS (SELECT doc_id, source, " +
      s"list_distinct($ToksSql) AS tk FROM documents), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS DOUBLE), 6) AS jaccard " +
      "FROM t a JOIN t b ON a.source = b.source AND b.doc_id > a.doc_id " +
      "AND b.doc_id <= a.doc_id + 200 " +
      "WHERE round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS DOUBLE), 6) >= 0.7)"

  /** DuckDB cosine over 64-float list columns — shared by every
    * embedding oracle so the arithmetic (double widening, left-to-right
    * sum, norm-product order, 6dp rounding) is spelled ONCE.
    */
  private def CosSql(a: String, b: String): String = {
    def ss(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"round(${ss(a, b)} / (sqrt(${ss(a, a)}) * sqrt(${ss(b, b)})), 6)"
  }

  /** The deterministic first-16-centroid assignment ranking as a
    * `cent/sc/a` CTE chain — the ONE SQL spelling of `IvfIndex.assign`'s
    * arithmetic, shared by the IVF oracles and `llm_semdedup` so a
    * change to the assignment (rounding, tie-break, seeding) cannot
    * silently drift one consumer.
    */
  private val IvfAssignCtes: String =
    "cent AS (SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings WHERE vec_id < 16), " +
    "sc AS (SELECT e.vec_id, cent_id, " +
    s"${CosSql("e.embedding", "c_emb")} AS ccos FROM embeddings e CROSS JOIN cent), " +
    "a AS (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id " +
    "ORDER BY ccos DESC, cent_id) AS rn FROM sc)"

  /** ONE oracle for both IVF queries (`llm_ann_ivf` recomputes per query;
    * `llm_ann_ivf_indexed` probes the persisted index) — the index is an
    * access-path change, never a semantics change, and sharing the SQL
    * pins that.
    */
  /** ONE spelling of the IVF probe oracle, parameterized by the
    * index-side cells filter (`""` = the full index) — the remove
    * oracle must never drift from the build/add/indexed one on the
    * probe window, scoring or tie-breaks.
    */
  private def ivfOracle(cellsPred: String): String =
    s"WITH $IvfAssignCtes, " +
    s"cells AS (SELECT vec_id, cent_id AS cell FROM a WHERE rn = 1$cellsPred), " +
    "probes AS (SELECT vec_id AS q_id, cent_id AS cell FROM a " +
    "WHERE vec_id >= 16 AND vec_id < 24 AND rn <= 2), " +
    "scored AS (SELECT p.q_id, c.vec_id AS nbr_id, " +
    s"${CosSql("qe.embedding", "ne.embedding")} + 0.0 AS cos " +
    "FROM probes p JOIN cells c ON p.cell = c.cell AND c.vec_id <> p.q_id " +
    "JOIN embeddings qe ON qe.vec_id = p.q_id JOIN embeddings ne ON ne.vec_id = c.vec_id) " +
    "SELECT q_id, nbr_id, cos, CAST(row_number() OVER (PARTITION BY q_id " +
    "ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk FROM scored QUALIFY rnk <= 3 " +
    "ORDER BY q_id, rnk"

  private val IvfOracleSql: String = ivfOracle("")

  /** [[IvfOracleSql]] with the removed ids excluded from the INDEX side
    * only (queries still come from the base table) — the oracle for the
    * remove-then-probe maintenance path.
    */
  private val IvfRemoveOracleSql: String = ivfOracle(" AND vec_id % 37 <> 0")

  /** [[IvfOracleSql]] with the index side scoped to even-label vectors —
    * the filtered-search oracle (pre-filter: top-k over the allowed set).
    */
  private val IvfFilteredOracleSql: String = ivfOracle(
    " AND vec_id IN (SELECT vec_id FROM embeddings WHERE label % 2 = 0)")

  /** Recall@3 of the IVF result against exact brute-force top-3 — the
    * whole [[IvfOracleSql]] as a subquery on the approx side, the
    * llm_sim_topk shape on the exact side, hits joined per (q_id, nbr).
    */
  private val IvfRecallOracleSql: String =
    s"WITH ivf AS (SELECT q_id, nbr_id FROM (${ivfOracle("")})), " +
    "exactq AS (SELECT qe.vec_id AS q_id, ne.vec_id AS nbr_id, " +
    s"round(${CosSql("qe.embedding", "ne.embedding")}, 6) + 0.0 AS cos " +
    "FROM embeddings qe JOIN embeddings ne ON ne.vec_id <> qe.vec_id " +
    "WHERE qe.vec_id >= 16 AND qe.vec_id < 24), " +
    "exact AS (SELECT q_id, nbr_id, row_number() OVER (PARTITION BY q_id " +
    "ORDER BY cos DESC, nbr_id) AS rnk FROM exactq QUALIFY rnk <= 3) " +
    "SELECT e.q_id, CAST(count(i.nbr_id) AS BIGINT) AS n_hit, " +
    "round(count(i.nbr_id) / 3.0, 6) AS recall " +
    "FROM exact e LEFT JOIN ivf i ON i.q_id = e.q_id AND i.nbr_id = e.nbr_id " +
    "GROUP BY e.q_id ORDER BY e.q_id"

  /** MinHash+LSH verified near-dup pairs over any `(doc_id, text)` frame —
    * the 100 TB dup edge source (no id-locality or same-source assumption,
    * unlike [[jaccardDupPairs]]): shingle → 64-slot MinHash signature →
    * 16 bands × 4 rows → candidates via [[graft.Q.bucketCandidates]]
    * (all-pairs under the 64-member bucket cap, star-to-canonical edges
    * over it) → exact shingle-Jaccard verification of candidates only.
    * Shuffle volume is O(docs × bands) + O(candidates); verification
    * joins carry 8-byte shingle hashes, never text. Shared by
    * `llm_dedup_near` (reports the pairs) and `llm_dup_clusters_lsh`
    * (resolves them into components). `salvage = false` reproduces the
    * drop-the-bucket behavior for the A/B recall spec.
    */
  def minhashDupPairs(docs: DataFrame, tau: Double = 0.5,
                      salvage: Boolean = true): DataFrame = {
    val numHashes = 64; val rowsPerBand = 4
    // (A localCheckpoint of the exploded (doc_id, hash) rows was tried
    // and measured SLOWER — llm_dedup_near 7.2 → 9.9 s same-position:
    // materializing ~1M exploded rows and re-reading them from RDD
    // storage costs more than recomputing the codegen'd explode per
    // consumer. Recompute wins while the subtree is cheap-per-row.)
    val hashed = TextOps.docShingles(docs, 3)
      .withColumn("__h", TextOps.baseHash(col("sh")))
    // whole signature as ONE native aggregate buffer (array<long>),
    // not 64 separate min() columns — same values, ~64× fewer
    // aggregation-buffer field updates per input row
    val sig = hashed.groupBy("doc_id")
      .agg(TextOps.minHashSig(col("__h"), numHashes).as("__sig"))
    val bands = sig.select(col("doc_id"),
      explode(array(TextOps.bandStructsFromSig(col("__sig"), numHashes, rowsPerBand): _*)).as("b"))
    val cand = graft.Q.bucketCandidates(bands, "b", "doc_id", cap = 64, salvage)
    // exact verification runs over the 64-bit base hashes, not the
    // shingle strings: the join/aggregate shuffles carry 8 bytes per
    // shingle instead of the text (at corpus scale shingles ARE the
    // data volume), and the hashed set is the same set the signature
    // used (collision odds per doc pair ~ shingles²/2⁶⁴ — vanishing;
    // LlmOpsSpec still asserts equality against string-set Jaccard).
    val hs = hashed.select(col("doc_id"), col("__h"))
    val sizes = hs.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    cand
      .join(hs.select(col("doc_id").as("doc_a"), col("__h")), "doc_a")
      .join(hs.select(col("doc_id").as("doc_b"), col("__h")), Seq("doc_b", "__h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Cluster-resolution tail shared by `llm_dup_clusters` (window edge
    * source) and `llm_dup_clusters_lsh` (MinHash edge source): resolve
    * the `(doc_a, doc_b)` pairs into components, tag each member with
    * its canonical (min-id) cluster, the cluster size, and the survivor
    * flag. One definition so the two queries cannot drift apart.
    */
  private def dupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .select(col("u").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))

  /** Connected components of an undirected edge list `(u, v)`:
    * min-label propagation over edges PLUS pointer jumping (path
    * doubling) over the label graph each round. Edge propagation alone
    * converges in O(max component diameter) rounds — a chained-duplicate
    * path (A~B~C~…, each within the candidate window of the next) made
    * that blow past any fixed round cap at sf0.1. The jump step follows
    * each node's label to THAT node's label (labels are always node ids,
    * so the label table maps them), doubling the propagation distance per
    * round → O(log diameter) rounds total. Each round is one equi-join +
    * one partial-agg shuffle (neighbors) plus one self-join (jump);
    * `localCheckpoint` truncates lineage so round k doesn't replay rounds
    * 1..k-1 — the standard Spark iterative-graph guard. The fixpoint (min
    * id per component) is deterministic regardless of iteration schedule.
    * Returns `(u, label)` for every node with at least one edge.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    // The label-sum convergence check below casts labels to
    // decimal(38,0): a non-integral node id (string doc ids, fractional
    // doubles) would null or truncate the sum and the loop would spin to
    // maxRounds with a misleading "did not converge" — refuse loudly at
    // entry instead (all in-repo callers pass longs).
    pairs.schema.take(2).foreach { f =>
      import org.apache.spark.sql.types._
      val integral = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(integral,
        s"connectedComponents needs integral node ids; column '${f.name}' " +
          s"is ${f.dataType.simpleString} — map ids to longs first")
    }
    // Pre-partition the (static) edge table by the join key it is
    // re-joined on EVERY round: localCheckpoint preserves the physical
    // plan's output partitioning, so each round's neighbor join only
    // exchanges the (much smaller) labels side — without this the edge
    // table pays a full shuffle per round, the dominant cost of the
    // whole fixpoint at scale.
    val np = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // symmetrize in ONE pass via explode, not union-of-self: a union's
    // two branches each re-execute the pairs lineage (for the LSH/
    // MinHash edge sources that lineage is the expensive candidate
    // generation + verification — measured as two concurrent ~3 s jobs
    // per branch at sf0.1), while explode emits both directions from a
    // single evaluation of each input row
    // (failure-mode choice, r20: the edge and per-round label pins stay
    // localCheckpoints, not recomputable persists — LINEAGE TRUNCATION
    // is the point: persist keeps the full plan, so round k would still
    // re-optimize rounds 1..k-1's lineage and the fixpoint's planning
    // cost would grow quadratically. Executor loss ⇒ query retry.)
    val edges = pairs.toDF("u", "v")
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))
      .repartition(np, col("v"))
      .localCheckpoint() // materialized once; re-joined every round
    var labels = edges.groupBy("u").agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("u"), col("__mn")).as("label"))
      .localCheckpoint()
    // convergence by EXACT label-sum: labels are monotonically
    // non-increasing per node (the union branch below keeps each node's
    // own label in its min), so the sum strictly decreases iff ANY label
    // changed — one aggregate per round replaces the old per-row
    // old-vs-new comparison, which needed a third join per round just to
    // carry the old label alongside. decimal(38,0) keeps the sum exact
    // at any corpus size (a double would round; a long could overflow).
    def sumOf(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = sumOf(labels)
    var converged = prevSum == null // no edges → nothing to propagate
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // least(own label, neighbor labels) in ONE aggregate: the labels
      // table unions into the neighbor-join output (n tiny checkpointed
      // rows against 2m join rows), so no separate labels-vs-nbr join is
      // needed to keep the monotone floor
      val nbr = edges.join(labels.select(col("u").as("v"), col("label")), "v")
        .select(col("u"), col("label"))
        .unionByName(labels)
        .groupBy("u").agg(min(col("label")).as("label"))
      // pointer jump: label ← labels(label). Every label value is a node
      // id (least() over node ids), so the PREVIOUS round's checkpointed
      // labels table is a valid (slightly stale) mapping — using it
      // instead of `nbr` avoids recomputing the neighbor-min join+agg a
      // second time in the self-join (only the shuffle would be reused).
      // Stale jumps keep the monotone-decrease invariant and the same
      // fixpoint; the 300-hop CcSpec case pins that doubling still holds.
      // Left join + coalesce keeps already-minimal labels (label(m) = m
      // rows always exist, but stay safe under future re-keying).
      // LAZY checkpoint: the convergence aggregate below is the round's
      // one action — it computes (and caches) every partition of `next`,
      // so an eager materialization job would be a second full pass.
      val next = nbr.join(
          labels.select(col("u").as("label"), col("label").as("__jump")),
          Seq("label"), "left")
        .select(col("u"),
          least(col("label"), coalesce(col("__jump"), col("label"))).as("label"))
        .localCheckpoint(false)
      val s = sumOf(next)
      converged = s != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      rounds += 1
    }
    require(converged, s"label propagation did not converge in $rounds rounds")
    labels
  }

  def defs: Seq[(String, DeclaredQuery)] = Seq(

    "llm_dedup_exact" -> DeclaredQuery(
      // Exact dedup by normalized text, grouped on the md5 DIGEST of the
      // text rather than the text itself: partial aggregation still
      // collapses per-partition duplicates, but what crosses the shuffle
      // is 16 bytes per distinct document instead of the whole document —
      // at 100 TB that's shuffling fixed-width keys instead of kilobyte
      // texts (128-bit digest ⇒ collision odds ~n²/2¹²⁹, negligible at
      // any corpus size). Equivalence classes — and therefore keep_id and
      // n_copies — are identical to the oracle's GROUP BY lower(trim(text)).
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(encode(lower(trim(col("text"))), "UTF-8")).as("norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
      Some("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
        "GROUP BY lower(trim(text)) ORDER BY keep_id"),
      "exact dedup of documents by normalized text (keep min doc_id)"),

    "llm_text_stats" -> DeclaredQuery(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("source"),
          size(toks).cast("long").as("n_toks"),
          length(col("text")).cast("long").as("n_chars"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_toks"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang"), col("source")),
      Some("SELECT lang, source, count(*) AS n_docs, " +
        s"CAST(sum(len($ToksSql)) AS BIGINT) AS total_toks, " +
        "round(avg(CAST(length(text) AS BIGINT)), 4) AS avg_chars " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),
      "per-(lang,source) token/char rollups"),

    "llm_tokens" -> DeclaredQuery(
      // Token counting two ways: whitespace split and a BPE-ish regex
      // pre-tokenizer. Pure per-row expressions — embarrassingly parallel.
      // counts via regexp_count, NOT size(regexp_extract_all): counting
      // matches must not allocate a string per token (measured 2.4s →
      // ~0.5s warm at sf0.1 — the array of ~500 match strings per doc was
      // the whole cost). '\\S+' runs ≡ the non-empty \\s+ tokens of
      // TextOps.tokens/ToksSql. (Residual engine gap: Java \\s includes
      // \\x0B, RE2's does not — no fixture contains vertical tabs.)
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit("\\S+")).cast("long").as("n_ws"),
          regexp_count(col("text"), lit(BpeIshPattern)).cast("long").as("n_bpe"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id")),
      Some(s"SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_ws, " +
        s"CAST(len(regexp_extract_all(text, '$BpeIshPattern')) AS BIGINT) AS n_bpe, " +
        "CAST(length(text) AS BIGINT) AS n_chars FROM documents ORDER BY doc_id"),
      "token counting: whitespace + BPE-ish regex pre-tokenizer"),

    "llm_quality" -> DeclaredQuery(
      // Quality scoring from length / stopword-ratio / mean token length.
      // Score arithmetic is mirrored token-for-token in the oracle so the
      // rounded doubles agree bit-for-bit.
      (s, d) => {
        // tokens bound to a column once — every metric references the
        // materialized array, not a re-evaluated split (see docShingles).
        val t = col("__toks")
        val nToks = size(t).cast("double")
        val stopHits = size(filter(t,
          x => array_contains(lit(Stopwords.toArray), x))).cast("double")
        val sumLen = aggregate(transform(t, x => length(x)), lit(0),
          (acc, x) => acc + x).cast("double")
        // nullif token counts: a whitespace-only document tokenizes to []
        // and Spark 4 ANSI raises DIVIDE_BY_ZERO even on doubles; null
        // ratios (mirrored in the oracle) are the consistent answer
        val nSafe = nullif(nToks, lit(0.0))
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .select(
            col("doc_id"),
            nToks.cast("long").as("n_toks"),
            round(stopHits / nSafe, 6).as("stop_ratio"),
            round(sumLen / nSafe, 6).as("avg_tok_len"),
            round(least(nToks / lit(100.0), lit(1.0)) * 0.5 +
              (lit(1.0) - stopHits / nSafe) * 0.5, 6).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "x AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS n, " +
        s"CAST(len(list_filter(toks, t -> list_contains($StopSqlList, t))) AS DOUBLE) AS hits, " +
        "CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) AS sumlen FROM t) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS n_toks, round(hits / nullif(n, 0), 6) AS stop_ratio, " +
        "round(sumlen / nullif(n, 0), 6) AS avg_tok_len, " +
        "round(least(n / 100.0, 1.0) * 0.5 + (1.0 - hits / nullif(n, 0)) * 0.5, 6) AS quality " +
        "FROM x ORDER BY doc_id"),
      "document quality scoring: length, stopword ratio, token shape"),

    "llm_repetition" -> DeclaredQuery(
      // Within-document repetition signal (the Gopher/MassiveText "most
      // frequent n-gram fraction" rule): docs whose single most frequent
      // bigram carries too much of the text are template/boilerplate junk
      // a pretraining corpus filters out. Two hash aggregates: the first
      // shuffles (doc, bigram) pairs, the second re-keys its already
      // collapsed per-doc counts to hash(doc_id) — the expensive shuffle
      // (raw bigram volume) happens once; the second moves only distinct
      // (doc, bigram, count) rows. PlanSpec budgets the two exchanges.
      // NON-distinct bigrams (counts matter here, unlike docShingles);
      // the flag compares the ROUNDED fraction so both engines make
      // identical boundary decisions.
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .filter(size(col("__toks")) >= 2)
        val cnt = t.select(col("doc_id"),
            explode(TextOps.shingles(col("__toks"), 2)).as("bg"))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        cnt.groupBy("doc_id")
          .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_bigram_frac"),
            sum(col("c")).as("n_bigrams"),
            count(lit(1)).as("n_distinct"))
          .withColumn("flag_repetitive", col("top_bigram_frac") > 0.1)
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "s AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t WHERE len(toks) >= 2), " +
        "c AS (SELECT doc_id, bg, count(*) AS c FROM s GROUP BY doc_id, bg) " +
        "SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_bigram_frac, " +
        "CAST(sum(c) AS BIGINT) AS n_bigrams, count(*) AS n_distinct, " +
        "round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) > 0.1 AS flag_repetitive " +
        "FROM c GROUP BY doc_id ORDER BY doc_id"),
      "top-bigram repetition fraction (Gopher-style boilerplate filter)"),

    "llm_tfidf" -> DeclaredQuery(
      // Corpus-level TF-IDF: top-3 characteristic terms per document.
      // The scale skeleton is the canonical one: ONE shuffle of
      // (doc, term) pairs for tf, a vocab-sized df table JOINED BACK BY
      // BROADCAST (vocabularies are millions of rows when corpora are
      // billions — always the small side), the corpus doc-count as a
      // 1-row broadcast cross join, and per-doc top-k through the
      // rank<=k filter Spark rewrites into WindowGroupLimit (k rows per
      // partition survive BEFORE the shuffle). Smooth idf
      // (ln((N+1)/(df+1))+1, the sklearn spelling) keeps every term
      // finite. Scoring compares the ROUNDED score so both engines make
      // identical ranking decisions.
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tf = docs.select(col("doc_id"), explode(toks).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        // count(tf > 0), NOT count(1): a bare count (or count(tf) — the
        // optimizer rewrites a never-null count away) lets column pruning
        // drop tf's count out of this branch's partial aggregate, making
        // its (doc_id, term) exchange differ structurally from tf's own —
        // the corpus would be scanned and exploded TWICE. The tf>0
        // predicate (always true, but not foldable) keeps the subtrees
        // identical so ReuseExchange collapses them into one scan.
        val df = tf.groupBy("term")
          .agg(count(when(col("tf") > 0, 1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            round(col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6)
              .as("score"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term"))
        scored.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"WITH t AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*) AS n FROM documents), " +
        "s AS (SELECT tf.doc_id, tf.term, " +
        "round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score " +
        "FROM tf JOIN df ON tf.term = df.term CROSS JOIN n), " +
        "r AS (SELECT doc_id, term, score, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s) " +
        "SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, score FROM r " +
        "WHERE rk <= 3 ORDER BY doc_id, rk"),
      "corpus TF-IDF (smooth idf): top-3 terms per doc, broadcast df join"),

    "llm_pii_scrub" -> DeclaredQuery(
      // PII redaction — the compliance pass every pretraining corpus
      // runs: find and mask email addresses and phone-shaped numbers.
      // The fixture corpus is synthetic word soup with no PII, so the
      // query first AUGMENTS each doc with a deterministic
      // contact-header derived from its own key (documented fixture
      // augmentation — both engines build the identical string); the
      // redaction machinery (pattern count + global replace) is the real
      // thing and the md5 of the scrubbed text proves byte-identical
      // masking. Patterns use only RE2-and-Java-common syntax; Spark's
      // regexp_replace is global by default, DuckDB needs the 'g' flag.
      // Per-row expressions only — embarrassingly parallel at any scale.
      (s, d) => {
        val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phonePat = "[0-9]{3}-[0-9]{4}"
        val pii = concat(lit("contact "), col("source"), lit("."),
          col("doc_id").cast("string"), lit("@example.com call 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(" "), col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), pii.as("__pii"))
          .select(col("doc_id"),
            regexp_count(col("__pii"), lit(emailPat)).as("n_emails"),
            regexp_count(col("__pii"), lit(phonePat)).as("n_phones"),
            regexp_replace(regexp_replace(col("__pii"), emailPat, "<EMAIL>"),
              phonePat, "<PHONE>").as("__scrub"))
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            md5(col("__scrub")).as("scrub_md5"),
            length(col("__scrub")).cast("long").as("scrub_len"))
          .orderBy(col("doc_id"))
      },
      Some("WITH p AS (SELECT doc_id, 'contact ' || source || '.' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com call 555-01' || " +
        "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' ' || text AS pii " +
        "FROM documents), " +
        "x AS (SELECT doc_id, " +
        "len(regexp_extract_all(pii, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails, " +
        "len(regexp_extract_all(pii, '[0-9]{3}-[0-9]{4}')) AS n_phones, " +
        "regexp_replace(regexp_replace(pii, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', " +
        "'<EMAIL>', 'g'), '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrub FROM p) " +
        "SELECT doc_id, CAST(n_emails AS INT) AS n_emails, CAST(n_phones AS INT) AS n_phones, " +
        "md5(scrub) AS scrub_md5, CAST(len(scrub) AS BIGINT) AS scrub_len " +
        "FROM x ORDER BY doc_id"),
      "PII redaction: count + globally mask emails/phones, digest-verified"),

    "llm_chunk_dedup" -> DeclaredQuery(
      // Sub-document (chunk-level) duplication profile: split each doc
      // into consecutive FULL 8-token chunks, digest each, and report per
      // doc what fraction of its chunks occur MORE THAN ONCE corpus-wide
      // (a chunk repeated within one document counts too — internal
      // boilerplate is still boilerplate) — the granularity at which
      // repeated headers/footers show up even when whole-doc dedup
      // passes. Shuffle volume is one
      // (doc, 16-byte digest) pair per chunk — never the text — then one
      // digest-keyed count join and one per-doc aggregate. The size>=W
      // guard exists because Spark's sequence(0, -1) yields a DESCENDING
      // range rather than an empty one (and DuckDB drops such docs in
      // the unnest) — both engines therefore emit only docs with >= 1
      // full chunk.
      (s, d) => {
        val W = 8
        val t = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .filter(size(col("__toks")) >= W)
        val chunks = t.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), (floor(size(col("__toks")) / W)).cast("int") - 1),
            i => md5(concat_ws(" ", slice(col("__toks"), i * W + 1, lit(W)))))))
          .toDF("doc_id", "chunk_idx", "digest")
        val dup = chunks.groupBy("digest").agg(count(lit(1)).as("cnt"))
        chunks.join(dup, "digest")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"),
            round(sum(when(col("cnt") > 1, 1.0).otherwise(0.0)) / count(lit(1)), 6)
              .as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t0 AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "t AS (SELECT * FROM t0 WHERE len(toks) >= 8), " +
        "c AS (SELECT doc_id, md5(array_to_string(list_slice(toks, i*8+1, i*8+8), ' ')) AS digest " +
        "FROM t, unnest(generate_series(0, CAST(len(toks) // 8 AS INT) - 1)) AS u(i)), " +
        "d AS (SELECT digest, count(*) AS cnt FROM c GROUP BY 1) " +
        "SELECT c.doc_id, count(*) AS n_chunks, " +
        "CAST(sum(CASE WHEN d.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, " +
        "round(sum(CASE WHEN d.cnt > 1 THEN 1.0 ELSE 0.0 END) / count(*), 6) AS dup_frac " +
        "FROM c JOIN d USING (digest) GROUP BY c.doc_id ORDER BY doc_id"),
      "chunk-level dedup profile: 8-token chunk digests, corpus-dup fraction per doc"),

    "llm_quantize" -> DeclaredQuery(
      // Symmetric int8 quantization of the embedding column — the
      // storage/serving transform a 100 TB embedding table actually
      // ships (4× smaller, SIMD-friendly). Per vector: scale =
      // max|x|/127, q_i = round(x_i/scale) — round-to-integer is safe
      // cross-engine (both round half away from zero; no decimal-scaling
      // step to diverge). The md5 of the quantized codes proves
      // byte-identical quantization; relative RMSE audits the loss. All
      // per-row array expressions: embarrassingly parallel, zero
      // shuffles before the declared ORDER BY. The scale is BOUND TO A
      // COLUMN before the lambdas (an expression argument would
      // re-evaluate array_max per element — the measured O(d²) trap).
      (s, d) => {
        val t = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0)
              .as("__scale"))
        val qv = transform(col("embedding"),
          x => round(x.cast("double") / nullif(col("__scale"), lit(0.0))).cast("int"))
        t.select(col("vec_id"), col("__scale"), qv.as("__q"),
            aggregate(col("embedding"), lit(0.0), (acc, x) =>
              acc + pow(x.cast("double") -
                round(x.cast("double") / nullif(col("__scale"), lit(0.0))) * col("__scale"), 2))
              .as("__num"),
            aggregate(col("embedding"), lit(0.0), (acc, x) =>
              acc + pow(x.cast("double"), 2)).as("__den"))
          .select(col("vec_id"), round(col("__scale"), 6).as("scale"),
            md5(concat_ws(",", transform(col("__q"), _.cast("string")))).as("q_md5"),
            round(sqrt(col("__num") / nullif(col("__den"), lit(0.0))), 6).as("rel_rmse"))
          .orderBy(col("vec_id"))
      },
      Some("WITH t AS (SELECT vec_id, embedding, " +
        "list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale " +
        "FROM embeddings) " +
        "SELECT vec_id, round(scale, 6) AS scale, " +
        "md5(array_to_string(list_transform(embedding, " +
        "x -> CAST(CAST(round(CAST(x AS DOUBLE) / nullif(scale, 0)) AS INT) AS VARCHAR)), ',')) AS q_md5, " +
        "round(sqrt(list_aggregate(list_transform(embedding, " +
        "x -> pow(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / nullif(scale, 0)) * scale, 2)), 'sum') / " +
        "nullif(list_aggregate(list_transform(embedding, " +
        "x -> pow(CAST(x AS DOUBLE), 2)), 'sum'), 0)), 6) AS rel_rmse " +
        "FROM t ORDER BY vec_id"),
      "symmetric int8 embedding quantization: per-vector scale, code digest, rel RMSE"),

    "llm_domain_filter" -> DeclaredQuery(
      // URL/domain filtering — the first gate of every web-corpus
      // pipeline: parse the host out of each document's source URL,
      // classify its TLD, and flag blocklisted domains. The fixture has
      // no URL column, so the URL is built deterministically from the
      // doc's own keys (same augmentation idiom as llm_pii_scrub); the
      // host/TLD extraction is a shared regexp spelling (regexp_extract
      // group syntax is identical on both engines — no parse_url, whose
      // DuckDB twin differs). Per-row expressions + one tiny aggregate:
      // the per-TLD rollup a crawler dashboard actually reads.
      (s, d) => {
        val url = concat(lit("https://"), lower(col("source")), lit(".example."),
          when(col("doc_id") % 3 === 0, "com")
            .when(col("doc_id") % 3 === 1, "org").otherwise("net"),
          lit("/p/"), col("doc_id").cast("string"))
        val hostPat = "^https?://([^/]+)"
        val tldPat = "\\.([a-z]+)$"
        val t = Tables.documents(s, d)
          .select(col("doc_id"), url.as("__url"))
          .select(col("doc_id"),
            regexp_extract(col("__url"), hostPat, 1).as("host"))
          .withColumn("tld", regexp_extract(col("host"), tldPat, 1))
          .withColumn("blocked",
            col("tld") === "net" || col("host").isin("src0.example.com", "src1.example.org"))
        t.groupBy("tld")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"),
            sum(col("blocked").cast("long")).as("n_blocked"))
          .orderBy(col("tld"))
      },
      Some("WITH u AS (SELECT doc_id, 'https://' || lower(source) || '.example.' || " +
        "CASE WHEN doc_id % 3 = 0 THEN 'com' WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END " +
        "|| '/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents), " +
        "t AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM u), " +
        "x AS (SELECT doc_id, host, regexp_extract(host, '\\.([a-z]+)$', 1) AS tld, " +
        "(regexp_extract(host, '\\.([a-z]+)$', 1) = 'net' OR " +
        "host IN ('src0.example.com', 'src1.example.org')) AS blocked FROM t) " +
        "SELECT tld, count(*) AS n_docs, count(DISTINCT host) AS n_hosts, " +
        "CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked " +
        "FROM x GROUP BY tld ORDER BY tld"),
      "URL domain filtering: host/TLD extraction + blocklist flags, per-TLD rollup"),

    "llm_fingerprint" -> DeclaredQuery(
      // Document fingerprinting: whole-text digest + min-shingle digest
      // (a 1-hash MinHash — robust to local edits). md5 is the hash
      // because it is the one digest both engines spell identically.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), toks.as("__toks"))
        .select(col("doc_id"),
          md5(concat_ws(" ", col("__toks"))).as("fp_doc"),
          array_min(transform(TextOps.shingles(col("__toks"), 3), sh => md5(sh))).as("fp_shingle"))
        .orderBy(col("doc_id")),
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents) " +
        "SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp_doc, " +
        "list_min(list_transform(generate_series(1, len(toks) - 2), " +
        "i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS fp_shingle " +
        "FROM t ORDER BY doc_id"),
      "rolling-hash document fingerprint: full digest + min shingle digest"),

    "llm_lang_id" -> DeclaredQuery(
      // n-gram-heuristic language ID: score = hits of per-language marker
      // tokens; argmax with deterministic tie order. The fixture corpus is
      // English-vocabulary word soup, so the interesting part is the
      // deterministic scoring plumbing, not linguistic accuracy.
      (s, d) => {
        val t = col("__toks")
        def hits(words: Seq[String]) =
          size(filter(t, x => array_contains(lit(words.toArray), x)))
        val en = hits(Seq("the", "a", "is", "of"))
        val de = hits(Seq("der", "die", "das", "und"))
        val fr = hits(Seq("le", "la", "et", "les"))
        val es = hits(Seq("el", "los", "y", "que"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), toks.as("__toks"))
          .select(
          col("doc_id"), col("lang"),
          en.cast("long").as("s_en"),
          when(en >= de && en >= fr && en >= es && en > 0, "en")
            .when(de >= fr && de >= es && de > 0, "de")
            .when(fr >= es && fr > 0, "fr")
            .when(es > 0, "es")
            .otherwise("und").as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents), " +
        "x AS (SELECT doc_id, lang, " +
        "len(list_filter(toks, x -> list_contains(['the','a','is','of'], x))) AS en, " +
        "len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS de, " +
        "len(list_filter(toks, x -> list_contains(['le','la','et','les'], x))) AS fr, " +
        "len(list_filter(toks, x -> list_contains(['el','los','y','que'], x))) AS es FROM t) " +
        "SELECT doc_id, lang, CAST(en AS BIGINT) AS s_en, " +
        "CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en' " +
        "WHEN de >= fr AND de >= es AND de > 0 THEN 'de' " +
        "WHEN fr >= es AND fr > 0 THEN 'fr' WHEN es > 0 THEN 'es' ELSE 'und' END AS pred_lang " +
        "FROM x ORDER BY doc_id"),
      "marker-token language ID heuristic with deterministic argmax"),

    "llm_jaccard_pairs" -> DeclaredQuery(
      // Exact token-set Jaccard over a bounded candidate set: pairs within
      // the same `source` AND a doc_id window — the natural sharding key
      // plus a locality bound, so the pair count grows linearly in corpus
      // size, never quadratically. Filter on the ROUNDED value so both
      // engines make identical boundary decisions.
      // the surviving pairs (tiny: threshold-filtered) are pinned before
      // the global sort — the range exchange's bounds-sampling pass would
      // otherwise re-execute the whole join + set-scoring lineage a
      // second time (the barrier fence removed the aggregate exchange the
      // sampler used to read from; measured +0.3 s without this pin)
      (s, d) => jaccardDupPairs(s, d).localCheckpoint()
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"WITH $DupPairsSql " +
        "SELECT doc_a, doc_b, jaccard FROM p ORDER BY doc_a, doc_b"),
      "exact token-set Jaccard for same-source pairs (bounded candidates)"),

    "llm_dup_clusters" -> DeclaredQuery(
      // Duplicate-CLUSTER resolution — the step every real dedup pipeline
      // needs after pair generation: a pair list alone can't answer "keep
      // which copy?" when dups chain (A~B, B~C but A!~C must still
      // collapse to one survivor). Connected components over the verified
      // dup edge set by iterative min-label propagation: each round, every
      // node takes the min label among itself and its neighbors — one
      // equi-join + one partial-agg shuffle per round, converging in
      // O(max component diameter) rounds (dup clusters are shallow:
      // near-identical docs are mutually similar, so diameters stay in
      // the low single digits; the O(log n) large-star/small-star variant
      // of Kiveris et al., "Connected Components in MapReduce and
      // Beyond", SoCC'14, is the drop-in upgrade if they didn't).
      // `localCheckpoint` after each round truncates the lineage so round
      // k's plan doesn't replay rounds 1..k-1 — the standard Spark
      // iterative-graph guard. The fixpoint (min id per component) is
      // deterministic regardless of iteration schedule. Output: every doc
      // in some dup cluster, its canonical (cluster_id = min doc_id),
      // the cluster size, and keep = "is the canonical survivor".
      (s, d) => dupClusters(jaccardDupPairs(s, d)),
      // oracle: transitive closure by recursive CTE, then min reachable id
      // per node — the same fixpoint the propagation loop converges to
      Some(s"WITH RECURSIVE $DupPairsSql, " +
        "e AS (SELECT doc_a AS u, doc_b AS v FROM p " +
        "UNION ALL SELECT doc_b, doc_a FROM p), " +
        "reach(u, v) AS (SELECT u, v FROM e " +
        "UNION SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u), " +
        "cc AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u) " +
        "SELECT doc_id, cluster_id, " +
        "count(*) OVER (PARTITION BY cluster_id) AS n_members, " +
        "doc_id = cluster_id AS keep FROM cc ORDER BY doc_id"),
      "connected-component dup clusters with canonical survivor per cluster"),

    "llm_dedup_near" -> DeclaredQuery(
      // MinHash + LSH near-dedup — the 100 TB path: shingle → 64-slot
      // MinHash signature (one hash-aggregate per doc) → 16 bands × 4 rows
      // → candidates by equi-join on (band, band-signature) → exact
      // shingle-Jaccard verification of candidates only. Shuffle volume is
      // O(docs × bands); no cross product anywhere. Deterministic: the
      // hash family is xxhash64(shingle, seed). No DuckDB oracle (xxhash64
      // is not portable); MinHashSpec asserts candidate recall ⊇ exact
      // Jaccard ≥ τ pairs and the driver records a rows-only check.
      (s, d) => minhashDupPairs(Tables.documents(s, d), tau = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
      None,
      "MinHash(64) + LSH(16×4) shingle near-dedup, exact-verified candidates"),

    "llm_dup_clusters_lsh" -> DeclaredQuery(
      // Dup-cluster resolution over the LSH edge set — the production
      // companion to llm_dup_clusters, whose oracle-checkable edge source
      // (jaccardDupPairs) bounds candidates to same-source + a doc_id
      // window: dup clusters whose ids differ by >200 are invisible to
      // it. The MinHash edges carry no locality assumption, so this is
      // the variant that finds EVERY near-dup cluster at corpus scale;
      // star salvage in bucketCandidates keeps even a giant boilerplate
      // cluster connected to its canonical survivor. No oracle (xxhash64
      // not portable); LlmOpsSpec plants a far-apart dup pair the window
      // misses and a 200-member over-cap cluster, and asserts both
      // resolve here.
      (s, d) => dupClusters(minhashDupPairs(Tables.documents(s, d), tau = 0.5)),
      None,
      "connected-component dup clusters over the LSH edge set (no id-locality bound)"),

    "llm_dedup_simhash" -> DeclaredQuery(
      // SimHash near-dedup: 64-bit signature per doc (sign of per-bit
      // weight sums), candidates via 4 × 16-bit band equi-join, exact
      // Hamming verification with bit_count(xor). Same scale shape as
      // MinHash banding. Signatures are over 3-shingles, not tokens: the
      // fixture's 31-token vocabulary makes token sets near-identical
      // across ALL docs (every band would collide → quadratic candidate
      // blowup), while shingle sets only collide for real near-dups.
      // No oracle (xxhash64); rows-only check + spec.
      (s, d) => {
        val tok = TextOps.docShingles(Tables.documents(s, d), 3)
          .withColumn("__h", TextOps.baseHash(col("sh")))
        // ONE native aggregate (long[64] buffer → BIGINT signature), not
        // 64 sum(when(bit)) columns — bit-identical output. Pinned: the
        // signature table feeds three consumers (bands + both sides of
        // the Hamming join) that would each recompute the shingle hash
        // aggregate (tiny: one 16-byte row per doc)
        // (failure-mode choice, r20: localCheckpoint, not persist — the
        // pin feeds the returned frame, so it could not be unpersisted
        // inside the query; see jaccardDupPairs' fuller note)
        val sim = tok.groupBy("doc_id")
          .agg(TextOps.simHash(col("__h")).as("sim"))
          .localCheckpoint()
        val bands = sim.select(col("doc_id"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band"),
            shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("b"))
        // hot-bucket guard with star salvage — same quadratic-candidate
        // shield as llm_dedup_near; signatures join back by id (one row
        // per doc, 8-byte keys) for the exact Hamming verification
        graft.Q.bucketCandidates(bands, "b", "doc_id", cap = 64)
          .join(sim.select(col("doc_id").as("doc_a"), col("sim").as("sim_a")), "doc_a")
          .join(sim.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
          .filter(col("hamming") <= 8)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None,
      "SimHash(64-bit) near-dedup via 16-bit band join + Hamming ≤ 8"),

    "llm_sim_topk" -> DeclaredQuery(
      // Brute-force exact cosine top-k for a fixed query set (vec_id < 8):
      // the small side is broadcast, so the big side streams through with
      // NO shuffle — at 100 TB this is one scan. Rank on the ROUNDED score
      // (+ nbr_id tie-break) so both engines rank identically. The
      // unbounded-query-set scale path is llm_ann_lsh.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("nbr_id"),
            round(VectorOps.cosine(col("q_emb"), col("embedding")), 6).as("cos"))
        val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("nbr_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some {
        def ss(a: String, b: String) =
          s"list_sum(list_transform(generate_series(1, 64), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
        "WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8), " +
        "c AS (SELECT q_id, e.vec_id AS nbr_id, " +
        s"round(${ss("q_emb", "e.embedding")} / (sqrt(${ss("q_emb", "q_emb")}) * " +
        s"sqrt(${ss("e.embedding", "e.embedding")})), 6) + 0.0 AS cos " +
        "FROM q, embeddings e WHERE e.vec_id <> q.q_id) " +
        "SELECT q_id, nbr_id, cos, CAST(row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk " +
        "FROM c QUALIFY rnk <= 5 ORDER BY q_id, rnk"
      },
      "exact cosine top-5 per query vector (broadcast, shuffle-free scan)"),

    "llm_dedup_embed" -> DeclaredQuery(
      // Embedding-cosine near-dup pairs, exact, over a bounded block
      // (vec_id window ≤ 200): threshold on the rounded score. The
      // unbounded version of this is llm_ann_lsh (bucketed); this exact
      // variant exists for oracle-checkable correctness.
      (s, d) => {
        // Norms are computed ONCE per vector before the pair join. The id
        // window is realized as an EQUI-join on a block key (each left row
        // fans out to its own and the next block) so the planner builds a
        // hash/sort-merge join — a pure range condition would plan as a
        // BroadcastNestedLoopJoin and evaluate the (pushed-down) cosine
        // over the full n² grid, interpreted. This shape is also the one
        // that scales: shuffle on blk, candidates per block bounded by W.
        val W = 200
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm(col("embedding")).as("nrm"),
            floor(col("vec_id") / W).as("blk"))
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
          col("nrm").as("nrm_a"), explode(array(col("blk"), col("blk") + 1)).as("jblk"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
          col("nrm").as("nrm_b"), col("blk").as("jblk_b"))
        val scored = a.join(b, col("jblk") === col("jblk_b") &&
            col("id_b") > col("id_a") && col("id_b") <= col("id_a") + W)
          .select(col("id_a"), col("id_b"),
            round(VectorOps.dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6).as("cos"))
        // survivors pinned before the global sort: the range exchange's
        // bounds-sampling pass would otherwise evaluate the whole
        // join + cosine lineage a second time (see llm_jaccard_pairs)
        graft.Q.aggFilterBarrier(scored, Seq("id_a", "id_b"), "cos", col("cos") >= 0.3)
          .localCheckpoint()
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${CosSql("a.embedding", "b.embedding")} AS cos " +
        "FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 200) " +
        "SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3 ORDER BY id_a, id_b"),
      "exact embedding-cosine near-dup pairs over a bounded id window"),

    "llm_semdedup" -> DeclaredQuery(
      // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:
      // 2303.09540): cluster embeddings into K coarse cells, then drop
      // any vector with a smaller-id same-cell neighbor above the
      // cosine threshold — duplicates are only searched WITHIN a cell,
      // so the quadratic term is (n/K)² per cell, tuned by K, never n².
      // Cell assignment is the shared IVF scan (IvfIndex.assign); the
      // within-cell pair join is RANK-BOUNDED (Q.boundedCellPairs,
      // cap=256): at fixture scale every cell is under the cap so the
      // result — and the oracle — is the exact all-pairs semantics,
      // while an over-cap mega-cell (the regime where fixed-K SemDeDup
      // goes quadratic) emits n·cap pairs, never n² (A/B-pinned in
      // LlmOpsSpec). The heavy cosine sits behind the aggregate barrier
      // so it is computed once per pair, map-side, codegen'd.
      // Output: every vector with its cell and keep flag.
      (s, d) => {
        val cells = IvfIndex.assign(Tables.embeddings(s, d), 16)
          .withColumn("nrm", VectorOps.norm(col("embedding")))
        val scored = graft.Q.boundedCellPairs(cells, "cell", "vec_id", 256)
          .select(col("vec_id_a").as("id_a"), col("vec_id_b").as("id_b"),
            round(VectorOps.dot(col("embedding_a"), col("embedding_b")) /
              (col("nrm_a") * col("nrm_b")), 6).as("cos"))
        val dominated = graft.Q
          .aggFilterBarrier(scored, Seq("id_a", "id_b"), "cos", col("cos") >= 0.3)
          .select(col("id_b"), lit(1).as("__dom")).distinct()
        cells.select(col("vec_id"), col("cell"))
          .join(dominated, col("vec_id") === col("id_b"), "left")
          .select(col("vec_id"), col("cell"), col("__dom").isNull.as("keep"))
          .orderBy(col("vec_id"))
      },
      Some(s"WITH $IvfAssignCtes, " +
        "cells AS (SELECT a.vec_id, CAST(cent_id AS BIGINT) AS cell, e.embedding " +
        "FROM a JOIN embeddings e USING (vec_id) WHERE rn = 1), " +
        "p AS (SELECT x.vec_id AS ia, y.vec_id AS ib, " +
        s"${CosSql("x.embedding", "y.embedding")} AS cos " +
        "FROM cells x JOIN cells y ON x.cell = y.cell AND y.vec_id > x.vec_id) " +
        "SELECT vec_id, cell, NOT EXISTS (SELECT 1 FROM p WHERE ib = vec_id " +
        "AND cos >= 0.3) AS keep FROM cells ORDER BY vec_id"),
      "SemDeDup: cluster embeddings into K cells, drop within-cell cosine dups"),

    "llm_cms_counts" -> DeclaredQuery(
      // CountMinSketch token frequencies — the last member of the
      // sketch family (HLL distinct, approx percentiles, MinHash/
      // SimHash signatures, Bloom membership): per-language CMS over
      // every token via Spark's native count_min_sketch aggregate
      // (binary, MERGEABLE — the daily-shard → global-union pattern of
      // agg_hll_union applies unchanged), probed for a fixed token
      // set. The sketch travels driver-side ONCE per language
      // (KB-sized by construction: width=⌈e/ε⌉ counters); estimates
      // are deterministic (fixed seed). CMS guarantees OVERESTIMATE
      // only, ≤ ε·N with confidence δ — pinned vs exact counts in
      // LlmOpsSpec. No oracle by design: the sketch binary is
      // Spark-internal, like the HLL family.
      (s, d) => {
        import s.implicits._
        // fixture-vocabulary probes (the synthetic corpus speaks SQL):
        // high-frequency in every language, so estimates are meaningful
        val probes = Seq("hash", "join", "data", "scan", "row")
        val sk = Tables.documents(s, d)
          .select(col("lang"), explode(toks).as("tok"))
          .groupBy("lang")
          .agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("cms"),
            count(lit(1)).as("n_tokens"))
          .collect()
        val rows = sk.flatMap { r =>
          val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("cms")))
          probes.map(p => (r.getString(0), p, cms.estimateCount(p),
            r.getAs[Long]("n_tokens")))
        }.toSeq
        rows.toDF("lang", "tok", "est", "n_tokens")
          .orderBy(col("lang"), col("tok"))
      },
      None,
      "CountMinSketch token counts per language (mergeable sketch, fixed probe set)"),

    "llm_topk_tokens" -> DeclaredQuery(
      // Vocabulary building: top-5 tokens per language by document
      // frequency. The rank-then-filter shape is rewritten by Spark 4 to
      // WindowGroupLimitExec — per-partition top-k BEFORE the shuffle, so
      // at 100 TB only k rows per (lang, partition) ever move.
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("lang"), explode(toks).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang").orderBy(desc("n"), asc("tok"))
        counts.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .orderBy(col("lang"), col("rnk"))
      },
      Some(s"WITH t AS (SELECT lang, unnest($ToksSql) AS tok " +
        "FROM documents), c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY lang, tok) " +
        "SELECT lang, tok, n, rnk FROM (SELECT lang, tok, n, " +
        "CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS BIGINT) AS rnk FROM c) " +
        "WHERE rnk <= 5 ORDER BY lang, rnk"),
      "vocabulary builder: top-5 tokens per language by frequency"),

    "llm_ann_ivf" -> DeclaredQuery(
      // IVF (inverted-file) approximate NN — the other classic ANN scale
      // path next to LSH: (1) assign every vector to its nearest of K
      // coarse centroids in ONE scan with the centroid table broadcast
      // (the "inverted lists"); (2) a query probes only its nprobe=2
      // nearest cells — candidates come from an EQUI-join on cell id, so
      // shuffle volume is O(list sizes), never n². Centroid "training" is
      // deterministic here (first K vectors) which also makes the whole
      // query SQL-expressible — unlike LSH, IVF gets a real DuckDB oracle.
      // All ranking is on 6dp-rounded cosines with id tie-breaks.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        // Centroids are collected to the driver and baked in as LITERALS:
        // K coarse centroids always fit on the driver (IVF training is an
        // offline step), and literal centroids make cell assignment a
        // pure map-side expression — ONE scan, ZERO shuffle, vs the
        // n×K-row window shuffle a join+rank formulation would cost.
        val cents: Seq[(Int, Array[Float])] = e.filter(col("vec_id") < K)
          .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
          .sortBy(_._1).toSeq
        // rounded cosine against a literal centroid — float widened to
        // double, left-to-right sum, (‖v‖·‖c‖) order: exactly the oracle's
        // list_sum(list_transform(...)) arithmetic, so 6dp values agree.
        def ccos(cEmb: Array[Float]): Column = {
          val cNorm = math.sqrt(cEmb.map(x => x.toDouble * x.toDouble)
            .foldLeft(0.0)(_ + _))
          round(VectorOps.dot(col("embedding"), typedlit(cEmb)) /
            (VectorOps.norm(col("embedding")) * lit(cNorm)), 6)
        }
        // (ccos, -cent_id) structs: lexicographic array_sort + reverse ≙
        // ORDER BY ccos DESC, cent_id ASC — the oracle's tie-break.
        val ranked = reverse(array_sort(array(cents.map { case (id, emb) =>
          struct(ccos(emb).as("c"), lit(-id).as("nid"))
        }: _*)))
        val assigned = e.select(col("vec_id"), col("embedding"), ranked.as("rk"))
        // inverted lists carry the vector: candidates need no second join
        val cells = assigned.select(col("vec_id"), col("embedding"),
          (-col("rk")(0).getField("nid")).as("cell"))
        val queries = assigned.filter(col("vec_id") >= K && col("vec_id") < K + 8)
        val probes = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          explode(slice(col("rk"), 1, NProbe)).as("p"))
          .select(col("q_id"), col("q_emb"), (-col("p").getField("nid")).as("cell"))
        val scored = broadcast(probes).join(cells, "cell")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("nbr_id"),
            round(VectorOps.cosine(col("q_emb"), col("embedding")), 6).as("cos"))
        val wT = Window.partitionBy("q_id").orderBy(desc("cos"), asc("nbr_id"))
        scored.withColumn("rnk", row_number().over(wT).cast("long"))
          .filter(col("rnk") <= TopK)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfOracleSql),
      "IVF approximate NN: 16 coarse cells, 2-probe, exact rerank top-3"),

    "llm_ann_ivf_indexed" -> DeclaredQuery(
      // The PERSISTED-index IVF path — train once, probe many: build
      // writes centroids + cell-PARTITIONED inverted lists through the
      // TsStore layout in one step; probe picks each query's 2 nearest
      // cells from the centroid table and reads ONLY those cells'
      // partitions (bounded probed-cell ids become an IN-list on the
      // partition column → plan-time pruning, PlanSpec-pinned). Identical
      // semantics to llm_ann_ivf — same oracle — but candidate IO scales
      // with the probed lists, not the corpus: the 100 TB serving shape.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val dir = graft.Q.scratchDir(s"ivf_idx_${new java.io.File(d).getName}")
        IvfIndex.build(Tables.embeddings(s, d), dir, K)
        val queries = Tables.embeddings(s, d)
          .filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        IvfIndex.probe(s, dir, queries, NProbe, TopK)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfOracleSql),
      "persisted IVF index: cell-partitioned inverted lists, pruned 2-probe, top-3"),

    "llm_ann_ivf_filtered" -> DeclaredQuery(
      // FILTERED vector search — the retrieval-with-constraints shape
      // (tenant/language/license scoping, hard-negative mining by label):
      // the index stores PAYLOAD columns next to the vectors
      // (build(payloadCols)), and probe applies the predicate to the
      // candidates BEFORE ranking — pre-filter semantics, so the top-k
      // is over the allowed set (a post-filter returns < k whenever
      // allowed matches rank low, the classic filtered-ANN pitfall). The
      // payload rides the inverted lists, so filtering costs zero extra
      // joins; the oracle is the IVF oracle with the same label scope on
      // the index side.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val dir = graft.Q.scratchDir(s"ivf_flt_${new java.io.File(d).getName}")
        IvfIndex.build(Tables.embeddings(s, d), dir, K,
          payloadCols = Seq("label"))
        val queries = Tables.embeddings(s, d)
          .filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        IvfIndex.probe(s, dir, queries, NProbe, TopK,
            filter = Some(col("label") % 2 === 0))
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfFilteredOracleSql),
      "filtered vector search: payload columns in the inverted lists, pre-filter before top-k"),

    "llm_ann_recall_eval" -> DeclaredQuery(
      // The ANN EVALUATION harness — recall@k of the persisted IVF index
      // against exact search, per query: the metric every index tuning
      // loop (k, nprobe, quantization) optimizes. Exact side = brute
      // force over the corpus with the query batch broadcast (the
      // llm_sim_topk shape — one corpus scan); approx side = the
      // persisted index probe (partition-pruned cells read); hits join
      // on (q_id, nbr_id). Both sides rank on 6dp-rounded cosines with
      // id tie-breaks, so the top-k SETS are engine-identical and recall
      // is exact arithmetic. At 100 TB the exact side is the expensive
      // one — run on a sample, exactly as here (8 queries).
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val dir = graft.Q.scratchDir(s"ivf_rec_${new java.io.File(d).getName}")
        IvfIndex.build(Tables.embeddings(s, d), dir, K)
        val queries = Tables.embeddings(s, d)
          .filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val approx = IvfIndex.probe(s, dir, queries, NProbe, TopK)
          .select(col("q_id"), col("nbr_id"))
        val wE = Window.partitionBy("q_id").orderBy(desc("cos"), asc("nbr_id"))
        val exact = broadcast(queries)
          .join(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("nbr_id"),
            round(graft.functions.VectorOps.cosine(col("q_emb"), col("embedding")), 6)
              .as("cos"))
          .withColumn("rnk", row_number().over(wE))
          .filter(col("rnk") <= TopK)
          .select(col("q_id"), col("nbr_id"))
        exact.join(approx.withColumn("__hit", lit(1)),
            Seq("q_id", "nbr_id"), "left_outer")
          .groupBy("q_id")
          .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"),
            round(sum(coalesce(col("__hit"), lit(0))) / lit(TopK.toDouble), 6)
              .as("recall"))
          .orderBy(col("q_id"))
      },
      Some(IvfRecallOracleSql),
      "ANN evaluation harness: per-query recall@3 of the IVF index vs exact search"),

    "llm_ann_recall_trained" -> DeclaredQuery(
      // The TRAINED index through the same evaluation harness:
      // build(train=true) runs sampled k-means++ + Lloyd (seed 42,
      // spherical) instead of first-K seeding, so cells follow the
      // corpus geometry and a fixed nprobe recovers more of the true
      // neighbors. Own-test (no oracle): k-means centroids are not
      // SQL-portable; determinism comes from the fixed seed + corpus
      // (IvfSpec pins centroid determinism, and strictly-better recall
      // on its CLUSTERED fixture — on unstructured corpora like the
      // driver's synthetic embeddings the two seedings are comparable
      // and either may edge ahead, so no cross-index pin here). At
      // 100 TB training cost is one sampled pass, paid once per index
      // build — probe cost is unchanged.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val sf = new java.io.File(d).getName
        val dirT = graft.Q.scratchDir(s"ivf_rect_$sf")
        IvfIndex.build(Tables.embeddings(s, d), dirT, K, train = true)
        val queries = Tables.embeddings(s, d)
          .filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wE = Window.partitionBy("q_id").orderBy(desc("cos"), asc("nbr_id"))
        val exact = broadcast(queries)
          .join(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("nbr_id"),
            round(graft.functions.VectorOps.cosine(col("q_emb"), col("embedding")), 6)
              .as("cos"))
          .withColumn("rnk", row_number().over(wE))
          .filter(col("rnk") <= TopK)
          .select(col("q_id"), col("nbr_id"))
        val trained =
          exact.join(IvfIndex.probe(s, dirT, queries, NProbe, TopK)
              .select(col("q_id"), col("nbr_id")).withColumn("__hit", lit(1)),
            Seq("q_id", "nbr_id"), "left_outer")
            .groupBy("q_id")
            .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"),
              round(sum(coalesce(col("__hit"), lit(0))) / lit(TopK.toDouble), 6)
                .as("recall"))
        val meanT = trained.agg(avg("recall")).head().getDouble(0)
        require(meanT > 0.0,
          f"trained IVF recall collapsed: mean=$meanT%.4f at nprobe=$NProbe")
        trained.orderBy(col("q_id"))
      },
      None,
      "trained (k-means++) IVF through the recall harness — own-test, " +
        "non-collapse pin (recall > 0 at nprobe=2); centroid determinism " +
        "and clustered-fixture superiority pinned in IvfSpec"),

    "llm_ann_ivf_quantized" -> DeclaredQuery(
      // The QUANTIZED persisted index — llm_quantize's symmetric int8
      // path wired into the cells table: codes are ONE binary value
      // (byte/dim, 4× smaller than the float column) plus a per-vector
      // scale. Probing runs two passes: approximate scoring over the
      // CODES column only (the scale cancels in cosine, and parquet's
      // columnar layout keeps the float pages unread — IvfSpec pins the
      // codes-only ReadSchema), then an EXACT float rerank of the
      // surviving rerankFactor×topK pool through an id-bounded read
      // that reaches row-group stats on the vec_id-sorted chunks. Same
      // oracle as the float index: the rerank's scores/ordering are
      // exact, and the pool bound doesn't bite at this fixture (parity
      // also pinned in IvfSpec against the float path).
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val dir = graft.Q.scratchDir(s"ivf_q_${new java.io.File(d).getName}")
        IvfIndex.build(Tables.embeddings(s, d), dir, K, quantized = true)
        val queries = Tables.embeddings(s, d)
          .filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        IvfIndex.probe(s, dir, queries, NProbe, TopK)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfOracleSql),
      "quantized IVF: int8-coded cells (4x less probe IO), exact float rerank of the pool"),

    "llm_ann_ivf_add" -> DeclaredQuery(
      // INCREMENTAL index maintenance, oracle-gated end-to-end: build
      // the index over only the FIRST HALF of the corpus, then
      // IvfIndex.add the second half — assignment against the persisted
      // centroids, latest-wins upsert into ONLY the touched cell
      // partitions (TsStore's manifest-committed pruned MERGE). Cell
      // assignment depends only on the centroids (the deterministic
      // first 16 vectors, present in the first half), so build+add must
      // probe IDENTICALLY to the full one-shot build — the shared
      // IvfOracleSql pins that: any row the add path loses, duplicates,
      // or mis-cells breaks the hash. At 100 TB this is the difference
      // between re-clustering a corpus and committing a day's new
      // vectors against yesterday's index.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val e = Tables.embeddings(s, d)
        val splitAt = 250L // sf-fixed half point; seeds (vec_id < 16) stay in the build half
        val dir = graft.Q.scratchDir(s"ivf_add_${new java.io.File(d).getName}")
        IvfIndex.build(e.filter(col("vec_id") < splitAt), dir, K)
        IvfIndex.add(s, dir, e.filter(col("vec_id") >= splitAt))
        val queries = e.filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        IvfIndex.probe(s, dir, queries, NProbe, TopK)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfOracleSql),
      "incremental IVF: build on half the corpus, add() the rest, probe == one-shot build"),

    "llm_ann_ivf_remove" -> DeclaredQuery(
      // Index-side takedown, oracle-gated: build the full index, REMOVE
      // every 37th vector (IvfIndex.remove = file-granular manifest
      // delete on the cells table — only the chunks holding matches are
      // rewritten, removed vectors stay probeable asOf prior versions
      // until vacuum), then probe. The oracle recomputes the IVF result
      // with the removed ids excluded from the index side only, so a
      // resurrected neighbor, a lost survivor, or a mis-celled rewrite
      // breaks the hash. With build/add/probe this completes the index
      // maintenance verbs a 100 TB serving corpus needs.
      (s, d) => {
        val K = 16; val NProbe = 2; val TopK = 3
        val e = Tables.embeddings(s, d)
        val dir = graft.Q.scratchDir(s"ivf_rm_${new java.io.File(d).getName}")
        IvfIndex.build(e, dir, K)
        IvfIndex.remove(s, dir, col("vec_id") % 37 === 0)
        val queries = e.filter(col("vec_id") >= K && col("vec_id") < K + 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        IvfIndex.probe(s, dir, queries, NProbe, TopK)
          .orderBy(col("q_id"), col("rnk"))
      },
      Some(IvfRemoveOracleSql),
      "index takedown: remove vectors via a manifest delete, probe == index rebuilt without them"),

    "llm_ngram_freq" -> DeclaredQuery(
      // n-gram language-model statistics: per-source top-3 bigrams by
      // DOCUMENT frequency (distinct doc per bigram, the dedup-corpus
      // convention). explode → distinct → hash agg → WindowGroupLimit:
      // every stage is shuffle-bounded, k rows per group move at the end.
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), toks.as("__toks"))
          .select(col("doc_id"), col("source"),
            explode(TextOps.shingles(col("__toks"), 2)).as("bg"))
          .distinct()
        val c = t.groupBy("source", "bg").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("source").orderBy(desc("df"), asc("bg"))
        c.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .orderBy(col("source"), col("rnk"))
      },
      Some(s"WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents), " +
        "s AS (SELECT DISTINCT doc_id, source, unnest(list_transform(" +
        "generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t), " +
        "c AS (SELECT source, bg, count(*) AS df FROM s GROUP BY source, bg) " +
        "SELECT source, bg, df, rnk FROM (SELECT source, bg, df, " +
        "CAST(row_number() OVER (PARTITION BY source ORDER BY df DESC, bg) AS BIGINT) AS rnk FROM c) " +
        "WHERE rnk <= 3 ORDER BY source, rnk"),
      "bigram document-frequency top-3 per source (n-gram LM statistics)"),

    "llm_decontaminate" -> DeclaredQuery(
      // Benchmark decontamination — the training-pipeline gate that keeps
      // eval data out of the training corpus: flag every corpus document
      // sharing an n-gram with the held-out eval split (docs with
      // doc_id % 50 == 0 play the benchmark set; 3-gram granularity is
      // the fixture-scale stand-in for the customary 13-grams — the
      // 31-token fixture vocabulary makes trigram collisions common
      // enough to exercise the hit-counting path, ~257 flagged docs at
      // sf0.01). Scale
      // shape: the eval n-gram set is benchmark-sized (thousands of
      // docs, not billions) → broadcast, so contamination detection is
      // ONE scan of corpus shingles with a map-side hash probe; the only
      // shuffle is the per-doc hit count. docShingles emits distinct
      // (doc_id, shingle) pairs, so count(*) after the probe is the
      // distinct contaminated-gram count.
      (s, d) => {
        val g = TextOps.docShingles(Tables.documents(s, d), 3)
        val evalGrams = g.filter(col("doc_id") % 50 === 0)
          .select(col("sh")).distinct()
        g.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(evalGrams), "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_eval_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, unnest(list_transform(" +
        "generate_series(1, len(toks) - 2), " +
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM t), " +
        "e AS (SELECT DISTINCT sh FROM g WHERE doc_id % 50 = 0) " +
        "SELECT g.doc_id, count(*) AS n_eval_grams FROM g JOIN e USING (sh) " +
        "WHERE g.doc_id % 50 <> 0 GROUP BY g.doc_id ORDER BY doc_id"),
      "benchmark decontamination: corpus docs sharing 3-grams with the eval split"),

    "llm_train_split" -> DeclaredQuery(
      // Deterministic train/val/test split by content-independent hash of
      // the document KEY (md5 of the id string, first hex nibble:
      // 0..b=train 12/16, c..d=val 2/16, e..f=test 2/16). Hash splitting
      // is the only assignment that stays stable under reprocessing,
      // resharding, and incremental appends — row_number() or rand()
      // would reshuffle docs between splits on every run. Pure per-row
      // projection; md5 is engine-portable so the oracle is exact.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), splitCol.as("split"))
        .orderBy(col("doc_id")),
      Some(s"SELECT doc_id, $SplitCaseSql AS split FROM documents ORDER BY doc_id"),
      "deterministic hash-based train/val/test split (md5 nibble)"),

    "llm_sample_mix" -> DeclaredQuery(
      // Deterministic data mixing — per-source sampling rates (the
      // "3 parts web to 1 part code" recipe every pretraining corpus
      // uses), decided per document by a content-independent KEY hash so
      // the sample is stable under reprocessing, resharding, and
      // incremental appends (rand() resamples every run; row_number
      // depends on physical layout). The keep rule compares an md5
      // nibble's hex position against the source's rate in 16ths
      // (fixture recipe: source number % 4 → 4/8/12/16 sixteenths).
      // Nibble POSITION 2 keeps mixing independent of llm_train_split's
      // position-1 nibble — a doc's split and its mixing survival are
      // uncorrelated. Pure per-row projection+filter: embarrassingly
      // parallel, no shuffle at all before the declared ORDER BY.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          mixRate16.cast("long").as("rate16"), mixNibPos.cast("long").as("__nib"))
        .filter(col("__nib") <= col("rate16"))
        .select(col("doc_id"), col("source"), col("rate16"))
        .orderBy(col("doc_id")),
      Some(s"SELECT doc_id, source, CAST($MixRate16Sql AS BIGINT) AS rate16 " +
        s"FROM documents WHERE $MixNibPosSql <= $MixRate16Sql ORDER BY doc_id"),
      "deterministic per-source mixing: md5-nibble keep at source-derived rates"),

    "llm_pack_sequences" -> DeclaredQuery(
      // Sequence packing — the last step before a training corpus hits
      // the GPU: documents are concatenated in a stable order and chunked
      // into fixed token-budget sequences (budget 512 here), so each doc
      // gets (pack_id, offset) coordinates. Pure window arithmetic: an
      // EXCLUSIVE running token sum per source shard (docs straddle pack
      // boundaries — the standard concat-then-chunk scheme), then integer
      // div/mod. One shuffle (the window's, by shard); integer-only math
      // so the oracle is exact. At 100 TB the shard key is what bounds
      // window partition size — source plays that role here.
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), size(toks).cast("long").as("n_toks"))
          .withColumn("off", coalesce(sum("n_toks").over(w), lit(0L)))
          .select(col("doc_id"), col("source"), col("n_toks"),
            expr("off div 512").as("pack_id"),
            (col("off") % 512).as("pack_offset"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, source, " +
        s"CAST(len($ToksSql) AS BIGINT) AS n_toks FROM documents), " +
        // sum() OVER returns HUGEINT in DuckDB — cast back to BIGINT so
        // the integer div/mod results match Spark's LongType exactly
        "o AS (SELECT doc_id, source, n_toks, coalesce(CAST(sum(n_toks) OVER (" +
        "PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off FROM t) " +
        "SELECT doc_id, source, n_toks, CAST(off // 512 AS BIGINT) AS pack_id, " +
        "CAST(off % 512 AS BIGINT) AS pack_offset FROM o ORDER BY doc_id"),
      "sequence packing: concat-then-chunk (pack_id, offset) per doc at budget 512"),

    "llm_unigram_score" -> DeclaredQuery(
      // Unigram LM scoring — the classic perplexity-proxy quality filter:
      // per-doc mean log-probability under the corpus's own unigram
      // distribution. The probability table is VOCABULARY-sized, so the
      // whole-corpus normalizer is a window over that tiny table and the
      // doc join broadcasts it — at 100 TB the only per-token work is one
      // broadcast-hash probe, and token explosion shuffles once for the
      // vocab count. avg(ln p) is rounded at 6dp; the summands are O(1)
      // magnitudes so partial-sum order divergence is ~1e-14, far inside
      // the rounding.
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .select(col("doc_id"), explode(col("__toks")).as("tok"))
        val freq = t.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy()
        val fp = freq.select(col("tok"),
          (col("cnt").cast("double") / sum(col("cnt")).over(w).cast("double")).as("p"))
        t.join(broadcast(fp), "tok")
          .groupBy("doc_id")
          .agg(round(avg(log(col("p"))), 6).as("score"),
            count(lit(1)).as("n_toks"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, unnest($ToksSql) AS tok FROM documents), " +
        "f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok), " +
        "fp AS (SELECT tok, CAST(cnt AS DOUBLE) / CAST((SELECT sum(cnt) FROM f) AS DOUBLE) AS p FROM f) " +
        "SELECT doc_id, round(avg(ln(p)), 6) AS score, count(*) AS n_toks " +
        "FROM t JOIN fp USING (tok) GROUP BY doc_id ORDER BY doc_id"),
      "unigram LM quality score: per-doc mean log-probability"),

    "llm_bigram_score" -> DeclaredQuery(
      // Bigram LM scoring with Laplace smoothing — the stronger
      // perplexity-proxy filter one rung above llm_unigram_score:
      // per-doc mean ln((c(a,b)+1) / (c(a)+V)) under the corpus's own
      // bigram counts. Scale shape: bigrams come from zip_with over the
      // already-materialized token array (no positional self-join), the
      // doc↔bigram-count join shuffles once on the dense (a,b) key, the
      // CONTEXT table is vocabulary-sized and broadcasts, and V is a
      // one-row broadcast cross join. Docs under 2 tokens drop out on
      // both sides (slice guards mirrored). O(1)-magnitude summands +
      // 6dp rounding absorb partial-sum order noise, as in the unigram
      // precedent.
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"), toks.as("__toks"))
        val bi = t.filter(size(col("__toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            "zip_with(slice(__toks, 1, size(__toks)-1), " +
              "slice(__toks, 2, size(__toks)-1), (x, y) -> struct(x AS a, y AS b))"))
            .as("bg"))
          .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
        val cab = bi.groupBy("a", "b").agg(count(lit(1)).as("cab"))
        val ca = cab.groupBy("a").agg(sum(col("cab")).as("ca"))
        val vDf = t.select(explode(col("__toks")).as("tok"))
          .agg(countDistinct(col("tok")).as("v"))
        bi.join(cab, Seq("a", "b"))
          .join(broadcast(ca), Seq("a"))
          .crossJoin(broadcast(vDf))
          .groupBy("doc_id")
          .agg(round(avg(log((col("cab") + lit(1.0)) /
            (col("ca") + col("v")).cast("double"))), 6).as("score"),
            count(lit(1)).as("n_bigrams"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS a, " +
        "unnest(toks[2:len(toks)]) AS b FROM t WHERE len(toks) >= 2), " +
        "u AS (SELECT unnest(toks) AS tok FROM t), " +
        "cab AS (SELECT a, b, count(*) AS cab FROM bi GROUP BY a, b), " +
        "ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cab GROUP BY a), " +
        "v AS (SELECT count(DISTINCT tok) AS v FROM u) " +
        "SELECT doc_id, round(avg(ln((cab + 1.0) / CAST(ca + v AS DOUBLE))), 6) AS score, " +
        "count(*) AS n_bigrams FROM bi JOIN cab USING (a, b) JOIN ca USING (a) " +
        "CROSS JOIN v GROUP BY doc_id ORDER BY doc_id"),
      "bigram LM quality score: Laplace-smoothed mean log-probability per doc"),

    "llm_corpus_clean" -> DeclaredQuery(
      // The end-to-end corpus-cleaning pipeline in ONE declared query:
      // quality gate (length bounds + stopword-ratio floor) → exact dedup
      // on the md5 digest (keep min doc_id) → deterministic hash split →
      // per-(split, lang) corpus stats. Every stage is shuffle-bounded:
      // the gate is a map-side filter, dedup shuffles 16-byte digests,
      // split is a pure projection, stats one hash aggregate.
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("text"),
            col("n_chars").cast("long").as("n_chars"), toks.as("__toks"))
          .withColumn("__stop_ratio",
            size(filter(col("__toks"), t => t.isin(Stopwords: _*))).cast("double") /
              nullif(size(col("__toks")).cast("double"), lit(0.0)))
          .filter(col("n_chars").between(80, 2000) && col("__stop_ratio") >= 0.05)
        val kept = t
          .withColumn("__dig", md5(encode(lower(trim(col("text"))), "UTF-8")))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("__dig")).orderBy(col("doc_id"))))
          .filter(col("__rn") === 1)
        kept.select(col("lang"), splitCol.as("split"), col("n_chars"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("split"), col("lang"))
      },
      Some(s"WITH t AS (SELECT doc_id, lang, text, CAST(n_chars AS BIGINT) AS n_chars, " +
        s"$ToksSql AS toks FROM documents), " +
        "g AS (SELECT *, CAST(len(list_filter(toks, x -> list_contains(" +
        s"$StopSqlList, x))) AS DOUBLE) / nullif(len(toks), 0) AS sr FROM t " +
        "WHERE n_chars BETWEEN 80 AND 2000), " +
        "q AS (SELECT * FROM g WHERE sr >= 0.05), " +
        "k AS (SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text))) " +
        "ORDER BY doc_id) AS rn FROM q), " +
        s"s AS (SELECT lang, n_chars, $SplitCaseSql AS split FROM k WHERE rn = 1) " +
        "SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars " +
        "FROM s GROUP BY split, lang ORDER BY split, lang"),
      "end-to-end corpus cleaning: quality gate → exact dedup → split → stats"),

    "llm_pipeline_full" -> DeclaredQuery(
      // The COMPLETE modern pretraining-data pipeline as one declared
      // query — every stage is one of this engine's operators, composed:
      //   length gate → exact dedup (16-byte digest shuffle) →
      //   benchmark decontamination (broadcast eval-gram anti-join) →
      //   deterministic per-source mixing (md5 nibble 2) →
      //   hash train/val/test split (md5 nibble 1) →
      //   sequence packing (exclusive running sum per (split, source))
      // → per-(split, source) corpus accounting: docs, tokens, packs.
      // Scale: the only shuffles are the dedup digest, the pack window's
      // (split, source), and the final stats aggregate; decontamination
      // is a map-side broadcast probe, gate/mix/split are projections.
      (s, d) => {
        val all = Tables.documents(s, d)
        val base = all
          .select(col("doc_id"), col("source"), col("text"),
            col("n_chars").cast("long").as("n_chars"), toks.as("__toks"))
          .filter(col("n_chars").between(80, 2000))
        val dedup = base
          .withColumn("__dig", md5(encode(lower(trim(col("text"))), "UTF-8")))
          .withColumn("__rn", row_number().over(
            Window.partitionBy("__dig").orderBy("doc_id")))
          .filter(col("__rn") === 1)
        val g = TextOps.docShingles(all, 3)
        val evalG = g.filter(col("doc_id") % 50 === 0).select("sh").distinct()
        val contaminated = g.join(broadcast(evalG), "sh").select("doc_id").distinct()
        val clean = dedup.filter(col("doc_id") % 50 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
        val mixed = clean.filter(mixNibPos <= mixRate16)
          .select(col("doc_id"), col("source"), splitCol.as("split"),
            size(col("__toks")).cast("long").as("n_toks"))
        val w = Window.partitionBy("split", "source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        mixed.withColumn("off", coalesce(sum("n_toks").over(w), lit(0L)))
          .withColumn("pack_id", expr("off div 512"))
          .groupBy("split", "source")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("total_toks"),
            countDistinct("pack_id").as("n_packs"))
          .orderBy(col("split"), col("source"))
      },
      Some(s"WITH t AS (SELECT doc_id, source, text, CAST(n_chars AS BIGINT) AS n_chars, " +
        s"$ToksSql AS toks FROM documents), " +
        "base AS (SELECT * FROM t WHERE n_chars BETWEEN 80 AND 2000), " +
        "k AS (SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text))) " +
        "ORDER BY doc_id) AS rn FROM base), " +
        "ded AS (SELECT * FROM k WHERE rn = 1), " +
        "g AS (SELECT DISTINCT doc_id, unnest(list_transform(" +
        "generate_series(1, len(toks) - 2), " +
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM t), " +
        "e AS (SELECT DISTINCT sh FROM g WHERE doc_id % 50 = 0), " +
        "cont AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (sh)), " +
        "clean AS (SELECT * FROM ded WHERE doc_id % 50 <> 0 " +
        "AND doc_id NOT IN (SELECT doc_id FROM cont)), " +
        s"mixed AS (SELECT doc_id, source, $SplitCaseSql AS split, " +
        "CAST(len(toks) AS BIGINT) AS n_toks FROM clean " +
        s"WHERE $MixNibPosSql <= $MixRate16Sql), " +
        "o AS (SELECT *, coalesce(CAST(sum(n_toks) OVER (PARTITION BY split, source " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) " +
        "AS off FROM mixed), " +
        "p AS (SELECT split, source, n_toks, off // 512 AS pack_id FROM o) " +
        "SELECT split, source, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS total_toks, " +
        "CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs FROM p " +
        "GROUP BY split, source ORDER BY split, source"),
      "full pretraining pipeline: gate → dedup → decontaminate → mix → split → pack"),

    "llm_ann_lsh" -> DeclaredQuery(
      // Approximate nearest neighbors — the scale path: random-hyperplane
      // LSH bucket (8 planes → 256 buckets) computed in one scan, then
      // candidates by bucket equi-join only. Left join keeps query rows
      // with an empty bucket (nbr null) so the result is total over the
      // query set. No oracle (approximate by design); AnnSpec measures
      // recall vs llm_sim_topk on sf0.001.
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            VectorOps.lshBucket(col("embedding"), numPlanes = 8, dim = 64).as("bucket"))
        val q = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket").as("q_bucket"))
          .filter(col("q_id") < 8)
        val cand = q.join(e,
            col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"), "left")
          .select(col("q_id"), col("vec_id").as("nbr_id"),
            round(VectorOps.cosine(col("q_emb"), col("embedding")), 6).as("cos"))
        val w = Window.partitionBy("q_id").orderBy(desc_nulls_last("cos"), asc_nulls_last("nbr_id"))
        cand.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      None,
      "LSH-bucketed approximate NN top-3 (8 hyperplanes, 256 buckets)"),

    "llm_kmeans" -> DeclaredQuery(
      // One Lloyd assignment step, k=8: every vector to its nearest
      // centroid (centroids = the first 8 vectors — deterministic seed,
      // the k-means‖ init would be a follow-up round of this same
      // plan). Shape is the 100 TB one: the k-row centroid table
      // BROADCASTS (k ≪ n always), dist² = |v|² + |c|² − 2v·c with the
      // norms computed once per side and the dot via the codegen'd
      // native expression, and the argmin is a PARTIAL-aggregatable
      // min(struct) — the n×k fan-out collapses back to n rows map-side
      // (each vector's k candidates are co-located by construction), so
      // the one exchange carries n partials, never n×k. Ties break to
      // the lowest cluster id via the struct order on the ROUNDED dist.
      (s, d) => kmeansAssign(s, d)
        .select(col("vec_id"), col("cluster"), col("d2"))
        .orderBy(col("vec_id")),
      Some(s"WITH $KmeansAssignSql " +
        "SELECT vec_id, cluster, d2 FROM asg ORDER BY vec_id"),
      "k-means Lloyd assignment step (k=8 broadcast centroids, map-side argmin)"),

    "llm_centroids" -> DeclaredQuery(
      // The k-means UPDATE step over llm_kmeans' assignment: new
      // centroid = element-wise member mean. The embedding rides through
      // the assignment aggregate (no rescan/self-join); posexplode fans
      // each vector to 64 (cluster, dim) cells and ONE hash aggregate
      // collapses them — k×64 output rows at any corpus size, partials
      // combine map-side. Iterating assignment+update to convergence is
      // this same plan in a driver loop (each round a new broadcast).
      (s, d) => kmeansAssign(s, d)
        .select(col("cluster"), posexplode(col("embedding")))
        .groupBy(col("cluster"), (col("pos") + 1).cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("col").cast("double")), 6).as("c_val"))
        .filter(col("dim") <= 4) // report the leading dims (bounded, still per-cluster)
        .orderBy(col("cluster"), col("dim")),
      Some(s"WITH $KmeansAssignSql " +
        "SELECT cluster, CAST(i AS BIGINT) AS dim, count(*) AS n, " +
        "round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS c_val " +
        "FROM asg JOIN embeddings USING (vec_id), " +
        "unnest(generate_series(1, 4)) AS u(i) " +
        "GROUP BY 1, 2 ORDER BY cluster, dim"),
      "k-means centroid update step (element-wise member means, k×dims output)"),

    "llm_winnow" -> DeclaredQuery(
      // Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS
      // algorithm): hash every 3-token shingle, slide a 4-shingle window
      // per document, keep each window's MIN hash; the distinct kept
      // hashes are the document's fingerprints. Guarantees every match
      // of ≥ window+k−1 tokens shares a fingerprint — positional, unlike
      // llm_chunk_dedup's fixed blocks. Hash = md5 hex (string min is
      // lexicographic in BOTH engines; xxhash64 has no DuckDB twin). The
      // per-doc window pass shuffles (doc_id, pos, 32-byte digest) once;
      // the corpus-duplicate join then moves only distinct fingerprints.
      (s, d) => {
        val w = Window.partitionBy("doc_id").orderBy(col("pos")).rowsBetween(-3, 0)
        val sel = Tables.documents(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), posexplode(TextOps.shingles(col("__toks"))))
          .select(col("doc_id"), col("pos"), md5(col("col")).as("__h"))
          .withColumn("fp", min(col("__h")).over(w))
          .filter(col("pos") >= 3)
          .select(col("doc_id"), col("fp")).distinct()
        // sel is already distinct (doc_id, fp): a plain count over the
        // fp partition IS the doc frequency. A window over ONE shuffle
        // by fp, not a groupBy(fp) + self-join (that spelling paid the
        // fp exchange twice — once for the aggregate, once to co-locate
        // the join — for identical per-row values)
        sel.withColumn("__df",
            count(lit(1)).over(Window.partitionBy(col("fp"))))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fp"),
            sum((col("__df") > 1).cast("long")).as("n_shared"))
          .withColumn("shared_frac",
            round(col("n_shared").cast("double") / col("n_fp"), 6))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents), " +
        "s AS (SELECT doc_id, i AS pos, " +
        "md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS h " +
        "FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)), " +
        "w AS (SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp FROM s), " +
        "f AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos >= 4), " +
        "df AS (SELECT fp, count(*) AS dd FROM f GROUP BY fp) " +
        "SELECT doc_id, count(*) AS n_fp, " +
        "CAST(sum(CASE WHEN dd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared, " +
        "round(CAST(sum(CASE WHEN dd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS shared_frac " +
        "FROM f JOIN df USING (fp) GROUP BY doc_id ORDER BY doc_id"),
      "winnowing (MOSS) fingerprints: rolling-min shingle hashes, corpus overlap"),

    "llm_bpe_pairs" -> DeclaredQuery(
      // One BPE training step: frequency of every adjacent character
      // pair inside words, over all token instances — the argmax pair is
      // the next merge. Two explodes (token, then pair position) feed
      // ONE hash aggregate; pairs are 2-char strings so the shuffle
      // carries the collapsed pair table, and the global top-20 plans as
      // TakeOrderedAndProject (no total sort). A full BPE trainer is
      // this plan in a driver loop with a merges-so-far broadcast.
      (s, d) => {
        // substring with a non-literal start goes through Column.substr
        val pairs = when(length(col("tok")) >= 2,
          transform(sequence(lit(1), length(col("tok")) - 1),
            i => col("tok").substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))
        Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .select(explode(pairs).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("pair"))
          .limit(20)
      },
      Some(s"WITH t AS (SELECT unnest($ToksSql) AS tok FROM documents), " +
        "p AS (SELECT unnest(list_transform(generate_series(1, length(tok) - 1), " +
        "i -> substr(tok, i, 2))) AS pair FROM t WHERE length(tok) >= 2) " +
        "SELECT pair, count(*) AS n FROM p GROUP BY pair " +
        "ORDER BY n DESC, pair LIMIT 20"),
      "BPE merge-step statistics: adjacent char-pair frequencies, top-20"),

    "llm_dataset_card" -> DeclaredQuery(
      // The dataset card: one summary row a corpus release ships with —
      // doc/lang/source counts, token volume, length stats, exact-dup
      // rate. Three DISTINCT aggregates in one pass: Spark plans the
      // multi-distinct via Expand (each row replayed 4×) — here that is
      // the RIGHT trade (one scan of the corpus beats four; contrast
      // ts_funnel, where the Expand was avoidable by restructuring).
      // Output is a single row at any corpus size.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"),
          length(col("text")).cast("long").as("__nc"),
          md5(col("text")).as("__dig"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("__nt")).as("n_tokens"),
          round(avg(col("__nc")), 6).as("avg_chars"),
          (count(lit(1)) - countDistinct(col("__dig"))).as("n_exact_dups"))
        .orderBy(col("n_docs")),
      Some(s"SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs, " +
        "count(DISTINCT source) AS n_sources, " +
        s"CAST(sum(len($ToksSql)) AS BIGINT) AS n_tokens, " +
        "round(avg(length(text)), 6) AS avg_chars, " +
        "count(*) - count(DISTINCT md5(text)) AS n_exact_dups " +
        "FROM documents ORDER BY n_docs"),
      "corpus dataset card: one-row release summary (counts, tokens, dup rate)"),

    "llm_quality_tiers" -> DeclaredQuery(
      // Quantile-tier bucketing — the CCNet-style "split the corpus into
      // quality tiers" step, spelled the way it scales: compute the
      // 20/40/60/80 boundaries ONCE (a 4-double result), broadcast them
      // back, bucket each doc with a CASE, and roll up per tier. A
      // global ntile() would need a single-partition window over the
      // whole corpus — this shape's only full pass is the boundary
      // aggregate (exact percentile here for the oracle gate; the
      // production swap-in is percentile_approx, same plan otherwise —
      // see agg_percentile_approx for the sketch's own correctness
      // harness). Tier population counts differ from n/5 only by the
      // boundary-tie mass, which the fixed <= spelling pins identically
      // on both engines.
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val b = docs.agg(percentile(col("n_chars"),
          array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))).as("bs"))
        docs.join(broadcast(b))
          .withColumn("tier",
            when(col("n_chars") <= col("bs")(0), 1L)
              .when(col("n_chars") <= col("bs")(1), 2L)
              .when(col("n_chars") <= col("bs")(2), 3L)
              .when(col("n_chars") <= col("bs")(3), 4L)
              .otherwise(5L))
          .groupBy("tier")
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("chars_min"),
            max(col("n_chars")).as("chars_max"))
          .orderBy(col("tier"))
      },
      Some("WITH b AS (SELECT quantile_cont(n_chars, [0.2, 0.4, 0.6, 0.8]) AS bs FROM documents) " +
        "SELECT CASE WHEN n_chars <= bs[1] THEN 1 WHEN n_chars <= bs[2] THEN 2 " +
        "WHEN n_chars <= bs[3] THEN 3 WHEN n_chars <= bs[4] THEN 4 ELSE 5 END AS tier, " +
        "count(*) AS n_docs, min(n_chars) AS chars_min, max(n_chars) AS chars_max " +
        "FROM documents, b GROUP BY 1 ORDER BY tier"),
      "quantile quality tiers: boundaries once + broadcast, never a global ntile"),

    "llm_dedup_prefix" -> DeclaredQuery(
      // Prefix-fingerprint dedup — the near-dup family's cheapest member
      // (boilerplate mirrors share openings even when tails drift): key
      // = md5 of the first 32 tokens, canonical = min doc_id per key via
      // one window over the 16-byte-digest shuffle. Complements exact
      // (whole-doc md5), MinHash/SimHash (set similarity), chunk
      // (sub-doc blocks) and winnow (positional) — a user picks by
      // recall/cost point.
      (s, d) => {
        val w = Window.partitionBy("__p")
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("__toks"))
          .select(col("doc_id"),
            md5(concat_ws(" ", slice(col("__toks"), 1, 32))).as("__p"))
          .withColumn("canonical", min(col("doc_id")).over(w))
          .select(col("doc_id"), col("canonical"),
            (col("doc_id") =!= col("canonical")).as("is_dup"))
          .orderBy(col("doc_id"))
      },
      Some(s"WITH t AS (SELECT doc_id, md5(array_to_string(($ToksSql)[1:32], ' ')) AS p " +
        "FROM documents) " +
        "SELECT doc_id, min(doc_id) OVER (PARTITION BY p) AS canonical, " +
        "doc_id <> min(doc_id) OVER (PARTITION BY p) AS is_dup " +
        "FROM t ORDER BY doc_id"),
      "prefix-fingerprint dedup: md5 of first 32 tokens, min-id canonical"),

    "llm_corpus_diff" -> DeclaredQuery(
      // Release diff — what changed between corpus v1 and v2 (v2 derived
      // deterministically: drop docs whose md5 nibble is 'a', rewrite
      // text for doc_id < 50, add 10 new ids). A full-outer join on
      // doc_id comparing 16-byte digests classifies every id as
      // added/removed/changed/unchanged; the rollup is 4 rows at any
      // corpus size. Only (id, digest) pairs ever shuffle — never text —
      // which is what makes the diff affordable as a per-release gate.
      (s, d) => {
        val v1 = Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("__d1"))
        val docs = Tables.documents(s, d)
        val v2 = docs
          .filter(substring(md5(col("doc_id").cast("string")), 1, 1) =!= "a")
          .select(col("doc_id"),
            md5(when(col("doc_id") < 50, concat(lit("v2 "), col("text")))
              .otherwise(col("text"))).as("__d2"))
          .unionByName(docs.filter(col("doc_id") < 10)
            .select((col("doc_id") + 1000000).as("doc_id"), md5(col("text")).as("__d2")))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(when(col("__d1").isNull, "added")
            .when(col("__d2").isNull, "removed")
            .when(col("__d1") =!= col("__d2"), "changed")
            .otherwise("unchanged").as("status"))
          .groupBy("status").agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      },
      Some("WITH v1 AS (SELECT doc_id, md5(text) AS d1 FROM documents), " +
        "v2 AS (SELECT doc_id, md5(CASE WHEN doc_id < 50 THEN 'v2 ' || text ELSE text END) AS d2 " +
        "FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> 'a' " +
        "UNION ALL SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id < 10) " +
        "SELECT CASE WHEN d1 IS NULL THEN 'added' WHEN d2 IS NULL THEN 'removed' " +
        "WHEN d1 <> d2 THEN 'changed' ELSE 'unchanged' END AS status, count(*) AS n " +
        "FROM v1 FULL OUTER JOIN v2 USING (doc_id) GROUP BY 1 ORDER BY status"),
      "corpus release diff: digest-only full-outer compare, 4-row rollup"),

    "llm_mixture_weights" -> DeclaredQuery(
      // Training-mixture design: per-source sampling weights under
      // temperature τ=0.7 (the multilingual/multi-source up-weighting
      // recipe: w_i ∝ c_i^τ, flattening the head). One token-count
      // aggregate to #sources rows; the normalizer is a window over
      // that tiny table. Cross-engine pow() can differ in the last ulp
      // — relative 1e-16, absorbed by 6dp rounding of weights in [0,1].
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), size(toks).cast("long").as("__nt"))
          .groupBy("source").agg(sum(col("__nt")).as("n_toks"))
        val w = Window.partitionBy()
        counts
          .withColumn("__pw", pow(col("n_toks").cast("double"), lit(0.7)))
          .select(col("source"), col("n_toks"),
            round(col("n_toks").cast("double") / sum(col("n_toks").cast("double")).over(w), 6).as("w_nat"),
            round(col("__pw") / sum(col("__pw")).over(w), 6).as("w_temp"))
          .orderBy(col("source"))
      },
      Some(s"WITH c AS (SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS n_toks " +
        "FROM documents GROUP BY source) " +
        "SELECT source, n_toks, " +
        "round(CAST(n_toks AS DOUBLE) / sum(CAST(n_toks AS DOUBLE)) OVER (), 6) AS w_nat, " +
        "round(pow(CAST(n_toks AS DOUBLE), 0.7) / sum(pow(CAST(n_toks AS DOUBLE), 0.7)) OVER (), 6) AS w_temp " +
        "FROM c ORDER BY source"),
      "temperature-sampling mixture weights per source (τ=0.7 flattening)"),

    "llm_edit_sim" -> DeclaredQuery(
      // Edit-distance near-dup — the similarity family's character-level
      // member (catches typo-level mirrors that token shingles miss):
      // levenshtein over 40-char prefixes of id-ADJACENT doc pairs. The
      // neighbor set is an equi join on doc_id+1 (llm_dedup_embed's
      // block idiom: a bounded candidate generator that stays a hash
      // join at any scale — the production candidate source would be an
      // LSH/prefix bucket, same downstream plan). Distance on a capped
      // prefix bounds the O(len²) DP per pair.
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("__pre"))
        val b = docs.select((col("doc_id") - 1).as("__nbr"), col("__pre").as("__pre_b"))
        docs.join(b, col("doc_id") === col("__nbr"))
          .select(col("doc_id"),
            levenshtein(col("__pre"), col("__pre_b")).cast("long").as("dist"))
          .withColumn("is_near", col("dist") <= 10)
          .orderBy(col("doc_id"))
      },
      Some("WITH d AS (SELECT doc_id, substring(text, 1, 40) AS pre FROM documents) " +
        "SELECT a.doc_id, CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist, " +
        "levenshtein(a.pre, b.pre) <= 10 AS is_near " +
        "FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 ORDER BY a.doc_id"),
      "edit-distance similarity over bounded adjacent-id pairs (40-char prefixes)"),

    "llm_cooccur" -> DeclaredQuery(
      // PMI co-occurrence over the HEAD vocabulary — the embedding-free
      // association statistic (word2vec's input, topic seeds). The
      // vocabulary is capped to the top-12 tokens by doc frequency
      // (computed once, broadcast), so the per-doc pair fan-out is
      // bounded at 66 regardless of document length: each doc's token
      // set intersects the head list, pairs explode from that ≤12-item
      // array, ONE aggregate counts pair support, and PMI derives from
      // the (also broadcast) singleton supports. At 100 TB nothing
      // quadratic ever forms — the cap is the candidate generator, as
      // in every other pairing op here. Ordered pairs a < b.
      (s, d) => {
        val docToks = Tables.documents(s, d)
          .select(col("doc_id"), array_distinct(toks).as("__set"))
        val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("__nd"))
        val head = docToks.select(col("doc_id"), explode(col("__set")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("__df"))
          .orderBy(desc("__df"), col("tok")).limit(12)
        val withHead = docToks
          .join(broadcast(head.agg(collect_list(struct(col("tok"), col("__df"))).as("__hs"))))
          .select(col("doc_id"), col("__hs"),
            filter(col("__set"), t => exists(col("__hs"), h => h("tok") === t)).as("__present"))
        val pairs = withHead
          .select(col("doc_id"), explode(col("__present")).as("a"), col("__present"))
          .select(col("doc_id"), col("a"), explode(col("__present")).as("b"))
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(head.select(col("tok").as("a"), col("__df").as("__dfa"))), "a")
          .join(broadcast(head.select(col("tok").as("b"), col("__df").as("__dfb"))), "b")
          .join(broadcast(nDocs))
          .select(col("a"), col("b"), col("n_ab"),
            round(log(col("n_ab").cast("double") * col("__nd").cast("double") /
              (col("__dfa").cast("double") * col("__dfb").cast("double"))), 6).as("pmi"))
          .orderBy(col("a"), col("b"))
      },
      Some(s"WITH t AS (SELECT doc_id, list_distinct($ToksSql) AS toks FROM documents), " +
        "e AS (SELECT doc_id, unnest(toks) AS tok FROM t), " +
        "head AS (SELECT tok, count(*) AS df FROM e GROUP BY tok ORDER BY df DESC, tok LIMIT 12), " +
        "p AS (SELECT x.doc_id, x.tok AS a, y.tok AS b FROM e x JOIN e y ON x.doc_id = y.doc_id " +
        "AND x.tok < y.tok WHERE x.tok IN (SELECT tok FROM head) AND y.tok IN (SELECT tok FROM head)), " +
        "c AS (SELECT a, b, count(*) AS n_ab FROM p GROUP BY a, b), " +
        "nd AS (SELECT count(*) AS n FROM documents) " +
        "SELECT a, b, n_ab, round(ln(CAST(n_ab AS DOUBLE) * CAST(nd.n AS DOUBLE) / " +
        "(CAST(ha.df AS DOUBLE) * CAST(hb.df AS DOUBLE))), 6) AS pmi " +
        "FROM c JOIN head ha ON c.a = ha.tok JOIN head hb ON c.b = hb.tok " +
        "CROSS JOIN nd ORDER BY a, b"),
      "PMI co-occurrence over the top-12 vocabulary (bounded pair fan-out)"),

    "llm_shard_manifest" -> DeclaredQuery(
      // Corpus-export sharding — the "write this as bounded-size
      // shards" step (webdataset/TFRecord style): docs are assigned to
      // shards of ≤64 KiB cumulative text per lang, in deterministic
      // doc_id order, via running-byte cumsum → floor-div. The shard
      // rollup reuses the window's hash(lang) exchange (lang is a
      // subset of the rollup key, so the aggregate's required
      // clustering is already satisfied) — one shuffle end to end.
      // First/last doc ids per shard make the manifest seekable.
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("__nc"))
          .withColumn("__cum", sum(col("__nc")).over(w))
          // greatest(..., 0): a zero-byte prefix makes cum-1 = -1, where
          // Spark's `/` (double, trunc-toward-zero) and DuckDB's `//`
          // (floor) disagree on the shard id; clamp so both yield 0.
          .withColumn("shard_id",
            (greatest(col("__cum") - 1L, lit(0L)) / 65536L).cast("long"))
          .groupBy("lang", "shard_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("__nc")).as("bytes"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("lang"), col("shard_id"))
      },
      Some("WITH t AS (SELECT doc_id, lang, n_chars, " +
        "sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM documents) " +
        "SELECT lang, CAST(greatest(cum - 1, 0) // 65536 AS BIGINT) AS shard_id, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes, " +
        "min(doc_id) AS first_doc, max(doc_id) AS last_doc " +
        "FROM t GROUP BY 1, 2 ORDER BY lang, shard_id"),
      "size-bounded export-shard manifest (running cumsum, one lang shuffle)"),

    "llm_sentences" -> DeclaredQuery(
      // Sentence segmentation + readability proxies: split on [.!?]+
      // runs, count non-empty sentences, average sentence length in
      // words — the readability signal quality filters threshold on
      // (very long or very short average sentences flag boilerplate
      // and tables). Pure per-row expressions: no shuffle before the
      // declared ORDER BY at any corpus size. The split pattern is
      // spelled from the same char-class on both sides; empty/blank
      // segments (trailing punctuation) are filtered identically.
      (s, d) => {
        val sents = filter(split(col("text"), "[.!?]+"),
          t => length(trim(t)) > 0)
        Tables.documents(s, d)
          .select(col("doc_id"), sents.as("__ss"))
          .select(col("doc_id"),
            size(col("__ss")).cast("long").as("n_sents"),
            round(aggregate(col("__ss"), lit(0L),
              (acc, x) => acc + size(TextOps.tokens(x))).cast("double") /
              nullif(size(col("__ss")).cast("double"), lit(0.0)), 6).as("avg_sent_words"))
          .orderBy(col("doc_id"))
      },
      Some("WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '[.!?]+'), " +
        "x -> trim(x) <> '') AS ss FROM documents) " +
        "SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_sents, " +
        "round(CAST(list_sum(list_transform(ss, x -> len(list_filter(" +
        "string_split_regex(trim(x), '\\s+'), w -> w <> '')))) AS DOUBLE) / " +
        "nullif(CAST(len(ss) AS DOUBLE), 0.0), 6) AS avg_sent_words " +
        "FROM t ORDER BY doc_id"),
      "sentence segmentation + average sentence length (readability proxy)")
  )
}
