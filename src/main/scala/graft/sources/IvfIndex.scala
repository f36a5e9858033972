package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Persisted IVF (inverted-file) ANN index — the train-once / probe-many
  * pattern the per-query `llm_ann_ivf` recomputation cannot serve at
  * 100 TB. The index is two TsStore-layout parquet tables under one root:
  *
  *   - `<dir>/centroids` — the K coarse centroids (tiny, driver-sized by
  *     construction: IVF training is an offline step and K ≪ n);
  *   - `<dir>/cells`     — every vector's (cell, vec_id, embedding),
  *     PARTITIONED BY cell, range-clustered and sorted on vec_id within
  *     each cell (tight row-group stats via TsStore's pinned geometry).
  *
  * Probing reads the centroid table to pick each query's nprobe nearest
  * cells, then reads ONLY those cells' partitions: the probed cell ids
  * are bounded (queries × nprobe) driver-side values, so the cells scan
  * carries an `cell IN (...)` predicate on the partition column — plan-
  * time partition pruning, pinned in PlanSpec. A 2-of-16-cell probe
  * reads ~1/8 of the index; at a billion vectors the untouched inverted
  * lists are never opened. The base-table embeddings are touched only to
  * fetch the query vectors themselves.
  *
  * Centroid "training" here is deterministic (the first K vectors, as in
  * `llm_ann_ivf`) which keeps the whole pipeline SQL-expressible — the
  * indexed query gets a real DuckDB oracle. Swapping in k-means centroids
  * (`llm_kmeans`/`llm_centroids`) changes only what `build` writes.
  */
object IvfIndex {

  /** Rounded cosine of a vector column against a LITERAL centroid —
    * float widened to double, left-to-right sum, (‖v‖·‖c‖) order:
    * exactly the oracle's list_sum(list_transform(...)) arithmetic.
    */
  private def centroidCos(vec: Column, cEmb: Array[Float]): Column = {
    val cNorm = math.sqrt(cEmb.map(x => x.toDouble * x.toDouble).foldLeft(0.0)(_ + _))
    round(VectorOps.dot(vec, typedlit(cEmb)) / (VectorOps.norm(vec) * lit(cNorm)), 6)
  }

  /** Nearest-centroid ranking array for a vector column: (ccos, -cent_id)
    * structs, lexicographically sorted descending ≙ ORDER BY ccos DESC,
    * cent_id ASC. Index i of the result is the (i+1)-th nearest cell.
    */
  private def rankedCells(vec: Column, cents: Seq[(Int, Array[Float])]): Column =
    reverse(array_sort(array(cents.map { case (id, emb) =>
      struct(centroidCos(vec, emb).as("c"), lit(-id).as("nid"))
    }: _*)))

  /** Nearest-centroid cell assignment with the deterministic first-`k`
    * centroids baked in as literals — ONE scan, zero shuffle. Returns
    * `(vec_id, embedding, cell)`; shared by [[build]] and the
    * SemDeDup-style `llm_semdedup` operator (cluster-then-dedup needs
    * exactly this cell key).
    */
  def assign(embeddings: DataFrame, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val cents: Seq[(Int, Array[Float])] = e.filter(col("vec_id") < k)
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    e.select(col("vec_id"), col("embedding"),
      (-rankedCells(col("embedding"), cents)(0).getField("nid"))
        .cast("long").as("cell"))
  }

  /** Train + persist in one step: centroids and the cell-partitioned
    * inverted lists. Assignment is ONE scan per round with the centroids
    * baked in as literals — a pure map-side expression, zero shuffle
    * before the layout write.
    *
    * `lloydRounds = 0` (the oracle-checkable default) seeds centroids
    * with the first K vectors and writes immediately; `lloydRounds > 0`
    * runs that many k-means refinement rounds first — each is one
    * assignment scan + one partial-aggregatable per-cell mean whose
    * K×dims result is collected to the driver (driver-sized by
    * construction, same budget as the seed collect). An emptied cell
    * keeps its previous centroid. The index layout and probe path are
    * identical either way — training quality is orthogonal to the
    * access path.
    */
  def build(embeddings: DataFrame, dir: String, k: Int,
            lloydRounds: Int = 0): Unit = {
    val spark = embeddings.sparkSession
    val e = embeddings.select(col("vec_id"), col("embedding"))
    var cents: Seq[(Int, Array[Float])] = e.filter(col("vec_id") < k)
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    for (_ <- 0 until lloydRounds) {
      val assigned = e.select(col("embedding"),
        (-rankedCells(col("embedding"), cents)(0).getField("nid")).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toArray
        }
      cents = cents.map { case (id, old) => (id, means.getOrElse(id, old)) }
    }
    import spark.implicits._
    cents.map { case (id, emb) => (id.toLong, emb.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val assigned = e.select(col("vec_id"), col("embedding"),
      (-rankedCells(col("embedding"), cents)(0).getField("nid")).as("cell"))
    TsStore.write(assigned, s"$dir/cells", tsCol = "vec_id",
      uidCols = Seq("cell"), overlapPolicy = TsStore.OverlapPolicy.Allow)
  }

  /** Probe the persisted index: `queries` is a (q_id, q_emb) frame —
    * SMALL by contract (the serving batch). Cell selection reads the
    * centroid table only; candidate generation reads only the probed
    * cells' partitions; exact cosine rerank returns the top `topK`
    * neighbors per query with rounded scores and id tie-breaks.
    */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
            nprobe: Int, topK: Int): DataFrame = {
    val cents: Seq[(Int, Array[Float])] = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val probes = queries.toDF("q_id", "q_emb")
      .select(col("q_id"), col("q_emb"),
        explode(slice(rankedCells(col("q_emb"), cents), 1, nprobe)).as("p"))
      .select(col("q_id"), col("q_emb"), (-col("p").getField("nid")).as("cell"))
    // the probed cell ids as LITERALS (bounded by queries × nprobe): an
    // IN-list on the partition column is what turns the cells read into
    // plan-time partition pruning — a join on cell would scan every list
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cells = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(probedCells: _*))
    val scored = broadcast(probes).join(cells, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"),
        round(VectorOps.cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("nbr_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }
}
