package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering value over several columns — the
  * multi-dimensional layout verb behind [[graft.sources.TsStore.zorder]]
  * (the Delta `OPTIMIZE ZORDER BY` / Iceberg `rewrite_data_files`
  * sort-order role). A store written range-sorted on ONE key carries
  * tight per-file bounds on that key alone; per-file min/max on any
  * other column spans the whole domain, so [[graft.sources.FileStats]]
  * pruning (and parquet row-group skipping) is useless for queries
  * keyed on it. Interleaving the bits of each column's QUANTILE-BUCKET
  * rank gives every file locality in ALL the cluster dimensions at
  * once: a predicate on any one of them prunes to ~N^((k-1)/k) of the
  * files instead of all of them.
  *
  * Two-step, both composed from existing Spark ops (no custom
  * expression, no extra shuffle beyond the rewrite's own range
  * partition):
  *
  *  1. [[boundaries]]: one driver-side `approxQuantile` pass computes
  *     per-column cut points (equi-DEPTH buckets — equi-width would
  *     collapse under skew; this is the sampling role of Delta's
  *     `range_partition_id`). Cost is one aggregate job, result is
  *     O(buckets) literals.
  *  2. [[zValue]]: per row, each column's bucket rank is a fold over
  *     its broadcast boundary array (`aggregate` HOF over a literal
  *     array — codegen-friendly, no UDF), and the ranks' bits are
  *     interleaved with plain shift/mask arithmetic into one LONG sort
  *     key.
  *
  * Columns must be numeric, timestamp, or date (cast to double for
  * bucketing — rank order is all that matters). Strings would need
  * byte-order quantiles; exclude them rather than prune wrongly.
  */
object ZOrder {

  /** Per-column ascending distinct cut points at `buckets` equi-depth
    * quantiles (≤ buckets-1 values per column; fewer when the column
    * has few distinct values). One `approxQuantile` call per column —
    * driver-side, sample-based, O(buckets) result each.
    */
  def boundaries(df: DataFrame, cols: Seq[String], buckets: Int): Map[String, Array[Double]] = {
    require(cols.nonEmpty, "zorder needs at least one cluster column")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val qs = casted.stat.approxQuantile(cols.toArray, probs, 0.01)
    cols.zip(qs).map { case (c, q) =>
      c -> q.filter(v => !v.isNaN).distinct.sorted
    }.toMap
  }

  /** The interleaved-bit Z value as a LONG column. Each column's rank is
    * `aggregate(lit(cuts), 0, (acc, b) -> acc + (v >= b))` — count of
    * cut points at or below the value, i.e. its equi-depth bucket; nulls
    * rank last (bucket = cuts.length, past every non-null). Every
    * column's rank is then SCALED to one common bit width B =
    * log2(buckets) — a low-cardinality column (few distinct cut points)
    * would otherwise occupy fewer bits and lose its share of the HIGH
    * bit positions, letting the widest column dominate the ordering
    * (exactly what breaks pruning when the rewrite produces few files:
    * only the top bits decide file membership). With uniform width, bit
    * b of column i lands at position b*k+i, so adjacent Z ranges share
    * high-order buckets in EVERY dimension. Total bits stay well under
    * 63 (buckets ≤ 2^16, k small).
    */
  def zValue(bs: Map[String, Array[Double]], cols: Seq[String]): Column = {
    val k = cols.size
    val bits = {
      val maxN = bs.valuesIterator.map(_.length + 1).max
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros((maxN - 1).toLong).toInt)
    }
    require(bits * k <= 62, s"zorder bit budget exceeded: $k cols x $bits bits")
    val scale = 1L << bits
    val ranks: Seq[Column] = cols.map { c =>
      val cuts = bs(c)
      if (cuts.isEmpty) lit(0L)
      else {
        val v = col(c).cast("double")
        // the fold alone would silently rank a null FIRST (null >= b
        // falls to otherwise(0)); the explicit isNull branch pins the
        // documented contract — nulls cluster LAST, past every cut.
        val fold = aggregate(lit(cuts), lit(0L),
          (acc, b) => acc + when(v >= b, 1L).otherwise(0L))
        val rank = when(v.isNull, lit(cuts.length.toLong)).otherwise(fold)
        val n = cuts.length + 1 // ranks 0..cuts.length
        // scale 0..n-1 onto 0..2^bits-1 so every column fills the width
        (rank.cast("long") * scale / n).cast("long")
      }
    }
    val terms = for {
      b <- 0 until bits
      i <- 0 until k
    } yield shiftright(ranks(i), b).bitwiseAND(lit(1L)) * lit(1L << (b * k + i))
    terms.reduce(_ + _).as("__z")
  }
}
