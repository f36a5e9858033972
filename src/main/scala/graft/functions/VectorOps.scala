package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns. All math in
  * double: float inputs are widened before any arithmetic and summed
  * left to right — the same additions as DuckDB's
  * `list_sum(list_transform(...))`, so rounded scores match bit-for-bit.
  *
  * The production spellings are the NATIVE codegen expressions
  * (`graft.functions.expressions.FloatVec*` — round 3; 2–4× over the
  * HOFs, cosine fused to one traversal). Measured history, sf0.1 (400k
  * pairs, dim 64): unrolled 64-term `element_at` tree 8.9s → HOF
  * `aggregate(zip_with(...))` 2.3s (round 2) → native expression < 1s
  * (round 3, and it stays inside whole-stage codegen). Placement still
  * matters most: keep heavy expressions in a map-side Project, never in
  * a join condition or as a grouped-aggregate child (see graft.Q).
  */
object VectorOps {
  import org.apache.spark.sql.GraftShim.{column => ofExpr, expression => toExpr}
  import graft.functions.expressions.{FloatVecCosine, FloatVecDot, FloatVecLsh, FloatVecNormSq}

  /** Embedding dimensionality of the fixture tables. */
  val Dim = 64

  /** Σ aᵢ·bᵢ — left-to-right double sum via the native codegen expression
    * ([[graft.functions.expressions.FloatVecDot]]); numerically identical
    * to the HOF spelling below and to the oracles.
    */
  def dot(a: Column, b: Column): Column = ofExpr(FloatVecDot(toExpr(a), toExpr(b)))

  def normSq(a: Column): Column = ofExpr(FloatVecNormSq(toExpr(a)))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity dot/(‖a‖·‖b‖) — ONE fused array traversal
    * ([[graft.functions.expressions.FloatVecCosine]]); the operation
    * order every oracle mirrors, so rounded values agree.
    */
  def cosine(a: Column, b: Column): Column = ofExpr(FloatVecCosine(toExpr(a), toExpr(b)))

  /** Symmetric int8 codes of a float vector as ONE binary value (byte
    * per dimension — the quantized IVF cells' storage form; scale is
    * `array_max(|x|)/127`, llm_quantize's spelling).
    */
  def int8Encode(a: Column, scale: Column): Column =
    ofExpr(graft.functions.expressions.FloatVecInt8Encode(toExpr(a), toExpr(scale)))

  /** Cosine of a float query against int8 codes — scale-free (the
    * per-vector scale cancels in cosine), so approximate scoring reads
    * ONLY the codes column.
    */
  def int8Cosine(q: Column, codes: Column): Column =
    ofExpr(graft.functions.expressions.FloatVecInt8Cosine(toExpr(q), toExpr(codes)))

  /** HOF spellings (interpreted lambdas, NOT codegen'd) — kept as the
    * numeric cross-check twin for VecExprsSpec and the measured perf
    * comparison in SURVEY §6.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSqHof(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(normSqHof(a)) * sqrt(normSqHof(b)))

  /** splitmix64 — tiny deterministic PRNG for compile-time constants
    * (public-domain algorithm, Steele et al. "Fast Splittable PRNGs").
    */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic random-hyperplane LSH bucket (SimHash for vectors):
    * bit h = sign(Σᵢ sᵢₕ·vᵢ) with sᵢₕ ∈ {−1,+1} baked in as compile-time
    * literals from splitmix64 — the per-row work is dim adds per plane,
    * all codegen'd. Same-bucket vectors are ANN candidates: the 100 TB
    * similarity path computes buckets in a single scan and joins on
    * bucket equality instead of an O(n²) cross product.
    */
  def lshBucket(v: Column, numPlanes: Int = 8, dim: Int = Dim): Column =
    ofExpr(FloatVecLsh(toExpr(v), numPlanes, dim))

  /** The unrolled Column-API spelling of [[lshBucket]] (numPlanes × dim
    * expression nodes — 512 at the defaults). Kept as the equivalence
    * twin for VecExprsSpec; the native expression is the production path.
    */
  def lshBucketUnrolled(v: Column, numPlanes: Int = 8, dim: Int = Dim): Column =
    (0 until numPlanes).map { h =>
      val proj = (1 to dim).map { i =>
        val s = if ((splitmix64(h.toLong * 4096 + i) & 1L) == 0L) -1.0 else 1.0
        lit(s) * element_at(v, i).cast("double")
      }.reduce(_ + _)
      when(proj > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
}
