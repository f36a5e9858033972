package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (no UDFs — stays inside whole-stage
  * codegen, SURVEY §2.11). All math in double: float inputs are widened
  * before any arithmetic so results are engine-portable (FIXTURES.md
  * casting rules).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ — elementwise product then left-to-right double sum. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖) — the exact operation
    * order mirrored in every oracle so rounded values agree.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic random-hyperplane LSH bucket (SimHash for vectors):
    * bit h = sign(Σᵢ sᵢₕ·vᵢ) where sᵢₕ ∈ {−1,+1} comes from xxhash64(h,i).
    * Same-bucket vectors are ANN candidates — the 100 TB similarity path:
    * bucket is computed in a single scan, candidates join on bucket
    * equality instead of an O(n²) cross product.
    */
  def lshBucket(v: Column, numPlanes: Int = 16, dim: Int = 64): Column =
    (0 until numPlanes).map { h =>
      val proj = aggregate(
        transform(sequence(lit(0), lit(dim - 1)),
          i => when(pmod(xxhash64(lit(h), i), lit(2)) === 0, lit(-1.0)).otherwise(lit(1.0)) *
            element_at(v, (i + 1).cast("int")).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)
}
