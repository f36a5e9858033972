package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators: tokenization, word
  * shingling, MinHash signatures, SimHash. Everything is a composition of
  * codegen'd built-ins (split/transform/xxhash64/min) — no UDFs, so the
  * whole pipeline stays inside whole-stage codegen and scales as ordinary
  * shuffles (SURVEY §4.3).
  */
object TextOps {

  /** Whitespace tokenizer: regex split + drop empties, so runs of spaces
    * or leading/trailing whitespace never produce empty tokens (which
    * would pollute shingles and MinHash signatures).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** k-word shingles (n-grams) as space-joined strings; empty array when
    * the document has fewer than k tokens.
    */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, (i + j).cast("int"))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct (doc_id, shingle) pairs for a documents table. */
  def docShingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        explode(shingles(tokens(col("text")), k)).as("sh"))
      .distinct()

  /** MinHash signature columns h0..h{n-1}: per doc, min over shingles of
    * the seeded hash family xxhash64(shingle, seed). Deterministic across
    * runs/engines; one hash-aggregate per doc (map-side combined).
    */
  def minHashAggs(shCol: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => min(xxhash64(shCol, lit(i))).as(s"h$i"))

  /** LSH band columns from a MinHash signature: bands of `rowsPerBand`
    * consecutive signature slots hashed together. Docs sharing any band
    * value are near-dup candidates.
    */
  def bandStructs(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    val bands = numHashes / rowsPerBand
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*).as("sig"))
    }
  }

  /** 64-bit SimHash over a set of terms: bit i of the result is the sign
    * of Σ_terms (±1 from bit i of xxhash64(term)). Returned as aggregate
    * expression list (one per bit) + an assembler.
    */
  def simHashBitAggs(termCol: Column): Seq[Column] =
    (0 until 64).map { i =>
      sum(when(shiftright(xxhash64(termCol), i).bitwiseAND(lit(1L)) === 1L, lit(1))
        .otherwise(lit(-1))).as(s"b$i")
    }

  def simHashAssemble: Column =
    (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
}
