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

  /** Distinct (doc_id, shingle) pairs for a documents table.
    *
    * The token array is BOUND TO A COLUMN before shingling: expressions
    * inside the shingle lambda reference their children per element, so
    * passing the raw `tokens(text)` expression would re-run the
    * split+filter for every element_at — O(tokens²) per document
    * (measured: 13s → 0.5s for the distinct-shingle step at sf0.1).
    */
  def docShingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(shingles(col("__toks"), k)).as("sh"))
      .distinct()

  /** One base hash per shingle — project this ONCE before aggregating so
    * the string is hashed a single time per row, not once per signature
    * slot (64× less hashing on the MinHash hot path).
    */
  def baseHash(shCol: Column): Column = xxhash64(shCol)

  /** MinHash signature columns h0..h{n-1} over a precomputed base-hash
    * column: slot i re-hashes the 8-byte base with a per-slot seed value
    * (`xxhash64(slot, h)`) and takes the per-doc min. Hashing a long is
    * ~20× cheaper than hashing the shingle string per slot, and unlike a
    * wrap-around multiply-add family it cannot trip Spark 4's ANSI
    * long-overflow check. Deterministic across runs; one hash-aggregate
    * per doc (map-side combined).
    *
    * This 64-separate-aggregates spelling is the equivalence twin for
    * SigAggsSpec; the production path is [[minHashSig]].
    */
  def minHashAggs(hashCol: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      min(xxhash64(lit(i), hashCol)).as(s"h$i")
    }

  /** Whole MinHash signature as ONE native aggregate returning
    * `array<long>` — value-identical to [[minHashAggs]] slot by slot
    * ([[graft.functions.expressions.MinHashSigAgg]]), but one primitive
    * buffer per group instead of 64 UnsafeRow fields, with per-slot
    * seeds precomputed once.
    */
  def minHashSig(hashCol: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(graft.functions.expressions
      .MinHashSigAgg(GraftShim.expression(hashCol), numHashes)
      .toAggregateExpression())
  }

  /** Band columns from an `array<long>` signature (see [[minHashSig]]):
    * same band values as [[bandStructs]] over h0..h63 columns, since
    * `element_at(sig, i+1)` carries the identical slot longs.
    */
  def bandStructsFromSig(sigCol: Column, numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    val bands = numHashes / rowsPerBand
    (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand)
          .map(r => element_at(sigCol, b * rowsPerBand + r + 1)): _*).as("sig"))
    }
  }

  /** 64-bit SimHash as ONE native aggregate (BIGINT result) — bit-equal
    * to the [[simHashBitAggs]]+[[simHashAssemble]] twin
    * ([[graft.functions.expressions.SimHashAgg]]).
    */
  def simHash(hashCol: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(graft.functions.expressions
      .SimHashAgg(GraftShim.expression(hashCol))
      .toAggregateExpression())
  }

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
    * of Σ_terms (±1 from bit i of the term's base hash). Takes the
    * PRECOMPUTED hash column (see [[baseHash]]) so each term is hashed
    * once, not 64 times. Returned as aggregate expression list (one per
    * bit) + an assembler.
    */
  def simHashBitAggs(hashCol: Column): Seq[Column] =
    (0 until 64).map { i =>
      sum(when(shiftright(hashCol, i).bitwiseAND(lit(1L)) === 1L, lit(1))
        .otherwise(lit(-1))).as(s"b$i")
    }

  def simHashAssemble: Column =
    (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
}
