package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Clean-room Bloom filter as a typed `Aggregator` + a pure-`Column`
  * probe — the runtime-filter building block (SURVEY §2.11 / §4.3):
  * build the filter over a selective dimension's join keys, broadcast
  * the bitmap (one row), and pre-filter the fact side BEFORE its join
  * shuffle. False positives are removed by the exact join that follows,
  * so results stay exact — the bloom only cuts shuffle volume
  * (at 100 TB: fact rows that cannot match never leave their input
  * partition; Spark's own InjectRuntimeFilter does this internally, but
  * is not user-steerable from the public API).
  *
  * Hashing is ANSI-safe enhanced double hashing: two raw `xxhash64`
  * values per key (seeds 42 and 42+extra-arg) are reduced mod m into
  * position seeds, and probe i tests bit `(p1 + i·p2) mod m`. The
  * reduction happens AFTER any multiply only on values < m, so the
  * identical spelling runs as Scala in the Aggregator and as Catalyst
  * `Column`s in [[mightContain]] — no overflow-wrapping semantics to
  * keep in sync under `spark.sql.ansi.enabled`.
  *
  * m is SELF-DESCRIBING: the probe derives it from the bitmap column's
  * own length (`size(bits) · 64`), so a build/probe sizing mismatch —
  * which would silently manufacture false negatives and drop real join
  * rows — is structurally impossible; only [[agg]] takes an mBits.
  */
object BloomFilter {

  /** Number of probe bits per key. With m/n ≈ 100 bits/key (the shapes
    * we build: vocab-sized dims), fpp is far below 1e-6; even at
    * m/n = 16 it is ~5e-4 — and correctness never depends on it. */
  val K = 5

  /** Bitmap sized for the default declared query (2^17 bits = 16 KiB). */
  val DefaultBits = 1 << 17

  /** Input: the two RAW (unreduced) hashes of one key. */
  case class Probes(h1: Long, h2: Long)

  /** Buffer/output: the bitmap as packed 64-bit words. */
  case class Bits(bits: Array[Long])

  /** The two raw hash Columns for `key` — the probe side uses the same
    * spelling (xxhash64 with and without the extra seed literal). */
  def probes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(1L)))

  def agg(mBits: Int = DefaultBits): Aggregator[Probes, Bits, Bits] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    new Aggregator[Probes, Bits, Bits] {
      def zero: Bits = Bits(new Array[Long](mBits / 64))
      def reduce(b: Bits, in: Probes): Bits = {
        val m = b.bits.length * 64
        // floorMod ≙ Catalyst pmod — same non-negative residue
        val p1 = java.lang.Math.floorMod(in.h1, m.toLong)
        val p2 = java.lang.Math.floorMod(in.h2, m.toLong)
        var i = 0
        while (i < K) {
          val pos = ((p1 + i.toLong * p2) % m).toInt
          b.bits(pos >> 6) |= 1L << (pos & 63)
          i += 1
        }
        b
      }
      def merge(a: Bits, b: Bits): Bits = {
        var i = 0
        while (i < a.bits.length) { a.bits(i) |= b.bits(i); i += 1 }
        a
      }
      def finish(b: Bits): Bits = b
      def bufferEncoder: Encoder[Bits] = Encoders.product[Bits]
      def outputEncoder: Encoder[Bits] = Encoders.product[Bits]
    }
  }

  /** All-K-bits-set test against `bloomBits` (an `array<bigint>` column,
    * typically broadcast via a one-row join). m comes from the bitmap
    * itself, so the test can never disagree with the build's sizing.
    * Pure built-in Columns — stays inside whole-stage codegen.
    * `shiftleft` goes through `call_function` because the Scala wrapper
    * only accepts a literal shift amount; the SQL function takes an
    * expression. */
  def mightContain(bloomBits: Column, key: Column): Column = {
    val m = size(bloomBits).cast("long") * lit(64L)
    val p1 = pmod(xxhash64(key), m)
    val p2 = pmod(xxhash64(key, lit(1L)), m)
    (0 until K).map { i =>
      val pos = (p1 + lit(i.toLong) * p2) % m
      val word = element_at(bloomBits, (pos / 64).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
