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
  * Hashing is ANSI-safe enhanced double hashing: the caller derives two
  * POSITION seeds in `[0, mBits)` via `pmod(xxhash64(key), m)` /
  * `pmod(xxhash64(key, 1), m)` (see [[probes]]), and probe i tests bit
  * `(p1 + i·p2) mod m`. All arithmetic stays far below Long range, so
  * the identical spelling runs as Scala in the Aggregator and as
  * Catalyst `Column`s in [[mightContain]] — no overflow-wrapping
  * semantics to keep in sync under `spark.sql.ansi.enabled`.
  */
object BloomFilter {

  /** Number of probe bits per key. With m/n ≈ 100 bits/key (the shapes
    * we build: vocab-sized dims), fpp is far below 1e-6; even at
    * m/n = 16 it is ~5e-4 — and correctness never depends on it. */
  val K = 5

  /** Bitmap sized for the default declared query (2^17 bits = 16 KiB). */
  val DefaultBits = 1 << 17

  /** Input: the two derived bit positions for one key. */
  case class Probes(p1: Long, p2: Long)

  /** Buffer/output: the bitmap as packed 64-bit words. */
  case class Bits(bits: Array[Long])

  /** The two position seeds for `key`, as Columns — the probe side MUST
    * use the same spelling (same xxhash64 seeds, same pmod). */
  def probes(key: Column, mBits: Int = DefaultBits): (Column, Column) =
    (pmod(xxhash64(key), lit(mBits.toLong)),
      pmod(xxhash64(key, lit(1L)), lit(mBits.toLong)))

  def agg(mBits: Int = DefaultBits): Aggregator[Probes, Bits, Bits] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    new Aggregator[Probes, Bits, Bits] {
      def zero: Bits = Bits(new Array[Long](mBits / 64))
      def reduce(b: Bits, in: Probes): Bits = {
        var i = 0
        while (i < K) {
          val pos = ((in.p1 + i.toLong * in.p2) % mBits).toInt
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
    * typically broadcast via a one-row join). Pure built-in Columns —
    * stays inside whole-stage codegen. `shiftleft` goes through
    * `call_function` because the Scala wrapper only accepts a literal
    * shift amount; the SQL function takes an expression. */
  def mightContain(bloomBits: Column, key: Column, mBits: Int = DefaultBits): Column = {
    val (p1, p2) = probes(key, mBits)
    (0 until K).map { i =>
      val pos = (p1 + lit(i.toLong) * p2) % lit(mBits.toLong)
      val word = element_at(bloomBits, (pos / 64).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
