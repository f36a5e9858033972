package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The UDAF extension-point showcase (SURVEY §2.11): a typed
  * `Aggregator[IN, BUF, OUT]` computing an OHLC bar — the
  * reference-domain aggregation (corintick stores bars; clients
  * resample). The declared query `agg_ohlc` deliberately uses the
  * built-in `min_by`/`max_by` spelling (better codegen); this Aggregator
  * exists as the custom-aggregate template and is proven equivalent to
  * the built-in plan in OhlcAggregatorSpec.
  *
  * Scale shape: the buffer is O(1) (6 numbers), `merge` is associative
  * and commutative, so Spark runs it as partial aggregation before the
  * shuffle — state per group never grows with row count, the property
  * that makes it safe under 100 TB skew.
  */
object OhlcAggregator {

  /** (epoch-µs ts, unique tie-break id, value) input row. */
  case class Tick(ts: Long, id: Long, value: Double)

  /** Open/close carry their (ts, id) so merge is order-independent. */
  case class Buf(openTs: Long, openId: Long, open: Double,
                 closeTs: Long, closeId: Long, close: Double,
                 high: Double, low: Double, n: Long)

  case class Ohlc(open: Double, high: Double, low: Double, close: Double, n: Long)

  private val empty = Buf(Long.MaxValue, Long.MaxValue, 0.0,
    Long.MinValue, Long.MinValue, 0.0,
    Double.NegativeInfinity, Double.PositiveInfinity, 0L)

  val agg: Aggregator[Tick, Buf, Ohlc] = new Aggregator[Tick, Buf, Ohlc] {
    def zero: Buf = empty

    private def earlier(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
      aTs < bTs || (aTs == bTs && aId < bId)

    def reduce(b: Buf, t: Tick): Buf = merge(b,
      Buf(t.ts, t.id, t.value, t.ts, t.id, t.value, t.value, t.value, 1L))

    def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0) b else if (b.n == 0) a
      else {
        val (oTs, oId, o) =
          if (earlier(a.openTs, a.openId, b.openTs, b.openId)) (a.openTs, a.openId, a.open)
          else (b.openTs, b.openId, b.open)
        val (cTs, cId, c) =
          if (earlier(a.closeTs, a.closeId, b.closeTs, b.closeId)) (b.closeTs, b.closeId, b.close)
          else (a.closeTs, a.closeId, a.close)
        Buf(oTs, oId, o, cTs, cId, c,
          math.max(a.high, b.high), math.min(a.low, b.low), a.n + b.n)
      }

    def finish(b: Buf): Ohlc = Ohlc(b.open, b.high, b.low, b.close, b.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }
}
