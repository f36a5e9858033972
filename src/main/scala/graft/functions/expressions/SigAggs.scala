package graft.functions.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native signature aggregates for the near-dedup path.
  *
  * The Column-API spelling builds the 64-slot MinHash signature as 64
  * separate `min(xxhash64(lit(i), h))` aggregate expressions (and SimHash
  * as 64 `sum(when(bit))` columns): every input row then pays 64 slot
  * updates through a 64-field UnsafeRow aggregation buffer, and every
  * slot re-derives its seed hash. These aggregates keep the whole
  * signature in ONE primitive `Array[Long]` buffer — one buffer lookup
  * per row, per-slot seeds precomputed once — and emit the signature as a
  * single `array<long>` column.
  *
  * Exact-equivalence contract (proven in SigAggsSpec): slot i of
  * [[MinHashSigAgg]] equals `min(xxhash64(lit(i), h))` — Spark's XxHash64
  * folds children left-to-right from seed 42, so
  * `xxhash64(i: Int, h: Long) = XXH64.hashLong(h, XXH64.hashInt(i, 42))`
  * and the per-slot prefix `XXH64.hashInt(i, 42)` is a constant.
  * [[SimHashAgg]] bit i equals `sum(±1 from bit i of h) > 0` — the
  * [[graft.functions.TextOps.simHashBitAggs]]/`simHashAssemble` pair.
  *
  * Null contract: null inputs are skipped (the callers hash non-null
  * shingles, so none occur); both sides agree on every non-null stream.
  */
abstract class LongArraySigAgg extends TypedImperativeAggregate[Array[Long]] {
  override def children: Seq[Expression] = Seq(child)
  def child: Expression

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT hash column, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** 64-slot (or n-slot) MinHash signature in one pass; returns array<long>. */
case class MinHashSigAgg(child: Expression, numHashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends LongArraySigAgg {

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** XXH64.hashInt(i, 42) — the constant prefix of xxhash64(lit(i), h). */
  @transient private lazy val slotSeeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val s = XXH64.hashLong(h, slotSeeds(i))
        if (s < buf(i)) buf(i) = s
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** 64-bit SimHash in one pass: bit i of the result is `sign(Σ ±1 from bit
  * i of each input hash)`; returns the assembled BIGINT signature.
  */
case class SimHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0) extends LongArraySigAgg {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (((h >>> i) & 1L) << 1) - 1L // +1 if bit set, else -1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L; var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= 1L << i; i += 1 }
    sig
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** SQL registrations for the signature aggregates (GraftExtensions):
  * `graft_minhash_sig(h, 64)` and `graft_simhash(h)` make the native
  * one-buffer aggregates reachable from plain SQL — the same analyzer
  * path as any built-in aggregate (UnresolvedFunction wraps them in an
  * AggregateExpression), so `GROUP BY doc_id` dedup pipelines can be
  * written without the Scala API.
  */
object SigAggs {
  def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "graft_minhash_sig"),
      VecExprs.arity("graft_minhash_sig", 2) { es =>
        val n = es(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig: numHashes must be an integer literal, got $other")
        }
        MinHashSigAgg(es.head, n)
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      VecExprs.arity("graft_simhash", 1)(es => SimHashAgg(es.head))))
}
