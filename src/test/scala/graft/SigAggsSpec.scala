package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextOps
import graft.sources.Tables

/** Native one-buffer signature aggregates vs their 64-column twins:
  * slot-by-slot / bit-by-bit equality on the real fixture corpus.
  */
class SigAggsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashed = TextOps.docShingles(Tables.documents(spark, TestSpark.sf001), 3)
    .withColumn("__h", TextOps.baseHash(col("sh")))

  test("MinHashSigAgg equals the 64 separate min(xxhash64(i, h)) aggregates") {
    val n = 64
    val native = hashed.groupBy("doc_id")
      .agg(TextOps.minHashSig(col("__h"), n).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    val aggs = TextOps.minHashAggs(col("__h"), n)
    val twin = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to n).map(r.getLong).toArray).toMap
    assert(native.keySet == twin.keySet && native.nonEmpty)
    native.foreach { case (doc, sig) =>
      assert(sig.sameElements(twin(doc)), s"doc $doc signature diverged")
    }
  }

  test("SimHashAgg equals the sum(when(bit)) + assemble twin") {
    val native = hashed.groupBy("doc_id")
      .agg(TextOps.simHash(col("__h")).as("sim"))
      .as[(Long, Long)].collect().toMap
    val bitAggs = TextOps.simHashBitAggs(col("__h"))
    val twin = hashed.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), TextOps.simHashAssemble.as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(native == twin && native.nonEmpty)
  }

  test("band structs from the array signature equal the h0..h63 spelling") {
    val n = 64; val r = 4
    val fromSig = hashed.groupBy("doc_id")
      .agg(TextOps.minHashSig(col("__h"), n).as("sig"))
      .select(col("doc_id"),
        explode(array(TextOps.bandStructsFromSig(col("sig"), n, r): _*)).as("b"))
      .select($"doc_id", $"b.band", $"b.sig")
      .as[(Long, Int, Long)].collect().toSet
    val aggs = TextOps.minHashAggs(col("__h"), n)
    val fromCols = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), explode(array(TextOps.bandStructs(n, r): _*)).as("b"))
      .select($"doc_id", $"b.band", $"b.sig")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromSig == fromCols && fromSig.nonEmpty)
  }
}
