package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** The mapPartitions decode stub must agree with its SQL-expression twin
  * (`mm_meta`) — same schema, same values, any partitioning.
  */
class DecodeStubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeStub output equals mm_meta metadata columns") {
    val payload = Tables.documents(spark, TestSpark.sf001)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(7) // exercise multi-partition batch shape
    val viaStub = Multimodal.decodeStub(payload)
    assert(viaStub.schema === Multimodal.mediaMetaSchema)
    val viaSql = Registry.all("mm_meta").fn(spark, TestSpark.sf001)
      .select("doc_id", "n_bytes", "fmt", "width", "height")
    assert(viaStub.count() === viaSql.count())
    assert(viaStub.except(viaSql).count() === 0)
    assert(viaSql.except(viaStub).count() === 0)
  }
}
