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

  test("SQL names graft_minhash_sig / graft_simhash equal the Column-API aggregates") {
    hashed.createOrReplaceTempView("sig_hashed")
    val sqlMin = spark.sql(
      "SELECT doc_id, graft_minhash_sig(__h, 64) AS sig FROM sig_hashed GROUP BY doc_id")
      .as[(Long, Array[Long])].collect().toMap
    val apiMin = hashed.groupBy("doc_id")
      .agg(TextOps.minHashSig(col("__h"), 64).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    assert(sqlMin.keySet === apiMin.keySet && sqlMin.nonEmpty)
    sqlMin.foreach { case (doc, sig) => assert(sig.sameElements(apiMin(doc))) }
    val sqlSim = spark.sql(
      "SELECT doc_id, graft_simhash(__h) AS sim FROM sig_hashed GROUP BY doc_id")
      .as[(Long, Long)].collect().toMap
    val apiSim = hashed.groupBy("doc_id")
      .agg(TextOps.simHash(col("__h")).as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(sqlSim === apiSim)
  }

  test("PercentilesAgg matches Spark's builtin percentile to 6dp on every group") {
    import org.apache.spark.sql.GraftShim
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val ps = GraftShim.column(graft.functions.expressions
      .PercentilesAgg(GraftShim.expression(col("l_extendedprice")),
        Seq(0.5, 0.95, 0.99)).toAggregateExpression())
    val native = li.groupBy("l_returnflag").agg(ps.as("p"))
      .select(col("l_returnflag"), round(element_at(col("p"), 1), 6),
        round(element_at(col("p"), 2), 6), round(element_at(col("p"), 3), 6))
      .as[(String, Double, Double, Double)].collect().toSet
    val builtin = li.groupBy("l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6),
        round(expr("percentile(l_extendedprice, 0.95)"), 6),
        round(expr("percentile(l_extendedprice, 0.99)"), 6))
      .as[(String, Double, Double, Double)].collect().toSet
    assert(native == builtin && native.nonEmpty)
    // all-null group → null array (nullable contract)
    val nulls = Seq(("a", None: Option[Double]), ("a", None)).toDF("k", "v")
      .groupBy("k")
      .agg(GraftShim.column(graft.functions.expressions
        .PercentilesAgg(GraftShim.expression(col("v")), Seq(0.5))
        .toAggregateExpression()).as("p"))
      .select(col("p").isNull).as[Boolean].collect()
    assert(nulls.toSeq == Seq(true))
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
