package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TsStore

/** ScalaCheck-generator properties (SURVEY §5.2.3): random-series
  * round-trip, forward-fill idempotence, cosine bounds — semantic
  * invariants no single fixture exercises. Samples are drawn with fixed
  * seeds (no scalatestplus bridge in the offline cache, so sampling is
  * driven directly; determinism is a feature here anyway).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted for seed $seed"))

  private val seriesGen: Gen[List[(Long, Long, Option[Double])]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      uid <- Gen.choose(1L, 3L)
      off <- Gen.choose(0L, 86400L)
      v <- Gen.option(Gen.choose(-1000.0, 1000.0))
    } yield (uid, off, v))
  } yield rows.zipWithIndex.map { case ((u, o, v), i) => (u, o * 1000000L + i, v) }
  // offsets made unique per row (µs + index) → a valid tick series

  private def toDf(rows: List[(Long, Long, Option[Double])]) = {
    import spark.implicits._
    rows.map { case (u, us, v) =>
      (u, new Timestamp(1704067200000L + us / 1000), v)
    }.toDF("user_id", "ts", "value")
  }

  test("property: TsStore round-trip preserves any generated series") {
    (1L to 5L).foreach { seed =>
      val rows = sample(seriesGen, seed)
      val df = toDf(rows)
      val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
      TsStore.write(df, dir, tsCol = "ts", uidCols = Seq("user_id"))
      val back = TsStore.read(spark, dir).select("user_id", "ts", "value")
      assert(back.count() === df.count(), s"seed=$seed")
      assert(back.except(df).count() === 0 && df.except(back).count() === 0, s"seed=$seed")
    }
  }

  test("property: forward-fill is idempotent (ffill(ffill(x)) == ffill(x))") {
    (10L to 14L).foreach { seed =>
      val w = Window.partitionBy("user_id").orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val df = toDf(sample(seriesGen, seed))
        .withColumn("rid", monotonically_increasing_id())
      val once = df.withColumn("value", last(col("value"), ignoreNulls = true).over(w))
      val twice = once.withColumn("value", last(col("value"), ignoreNulls = true).over(w))
      assert(once.select("user_id", "ts", "value")
        .except(twice.select("user_id", "ts", "value")).count() === 0, s"seed=$seed")
    }
  }

  test("property: cosine of any two nonzero vectors lies in [-1, 1]") {
    import spark.implicits._
    val vecGen = Gen.listOfN(64, Gen.choose(-1.0f, 1.0f))
      .suchThat(_.exists(x => math.abs(x) > 1e-3))
    val pairs = (20L to 29L).map(s => (sample(vecGen, s).toArray, sample(vecGen, s + 100).toArray))
    val df = pairs.toDF("a", "b")
      .select(graft.functions.VectorOps.cosine(col("a"), col("b")).as("c"))
    df.collect().foreach { r =>
      val c = r.getDouble(0)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("property: tolerance-bounded asof equals brute force on BOTH implementations") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val tol = 3600L * 1000000L // 1 hour of µs against a day of offsets — bites often
    (40L to 44L).foreach { seed =>
      val rows = sample(seriesGen, seed)
      val (l, r) = rows.zipWithIndex.partition(_._2 % 2 == 0)
      val left = l.map { case ((u, us, _), i) => (u, i.toLong, us) }
      val right = r.map { case ((u, us, _), i) => (u, i.toLong, us) }
      if (left.nonEmpty && right.nonEmpty) {
        val lDf = left.toDF("user_id", "event_id", "us")
        val brute: Map[Long, Option[Long]] =
          left.map { case (u, id, us) =>
            val cands = right.filter { case (u2, _, us2) =>
              u2 == u && us2 <= us && us2 >= us - tol }
            id -> (if (cands.isEmpty) None
              else Some(cands.maxBy { case (_, rid, rus) => (rus, rid) }._2))
          }.toMap
        val win = TimeSeries.asofJoin(lDf, right.toDF("user_id", "r_id", "r_us"),
          keys = Seq("user_id"), leftTs = "us", rightTs = "r_us",
          rightTieBreak = Seq("r_id"), tolerance = Some(lit(tol)))
          .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
        val nat = TimeSeries.asofJoinNative(lDf, right.toDF("v_uid", "r_id", "r_us"),
          leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "us", rightTs = "r_us", rightTieBreak = Seq("r_id"),
          toleranceMicros = Some(tol))
          .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
        assert(win == brute, s"seed=$seed window-path")
        assert(nat == brute, s"seed=$seed native-exec-path")
      }
    }
  }

  test("property: asofJoinNearest equals brute force (equal-distance ties go backward)") {
    import spark.implicits._
    import graft.operators.TimeSeries
    (40L to 44L).foreach { seed =>
      val rows = sample(seriesGen, seed)
      val (l, r) = rows.zipWithIndex.partition(_._2 % 2 == 0)
      val left = l.map { case ((u, us, _), i) => (u, i.toLong, us) }
      val right = r.map { case ((u, us, _), i) => (u, i.toLong, us) }
      if (left.nonEmpty && right.nonEmpty) {
        val lDf = left.toDF("user_id", "event_id", "us")
          .select(col("user_id"), col("event_id"), timestamp_micros(col("us")).as("ts"))
        val rDf = right.toDF("user_id", "r_id", "r_us")
          .select(col("user_id"), col("r_id"), timestamp_micros(col("r_us")).as("r_ts"))
        val brute: Map[Long, Option[Long]] = left.map { case (u, id, us) =>
          val cands = right.filter(_._1 == u)
          val bwd = cands.filter(_._3 <= us) match {
            case Nil => None; case c => Some(c.maxBy(x => (x._3, x._2))) }
          val fwd = cands.filter(_._3 >= us) match {
            case Nil => None; case c => Some(c.minBy(x => (x._3, x._2))) }
          val best = (bwd, fwd) match {
            case (None, f) => f.map(_._2)
            case (b, None) => b.map(_._2)
            case (Some(b), Some(f)) =>
              if ((f._3 - us) < (us - b._3)) Some(f._2) else Some(b._2)
          }
          id -> best
        }.toMap
        val got = TimeSeries.asofJoinNearest(lDf, rDf, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "r_ts", rightTieBreak = Seq("r_id"))
          .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
        assert(got == brute, s"seed=$seed")
        val nat = TimeSeries.asofJoinNative(lDf,
          rDf.withColumnRenamed("user_id", "v_uid"),
          leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
          leftTs = "ts", rightTs = "r_ts", rightTieBreak = Seq("r_id"),
          nearest = true)
          .select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
        assert(nat == brute, s"seed=$seed native-exec-path")
      }
    }
  }

  test("property: asofJoin (both directions) equals the brute-force reference on random series") {
    import spark.implicits._
    import graft.operators.TimeSeries
    (30L to 34L).foreach { seed =>
      val rows = sample(seriesGen, seed)
      // split generated rows into a left and right side per uid
      val (l, r) = rows.zipWithIndex.partition(_._2 % 2 == 0)
      val left = l.map { case ((u, us, _), i) => (u, i.toLong, us) }
      val right = r.map { case ((u, us, _), i) => (u, i.toLong, us) }
      if (left.nonEmpty && right.nonEmpty) {
        val lDf = left.toDF("user_id", "event_id", "us")
        val rDf = right.toDF("user_id", "r_id", "r_us")
        def brute(forward: Boolean): Map[Long, Option[Long]] =
          left.map { case (u, id, us) =>
            val cands = right.filter { case (u2, _, us2) =>
              u2 == u && (if (forward) us2 >= us else us2 <= us) }
            val best =
              if (cands.isEmpty) None
              else if (forward) Some(cands.minBy { case (_, rid, rus) => (rus, rid) }._2)
              else Some(cands.maxBy { case (_, rid, rus) => (rus, rid) }._2)
            id -> best
          }.toMap
        Seq(false, true).foreach { fwd =>
          val got = TimeSeries.asofJoin(lDf, rDf, keys = Seq("user_id"),
            leftTs = "us", rightTs = "r_us",
            rightTieBreak = Seq("r_id"), forward = fwd)
            .select("event_id", "r_id").as[(Long, Option[Long])]
            .collect().toMap
          assert(got == brute(fwd), s"seed=$seed forward=$fwd")
          // the custom exec must agree in BOTH directions too
          val nat = TimeSeries.asofJoinNative(lDf,
            right.toDF("v_uid", "r_id", "r_us"),
            leftKeys = Seq("user_id"), rightKeys = Seq("v_uid"),
            leftTs = "us", rightTs = "r_us",
            rightTieBreak = Seq("r_id"), forward = fwd)
            .select("event_id", "r_id").as[(Long, Option[Long])]
            .collect().toMap
          assert(nat == brute(fwd), s"seed=$seed forward=$fwd native-exec-path")
        }
      }
    }
  }

  test("property: bloom filter has zero false negatives at any sizing") {
    import spark.implicits._
    import graft.functions.BloomFilter
    val gen = for {
      mExp <- Gen.choose(7, 14) // 128 bits .. 16 Kbits
      n <- Gen.choose(1, 2000)
      keys <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield (1 << mExp, keys)
    (1L to 6L).foreach { seed =>
      val (mBits, keys) = sample(gen, seed)
      val df = keys.toDF("k")
      val (h1, h2) = BloomFilter.probes(col("k"))
      val agg = org.apache.spark.sql.functions.udaf(
        BloomFilter.agg(mBits),
        org.apache.spark.sql.Encoders.product[BloomFilter.Probes])
      val bloom = df.select(h1.as("h1"), h2.as("h2"))
        .agg(agg(col("h1"), col("h2")).as("bf"))
        .select(col("bf.bits").as("__bits"))
      val misses = df.join(broadcast(bloom))
        .filter(!BloomFilter.mightContain(col("__bits"), col("k")))
        .count()
      assert(misses == 0L, s"seed=$seed mBits=$mBits n=${keys.size}: $misses false negatives")
    }
  }

  test("property: bucketCandidates is bounded and complete on random bucket layouts") {
    import spark.implicits._
    val layoutGen: Gen[List[(Long, Long)]] = for {
      nBuckets <- Gen.choose(1, 6)
      rows <- Gen.listOfN(nBuckets, Gen.choose(1, 30))
    } yield rows.zipWithIndex.flatMap { case (sz, b) =>
      (0 until sz).map(i => ((b * 1000 + i).toLong, b.toLong))
    }
    (1L to 5L).foreach { seed =>
      val rows = sample(layoutGen, seed)
      val cap = 10
      val bands = rows.toDF("doc_id", "b")
      val got = Q.bucketCandidates(bands, "b", "doc_id", cap)
        .as[(Long, Long)].collect().toSet
      val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._1).sorted)
      val want = byBucket.flatMap { case (_, ids) =>
        if (ids.size <= cap)
          for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
        else ids.tail.map(m => (ids.head, m)) // star to the min id
      }.toSet
      assert(got === want, s"seed=$seed")
      // invariants: ordered pairs, and per-bucket output never exceeds
      // max(cap², B−1) — the linear-salvage bound
      got.foreach { case (a, bb) => assert(a < bb, s"seed=$seed unordered pair") }
    }
  }
}
