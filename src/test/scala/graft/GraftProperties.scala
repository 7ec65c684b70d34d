package graft

import graft.functions.Fx
import graft.similarity.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the oracle-sensitive primitives
  * (SURVEY.md §5: surrogate-key determinism, date invariants, vector
  * math parity). Each case runs one small Spark job; 10 cases per
  * property keeps the suite fast.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark

  private val partGen: Gen[Option[String]] =
    Gen.option(Gen.choose(0, 20).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar)))

  property("surrogateKey = md5(parts|None-rendered)[0:12]") =
    forAll(Gen.nonEmptyListOf(partGen).map(_.take(4))) { parts =>
      val schema = StructType(parts.indices.map(i =>
        StructField(s"c$i", StringType, nullable = true)))
      val row = Row(parts.map(_.orNull): _*)
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), schema)
      val key = d.select(Fx.surrogateKey(
        parts.indices.map(i => col(s"c$i")): _*)).head().getString(0)
      val rendered = parts.map(_.getOrElse("None")).mkString("|")
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(rendered.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      key == expected
    }

  property("dateKey matches yyyyMMdd for any modern date") =
    forAll(Gen.choose(0L, 40000L)) { epochDay =>
      val date = java.time.LocalDate.ofEpochDay(epochDay)
      val got = spark.sql(s"SELECT DATE'$date' AS d")
        .select(Fx.dateKey(col("d"))).head().getInt(0)
      got == date.getYear * 10000 +
        date.getMonthValue * 100 + date.getDayOfMonth
    }

  property("is_weekend iff Saturday or Sunday") =
    forAll(Gen.choose(15000L, 25000L)) { epochDay =>
      val date = java.time.LocalDate.ofEpochDay(epochDay)
      val got = spark.sql(s"SELECT DATE'$date' AS d")
        .select(Fx.dateAttributes(col("d"))
          .find(_._1 == "is_weekend").get._2).head().getBoolean(0)
      val dow = date.getDayOfWeek
      got == (dow == java.time.DayOfWeek.SATURDAY ||
        dow == java.time.DayOfWeek.SUNDAY)
    }

  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))

  property("graft_dot equals left-to-right driver-side fold") =
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val expected = (0 until n).foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val schema = StructType(Seq(
        StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType))))
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(a, b)), 1), schema)
      val got = d.select(Similarity.dot(col("a"), col("b")))
        .head().getDouble(0)
      got == expected // same fold order → bit-identical
    }

  property("token bucket capacity is never exceeded") =
    forAll(Gen.choose(1, 120), Gen.choose(0L, 7200L)) { (rate, sec) =>
      var now = 0L
      val b = new graft.extract.TokenBucket(rate, () => now, _ => ())
      now = sec * 1000000000L
      b.acquire()
      b.available <= rate.toDouble
    }

  property("hashFraction lands in [0,1) and equals the driver-side " +
      "md5 computation for any id/salt") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.stringOfN(5, Gen.alphaNumChar)) { (id, salt) =>
      val got = spark.range(1).select(
        graft.sampling.Sampling.hashFraction(lit(id), salt))
        .head().getDouble(0)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + id.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val expected = java.lang.Long.parseLong(hex, 16) / 4294967296.0
      got == expected && got >= 0.0 && got < 1.0
    }

  property("TopKByScore equals sort-then-take under any input order") =
    forAll(
        Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0, 5)
          .map(_ / 4.0))),
        Gen.choose(1, 6)) { (pairs, k) =>
      import graft.expressions.{ScoredId, TopKByScore}
      val a = new TopKByScore(k)
      val entries = pairs.map { case (i, s) => ScoredId(i, s) }.distinct
      val got = a.finish(entries.foldLeft(a.zero)(a.reduce))
      val want = entries.sortBy(e => (-e.score, e.id)).take(k)
      // and merge over any split point agrees with the single pass
      val (l, r) = entries.splitAt(entries.size / 2)
      val merged = a.finish(a.merge(
        l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce)))
      got == want && merged == want
    }

  property("rangeJoin matches the theta join for random intervals") =
    forAll(
        Gen.listOfN(6, Gen.chooseNum(-50.0, 50.0)),
        Gen.listOfN(4, Gen.zip(Gen.chooseNum(-50.0, 50.0),
          Gen.chooseNum(0.0, 40.0))),
        Gen.chooseNum(1.0, 30.0)) { (points, ivals, width) =>
      val pts = spark.createDataFrame(
        spark.sparkContext.parallelize(
          points.zipWithIndex.map { case (v, i) => Row(i, v) }, 2),
        StructType(Seq(StructField("pid", IntegerType),
          StructField("v", DoubleType))))
      val iv = spark.createDataFrame(
        spark.sparkContext.parallelize(
          ivals.zipWithIndex.map { case ((lo, len), i) =>
            Row(i, lo, lo + len) }, 2),
        StructType(Seq(StructField("iid", IntegerType),
          StructField("lo", DoubleType), StructField("hi", DoubleType))))
      val got = graft.operators.Analytics
        .rangeJoin(pts, iv, "v", "lo", "hi", width)
        .select("pid", "iid").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = pts.crossJoin(iv)
        .where(col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      got == want
    }

  property("BoundedDistinctIds under any fold split equals the exact " +
      "distinct set when <= cap, and always freezes filterably past " +
      "it") =
    forAll(
      Gen.listOf(Gen.choose(0L, 12L)),
      Gen.choose(1, 6),
      Gen.choose(0, 100)) { (xs, cap, seed) =>
      val agg = new graft.expressions.BoundedDistinctIds(cap)
      // split the input at a pseudo-random point and merge the two
      // independently-reduced partials — the map-side/final shape
      val cut = if (xs.isEmpty) 0 else seed % (xs.size + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val distinct = xs.distinct.sorted
      if (distinct.size <= cap) merged == distinct
      else merged.size > cap // frozen: the size filter drops it
    }

  property("KLL exact regime under any shard split: merged quantiles " +
      "equal the inclusive order statistic") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(-1000, 1000).map(_.toDouble))
        .map(_.take(400)),
      Gen.choose(0, 100),
      Gen.oneOf(0.25, 0.5, 0.75)) { (xs, seed, rank) =>
      import org.apache.datasketches.kll.KllDoublesSketch
      import org.apache.datasketches.memory.Memory
      val mk = () => new graft.expressions.KllQuantile.SketchAgg(8192)
      val agg = mk()
      val cut = seed % (xs.size + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      val sk = KllDoublesSketch.heapify(
        Memory.wrap(agg.finish(merged)))
      val got = sk.getQuantile(rank,
        org.apache.datasketches.quantilescommon
          .QuantileSearchCriteria.INCLUSIVE)
      val s = xs.sorted
      val want = s(math.max(0,
        math.ceil(rank * s.length).toInt - 1))
      got == want && sk.getN == xs.length.toLong
    }
}
