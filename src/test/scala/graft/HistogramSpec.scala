package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Histogram

class HistogramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val s = 4

  test("bounds invert the bucket: lo <= x <= hi, bucket monotone in x") {
    import spark.implicits._
    val xs = (0L to 2000L) ++ Seq(4095L, 4096L, 4097L, 1L << 40, Long.MaxValue >> 8)
    val rows = xs.toDF("x")
      .select(col("x"), Histogram.hdrBucket(col("x"), s).as("b"))
      .select(col("x"), col("b"),
        Histogram.lowerBound(col("b"), s).as("lo"),
        Histogram.upperBound(col("b"), s).as("hi"))
      .collect()
    rows.foreach { r =>
      val (x, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(lo <= x && x <= hi, s"x=$x outside [$lo,$hi]")
      // relative width bound: hi - lo < 2^-s * lo outside the exact region
      if (lo >= (1L << (s + 1))) assert(hi - lo + 1 <= lo / (1 << s))
    }
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1), "bucket must be monotone in x")
    }
  }

  test("quantile estimates are within 2^-s relative error of exact") {
    import spark.implicits._
    // skewed data: heavy head, long tail (the web-corpus length shape)
    val xs = (1 to 20000).map(i => (i % 97 + 1).toLong) ++
      (1 to 200).map(i => (i * 731).toLong)
    val df = xs.toDF("x").withColumn("g", lit("all"))
    val hist = Histogram.hdrHistogram(df, col("g"), col("x"), s)
    val got = Histogram.quantiles(hist, s,
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val sortedXs = xs.sorted
    def exact(q: Double) = sortedXs(math.ceil(q * xs.size).toInt - 1)
    for ((name, q) <- Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)) {
      val e = exact(q).toDouble
      assert(math.abs(got(name) - e) <= e / (1 << s) + 1,
        s"$name: got ${got(name)}, exact $e")
    }
  }

  test("null/negative inputs land in the NULL bucket and never shift quantiles") {
    import spark.implicits._
    val clean = (1L to 1000L).map(Option(_))
    val dirty = clean ++ Seq.fill(300)(None) ++ (1 to 300).map(i => Option(-i.toLong))
    def q(xs: Seq[Option[Long]]) = {
      val hist = Histogram.hdrHistogram(
        xs.toDF("x").withColumn("g", lit("g")), col("g"), col("x"), s)
      Histogram.quantiles(hist, s, Seq(("p50", 1, 2), ("p99", 99, 100)))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    // invalid values must not count toward totals or cumulative rank
    assert(q(dirty) == q(clean))
    // but they are surfaced: the NULL bucket carries their count
    val hist = Histogram.hdrHistogram(
      dirty.toDF("x").withColumn("g", lit("g")), col("g"), col("x"), s)
    val nullN = hist.filter(col("bucket").isNull)
      .agg(sum(col("n"))).head.getLong(0)
    assert(nullN == 600L)
  }

  test("sum-merge of partial histograms equals the whole-data histogram") {
    import spark.implicits._
    val xs = (1 to 5000).map(i => (i * 37 % 4096).toLong)
    def hist(part: Seq[Long]) = Histogram.hdrHistogram(
      part.toDF("x").withColumn("g", lit("g")), col("g"), col("x"), s)
    val (a, b) = xs.splitAt(2000)
    val merged = hist(a).unionAll(hist(b))
      .groupBy(col("group"), col("bucket")).agg(sum(col("n")).as("n"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(merged) == canon(hist(xs)))
  }

  test("histogram plan is a hash aggregate — no sort, no window on values") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hist = Histogram.hdrHistogram(docs, col("lang"),
      graft.analytics.TextAnalysis.tokenCount(col("text")), s)
    val plan = hist.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "histogram must not need a window")
    assert(!plan.toLowerCase.contains("sortaggregate"),
      "bucket count must hash-aggregate")
  }
}
