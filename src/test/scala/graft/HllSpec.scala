package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.{GraftFunctions, Hll}

class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.01"

  private def sketchOf(n: Int, offset: Int = 0, p: Int = 8): Array[Byte] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    (0 until n).map(i => (i + offset).toString).toDF("v")
      .agg(GraftFunctions.hllSketch(col("v"), p).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
  }

  test("bucketRank matches the md5 hex definition") {
    // md5("7") = 8f14e45fceea167a5a36dedd4bea2543 →
    // bucket 0x8f = 143, w = 0x14e45fceea167 = 367537479917927
    val (bucket, rank) = Hll.bucketRank("7".getBytes("UTF-8"), 8)
    assert(bucket == 143)
    val w = 367537479917927L
    assert(rank == 53 - (64 - java.lang.Long.numberOfLeadingZeros(w)))
  }

  test("estimate is within 3 standard errors of the exact count") {
    // p=8 → m=256, stderr = 1.04/sqrt(256) ≈ 6.5%
    for (n <- Seq(500, 5000, 50000)) {
      val est = Hll.estimate(sketchOf(n))
      assert(math.abs(est - n) < 3 * 0.065 * n,
        s"n=$n est=$est outside 3σ")
    }
  }

  test("small-range linear counting keeps tiny counts near-exact") {
    val est = Hll.estimate(sketchOf(25))
    assert(math.abs(est - 25) <= 5, s"est=$est")
  }

  test("merge of disjoint sketches equals the sketch of the union") {
    val a = sketchOf(3000, offset = 0)
    val b = sketchOf(3000, offset = 100000)
    GraftFunctions.register(spark)
    import spark.implicits._
    val merged = Seq(a, b).toDF("s")
      .agg(GraftFunctions.hllMerge(col("s")).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val union = {
      val rows = (0 until 3000).map(_.toString) ++
        (0 until 3000).map(i => (i + 100000).toString)
      rows.toDF("v").agg(GraftFunctions.hllSketch(col("v"), 8).as("s"))
        .collect()(0).getAs[Array[Byte]]("s")
    }
    assert(java.util.Arrays.equals(merged, union))
    // estimate of the merge is deterministic and sane
    val est = Hll.estimate(merged)
    assert(math.abs(est - 6000) < 3 * 0.065 * 6000)
  }

  test("sketches survive a parquet round trip and re-aggregate") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/events.parquet")
    val perType = e.groupBy(col("event_type"))
      .agg(GraftFunctions.hllSketch(col("user_id").cast("string"), 8)
        .as("sketch"))
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    perType.write.mode("overwrite").parquet(dir)

    val rolled = spark.read.parquet(dir)
      .agg(GraftFunctions.hllMerge(col("sketch")).as("sketch"))
      .select(GraftFunctions.hllEstimate(col("sketch")).as("est"))
      .collect()(0).getDouble(0)
    val exact = e.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(rolled - exact) < 3 * 0.065 * exact,
      s"rolled=$rolled exact=$exact")
  }

  test("null values are skipped, not hashed") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val withNulls = Seq(Some("1"), None, Some("2"), None).toDF("v")
      .agg(GraftFunctions.hllSketch(col("v"), 8).as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(withNulls, sketchOf(2, offset = 1)))
  }
}
