package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize
import graft.sources.{ChangeFeedGen, Tables}

/** Focused spec for the single-shuffle epoch reduce after its r15
  * hot-path rewrite: the per-partition first-per-key dedup moved from a
  * `mapPartitions` closure (external-row codec per event) to the native
  * stateful predicate `expressions.FirstOfSortedRun`. Pins (1) exact
  * equivalence with the aggregate formulation, (2) per-partition state
  * isolation across many concurrent tasks, and (3) the plan property the
  * rewrite exists for — no external-row round trip in the reduce.
  */
class ReduceToBucketsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("reduceToBuckets == latest-per-key aggregate, with bucket ids") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    for (buckets <- Seq(1, 16); tasks <- Seq(1, 7)) {
      val got = Materialize.reduceToBuckets(feed, buckets, tasks)
      // oracle: the reduceByKey aggregate (independent plan shape), the
      // same projection, bucket re-derived from the key
      val want = Materialize.reduceByKey(feed)
        .select(col("key"), col("after"), col("op"),
          col("source.pos").as("pos"),
          pmod(xxhash64(col("key")), lit(buckets)).as("_bucket"))
      assert(canon(got) == canon(want), s"buckets=$buckets tasks=$tasks")
    }
  }

  test("per-partition predicate state is isolated across concurrent tasks") {
    // 64 partitions of interleaved duplicate keys, far more tasks than
    // cores: shared mutable state between two concurrently-running
    // partitions would either drop first rows or keep duplicates.
    // buckets == writeTasks (ADVICE r15): with buckets < writeTasks the
    // repartition hashes only `buckets` distinct values, so most of the
    // 64 tasks would carry no rows and exercise nothing
    val n = 20000L
    val df = spark.range(0L, n, 1L, 8)
      .select(
        struct((col("id") % 500).as("k")).as("key"),
        struct(col("id").as("v")).as("after"),
        lit("u").as("op"),
        struct(col("id").as("pos")).as("source"))
    val out = Materialize.reduceToBuckets(df, buckets = 64, writeTasks = 64)
      .select(col("key.k"), col("pos")).collect()
    assert(out.length == 500)
    // latest per key: pos == max id of the key's run == k + 39*500
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + (n / 500 - 1) * 500,
        s"key ${r.getLong(0)} kept pos ${r.getLong(1)}")
    }
  }

  test("the reduce plan carries no external-row round trip") {
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val plan = Materialize.reduceToBuckets(feed, 16, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan.take(2000))
    assert(!plan.contains("MapPartitions"), plan.take(2000))
    assert(plan.contains("graft_first_of_sorted_run"), plan.take(2000))
  }
}
