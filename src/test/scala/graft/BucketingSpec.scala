package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY scale requirements: "co-locate
  * joins via bucketing or pre-partitioning"): two tables bucketed on the
  * join key join without shuffling either side.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables has no shuffle exchange") {
    // warehouse.dir is static — tables land in ./spark-warehouse (gitignored)
    // and are dropped at the end
    spark.sql("CREATE DATABASE IF NOT EXISTS graftbuckets")
    spark.sql("USE graftbuckets")
    try {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      // force a non-broadcast join so bucketing is what avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = joined.queryExecution.executedPlan.toString
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join")
      // the only exchange allowed is for the final groupBy, never below the join
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange"),
        "bucketed join still shuffled its inputs")
      val n = joined.count()
      assert(n > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("USE default")
    }
  }
}
