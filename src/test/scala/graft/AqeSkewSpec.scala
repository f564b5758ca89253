package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: the engine's 100 TB answer to hot keys is
  * (a) manual salting (`Salting`, `a_salted_agg`) and (b) AQE's
  * skew-join split — this spec pins (b) actually firing on a skewed
  * shuffle join, so a config regression (AQE or the skew thresholds
  * accidentally disabled in a session builder) cannot silently revert
  * the claim.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.enabled" ->
        spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // local-scale thresholds so the synthetic skew qualifies
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of fact rows share one key; dim is uniform
      val facts = spark.range(0, 200000)
        .select(when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("pad"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      // global agg above the join: no output-partitioning requirement, so
      // OptimizeSkewedJoin is free to split; max(pad) keeps the wide
      // column in the shuffled data (pruned otherwise → no skew bytes)
      val joined = facts.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(col("pad")).as("mp"),
          sum(col("v")).as("sv"))
      val row = joined.collect()(0)
      // correctness survives the split: every fact row matches one dim row
      assert(row.getLong(0) == 200000L, s"join row count ${row.getLong(0)}")
      assert(row.getString(1).length == 64)
      // the FINAL adaptive plan must mark the skewed SMJ side as split
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${finalPlan.take(800)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
