package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of the sink-epoch reduce
  * (`Materialize.reduceToBuckets`) — the operator sits INSIDE the sinks'
  * merge, so `ExplainAudit` over declared queries never shows it.
  *
  *   sbt 'runMain graft.tools.ReducePlanDump'
  */
object ReducePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val feed = graft.sources.ChangeFeedGen.standardFeed(
      graft.sources.Tables.load(spark, sfDir, "orders"), "orders")
    println("\n================ reduce_to_buckets ================")
    graft.operators.Materialize.reduceToBuckets(feed, 16, 4)
      .explain("formatted")
    spark.stop()
  }
}
