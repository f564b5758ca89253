package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: dump the formatted physical plans of every Spark job a
  * sink EPOCH actually runs (probe jobs, sidecar writes, the merge
  * write) — these execute INSIDE `CdcSink.merge`, so neither
  * `ExplainAudit` nor `ReducePlanDump` shows the real epoch shape. A
  * `QueryExecutionListener` captures each execution as it completes,
  * labeled by the preceding marker.
  *
  *   sbt 'runMain graft.tools.MergePlanDump'
  */
object MergePlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var section = ""
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        println(s"\n-------- [$section] job=$funcName " +
          f"(${durationNs / 1e9}%.3f s) --------")
        println(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    val feed = graft.sources.ChangeFeedGen.standardFeed(
      graft.sources.Tables.load(spark, sfDir, "orders"), "orders")

    def epoch(e: Int) = feed.filter(col("op") === "u" &&
      col("key.o_orderkey") % 1000 === (e - 1))

    def run(label: String, mk: String => graft.streaming.CdcSink): Unit = {
      section = s"$label snapshot epoch"
      val sink = mk(Files.createTempDirectory(s"mpd-$label").toString)
      sink.merge(feed.filter(col("op") === "r"), 0L)
      Thread.sleep(800) // listener bus drain before relabeling
      section = s"$label update epoch"
      sink.merge(epoch(1), 1L)
      Thread.sleep(800)
    }

    run("bucketed", d =>
      new graft.streaming.BucketedMergeSink(d, buckets = 128))
    run("full", d => new graft.streaming.MergeSink(d))
    run("lsm", d =>
      new graft.streaming.LsmMergeSink(d, buckets = 128, compactEvery = 2))
    spark.stop()
  }
}
