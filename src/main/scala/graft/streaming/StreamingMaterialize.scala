package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming CDC pipeline: change-feed transport → Structured
  * Streaming micro-batches → foreachBatch MERGE (SURVEY §3.1's Spark shape:
  * the reference's queue/poll loop collapses into micro-batch planning, the
  * offset store into the checkpoint location).
  */
object StreamingMaterialize {

  /** Write a batch feed DataFrame to a parquet "transport" directory,
    * range-partitioned by position so file order == log order (stands in
    * for a Kafka topic / binlog transport; file listing order is the
    * replayable offset axis).
    *
    * Spark's file stream source admits files in MODIFICATION-TIME order
    * (ties broken by listing order, which is nondeterministic), while the
    * parallel write gives all part files near-identical mtimes — so
    * without correction a later-pos file can enter an EARLIER micro-batch
    * than its predecessor. Order-sensitive sinks (the JDBC sink applies
    * statements in arrival order, like any consumer of a real log) then
    * see history out of order across batches. Stamp strictly increasing
    * mtimes in part-file (= pos-range) order so the transport honours the
    * log contract it stands in for.
    */
  def writeTransport(feed: DataFrame, dir: String, files: Int = 4,
                     orderCol: String = "source.pos"): Unit = {
    feed.repartitionByRange(files, col(orderCol))
      .write.mode("overwrite").parquet(dir)
    stampLogOrder(dir)
  }

  /** Stamp strictly increasing mtimes over a transport directory's part
    * files in name order (range partitioning makes name order == order-key
    * order), so the file stream source admits them as a log.
    */
  def stampLogOrder(dir: String): Unit = {
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val base = System.currentTimeMillis() - parts.length * 1000L
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(base + i * 1000L),
        s"could not stamp transport order on ${f.getName}")
    }
  }

  /** Stream the transport into a MergeSink, `filesPerTrigger` files per
    * micro-batch, until all available data is processed. Returns the
    * materialized view.
    */
  def run(spark: SparkSession, transportDir: String, sinkDir: String,
          filesPerTrigger: Int = 1, sinkFactory: String => CdcSink =
            d => new MergeSink(d)): DataFrame = {
    val schema = spark.read.parquet(transportDir).schema
    val sink = sinkFactory(sinkDir)
    // checkpoint co-located with the sink so re-runs RESUME (same
    // rationale as ChangeLogPipeline.run) instead of replaying epoch 0
    // over committed sink state
    val ckpt = java.nio.file.Paths.get(sinkDir, "_checkpoint").toString
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(transportDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        sink.merge(batch, epochId): Unit
      }
      .start()
    q.awaitTermination()
    sink.view(spark)
  }

  /** Convenience: full pipeline from an in-memory feed. 4 transport files
    * in 2-file micro-batches: multiple batches exercise cross-batch state
    * without paying one full-state merge per file.
    */
  def materializeFeed(spark: SparkSession, feed: DataFrame): DataFrame = {
    val transport = Files.createTempDirectory("graft-transport").toString
    val sinkDir = Files.createTempDirectory("graft-sink").toString
    writeTransport(feed, transport)
    run(spark, transport, sinkDir, filesPerTrigger = 2)
  }
}
