package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.sources.v2.ChangeLogSource

/** End-to-end pipeline over the DSv2 change-log source: envelope frames are
  * serialized to the wire format (the "binlog") through the DSv2 writer,
  * tailed by ChangeLogSource as a real MicroBatchStream with
  * segment-frontier offsets, parsed back into envelope frames, and merged
  * into the sink (bucketed by default — only touched buckets rewrite).
  */
object ChangeLogPipeline {

  /** Serialize an envelope feed to wire segments via the DSv2 batch
    * writer (pos order; committed names carry record counts, so the
    * tailing source needs no content reads for offsets or admission).
    */
  def writeWire(feed: DataFrame, dir: String, files: Int = 3): Unit =
    feed
      .repartitionByRange(files, col("source.pos"))
      .sortWithinPartitions(col("source.pos"))
      .select(
        col("source.table").as("table"), col("op"),
        col("source.pos").as("pos"),
        // coalesce: a delete's absent after-image must still occupy its
        // wire field
        coalesce(to_json(col("key")), lit("null")).as("key_json"),
        coalesce(to_json(col("after")), lit("null")).as("payload_json"))
      .write.format(classOf[ChangeLogSource].getName)
      .option("path", dir).mode("append").save()

  /** Tail the wire directory through the DSv2 source and materialize.
    * The default sink is the bucket-partitioned MERGE (touched-bucket
    * rewrite — the 100 TB path); pass `d => new MergeSink(d)` for the
    * full-state variant.
    */
  def run(spark: SparkSession, wireDir: String, sinkDir: String,
          keySchema: StructType, payloadSchema: StructType,
          sinkFactory: String => CdcSink =
            d => new BucketedMergeSink(d)): DataFrame = {
    val sink = sinkFactory(sinkDir)
    // checkpoint lives WITH the sink: a re-run over the same dirs
    // resumes from the committed offsets and epoch ids instead of
    // replaying from segment 0 with epoch ids that collide with the
    // sink's existing v0/m0 artifacts
    val ckpt = java.nio.file.Paths.get(sinkDir, "_checkpoint").toString
    val q = spark.readStream
      .format(classOf[ChangeLogSource].getName)
      .option("path", wireDir)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val env = batch.select(
          from_json(col("key_json"), keySchema).as("key"),
          lit(null).cast(payloadSchema).as("before"),
          from_json(col("payload_json"), payloadSchema).as("after"),
          col("op"),
          struct(col("pos")).as("source"),
          lit(null).cast("string").as("transaction"),
          col("pos").as("ts_ms"))
        sink.merge(env, epochId): Unit
      }
      .start()
    q.awaitTermination()
    sink.view(spark)
  }
}
