package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.sources.v2.ChangeLogSource

/** End-to-end pipeline over the DSv2 change-log source: envelope frames are
  * serialized to the wire format (the "binlog"), tailed by
  * ChangeLogSource as a real MicroBatchStream with record-index offsets,
  * parsed back into envelope frames, and merged into the sink.
  */
object ChangeLogPipeline {

  /** Serialize an envelope feed to wire files (TAB fields; pos order). */
  def writeWire(feed: DataFrame, dir: String, files: Int = 3): Unit =
    feed
      .repartitionByRange(files, col("source.pos"))
      .sortWithinPartitions(col("source.pos"))
      // concat_ws silently drops nulls — a delete's absent after-image must
      // still occupy its wire field
      .select(concat_ws("\t",
        col("source.table"), col("op"), col("source.pos"),
        coalesce(to_json(col("key")), lit("null")),
        coalesce(to_json(col("after")), lit("null"))).as("value"))
      .write.mode("overwrite").text(dir)

  /** Tail the wire directory through the DSv2 source and materialize. */
  def run(spark: SparkSession, wireDir: String, sinkDir: String,
          keySchema: StructType, payloadSchema: StructType): DataFrame = {
    val sink = new MergeSink(sinkDir)
    val ckpt = Files.createTempDirectory("graft-wire-ckpt").toString
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
        sink.merge(env, epochId)
      }
      .start()
    q.awaitTermination()
    sink.view(spark)
  }
}
