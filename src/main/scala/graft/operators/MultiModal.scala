package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (builder-prompt requirement): image/audio/
  * video travel as opaque BINARY columns with typed metadata; decode /
  * feature-extract run as partition-batched functions (the Scala analogue
  * of `mapInPandas` — one "model/codec session" per partition, batch-shaped
  * I/O). The actual codec is STUBBED deterministically (no image/audio
  * libraries in this environment); the Spark-side plumbing — schema,
  * partitioning, batch iteration, session-per-partition lifecycle — is real
  * and tested.
  */
object MultiModal {

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** STUB codec: deterministic pseudo-decode of a binary blob. A real
    * deployment replaces this object with an actual codec (ONNX session /
    * libvips handle) — note it is constructed once per partition, not per
    * row, exactly where a model session would be opened.
    */
  final class StubCodecSession {
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val n = if (bytes == null) 0 else bytes.length
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      // fake dimensions derived only from length — deterministic
      (fmt, 16 + (n % 640), 16 + ((n * 7) % 480))
    }
  }

  /** Attach decoded metadata for a binary column via mapPartitions with a
    * per-partition codec session.
    */
  def decodeMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ metaSchema.fields)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val session = new StubCodecSession // one per partition, like a model
      rows.map { r =>
        val bytes = r.get(binIdx) match {
          case b: Array[Byte] => b
          case null => null
          case other => other.toString.getBytes("UTF-8")
        }
        val n = if (bytes == null) 0 else bytes.length
        val (fmt, w, h) = session.decode(bytes)
        Row.fromSeq(r.toSeq ++ Seq(n, fmt, w, h))
      }
    }(enc)
  }

  /** Frame-sampling stub for video-ish blobs: emit one row per sampled
    * "frame" (every `stride` bytes), preserving the source key — the
    * explode-shaped half of the multimodal pipeline.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, keyCol: String,
                   stride: Int): DataFrame =
    df.select(col(keyCol), col(binaryCol))
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(
          (length(col(binaryCol)) / stride).cast("int") - 1, lit(0)))))
      .withColumn("frame_off", col("frame_no") * stride)
      .drop(binaryCol)
}
