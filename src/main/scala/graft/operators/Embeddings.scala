package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Field→embedding enrichment (SURVEY T19; reference
  * `debezium-ai/debezium-ai-embeddings/.../FieldToEmbedding.java:51-72` with
  * in-process MiniLM ONNX). Spark shape: mapPartitions with ONE model
  * session per partition (never per row), batch iteration, output column
  * ARRAY<FLOAT>. The model itself is STUBBED with a deterministic
  * hash-seeded generator (no ONNX runtime in this environment); swap
  * `StubEmbeddingModel` for a real session without touching the plumbing.
  */
object Embeddings {

  /** Deterministic stand-in for an ONNX text-embedding session. */
  final class StubEmbeddingModel(dims: Int) {
    def embed(text: String): Array[Float] = {
      var s = if (text == null) 0L
              else text.foldLeft(1125899906842597L)((h, c) => 31 * h + c)
      val raw = Array.fill(dims) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat
      }
      val n = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      if (n == 0f) raw else raw.map(_ / n)
    }
  }

  /** Add `<outCol>: ARRAY<FLOAT>` computed from `textCol`. */
  def fieldToEmbedding(df: DataFrame, textCol: String, outCol: String,
                       dims: Int = 64): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val model = new StubEmbeddingModel(dims) // session per partition
      rows.map { r =>
        val emb = model.embed(r.getString(idx))
        Row.fromSeq(r.toSeq :+ emb.toSeq)
      }
    }(enc)
  }
}
