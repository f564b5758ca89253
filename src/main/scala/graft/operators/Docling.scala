package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StringType, StructType}

/** Field→document-conversion enrichment (SURVEY T20; reference
  * `debezium-ai/debezium-ai-docling/.../FieldToDocling.java` calls a
  * Docling service per record). Spark shape: mapPartitions with ONE service
  * client per partition, batch iteration. The service call is STUBBED with
  * a deterministic markdown-ish conversion (no egress here); the
  * partition-session plumbing is real.
  */
object Docling {

  /** Stand-in for a Docling HTTP client session. */
  final class StubDoclingClient {
    def convert(id: Long, text: String): String =
      s"# doc $id\n\n" + (if (text == null) "" else text)
  }

  /** Add `<outCol>: STRING` markdown conversion of (`idCol`, `textCol`). */
  def fieldToDocling(df: DataFrame, idCol: String, textCol: String,
                     outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, StringType, nullable = true)
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val client = new StubDoclingClient // one per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ client.convert(r.getLong(idIdx), r.getString(txtIdx)))
      }
    }(enc)
  }
}
