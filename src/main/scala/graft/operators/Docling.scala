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

  /** LIVE service client (one per partition): POSTs each record to a
    * docling-serve-style `/v1alpha/convert/source` endpoint and parses
    * `document.md_content` from the JSON response — the reference's
    * per-record service-call shape over a real socket (exercised
    * against `graft.tools.DoclingHttpServer`; the hosted service's
    * models are env-blocked, the REST round trip is not).
    */
  final class HttpDoclingClient(host: String, port: Int) {
    import graft.serde.Bson
    import graft.serde.Bson.{BArr, BDoc, BStr, BVal}
    private val url = s"http://$host:$port/v1alpha/convert/source"

    def convert(id: Long, text: String): String = {
      val req = Bson.renderJson(BDoc(Seq(
        "options" -> (BDoc(Seq("to_formats" ->
          (BArr(Seq(BStr("md"))): BVal))): BVal),
        "sources" -> (BArr(Seq(BDoc(Seq(
          "kind" -> BStr("text"),
          "id" -> BStr(id.toString),
          "text" -> (BStr(if (text == null) "" else text): BVal))))): BVal))))
      val (code, body) = graft.model.BlobHttp.request("POST", url,
        req.getBytes("UTF-8"), Seq("Content-Type" -> "application/json"))
      require(code == 200, s"docling service returned $code")
      Bson.parseJson(new String(body, "UTF-8")) match {
        case d: BDoc =>
          require(d.get("status").contains(BStr("success")),
            s"conversion failed: ${new String(body, "UTF-8")}")
          d.get("document") match {
            case Some(doc: BDoc) => doc.get("md_content") match {
              case Some(BStr(md)) => md
              case other => throw new IllegalStateException(s"no md_content: $other")
            }
            case other => throw new IllegalStateException(s"no document: $other")
          }
        case other => throw new IllegalStateException(s"bad response: $other")
      }
    }
  }

  /** Add `<outCol>: STRING` converted by the LIVE service — one HTTP
    * client per partition, per-record POSTs (the reference's shape; at
    * scale each executor task holds its own keep-alive connection).
    */
  def fieldToDoclingHttp(df: DataFrame, idCol: String, textCol: String,
                         outCol: String, host: String, port: Int): DataFrame = {
    val outSchema = df.schema.add(outCol, StringType, nullable = true)
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val client = new HttpDoclingClient(host, port) // one per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq :+
          client.convert(r.getLong(idIdx), r.getString(txtIdx)))
      }
    }(enc)
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
