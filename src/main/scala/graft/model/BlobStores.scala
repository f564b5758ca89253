package graft.model

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** K7 cloud object-store backends over plain REST (reference
  * `debezium-storage-s3/src/main/java/io/debezium/storage/s3/history/
  * S3SchemaHistory.java` and `debezium-storage-azure-blob/.../
  * AzureBlobSchemaHistory.java`). Both reference implementations hold
  * the record list in memory and re-upload the WHOLE object on every
  * store (object stores have no append), recovering by downloading the
  * object at startup — the same single-writer, control-plane-sized
  * pattern implemented here. The AWS/Azure SDKs are env-blocked, so the
  * REST layer each SDK emits is spoken directly against
  * `graft.tools.BlobHttpServer` (zero egress; the bytes on the wire are
  * the published protocols).
  */
object BlobHttp {

  def request(method: String, url: String, body: Array[Byte],
              headers: Seq[(String, String)]): (Int, Array[Byte]) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (body != null) {
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      os.write(body); os.close()
    }
    val code = conn.getResponseCode
    val stream =
      if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp =
      if (stream == null) Array.emptyByteArray else stream.readAllBytes()
    conn.disconnect()
    (code, resp)
  }
}

/** S3 schema history: one object holding the JSONL record log, replaced
  * per append (reference `S3SchemaHistory.storeRecord` uploads the full
  * document each time).
  */
final class S3HistoryStorage(endpoint: String, bucket: String, key: String)
  extends HistoryStorage {

  private def url = s"$endpoint/$bucket/$key"
  private val records = scala.collection.mutable.ArrayBuffer.empty[String]
  locally {
    val (code, body) = BlobHttp.request("GET", url, null, Nil)
    if (code == 200)
      records ++= new String(body, StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty)
    else require(code == 404, s"unexpected GET status $code")
  }

  override def append(line: String): Unit = synchronized {
    records += line
    val doc = records.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val (code, _) = BlobHttp.request("PUT", url, doc, Nil)
    require(code == 200, s"S3 PUT failed with $code")
  }

  override def readAll(): Seq[String] = synchronized(records.toSeq)
}

/** S3 offset store: the file-store semantics over one object (`key\tvalue`
  * lines, whole-object replace on set, GET-at-construct recovery).
  */
final class S3OffsetBackingStore(endpoint: String, bucket: String, key: String)
  extends OffsetBackingStore {

  private def url = s"$endpoint/$bucket/$key"
  private val m = scala.collection.concurrent.TrieMap.empty[String, String]
  locally {
    val (code, body) = BlobHttp.request("GET", url, null, Nil)
    if (code == 200)
      new String(body, StandardCharsets.UTF_8).split("\n")
        .filter(_.nonEmpty).foreach { l =>
          val Array(k, v) = l.split("\t", 2)
          m.put(k, v)
        }
    else require(code == 404, s"unexpected GET status $code")
  }

  override def get(k: String): Option[String] = m.get(k)

  override def set(k: String, value: String): Unit = synchronized {
    m.put(k, value)
    val doc = m.toSeq.sortBy(_._1).map { case (a, b) => s"$a\t$b" }
      .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val (code, _) = BlobHttp.request("PUT", url, doc, Nil)
    require(code == 200, s"S3 PUT failed with $code")
  }

  override def snapshot: Map[String, String] = m.toMap
}

/** Azure Blob schema history — same whole-object pattern via the Blob
  * REST dialect: PUT carries `x-ms-blob-type: BlockBlob` (the service
  * rejects a PUT without it) and succeeds with 201 Created.
  */
final class AzureBlobHistoryStorage(endpoint: String, container: String,
                                    blob: String) extends HistoryStorage {

  private def url = s"$endpoint/$container/$blob"
  private val azureHeaders = Seq(
    "x-ms-version" -> "2021-08-06", "x-ms-blob-type" -> "BlockBlob")
  private val records = scala.collection.mutable.ArrayBuffer.empty[String]
  locally {
    val (code, body) =
      BlobHttp.request("GET", url, null, Seq("x-ms-version" -> "2021-08-06"))
    if (code == 200)
      records ++= new String(body, StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty)
    else require(code == 404, s"unexpected GET status $code")
  }

  override def append(line: String): Unit = synchronized {
    records += line
    val doc = records.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    val (code, _) = BlobHttp.request("PUT", url, doc, azureHeaders)
    require(code == 201, s"Azure PUT failed with $code")
  }

  override def readAll(): Seq[String] = synchronized(records.toSeq)
}
