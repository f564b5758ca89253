package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Object-store FIXTURE SERVER (loopback HTTP) speaking the two public
  * blob REST dialects the reference's cloud storage backends use
  * (`debezium-storage-s3/src/main/java/io/debezium/storage/s3/history/
  * S3SchemaHistory.java` via the AWS SDK, `debezium-storage-azure-blob/
  * .../AzureBlobSchemaHistory.java` via the Azure SDK — both SDKs are
  * env-blocked, so the REST layer each SDK emits is implemented
  * directly):
  *
  *  - S3 path-style: `PUT/GET/DELETE /{bucket}/{key}`, `GET /{bucket}
  *    ?list-type=2&prefix=` returning ListObjectsV2 XML; missing keys
  *    are 404 with a `NoSuchKey` XML error body.
  *  - Azure Blob: `PUT /{container}/{blob}` REQUIRES the
  *    `x-ms-blob-type: BlockBlob` header (411/400 otherwise, like the
  *    real service) and answers 201 Created; GET returns the blob with
  *    `x-ms-blob-type` echoed.
  *
  * Objects live in memory; the bytes on the wire are the real REST
  * protocols.
  */
object BlobHttpServer {

  final class State {
    private[BlobHttpServer] val objects = TrieMap.empty[String, Array[Byte]]
    val puts = new AtomicInteger(0)
    val gets = new AtomicInteger(0)
    @volatile var azureBlobTypeSeen = false

    def keys: Seq[String] = objects.keySet.toSeq.sorted
    def get(path: String): Option[Array[Byte]] = objects.get(path)
  }

  def serve(): (Int, State, HttpServer) = {
    val state = new State
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 16)
    server.createContext("/", (ex: HttpExchange) => handle(ex, state))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "blob-fixture"); t.setDaemon(true); t
    })
    // start from a daemon thread: the JDK dispatcher inherits daemon
    // status, so a fixture left running can never pin the JVM open
    val starter = new Thread(() => server.start(), "blob-fixture-start")
    starter.setDaemon(true); starter.start(); starter.join()
    (server.getAddress.getPort, state, server)
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
                      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def xml(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def handle(ex: HttpExchange, state: State): Unit = {
    val path = ex.getRequestURI.getPath // /bucket/key... or /container/blob
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val isAzure = ex.getRequestHeaders.containsKey("x-ms-version") ||
      ex.getRequestHeaders.containsKey("X-Ms-Blob-Type")
    ex.getRequestMethod match {
      case "PUT" =>
        if (isAzure) {
          val blobType = ex.getRequestHeaders.getFirst("X-Ms-Blob-Type")
          if (blobType != "BlockBlob") {
            respond(ex, 400,
              xml("<Error><Code>MissingRequiredHeader</Code></Error>"))
            return
          }
          state.azureBlobTypeSeen = true
        }
        val body = ex.getRequestBody.readAllBytes()
        state.objects.put(path, body)
        state.puts.incrementAndGet()
        if (isAzure)
          respond(ex, 201, Array.emptyByteArray, "ETag" -> "\"graft\"")
        else
          respond(ex, 200, Array.emptyByteArray, "ETag" -> "\"graft\"")
      case "GET" =>
        if (query.contains("list-type=2")) {
          // S3 ListObjectsV2 over the bucket in `path`
          val prefix = query.split("&").collectFirst {
            case q if q.startsWith("prefix=") =>
              java.net.URLDecoder.decode(q.drop(7), "UTF-8")
          }.getOrElse("")
          val bucket = path.stripSuffix("/")
          val matches = state.keys
            .filter(k => k.startsWith(s"$bucket/") &&
              k.stripPrefix(s"$bucket/").startsWith(prefix))
            .map(_.stripPrefix(s"$bucket/"))
          val listing =
            s"""<?xml version="1.0" encoding="UTF-8"?>
               |<ListBucketResult><Name>${bucket.stripPrefix("/")}</Name>
               |<KeyCount>${matches.size}</KeyCount><IsTruncated>false</IsTruncated>
               |${matches.map(k => s"<Contents><Key>$k</Key></Contents>").mkString}
               |</ListBucketResult>""".stripMargin
          respond(ex, 200, xml(listing), "Content-Type" -> "application/xml")
        } else state.objects.get(path) match {
          case Some(body) =>
            state.gets.incrementAndGet()
            val hdrs =
              if (isAzure) Seq("x-ms-blob-type" -> "BlockBlob")
              else Seq("Content-Type" -> "application/octet-stream")
            respond(ex, 200, body, hdrs: _*)
          case None =>
            if (isAzure)
              respond(ex, 404, xml("<Error><Code>BlobNotFound</Code></Error>"))
            else
              respond(ex, 404, xml(
                s"<Error><Code>NoSuchKey</Code><Key>$path</Key></Error>"))
        }
      case "DELETE" =>
        state.objects.remove(path)
        respond(ex, if (isAzure) 202 else 204, Array.emptyByteArray)
      case "HEAD" =>
        if (state.objects.contains(path))
          respond(ex, 200, Array.emptyByteArray)
        else respond(ex, 404, Array.emptyByteArray)
      case other =>
        respond(ex, 405, xml(s"<Error><Code>MethodNotAllowed</Code><M>$other</M></Error>"))
    }
  }
}
