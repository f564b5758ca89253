package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.serde.Bson
import graft.serde.Bson.{BArr, BDoc, BStr, BVal}

/** Docling-serve-style FIXTURE SERVICE (loopback HTTP) for the T20
  * enrichment (reference `debezium-ai/debezium-ai-docling/.../
  * FieldToDocling.java` POSTs each record's payload to a Docling
  * conversion service and stores the converted document back on the
  * record). The real service's models are env-blocked; the REST shape
  * is implemented directly — `POST /v1alpha/convert/source` with a JSON
  * `{options, sources:[{kind, text, id}]}` request — and the CONVERSION
  * itself runs server-side (deterministic markdown rendering), so the
  * engine-side client genuinely round-trips every record through a
  * socket and parses the `{document:{md_content}, status}` response.
  */
object DoclingHttpServer {

  final class State {
    val requests = new AtomicInteger(0)
    @volatile var badRequests = 0
  }

  def serve(): (Int, State, HttpServer) = {
    val state = new State
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 16)
    server.createContext("/v1alpha/convert/source",
      (ex: HttpExchange) => handle(ex, state))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "docling-fixture"); t.setDaemon(true); t
    })
    // start from a daemon thread: the JDK dispatcher inherits daemon
    // status, so a fixture left running can never pin the JVM open
    val starter = new Thread(() => server.start(), "docling-fixture-start")
    starter.setDaemon(true); starter.start(); starter.join()
    (server.getAddress.getPort, state, server)
  }

  private def respond(ex: HttpExchange, code: Int, doc: BDoc): Unit = {
    val body = Bson.renderJson(doc).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, body.length.toLong)
    ex.getResponseBody.write(body)
    ex.close()
  }

  /** The service-owned conversion: plain text → markdown document. */
  def convert(id: String, text: String): String =
    s"# doc $id\n\n" + (if (text == null) "" else text)

  private def handle(ex: HttpExchange, state: State): Unit = {
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, BDoc(Seq("status" -> BStr("failure"),
        "error" -> BStr("POST required"))))
      return
    }
    state.requests.incrementAndGet()
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    Bson.parseJson(body) match {
      case d: BDoc =>
        d.get("sources") match {
          case Some(BArr(Seq(src: BDoc))) =>
            (src.get("kind"), src.get("id"), src.get("text")) match {
              case (Some(BStr("text")), Some(BStr(id)), Some(BStr(text))) =>
                respond(ex, 200, BDoc(Seq(
                  "status" -> BStr("success"),
                  "document" -> (BDoc(Seq(
                    "md_content" -> (BStr(convert(id, text)): BVal))): BVal))))
              case _ =>
                state.badRequests += 1
                respond(ex, 422, BDoc(Seq("status" -> BStr("failure"),
                  "error" -> BStr("source needs kind=text, id, text"))))
            }
          case _ =>
            state.badRequests += 1
            respond(ex, 422, BDoc(Seq("status" -> BStr("failure"),
              "error" -> BStr("exactly one source required"))))
        }
      case _ =>
        state.badRequests += 1
        respond(ex, 400, BDoc(Seq("status" -> BStr("failure"),
          "error" -> BStr("not a JSON object"))))
    }
  }
}
