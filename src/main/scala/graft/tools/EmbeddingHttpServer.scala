package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.serde.Bson
import graft.serde.Bson.{BArr, BDoc, BDouble, BStr, BVal}

/** Remote-embedding-service FIXTURE (loopback HTTP) for the T19 model
  * FACTORY family (reference `debezium-ai/debezium-ai-embeddings-ollama/
  * .../OllamaModelFactory.java`, `-hugging-face`, `-voyage-ai` — all
  * REST-backed models reached through langchain4j; the hosted services
  * are env-blocked, so the REST shape is implemented directly). Speaks
  * the Ollama embeddings API: `POST /api/embeddings` with
  * `{"model": name, "prompt": text}` answered by
  * `{"embedding": [float64...]}`.
  *
  * The server OWNS the model: it runs the in-repo ONNX executor over
  * the model bytes it was started with, so a client round-tripping a
  * document through this service gets the exact same embedding the
  * in-process session computes — and the same oracle pins both paths.
  */
object EmbeddingHttpServer {

  final class State {
    val requests = new AtomicInteger(0)
    @volatile var modelNamesSeen: Set[String] = Set.empty
  }

  def serve(modelBytes: Array[Byte], features: Int): (Int, State, HttpServer) = {
    val state = new State
    val model = new graft.operators.Embeddings.OnnxEmbeddingModel(
      modelBytes, features)
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 16)
    server.createContext("/api/embeddings",
      (ex: HttpExchange) => handle(ex, state, model))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "embed-fixture"); t.setDaemon(true); t
    })
    val starter = new Thread(() => server.start(), "embed-fixture-start")
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

  private def handle(ex: HttpExchange, state: State,
                     model: graft.operators.Embeddings.OnnxEmbeddingModel): Unit = {
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, BDoc(Seq("error" -> BStr("POST required"))))
      return
    }
    state.requests.incrementAndGet()
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    Bson.parseJson(body) match {
      case d: BDoc =>
        (d.get("model"), d.get("prompt")) match {
          case (Some(BStr(name)), Some(BStr(prompt))) =>
            state.modelNamesSeen += name
            // embedding model is single-threaded (shared MessageDigest)
            val emb = model.synchronized(model.embed(prompt))
            respond(ex, 200, BDoc(Seq(
              "embedding" -> (BArr(emb.toSeq.map(x =>
                BDouble(x): BVal)): BVal))))
          case _ =>
            respond(ex, 400, BDoc(Seq(
              "error" -> BStr("model and prompt required"))))
        }
      case _ =>
        respond(ex, 400, BDoc(Seq("error" -> BStr("not a JSON object"))))
    }
  }
}
