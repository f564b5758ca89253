package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.serde.Bson
import graft.serde.Bson.{BDoc, BStr, BVal}

/** Kubernetes apiserver FIXTURE for the ConfigMap storage backend
  * (loopback only — the reference reaches the API through the Fabric8
  * client: `debezium-storage-configmap/src/main/java/io/debezium/
  * storage/configmap/ConfigMapOffsetStore.java`; the client jars are
  * env-blocked, so the published core-v1 REST API is spoken directly).
  * Implements the ConfigMap subset that store touches:
  *
  *  - `GET  /api/v1/namespaces/{ns}/configmaps/{name}` → the object, or
  *    a 404 `Status` document with `reason: NotFound`;
  *  - `POST /api/v1/namespaces/{ns}/configmaps` → create (409
  *    `AlreadyExists` on conflict);
  *  - `PUT  /api/v1/namespaces/{ns}/configmaps/{name}` → replace.
  *
  * The server genuinely validates the manifests (kind/apiVersion, name
  * match between path and metadata, ConfigMap key alphabet
  * `[-._a-zA-Z0-9]+`) and owns `metadata.resourceVersion`, bumping it
  * per write like a real apiserver — a client echoing a stale object
  * can detect lost updates the same way it would in production.
  */
object KubeApiServer {

  final class State {
    private[KubeApiServer] val objects =
      TrieMap.empty[(String, String), Map[String, String]]
    private[KubeApiServer] val versions = new AtomicLong(0L)
    val gets = new AtomicInteger(0)
    val writes = new AtomicInteger(0)
    @volatile var rejectedKeys = 0

    def data(ns: String, name: String): Map[String, String] =
      objects.getOrElse((ns, name), Map.empty)
  }

  private val Path = "/api/v1/namespaces/([^/]+)/configmaps(?:/([^/]+))?".r

  def serve(): (Int, State, HttpServer) = {
    val state = new State
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 16)
    server.createContext("/", (ex: HttpExchange) => handle(ex, state))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "kube-fixture"); t.setDaemon(true); t
    })
    // start from a daemon thread: the JDK dispatcher inherits daemon
    // status, so a fixture left running can never pin the JVM open
    val starter = new Thread(() => server.start(), "kube-fixture-start")
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

  private def status(code: Int, reason: String, msg: String): BDoc =
    BDoc(Seq("kind" -> BStr("Status"), "apiVersion" -> BStr("v1"),
      "status" -> BStr(if (code < 400) "Success" else "Failure"),
      "reason" -> BStr(reason), "message" -> BStr(msg),
      "code" -> Bson.BInt32(code)))

  private def render(ns: String, name: String, data: Map[String, String],
                     version: Long): BDoc =
    BDoc(Seq(
      "kind" -> BStr("ConfigMap"), "apiVersion" -> BStr("v1"),
      "metadata" -> BDoc(Seq(
        "name" -> BStr(name), "namespace" -> BStr(ns),
        "resourceVersion" -> BStr(version.toString))),
      "data" -> BDoc(data.toSeq.sortBy(_._1).map { case (k, v) =>
        k -> (BStr(v): BVal) })))

  private val KeyOk = "[-._a-zA-Z0-9]+".r

  /** Parse + validate a ConfigMap manifest; Left = error status. */
  private def parseManifest(body: String, ns: String,
                            pathName: Option[String],
                            state: State): Either[BDoc, (String, Map[String, String])] = {
    val doc = Bson.parseJson(body) match {
      case d: BDoc => d
      case _ => return Left(status(400, "BadRequest", "not a JSON object"))
    }
    if (!doc.get("kind").contains(BStr("ConfigMap")))
      return Left(status(400, "BadRequest", "kind must be ConfigMap"))
    if (!doc.get("apiVersion").contains(BStr("v1")))
      return Left(status(400, "BadRequest", "apiVersion must be v1"))
    val name = doc.get("metadata") match {
      case Some(m: BDoc) => m.get("name") match {
        case Some(BStr(n)) => n
        case _ => return Left(status(422, "Invalid", "metadata.name required"))
      }
      case _ => return Left(status(422, "Invalid", "metadata required"))
    }
    if (pathName.exists(_ != name))
      return Left(status(400, "BadRequest",
        s"name in path ${pathName.get} differs from metadata.name $name"))
    val data = doc.get("data") match {
      case Some(d: BDoc) => d.fields.map {
        case (k, BStr(v)) => k -> v
        case (k, other) =>
          return Left(status(422, "Invalid", s"data.$k not a string: $other"))
      }
      case None => Seq.empty
      case other => return Left(status(422, "Invalid", s"bad data: $other"))
    }
    data.find(kv => !KeyOk.matches(kv._1)).foreach { kv =>
      state.rejectedKeys += 1
      return Left(status(422, "Invalid",
        s"data key '${kv._1}' must match [-._a-zA-Z0-9]+"))
    }
    Right((name, data.toMap))
  }

  private def handle(ex: HttpExchange, state: State): Unit = {
    (ex.getRequestMethod, ex.getRequestURI.getPath) match {
      case ("GET", Path(ns, name)) if name != null =>
        state.gets.incrementAndGet()
        state.objects.get((ns, name)) match {
          case Some(data) =>
            respond(ex, 200, render(ns, name, data, state.versions.get))
          case None =>
            respond(ex, 404, status(404, "NotFound",
              s"""configmaps "$name" not found"""))
        }
      case ("POST", Path(ns, null)) =>
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        parseManifest(body, ns, None, state) match {
          case Left(err) =>
            respond(ex, err.get("code").collect {
              case Bson.BInt32(c) => c }.getOrElse(400), err)
          case Right((name, data)) =>
            if (state.objects.putIfAbsent((ns, name), data).isDefined)
              respond(ex, 409, status(409, "AlreadyExists",
                s"""configmaps "$name" already exists"""))
            else {
              state.writes.incrementAndGet()
              respond(ex, 201,
                render(ns, name, data, state.versions.incrementAndGet()))
            }
        }
      case ("PUT", Path(ns, name)) if name != null =>
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        parseManifest(body, ns, Some(name), state) match {
          case Left(err) =>
            respond(ex, err.get("code").collect {
              case Bson.BInt32(c) => c }.getOrElse(400), err)
          case Right((_, data)) =>
            if (!state.objects.contains((ns, name)))
              respond(ex, 404, status(404, "NotFound",
                s"""configmaps "$name" not found"""))
            else {
              state.objects.put((ns, name), data)
              state.writes.incrementAndGet()
              respond(ex, 200,
                render(ns, name, data, state.versions.incrementAndGet()))
            }
        }
      case (m, p) =>
        respond(ex, 405, status(405, "MethodNotAllowed", s"$m $p"))
    }
  }
}
