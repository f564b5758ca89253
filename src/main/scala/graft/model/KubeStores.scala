package graft.model

import java.nio.charset.StandardCharsets

import graft.serde.Bson
import graft.serde.Bson.{BDoc, BStr, BVal}

/** K7 Kubernetes ConfigMap offset store over the core-v1 REST API
  * (reference `debezium-storage-configmap/src/main/java/io/debezium/
  * storage/configmap/ConfigMapOffsetStore.java`, which keeps the
  * connector's offsets in one ConfigMap's `data` map via the Fabric8
  * client; the client jars are env-blocked so the published REST API is
  * spoken directly against `graft.tools.KubeApiServer`).
  *
  * Semantics: recovery is one GET of the ConfigMap (404 = fresh start);
  * every `set` PUTs the complete object back — a ConfigMap is replaced
  * whole, there is no per-key append — creating it with POST on first
  * write. ConfigMap keys must match `[-._a-zA-Z0-9]+` (validated
  * server-side like the real apiserver), so offset keys outside that
  * alphabet are stored base64url-encoded under a `b64-` prefix, the
  * same normalize-or-encode approach the reference takes for its `.`
  * separators.
  */
final class ConfigMapOffsetBackingStore(endpoint: String, namespace: String,
                                        name: String)
  extends OffsetBackingStore {

  private def url =
    s"$endpoint/api/v1/namespaces/$namespace/configmaps/$name"
  private def createUrl =
    s"$endpoint/api/v1/namespaces/$namespace/configmaps"

  private val KeyOk = "[-._a-zA-Z0-9]+".r
  private def encodeKey(k: String): String =
    if (KeyOk.matches(k) && !k.startsWith("b64-")) k
    else "b64-" + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(k.getBytes(StandardCharsets.UTF_8))
  private def decodeKey(k: String): String =
    if (!k.startsWith("b64-")) k
    else new String(java.util.Base64.getUrlDecoder.decode(k.drop(4)),
      StandardCharsets.UTF_8)

  private val m = scala.collection.concurrent.TrieMap.empty[String, String]
  private var exists = false
  locally {
    val (code, body) = BlobHttp.request("GET", url, null, Nil)
    if (code == 200) {
      exists = true
      Bson.parseJson(new String(body, StandardCharsets.UTF_8)) match {
        case d: BDoc => d.get("data") match {
          case Some(data: BDoc) => data.fields.foreach {
            case (k, BStr(v)) => m.put(decodeKey(k), v)
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
    } else require(code == 404, s"unexpected GET status $code")
  }

  private def manifest: String = Bson.renderJson(BDoc(Seq(
    "kind" -> BStr("ConfigMap"), "apiVersion" -> BStr("v1"),
    "metadata" -> BDoc(Seq("name" -> BStr(name),
      "namespace" -> BStr(namespace))),
    "data" -> BDoc(m.toSeq.sortBy(_._1).map { case (k, v) =>
      encodeKey(k) -> (BStr(v): BVal) }))))

  private def push(): Unit = {
    val body = manifest.getBytes(StandardCharsets.UTF_8)
    if (!exists) {
      val (code, _) = BlobHttp.request("POST", createUrl, body,
        Seq("Content-Type" -> "application/json"))
      require(code == 201, s"ConfigMap create failed with $code")
      exists = true
    } else {
      val (code, _) = BlobHttp.request("PUT", url, body,
        Seq("Content-Type" -> "application/json"))
      require(code == 200, s"ConfigMap replace failed with $code")
    }
  }

  override def get(key: String): Option[String] = m.get(key)

  override def set(key: String, value: String): Unit = synchronized {
    m.put(key, value)
    push()
  }

  def remove(key: String): Unit = synchronized {
    m.remove(key)
    push()
  }

  override def snapshot: Map[String, String] = m.toMap
}
