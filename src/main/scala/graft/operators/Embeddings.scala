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

  /** A REAL model session: parses an ONNX file with the in-repo
    * executor ([[Onnx]]) and embeds text as hashed-bag-of-tokens
    * features → MLP forward → L2 normalization. The feature hash is the
    * engine's portable md5 bucket (same arithmetic as
    * `Sampling.hashBucket`), and the forward pass accumulates float64
    * left-to-right, so the whole pipeline replays exactly in a SQL
    * oracle from the model's weight literals.
    */
  final class OnnxEmbeddingModel(modelBytes: Array[Byte], features: Int) {
    private val model = Onnx.parse(modelBytes)
    private val md5 = java.security.MessageDigest.getInstance("MD5")

    private def bucket(token: String): Int = {
      val d = md5.digest(token.getBytes("UTF-8"))
      val hex = d.take(3).map(b => f"$b%02x").mkString // first 6 hex chars
      (java.lang.Long.parseLong(hex, 16) % features).toInt
    }

    def featurize(text: String): Array[Double] = {
      val f = new Array[Double](features)
      if (text != null)
        text.split(" ", -1).foreach(t => f(bucket(t)) += 1.0)
      f
    }

    def embed(text: String): Array[Double] = {
      val out = Onnx.run(model,
        Onnx.Tensor(1, features, featurize(text))).data
      var acc = 0.0
      var i = 0
      while (i < out.length) { acc += out(i) * out(i); i += 1 }
      val n = math.sqrt(acc)
      if (n == 0.0) out else out.map(_ / n)
    }
  }

  /** Add `<outCol>: ARRAY<DOUBLE>` computed by an ONNX model file —
    * one parsed session per PARTITION, exactly the reference's
    * in-process-session shape (the sink's FloatVector conversion
    * downcasts to float32 at the boundary; the pipeline keeps f64).
    */
  def fieldToEmbeddingOnnx(df: DataFrame, textCol: String, outCol: String,
                           modelBytes: Array[Byte],
                           features: Int): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType),
      nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val model = new OnnxEmbeddingModel(modelBytes, features) // per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ model.embed(r.getString(idx)).toSeq)
      }
    }(enc)
  }

  /** REMOTE model client (the reference's Ollama/HuggingFace/VoyageAI
    * factory family — REST-backed embedding services): POSTs each
    * record's text to an Ollama-style `/api/embeddings` endpoint and
    * parses the float64 `embedding` array. One client per partition;
    * exercised against `graft.tools.EmbeddingHttpServer` (which runs
    * the in-repo ONNX model server-side, so both T19 paths produce the
    * same embedding and share one oracle).
    */
  final class HttpEmbeddingClient(host: String, port: Int, modelName: String) {
    import graft.serde.Bson
    import graft.serde.Bson.{BArr, BDoc, BStr, BVal}
    private val url = s"http://$host:$port/api/embeddings"

    def embed(text: String): Array[Double] = {
      val req = Bson.renderJson(BDoc(Seq(
        "model" -> BStr(modelName),
        "prompt" -> (BStr(if (text == null) "" else text): BVal))))
      val (code, body) = graft.model.BlobHttp.request("POST", url,
        req.getBytes("UTF-8"), Seq("Content-Type" -> "application/json"))
      require(code == 200, s"embedding service returned $code")
      Bson.parseJson(new String(body, "UTF-8")) match {
        case d: BDoc => d.get("embedding") match {
          case Some(BArr(items)) => items.map {
            case Bson.BDouble(v) => v
            case Bson.BInt32(v) => v.toDouble
            case Bson.BInt64(v) => v.toDouble
            case other => throw new IllegalStateException(s"bad element $other")
          }.toArray
          case other => throw new IllegalStateException(s"no embedding: $other")
        }
        case other => throw new IllegalStateException(s"bad response: $other")
      }
    }
  }

  /** Add `<outCol>: ARRAY<DOUBLE>` computed by the REMOTE service —
    * per-partition HTTP clients, the reference's remote-factory shape.
    */
  def fieldToEmbeddingHttp(df: DataFrame, textCol: String, outCol: String,
                           host: String, port: Int,
                           modelName: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType),
      nullable = true)
    val idx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val client = new HttpEmbeddingClient(host, port, modelName)
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ client.embed(r.getString(idx)).toSeq)
      }
    }(enc)
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
