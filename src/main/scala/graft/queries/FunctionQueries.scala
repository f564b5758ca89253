package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CloudEvents, Geo, Names, Vectors}
import graft.operators.{Embeddings, Materialize, MultiModal, SchemaEvolution, Signals}
import graft.sources.ChangeFeedGen

/** Type-system kernels, converters and multimodal plumbing (SURVEY §1.3,
  * §2.7-2.9, T17-T19, K4, P6).
  */
object FunctionQueries extends QueryGroup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T17/§1.3 geometry: WKB encode→decode roundtrip recovers coordinates
    "f_geo_roundtrip" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("value"))
      val pts = e.select(col("event_id"),
        Geo.point(col("value"), col("value") * 2, lit(4326)).as("geom"))
      pts.select(col("event_id"),
        Geo.pointX(col("geom")).as("x"), Geo.pointY(col("geom")).as("y"))
    }),

    // T17 axis-order swap
    "f_geo_swap" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("value"))
      val pts = e.select(col("event_id"),
        Geo.point(col("value"), col("value") * 2, lit(4326)).as("geom"))
      val sw = pts.select(col("event_id"),
        Geo.swapCoordinates(col("geom")).as("geom"))
      sw.select(col("event_id"),
        Geo.pointX(col("geom")).as("sx"), Geo.pointY(col("geom")).as("sy"))
    }),

    // T17 full WKB traverser: polygon/linestring/multipoint built
    // per-row, then EWKB → big-endian → axis swap → little-endian →
    // plain WKB; the decoded coordinates must equal the swapped inputs
    // and the byte-level conversions must be exact inverses
    // (roundtrip_ok). Oracle is pure arithmetic — the geometry
    // machinery cancels out exactly when every byte transform is right.
    "f_geo_traverse" -> ((s, dir) => {
      val pipeline = udf { (v: Double) =>
        def run(wkb: Array[Byte]): (Array[Byte], Int) = {
          val le = graft.functions.Wkb.toLittleEndian(
            graft.functions.Wkb.swapAxes(graft.functions.Wkb.toBigEndian(
              graft.functions.Wkb.toEwkb(wkb, 4326))))
          val (plain, srid) = graft.functions.Wkb.toWkb(le)
          (plain, srid.getOrElse(-1))
        }
        val poly = graft.functions.Wkb.makePolygon(Seq(Seq(
          (v, v * 2), (v + 1, v * 2), (v + 1, v * 2 + 1),
          (v, v * 2 + 1), (v, v * 2))))
        val ls = graft.functions.Wkb.makeLineString(
          Seq((v, v * 2), (v + 4, v * 2 + 4), (v + 8, v * 2 + 8)))
        val mp = graft.functions.Wkb.makeMultiPoint(
          Seq((v, v * 2), (v - 1, v * 2 - 1)))
        val (p2, srid) = run(poly)
        val (l2, _) = run(ls)
        val (m2, _) = run(mp)
        val po = graft.functions.Wkb.ordinates(p2)
        val lo = graft.functions.Wkb.ordinates(l2)
        val mo = graft.functions.Wkb.ordinates(m2)
        val ok =
          java.util.Arrays.equals(graft.functions.Wkb.toLittleEndian(
            graft.functions.Wkb.toBigEndian(poly)), poly) &&
            java.util.Arrays.equals(graft.functions.Wkb.swapAxes(
              graft.functions.Wkb.swapAxes(ls)), ls)
        (graft.functions.Wkb.geometryType(p2), po.size, po.head, po(1),
          graft.functions.Wkb.geometryType(l2), lo.size, lo.head,
          graft.functions.Wkb.geometryType(m2), mo.size, mo(2), srid, ok)
      }
      t(s, dir, "events").select(col("event_id"),
        pipeline(col("value")).as("r"))
        .select(col("event_id"),
          col("r._1").as("poly_type"), col("r._2").as("poly_ords"),
          col("r._3").as("poly_x0"), col("r._4").as("poly_y0"),
          col("r._5").as("ls_type"), col("r._6").as("ls_ords"),
          col("r._7").as("ls_x0"),
          col("r._8").as("mp_type"), col("r._9").as("mp_ords"),
          col("r._10").as("mp_x1"),
          col("r._11").as("srid"), col("r._12").cast("int").as("roundtrip_ok"))
    }),

    // §1.3 vectors: pg-text render→parse roundtrip is the identity.
    // Projected to scalars (dims + checksum) — raw list columns are not
    // hashable by the driver's comparator.
    "f_vector_roundtrip" -> ((s, dir) => {
      val rt = Vectors.parseFloatVector(Vectors.toText(col("embedding")))
      t(s, dir, "embeddings").select(col("vec_id"),
        size(rt).as("dims"),
        // floor-quantize, not round(): cross-engine convention (NOTES)
        (floor(aggregate(rt, lit(0.0), (acc, x) => acc + x.cast("double")) * 10000)
          / 10000.0).as("checksum"))
    }),

    // Z-order (Morton) clustering key (functions/ZOrder.scala): bits of
    // two bucketed dims interleaved — the multi-dim layout key behind
    // lakehouse OPTIMIZE ZORDER; map-only projection, integer-exact.
    "f_zorder_curve" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        graft.functions.ZOrder.zValue(
          pmod(col("o_custkey"), lit(1024)),
          pmod(col("o_orderkey"), lit(1024)), bits = 10).as("z"))),

    // sparse vector projection: dims, nnz, value checksum
    "f_vector_sparse" -> ((s, dir) => {
      val sp = t(s, dir, "embeddings").select(col("vec_id"),
        Vectors.toSparse(col("embedding"), 0.3).as("sv"))
      sp.select(col("vec_id"),
        col("sv.dimensions").as("dims"),
        size(map_values(col("sv.vector"))).as("nnz"),
        (floor(aggregate(map_values(col("sv.vector")), lit(0.0), _ + _) * 10000)
          / 10000.0).as("checksum"))
    }),

    // §2.8 CloudEvents converter attributes
    "f_cloudevents" -> ((s, dir) =>
      CloudEvents.attributes(feed(s, dir, "orders"))
        .select(col("ce_id"), col("ce_source"), col("ce_specversion"),
          col("ce_type"), col("ce_time_ms"))),

    // §2.7 SchemaNameAdjuster
    "f_name_adjust" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_type")).distinct()
        .select(col("p_type"), Names.avroSafe(col("p_type")).as("avro_safe"))),

    // K4/§2.9: schema evolution — v2 adds a column; union + materialize
    "k4_schema_evolution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.filter(col("c_custkey") % 2 === 1)
      val v2 = c.filter(col("c_custkey") % 2 === 0)
        .withColumn("c_tier", concat(lit("T"), col("c_custkey") % 3))
      def env(df: DataFrame) = ChangeFeedGen.feed(df, "customer",
        df("c_custkey").cast("long"), Map.empty).filter(col("op") === "r")
      val merged = SchemaEvolution.unionEvolved(Seq(env(v1), env(v2)))
      Materialize.latestState(merged)
    }),

    // P6 signal actions (signals derived from the events control stream)
    "p6_signal_actions" -> ((s, dir) => {
      val sig = t(s, dir, "events").select(
        col("event_id").cast("string").as("id"),
        when(col("event_type") === "signup", lit("execute-snapshot"))
          .when(col("event_type") === "error", lit("stop-snapshot"))
          .when(col("event_type") === "view", lit("log"))
          .otherwise(lit("bogus-type")).as("type"),
        concat(lit("{\"data-collections\":[\"orders\"],\"type\":\"incremental\",\"k\":"),
          get_json_object(col("props"), "$.k"), lit("}")).as("data"))
      Signals.parse(sig)
    }),

    // multimodal: binary columns + stubbed decode via per-partition session
    "m_multimodal_meta" -> ((s, dir) => {
      val bin = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      MultiModal.decodeMeta(bin, "blob")
        .select(col("doc_id"), col("byte_len"), col("format"),
          col("width"), col("height"))
    }),

    // multimodal frame sampling (explode-shaped)
    "m_frame_sample" -> ((s, dir) => {
      val bin = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      MultiModal.sampleFrames(bin, "blob", "doc_id", 64)
    }),

    // T19 field→embedding (stub model, real partition-session plumbing):
    // embeddings are L2-normalized, so the self-cosine is 1 and norms are 1
    "a_field_to_embedding" -> ((s, dir) => {
      val emb = Embeddings.fieldToEmbedding(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "emb", dims = 64)
      emb.select(col("doc_id"), size(col("emb")).as("dim"),
        round(graft.analytics.Similarity.norm(col("emb")), 4).as("norm"))
    }),

    // T19 with a REAL model file: a deterministic .onnx MLP generated
    // in-repo, parsed and executed by the engine's ONNX subset
    // (MatMul/Add/Relu), one session per partition; every embedding dim
    // is pinned by the oracle's replay of the same weights
    // T19 remote-factory path: same documents POSTed to an Ollama-style
    // REST embedding service that runs the SAME ONNX model server-side
    // — both T19 paths share the weight-replay oracle
    "a_embedding_http" -> ((s, dir) => {
      val m = graft.tools.OnnxModelGen.mlp(features = 32, hidden = 16,
        dims = 8, seed = 7)
      val (port, state, server) =
        graft.tools.EmbeddingHttpServer.serve(m.bytes, features = 32)
      val df = Embeddings.fieldToEmbeddingHttp(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "emb", "127.0.0.1", port, modelName = "graft-mlp")
      val q = transform(col("emb"), x => floor(x * lit(1e6)).cast("long"))
      val out = df.select(col("doc_id"),
        size(col("emb")).cast("long").as("dims"),
        aggregate(q, lit(0L), (a, b) => a + b).as("sum_q6"),
        md5(concat_ws(",", transform(q, _.cast("string")))).as("emb_hash"))
      out.cache().count() // materialize before asserting on the service
      require(state.requests.get > 0 &&
        state.modelNamesSeen == Set("graft-mlp"),
        s"service saw ${state.requests.get} requests for ${state.modelNamesSeen}")
      server.stop(0)
      out
    }),

    "a_onnx_embedding" -> ((s, dir) => {
      val m = graft.tools.OnnxModelGen.mlp(features = 32, hidden = 16,
        dims = 8, seed = 7)
      val df = Embeddings.fieldToEmbeddingOnnx(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "emb", m.bytes, features = 32)
      val q = transform(col("emb"), x => floor(x * lit(1e6)).cast("long"))
      df.select(col("doc_id"), size(col("emb")).cast("long").as("dims"),
        aggregate(q, lit(0L), (a, b) => a + b).as("sum_q6"),
        md5(concat_ws(",", transform(q, _.cast("string")))).as("emb_hash"))
    })
  )

  def oracles: Map[String, String] = Map(
    "f_geo_roundtrip" ->
      "SELECT event_id, value AS x, value*2 AS y FROM events",

    "f_geo_swap" ->
      "SELECT event_id, value*2 AS sx, value AS sy FROM events",

    // the EWKB/endianness/swap pipeline cancels to pure arithmetic when
    // every byte transform is exact — see the query comment
    "f_geo_traverse" ->
      """SELECT event_id,
        | 3 AS poly_type, 10 AS poly_ords,
        | value*2 AS poly_x0, value AS poly_y0,
        | 2 AS ls_type, 6 AS ls_ords, value*2 AS ls_x0,
        | 4 AS mp_type, 4 AS mp_ords, value*2-1 AS mp_x1,
        | 4326 AS srid, 1 AS roundtrip_ok
        |FROM events""".stripMargin,

    "f_vector_roundtrip" ->
      """SELECT vec_id, len(embedding) AS dims,
        | floor(list_sum(embedding::DOUBLE[]) * 10000) / 10000.0 AS checksum
        |FROM embeddings""".stripMargin,

    "f_zorder_curve" ->
      """SELECT o_orderkey,
        | CAST(list_sum([
        |   ((((o_custkey % 1024) >> i) & 1) << (2*i)) +
        |   ((((o_orderkey % 1024) >> i) & 1) << (2*i+1))
        |  for i in range(0, 10)]) AS BIGINT) AS z
        |FROM orders""".stripMargin,

    "f_vector_sparse" ->
      """SELECT vec_id, len(embedding) AS dims,
        | len(list_filter(embedding::DOUBLE[], x -> abs(x) > 0.3)) AS nnz,
        | floor(coalesce(list_sum(list_filter(embedding::DOUBLE[], x -> abs(x) > 0.3)), 0.0) * 10000) / 10000.0 AS checksum
        |FROM embeddings""".stripMargin,

    "f_cloudevents" ->
      """SELECT concat('orders-', o_orderkey*10) AS ce_id, '/graft/testdb/orders' AS ce_source,
        | '1.0' AS ce_specversion, 'io.graft.orders.r' AS ce_type,
        | 1700000000000 + o_orderkey*10 AS ce_time_ms FROM orders
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+1), '/graft/testdb/orders', '1.0',
        | 'io.graft.orders.u', 1700000000000 + o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
        |UNION ALL
        |SELECT concat('orders-', o_orderkey*10+2), '/graft/testdb/orders', '1.0',
        | 'io.graft.orders.d', 1700000000000 + o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6""".stripMargin,

    "f_name_adjust" ->
      """SELECT DISTINCT p_type,
        | regexp_replace(p_type, '[^A-Za-z0-9_]', '_', 'g') AS avro_safe
        |FROM part""".stripMargin,

    "k4_schema_evolution" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        | CASE WHEN c_custkey%2=0 THEN concat('T', c_custkey%3) ELSE NULL END AS c_tier
        |FROM customer""".stripMargin,

    "p6_signal_actions" ->
      """SELECT CAST(event_id AS VARCHAR) AS signal_id,
        | CASE WHEN event_type='signup' THEN 'execute-snapshot'
        |      WHEN event_type='error' THEN 'stop-snapshot'
        |      WHEN event_type='view' THEN 'log'
        |      ELSE 'ignore' END AS action,
        | 'orders' AS collection, 'incremental' AS snapshot_type
        |FROM events""".stripMargin,

    "m_multimodal_meta" ->
      """SELECT doc_id, length(text) AS byte_len,
        | CASE WHEN length(text)%3=0 THEN 'png'
        |      WHEN length(text)%3=1 THEN 'jpeg' ELSE 'webp' END AS format,
        | 16 + length(text)%640 AS width,
        | 16 + (length(text)*7)%480 AS height
        |FROM documents""".stripMargin,

    "m_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_no, CAST(f*64 AS INT) AS frame_off
        |FROM (SELECT doc_id,
        |  unnest(range(0, greatest(CAST(floor(length(text)/64.0) AS BIGINT), 1))) AS f
        | FROM documents) x""".stripMargin,

    "a_field_to_embedding" ->
      "SELECT doc_id, 64 AS dim, CAST(1.0 AS DOUBLE) AS norm FROM documents",

    "a_onnx_embedding" -> onnxEmbeddingOracle,

    // the remote path computes the same model server-side
    "a_embedding_http" -> onnxEmbeddingOracle
  )

  /** Replay the generated MLP from its weight literals: hashed-count
    * features (portable md5 bucket), unrolled left-associated matmul
    * sums in the executor's exact accumulation order, Relu, L2
    * normalization, then per-dim q6 floor-quantization. float64
    * arithmetic over float32-quantized weights — bit-identical across
    * engines because every operation and its ORDER match.
    */
  private def onnxEmbeddingOracle: String = {
    val m = graft.tools.OnnxModelGen.mlp(features = 32, hidden = 16,
      dims = 8, seed = 7)
    val (f, h, d) = (32, 16, 8)
    def dot(terms: Seq[String]): String = terms.reduce((a, b) => s"($a + $b)")
    val featCols = (0 until f).map(b =>
      s"sum(CASE WHEN bucket=$b THEN 1 ELSE 0 END)::DOUBLE AS f$b")
      .mkString(", ")
    val hidCols = (0 until h).map { j =>
      val s = dot((0 until f).map(k => s"f$k*${m.w1(k)(j)}"))
      s"greatest(0.0, ($s + ${m.b1(j)})) AS h$j"
    }.mkString(", ")
    val outCols = (0 until d).map { k =>
      val s = dot((0 until h).map(j => s"h$j*${m.w2(j)(k)}"))
      s"($s + ${m.b2(k)}) AS o$k"
    }.mkString(", ")
    val nrm = dot((0 until d).map(k => s"o$k*o$k"))
    val embList = (0 until d).map(k => s"o$k/nn").mkString("[", ", ", "]")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
       |  FROM documents),
       | b AS (SELECT doc_id,
       |   CAST(list_sum([(strpos('0123456789abcdef',
       |       substr(md5(tok), i, 1))-1)::BIGINT << (4*(6-i))
       |       for i in range(1, 7)]) % $f AS BIGINT) AS bucket
       |  FROM tok),
       | feat AS (SELECT doc_id, $featCols FROM b GROUP BY doc_id),
       | hid AS (SELECT doc_id, $hidCols FROM feat),
       | outp AS (SELECT doc_id, $outCols FROM hid),
       | nrm AS (SELECT *, sqrt($nrm) AS nn FROM outp),
       | emb AS (SELECT doc_id, $embList AS e FROM nrm)
       |SELECT doc_id, CAST($d AS BIGINT) AS dims,
       | CAST(list_sum(list_transform(e,
       |   x -> CAST(floor(x*1e6) AS BIGINT))) AS BIGINT) AS sum_q6,
       | md5(array_to_string(list_transform(e,
       |   x -> CAST(floor(x*1e6) AS BIGINT)), ',')) AS emb_hash
       |FROM emb""".stripMargin
  }

  override val duckdbOnly: Set[String] = Set(
    "f_vector_roundtrip", "f_vector_sparse", "f_name_adjust",
    "f_zorder_curve",
    "p6_signal_actions", "m_frame_sample", "a_onnx_embedding",
    "a_embedding_http")
}
