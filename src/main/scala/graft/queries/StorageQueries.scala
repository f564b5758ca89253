package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Signals, Transforms}
import graft.streaming.KafkaTopicSink

/** K7 wire-backed storage backends (kafka / redis / s3 / azure-blob) and
  * the K1 topic sink over live loopback sockets (SURVEY §2.2; reference
  * `debezium-storage-kafka`, `debezium-storage-redis`,
  * `debezium-storage-s3`, `debezium-storage-azure-blob`, and the Connect
  * producer behind every topic sink). Each query drives the REAL wire
  * protocol against an in-process fixture server — the engine-side
  * bytes are identical to what a production broker/redis/object store
  * would receive — then verifies recovery/read-back against a DuckDB
  * oracle on the same source tables.
  */
object StorageQueries extends QueryGroup {

  /** The shared post-recovery verification: resume the change feed past
    * the recovered offset (the reference's restart path) and aggregate.
    */
  private def resumeAggregate(s: SparkSession, dir: String,
                              recovered: Long): DataFrame =
    feed(s, dir, "orders").filter(col("source.pos") > recovered)
      .groupBy(col("op")).agg(count(lit(1)).as("n"),
        min(col("source.pos")).as("min_pos"),
        max(col("source.pos")).as("max_pos"))

  private def cutFor(s: SparkSession, dir: String, mult: Long): Long =
    t(s, dir, "orders")
      .agg(max(col("o_orderkey")).cast("long")).head.getLong(0) * mult

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // K7 kafka: offsets in a compacted topic (last-wins + tombstone),
    // history replayed in offset order; restart = full topic read through
    // a FRESH client. The broker CRC32C-verifies every produced batch.
    "k7_kafka_store" -> ((s, dir) => {
      import graft.model.{KafkaHistoryStorage, KafkaOffsetBackingStore}
      val (port, broker, _) = graft.tools.KafkaWireServer.serve()
      val cut = cutFor(s, dir, 9)
      val st = new KafkaOffsetBackingStore("127.0.0.1", port, "graft-offsets")
      st.set("orders", "0")
      st.set("orders", cut.toString) // compacted overwrite
      st.set("lineitem", "41")
      st.set("doomed", "x"); st.remove("doomed") // tombstone
      st.close()
      val st2 = new KafkaOffsetBackingStore("127.0.0.1", port, "graft-offsets")
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"kafka offset restart mismatch: ${st2.snapshot}")
      st2.close()
      val hs = new KafkaHistoryStorage("127.0.0.1", port, "graft-history")
      val lines = (0 until 23).map(i => s"ddl-$i") // > one fetch batch
      lines.foreach(hs.append)
      hs.close()
      val hs2 = new KafkaHistoryStorage("127.0.0.1", port, "graft-history")
      hs2.append("ddl-post-restart")
      val recs = hs2.readAll()
      hs2.close()
      require(recs == lines :+ "ddl-post-restart",
        s"kafka history mismatch: $recs")
      require(broker.apiVersionsSeen, "client skipped version negotiation")
      require(broker.batchesVerified.get >= 28,
        s"broker verified ${broker.batchesVerified.get} batches")
      resumeAggregate(s, dir, recovered)
    }),

    // K7 redis: offsets as one hash (HSET/HGETALL/HDEL), history as a
    // stream (XADD/XRANGE), RESP2 over a real socket with AUTH enforced.
    "k7_redis_store" -> ((s, dir) => {
      import graft.model.{RedisHistoryStorage, RedisOffsetBackingStore}
      val (port, state, _) = graft.tools.RedisWireServer.serve("sekrit")
      val cut = cutFor(s, dir, 4)
      val st = new RedisOffsetBackingStore("127.0.0.1", port, "sekrit",
        "metadata:graft:offsets")
      st.set("orders", "0")
      st.set("orders", cut.toString)
      st.set("lineitem", "41")
      st.set("doomed", "x"); st.remove("doomed")
      st.close()
      val st2 = new RedisOffsetBackingStore("127.0.0.1", port, "sekrit",
        "metadata:graft:offsets")
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"redis offset restart mismatch: ${st2.snapshot}")
      st2.close()
      val hs = new RedisHistoryStorage("127.0.0.1", port, "sekrit",
        "metadata:graft:history")
      hs.append("first"); hs.append("second")
      hs.close()
      val hs2 = new RedisHistoryStorage("127.0.0.1", port, "sekrit",
        "metadata:graft:history")
      hs2.append("third")
      val recs = hs2.readAll()
      hs2.close()
      require(recs == Seq("first", "second", "third"),
        s"redis history mismatch: $recs")
      require(state.authSeen, "AUTH never reached the server")
      require(state.streamLen("metadata:graft:history") == 3,
        "stream length mismatch")
      resumeAggregate(s, dir, recovered)
    }),

    // K7 s3: whole-object rewrite per store (object stores can't append),
    // GET-at-construct recovery, ListObjectsV2 visibility.
    "k7_s3_store" -> ((s, dir) => {
      import graft.model.{S3HistoryStorage, S3OffsetBackingStore}
      val (port, state, server) = graft.tools.BlobHttpServer.serve()
      val endpoint = s"http://127.0.0.1:$port"
      val cut = cutFor(s, dir, 6)
      val st = new S3OffsetBackingStore(endpoint, "graft-bucket", "offsets.dat")
      st.set("orders", "0")
      st.set("orders", cut.toString)
      st.set("lineitem", "41")
      val st2 = new S3OffsetBackingStore(endpoint, "graft-bucket", "offsets.dat")
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"s3 offset restart mismatch: ${st2.snapshot}")
      val hs = new S3HistoryStorage(endpoint, "graft-bucket", "history.jsonl")
      hs.append("first"); hs.append("second")
      val hs2 = new S3HistoryStorage(endpoint, "graft-bucket", "history.jsonl")
      hs2.append("third")
      require(hs2.readAll() == Seq("first", "second", "third"),
        s"s3 history mismatch: ${hs2.readAll()}")
      // the keys are visible via ListObjectsV2
      val (code, listing) = graft.model.BlobHttp.request("GET",
        s"$endpoint/graft-bucket?list-type=2&prefix=", null, Nil)
      require(code == 200 && {
        val l = new String(listing, "UTF-8")
        l.contains("<Key>offsets.dat</Key>") && l.contains("<Key>history.jsonl</Key>")
      }, "ListObjectsV2 missing keys")
      server.stop(0)
      resumeAggregate(s, dir, recovered)
    }),

    // K7 azure-blob: BlockBlob PUT (x-ms-blob-type REQUIRED, 201 reply),
    // download recovery; a PUT without the header is rejected like the
    // real service rejects it.
    "k7_azure_store" -> ((s, dir) => {
      import graft.model.AzureBlobHistoryStorage
      val (port, state, server) = graft.tools.BlobHttpServer.serve()
      val endpoint = s"http://127.0.0.1:$port"
      val cut = cutFor(s, dir, 8)
      val hs = new AzureBlobHistoryStorage(endpoint, "graft-container",
        "debezium-history.jsonl")
      hs.append("first"); hs.append("second")
      val hs2 = new AzureBlobHistoryStorage(endpoint, "graft-container",
        "debezium-history.jsonl")
      hs2.append("third")
      require(hs2.readAll() == Seq("first", "second", "third"),
        s"azure history mismatch: ${hs2.readAll()}")
      require(state.azureBlobTypeSeen, "x-ms-blob-type never sent")
      // headerless PUT is rejected (400), exactly like the service
      val (badCode, _) = graft.model.BlobHttp.request("PUT",
        s"$endpoint/graft-container/bad", "x".getBytes("UTF-8"),
        Seq("x-ms-version" -> "2021-08-06"))
      require(badCode == 400, s"headerless Azure PUT returned $badCode")
      server.stop(0)
      resumeAggregate(s, dir, cut)
    }),

    // K7 rocketmq: schema history on a single-queue topic over the live
    // remoting protocol (JSON RemotingCommand headers, SEND_MESSAGE
    // validated server-side, PULL_MESSAGE re-encoding the CommitLog
    // message layout, pull loop to the max offset).
    "k7_rocketmq_store" -> ((s, dir) => {
      import graft.model.RocketMqHistoryStorage
      val (port, broker, _) = graft.tools.RocketMqWireServer.serve(maxPerPull = 7)
      val hs = new RocketMqHistoryStorage("127.0.0.1", port, "graft-history")
      val lines = (0 until 23).map(i => s"ddl-$i") // > one pull batch
      lines.foreach(hs.append)
      hs.close()
      val hs2 = new RocketMqHistoryStorage("127.0.0.1", port, "graft-history")
      hs2.append("ddl-post-restart")
      val recs = hs2.readAll()
      hs2.close()
      require(recs == lines :+ "ddl-post-restart",
        s"rocketmq history mismatch: $recs")
      require(broker.pulls.get >= 4, // 24 messages / 7 per pull
        s"pull loop too short: ${broker.pulls.get}")
      resumeAggregate(s, dir, cutFor(s, dir, 5))
    }),

    // P1 queue provider with chronicle-style mmap spill: every executor
    // task routes its partition through its OWN hybrid queue (bounded
    // memory deque, oldest evicted to mmap'd cycle files, spill drained
    // first) and asserts strict FIFO across the spill boundary — the
    // same per-process buffering shape the reference deploys; no driver
    // collect anywhere.
    "p1_spill_queue" -> ((s, dir) => {
      import graft.model.HybridQueueProvider
      import s.implicits._
      val fd = feed(s, dir, "orders")
        .select(to_json(struct(col("op"), col("source.pos").as("pos"))))
        .as[String]
      val polled = fd.mapPartitions { it =>
        val q = new HybridQueueProvider(maxMemory = 16, segmentBytes = 1 << 14)
        try {
          val in = it.toVector
          in.foreach(q.enqueue)
          require(in.size <= 16 || q.spillCount > 0,
            "expected the queue to spill")
          val out = Iterator.continually(q.poll())
            .takeWhile(_.isDefined).map(_.get).toVector
          require(out == in, "FIFO violated across the spill boundary")
          out.iterator
        } finally q.close()
      }
      polled.toDF("j").select(
        get_json_object(col("j"), "$.op").as("op"),
        get_json_object(col("j"), "$.pos").cast("long").as("pos"))
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("pos")).as("min_pos"), max(col("pos")).as("max_pos"))
    }),

    // K7 configmap: offsets in one Kubernetes ConfigMap's data map —
    // GET recovery (404 = fresh), POST create, whole-object PUT per
    // save with server-validated manifests and key alphabet.
    "k7_configmap_store" -> ((s, dir) => {
      import graft.model.ConfigMapOffsetBackingStore
      val (port, state, server) = graft.tools.KubeApiServer.serve()
      val endpoint = s"http://127.0.0.1:$port"
      val cut = cutFor(s, dir, 2)
      val st = new ConfigMapOffsetBackingStore(endpoint, "graft", "offsets")
      st.set("orders", "0")
      st.set("orders", cut.toString)
      st.set("lineitem", "41")
      st.set("weird/key:name", "x") // outside the ConfigMap key alphabet
      st.remove("weird/key:name")
      val st2 = new ConfigMapOffsetBackingStore(endpoint, "graft", "offsets")
      val recovered = st2.get("orders").get.toLong
      require(st2.snapshot == Map("orders" -> cut.toString, "lineitem" -> "41"),
        s"configmap restart mismatch: ${st2.snapshot}")
      require(state.writes.get >= 5, s"writes=${state.writes.get}")
      // a round-trip through an encoded key survives too
      val st3 = new ConfigMapOffsetBackingStore(endpoint, "graft", "offsets")
      st3.set("pg:slot/main", "LSN/9A0")
      val st4 = new ConfigMapOffsetBackingStore(endpoint, "graft", "offsets")
      require(st4.get("pg:slot/main").contains("LSN/9A0"),
        "encoded key lost on restart")
      server.stop(0)
      resumeAggregate(s, dir, recovered)
    }),

    // K1 topic sink over the live socket: route the change feed to
    // per-status topics (T7 content router), produce every envelope
    // through per-partition clients, then read every topic back via
    // Fetch and aggregate — counts must match the routed feed exactly.
    "k1_topic_sink_socket" -> ((s, dir) => {
      val (port, broker, _) = graft.tools.KafkaWireServer.serve()
      val routed = Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
        .select(col("topic"), to_json(col("key")).as("key"),
          to_json(struct(col("op"), col("source.pos").as("pos"))).as("value"))
      KafkaTopicSink.write(routed, "127.0.0.1", port).collect() // materialize
      require(broker.batchesVerified.get > 0, "no batches reached the broker")
      KafkaTopicSink.readBack(s, "127.0.0.1", port)
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("key")).as("n_keys"),
          sum(get_json_object(col("value"), "$.pos").cast("long")).as("sum_pos"))
    }),

    // K1-family Redis Streams sink (debezium-server redis sink shape):
    // the routed change feed XADDed one stream per topic as {key, value}
    // pairs via RESP-pipelined batches, AUTH-gated, then read back over
    // XRANGE and aggregated — stream content == routed feed.
    "k_redis_stream_sink" -> ((s, dir) => {
      import graft.streaming.RedisStreamSink
      val (port, state, _) = graft.tools.RedisWireServer.serve("sekrit")
      val routed = Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
        .select(col("topic"), to_json(col("key")).as("key"),
          to_json(struct(col("op"), col("source.pos").as("pos"))).as("value"))
      RedisStreamSink.write(routed, "127.0.0.1", port,
        password = "sekrit").collect() // materialize the produce
      require(state.authSeen, "sink connections must authenticate")
      RedisStreamSink.readBack(s, "127.0.0.1", port, password = "sekrit")
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("key")).as("n_keys"),
          sum(get_json_object(col("value"), "$.pos").cast("long")).as("sum_pos"))
    }),

    // KIP-98 idempotent producer on the K1 sink: per-task producer ids
    // + per-topic base sequences, EVERY batch deliberately sent twice
    // (simulated ack-lost retry) — the broker dedups server-side and
    // the topic content still equals the routed feed exactly.
    "k1_idempotent_producer" -> ((s, dir) => {
      val (port, broker, _) = graft.tools.KafkaWireServer.serve()
      val routed = Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
        .select(col("topic"), to_json(col("key")).as("key"),
          to_json(struct(col("op"), col("source.pos").as("pos"))).as("value"))
      KafkaTopicSink.writeIdempotent(routed, "127.0.0.1", port,
        retryEach = true).collect()
      require(broker.duplicatesDropped.get > 0,
        "no retries reached the broker's dedup path")
      KafkaTopicSink.readBack(s, "127.0.0.1", port)
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("key")).as("n_keys"),
          sum(get_json_object(col("value"), "$.pos").cast("long")).as("sum_pos"))
    }),

    // STREAMING exactly-once into Redis Streams: records XADD with
    // explicit pos-derived ids, so the SERVER fences replays (real
    // redis rejects an id ≤ the stream top) — no sink-side epoch state.
    // After the stream drains, a full deliberate re-delivery must be
    // rejected record-by-record; stream content == the routed feed.
    "stream_redis_sink" -> ((s, dir) => {
      import graft.streaming.RedisStreamSink
      val (port, _, _) = graft.tools.RedisWireServer.serve("sekrit")
      val routed = Transforms.contentRouter(feed(s, dir, "orders"),
        concat(lit("orders."),
          coalesce(col("after.o_orderstatus"), col("before.o_orderstatus"))))
        .select(col("topic"), col("source.pos").as("pos"),
          to_json(col("key")).as("key"),
          to_json(struct(col("op"), col("source.pos").as("pos"))).as("value"))
      val tmp = java.nio.file.Files.createTempDirectory("redis-stream")
      val transport = s"$tmp/transport"
      routed.repartitionByRange(4, col("pos"))
        .write.mode("overwrite").parquet(transport)
      graft.streaming.StreamingMaterialize.stampLogOrder(transport)
      val schema = s.read.parquet(transport).schema
      val q = s.readStream.schema(schema).option("maxFilesPerTrigger", 2)
        .parquet(transport)
        .writeStream.option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          RedisStreamSink.writeIdempotent(batch, "127.0.0.1", port,
            password = "sekrit").collect()
          ()
        }
        .start()
      q.awaitTermination()
      // at-least-once replay of EVERYTHING: the server must reject all
      val replay = RedisStreamSink.writeIdempotent(routed, "127.0.0.1",
          port, password = "sekrit")
        .agg(sum(col("produced")), sum(col("skipped"))).head
      require(replay.getLong(0) == 0, s"replay produced ${replay.getLong(0)}")
      require(replay.getLong(1) > 0, "replay skipped nothing")
      RedisStreamSink.readBack(s, "127.0.0.1", port, password = "sekrit")
        .groupBy(col("topic"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("key")).as("n_keys"),
          sum(get_json_object(col("value"), "$.pos").cast("long")).as("sum_pos"))
    }),

    // S13 kafka signal channel: signals produced to a topic, fetched and
    // parsed into actions (reference KafkaSignalChannel.java).
    // P7 over the SINK channel (reference SinkNotificationChannel:
    // every engine notification becomes a record on
    // `notification.sink.topic.name` — key = the notification id,
    // value = the Notification struct {id, aggregate_type, type,
    // additional_data, timestamp}) — produced to the LIVE kafka wire
    // fixture and fetched back; the reassembled frame must carry the
    // exact notification set the snapshot emitted
    "p7_sink_notifications" -> ((s, dir) => {
      val (port, _, _) = graft.tools.KafkaWireServer.serve()
      val notes = graft.streaming.Notifications.snapshotNotifications(
        graft.operators.IncrementalSnapshot.chunked(
          t(s, dir, "orders").select(col("o_orderkey")),
          Seq(col("o_orderkey")), 1024))
        .select(
          concat(lit("notif-"), col("notification_type"), lit("-"),
            col("chunk")).as("k"),
          to_json(struct(
            concat(lit("notif-"), col("notification_type"), lit("-"),
              col("chunk")).as("id"),
            lit("Incremental Snapshot").as("aggregate_type"),
            col("notification_type").as("type"),
            struct(col("chunk").cast("string").as("chunk"),
              col("row_count").cast("string").as("row_count"))
              .as("additional_data"),
            (lit(1700000000000L) + col("chunk")).as("timestamp"))).as("v"))
      val client = new graft.sources.net.KafkaClient("127.0.0.1", port)
      notes.collect().grouped(500).foreach { chunk =>
        client.produceStrings("graft-notifications", 0,
          chunk.map(r => (r.getString(0), r.getString(1))).toSeq)
      }
      val fetched = client.fetchAll("graft-notifications", 0)
      client.close()
      import s.implicits._
      fetched.map(r => (new String(r.key, "UTF-8"),
        new String(r.value, "UTF-8"))).toDF("id", "json")
        .select(col("id"),
          get_json_object(col("json"), "$.aggregate_type")
            .as("aggregate_type"),
          get_json_object(col("json"), "$.type").as("type"),
          get_json_object(col("json"), "$.additional_data.chunk")
            .cast("long").as("chunk"),
          get_json_object(col("json"), "$.additional_data.row_count")
            .cast("long").as("row_count"),
          get_json_object(col("json"), "$.timestamp").cast("long")
            .as("timestamp"))
    }),

    "s13_kafka_signals" -> ((s, dir) => {
      val (port, _, _) = graft.tools.KafkaWireServer.serve()
      val sig = t(s, dir, "events")
        .filter(col("event_id") % 97 === 0)
        .select(
          col("event_id").cast("string").as("k"),
          to_json(struct(
            when(col("event_type") === "signup", lit("execute-snapshot"))
              .when(col("event_type") === "error", lit("stop-snapshot"))
              .when(col("event_type") === "view", lit("log"))
              .otherwise(lit("bogus-type")).as("type"),
            concat(lit("{\"data-collections\":[\"orders\"],\"type\":\"incremental\"}"))
              .as("data"))).as("v"))
      val client = new graft.sources.net.KafkaClient("127.0.0.1", port)
      sig.collect().grouped(500).foreach { chunk =>
        client.produceStrings("graft-signals", 0,
          chunk.map(r => (r.getString(0), r.getString(1))).toSeq)
      }
      val fetched = client.fetchAll("graft-signals", 0)
      client.close()
      import s.implicits._
      val raw = fetched.map(r => (new String(r.key, "UTF-8"),
        new String(r.value, "UTF-8"))).toDF("id", "json")
      Signals.parse(raw
        .withColumn("type", get_json_object(col("json"), "$.type"))
        .withColumn("data", get_json_object(col("json"), "$.data")))
    }),

    // S13 file signal channel (reference FileSignalChannel.java): JSONL
    // signal files tailed as a STREAM through Signals.fileChannel —
    // lines {id, type, data} arrive per micro-batch, parse to actions.
    "s13_file_signals" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("sigfile")
      val sigDir = tmp.resolve("signals")
      java.nio.file.Files.createDirectories(sigDir)
      val lines = t(s, dir, "events")
        .filter(col("event_id") % 89 === 0)
        .select(col("event_id").cast("long").as("eid"), to_json(struct(
          col("event_id").cast("string").as("id"),
          when(col("event_type") === "signup", lit("execute-snapshot"))
            .when(col("event_type") === "error", lit("stop-snapshot"))
            .when(col("event_type") === "view", lit("log"))
            .otherwise(lit("bogus-type")).as("type"),
          lit("""{"data-collections":["orders"],"type":"incremental"}""")
            .as("data"))).as("l"))
        .orderBy(col("eid"))
        .collect().map(_.getString(1))
      // the channel tails a DIRECTORY: split across two signal files
      val (a, b) = lines.splitAt(lines.length / 2)
      java.nio.file.Files.write(sigDir.resolve("sig-1.jsonl"),
        a.mkString("", "\n", "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(sigDir.resolve("sig-2.jsonl"),
        b.mkString("", "\n", "\n").getBytes("UTF-8"))
      val outDir = tmp.resolve("out").toString
      val q = Signals.fileChannel(s, sigDir.toString)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    }),

    // S13 JMX signal channel (reference JmxSignalChannel.java): signals
    // invoked THROUGH the platform MBean server — the identical code
    // path a remote JMX console drives over the RMI connector — queued
    // on the channel and drained into parsed action rows.
    "s13_jmx_signals" -> ((s, dir) => {
      val chan = new graft.operators.JmxChannels.SignalChannel(
        "graft", s"q${System.nanoTime()}").register()
      try {
        val mbs = java.lang.management.ManagementFactory.getPlatformMBeanServer
        t(s, dir, "events")
          .filter(col("event_id") % 83 === 0)
          .select(col("event_id").cast("long").as("eid"),
            col("event_id").cast("string").as("id"),
            when(col("event_type") === "signup", lit("execute-snapshot"))
              .when(col("event_type") === "error", lit("stop-snapshot"))
              .when(col("event_type") === "view", lit("log"))
              .otherwise(lit("bogus-type")).as("type"))
          .orderBy(col("eid"))
          .collect().foreach { r =>
            mbs.invoke(chan.objectName, "signal",
              Array[AnyRef](r.getString(1), r.getString(2),
                """{"data-collections":["orders"],"type":"incremental"}"""),
              Array("java.lang.String", "java.lang.String", "java.lang.String"))
          }
        chan.read(s)
      } finally chan.close()
    })
  )

  def oracles: Map[String, String] = {
    def resumeOracle(mult: Int): String =
      s"""WITH c AS (SELECT CAST(max(o_orderkey)*$mult AS BIGINT) AS cut FROM orders),
         | ev AS (
         |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
         |  UNION ALL
         |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
         |  UNION ALL
         |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
         |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
         |FROM ev, c WHERE pos > cut GROUP BY op""".stripMargin
    Map(
      "k7_kafka_store" -> resumeOracle(9),
      "k7_redis_store" -> resumeOracle(4),
      "k7_s3_store" -> resumeOracle(6),
      "k7_azure_store" -> resumeOracle(8),
      "k7_configmap_store" -> resumeOracle(2),
      "k7_rocketmq_store" -> resumeOracle(5),
      "p1_spill_queue" ->
        """WITH ev AS (
          |  SELECT 'r' AS op, o_orderkey*10 AS pos FROM orders
          |  UNION ALL
          |  SELECT 'u', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
          |  UNION ALL
          |  SELECT 'd', o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
          |SELECT op, count(*) AS n, min(pos) AS min_pos, max(pos) AS max_pos
          |FROM ev GROUP BY op""".stripMargin,
      "stream_redis_sink" ->
        """WITH ev AS (
          |  SELECT o_orderkey, 'orders.'||o_orderstatus AS topic, o_orderkey*10 AS pos FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.U', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.'||o_orderstatus, o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
          |SELECT topic, count(*) AS n,
          |  count(DISTINCT o_orderkey) AS n_keys,
          |  CAST(sum(pos) AS BIGINT) AS sum_pos
          |FROM ev GROUP BY 1""".stripMargin,
      "k1_idempotent_producer" ->
        """WITH ev AS (
          |  SELECT o_orderkey, 'orders.'||o_orderstatus AS topic, o_orderkey*10 AS pos FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.U', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.'||o_orderstatus, o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
          |SELECT topic, count(*) AS n,
          |  count(DISTINCT o_orderkey) AS n_keys,
          |  CAST(sum(pos) AS BIGINT) AS sum_pos
          |FROM ev GROUP BY 1""".stripMargin,
      "k_redis_stream_sink" ->
        """WITH ev AS (
          |  SELECT o_orderkey, 'orders.'||o_orderstatus AS topic, o_orderkey*10 AS pos FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.U', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.'||o_orderstatus, o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
          |SELECT topic, count(*) AS n,
          |  count(DISTINCT o_orderkey) AS n_keys,
          |  CAST(sum(pos) AS BIGINT) AS sum_pos
          |FROM ev GROUP BY 1""".stripMargin,
      "k1_topic_sink_socket" ->
        """WITH ev AS (
          |  SELECT o_orderkey, 'orders.'||o_orderstatus AS topic, o_orderkey*10 AS pos FROM orders
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.U', o_orderkey*10+1 FROM orders WHERE o_orderkey%7=3
          |  UNION ALL
          |  SELECT o_orderkey, 'orders.'||o_orderstatus, o_orderkey*10+2 FROM orders WHERE o_orderkey%13=6)
          |SELECT topic, count(*) AS n,
          |  count(DISTINCT o_orderkey) AS n_keys,
          |  CAST(sum(pos) AS BIGINT) AS sum_pos
          |FROM ev GROUP BY 1""".stripMargin,
      "s13_kafka_signals" ->
        """SELECT CAST(event_id AS STRING) AS signal_id,
          | CASE WHEN event_type='signup' THEN 'execute-snapshot'
          |      WHEN event_type='error' THEN 'stop-snapshot'
          |      WHEN event_type='view' THEN 'log'
          |      ELSE 'ignore' END AS action,
          | 'orders' AS collection, 'incremental' AS snapshot_type
          |FROM events WHERE event_id % 97 = 0""".stripMargin,

      // the p7_notifications set, wrapped in the sink channel's record
      // shape (id key, aggregate_type, additional_data, timestamp)
      "p7_sink_notifications" ->
        """WITH n AS (
          | SELECT 'snapshot-started' AS type, CAST(-1 AS BIGINT) AS chunk,
          |  CAST(0 AS BIGINT) AS row_count
          | UNION ALL
          | SELECT 'snapshot-in-progress', chunk, count(*) FROM (
          |  SELECT CAST(floor((row_number() OVER (ORDER BY o_orderkey)-1)/1024) AS BIGINT) AS chunk
          |  FROM orders) x GROUP BY chunk
          | UNION ALL
          | SELECT 'snapshot-completed', -1, count(*) FROM orders)
          |SELECT concat('notif-', type, '-', chunk) AS id,
          | 'Incremental Snapshot' AS aggregate_type, type, chunk, row_count,
          | 1700000000000 + chunk AS timestamp
          |FROM n""".stripMargin,
      "s13_file_signals" ->
        """SELECT CAST(event_id AS STRING) AS signal_id,
          | CASE WHEN event_type='signup' THEN 'execute-snapshot'
          |      WHEN event_type='error' THEN 'stop-snapshot'
          |      WHEN event_type='view' THEN 'log'
          |      ELSE 'ignore' END AS action,
          | 'orders' AS collection, 'incremental' AS snapshot_type
          |FROM events WHERE event_id % 89 = 0""".stripMargin,
      "s13_jmx_signals" ->
        """SELECT CAST(event_id AS STRING) AS signal_id,
          | CASE WHEN event_type='signup' THEN 'execute-snapshot'
          |      WHEN event_type='error' THEN 'stop-snapshot'
          |      WHEN event_type='view' THEN 'log'
          |      ELSE 'ignore' END AS action,
          | 'orders' AS collection, 'incremental' AS snapshot_type
          |FROM events WHERE event_id % 83 = 0""".stripMargin)
  }
}
