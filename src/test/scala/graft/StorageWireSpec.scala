package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serde.KafkaProto
import graft.serde.KafkaProto.Record
import graft.sources.net.{KafkaClient, RedisClient}
import graft.tools.{BlobHttpServer, KafkaWireServer, RedisWireServer}

/** Protocol-level coverage for the K7 wire backends: Kafka record-batch
  * v2 codec + broker log semantics, RESP2 framing + auth, and the two
  * blob REST dialects. The oracle-checked queries exercise the store
  * recovery paths; these tests pin the byte-layer edge cases.
  */
class StorageWireSpec extends AnyFunSuite {

  // ---- Kafka codec ----

  test("record batch v2 round-trips keys, values, nulls and timestamps") {
    val recs = Seq(
      Record(100L, 1000L, "k0".getBytes, "v0".getBytes),
      Record(101L, 990L, null, "tombstone-key-null".getBytes),
      Record(102L, 1020L, "k2".getBytes, null),
      Record(103L, 1010L, Array.emptyByteArray, Array.emptyByteArray))
    val bytes = KafkaProto.encodeBatch(100L, recs)
    val back = KafkaProto.decodeBatches(bytes)
    assert(back.map(_.offset) == Seq(100L, 101L, 102L, 103L))
    assert(back.map(_.timestamp) == Seq(1000L, 990L, 1020L, 1010L))
    assert(new String(back.head.value) == "v0")
    assert(back(1).key == null && back(2).value == null)
    assert(back(3).key.length == 0 && back(3).value.length == 0)
  }

  test("decode rejects a CRC-corrupted batch") {
    val bytes = KafkaProto.encodeBatch(0L,
      Seq(Record(0L, 1L, "k".getBytes, "v".getBytes)))
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x40).toByte
    assertThrows[IllegalArgumentException](KafkaProto.decodeBatches(bytes))
  }

  test("decode concatenated batches and tolerates a truncated tail") {
    val b1 = KafkaProto.encodeBatch(0L, Seq(Record(0L, 1L, null, "a".getBytes)))
    val b2 = KafkaProto.encodeBatch(1L, Seq(Record(1L, 2L, null, "b".getBytes)))
    val joined = b1 ++ b2
    assert(KafkaProto.decodeBatches(joined).map(r => new String(r.value)) ==
      Seq("a", "b"))
    // a broker may cut the last batch at the fetch byte cap
    val truncated = b1 ++ b2.take(b2.length - 3)
    assert(KafkaProto.decodeBatches(truncated).map(r => new String(r.value)) ==
      Seq("a"))
  }

  test("zigzag varints cover negative and multi-byte values") {
    val w = new KafkaProto.Writer()
    Seq(0, -1, 1, 63, -64, 64, 12345, -12345, Int.MaxValue, Int.MinValue)
      .foreach(w.varint)
    val r = new KafkaProto.Reader(w.result())
    Seq(0, -1, 1, 63, -64, 64, 12345, -12345, Int.MaxValue, Int.MinValue)
      .foreach(v => assert(r.varint() == v))
  }

  // ---- Kafka broker + client ----

  test("client produces and fetch-loops across byte-capped batches") {
    val (port, broker, _) = KafkaWireServer.serve(recordsPerFetch = 7)
    val client = new KafkaClient("127.0.0.1", port)
    val base = client.produceStrings("t1", 0,
      (0 until 23).map(i => (s"k$i", s"v$i")))
    assert(base == 0L)
    val more = client.produceStrings("t1", 0, Seq(("k23", "v23")))
    assert(more == 23L) // broker assigns contiguous offsets
    val all = client.fetchAll("t1", 0)
    assert(all.size == 24)
    assert(all.map(_.offset) == (0L until 24L))
    assert(new String(all(23).value) == "v23")
    assert(broker.fetchRequests.get >= 4) // 24 records / 7 per fetch
    // fetch from the high watermark returns empty, not an error
    val (hw, tail) = client.fetchOnce("t1", 0, 24L)
    assert(hw == 24L && tail.isEmpty)
    // unknown topic surfaces the protocol error code as empty
    assert(client.fetchAll("nope", 0).isEmpty)
    assert(client.listTopics() == Seq("t1"))
    client.close()
  }

  test("kafka offset store folds compaction semantics on restart") {
    val (port, _, _) = KafkaWireServer.serve()
    val st = new graft.model.KafkaOffsetBackingStore("127.0.0.1", port, "off")
    st.set("a", "1"); st.set("a", "2"); st.set("b", "3")
    st.set("c", "9"); st.remove("c")
    st.close()
    val st2 = new graft.model.KafkaOffsetBackingStore("127.0.0.1", port, "off")
    assert(st2.snapshot == Map("a" -> "2", "b" -> "3"))
    st2.close()
  }

  // ---- RocketMQ ----

  test("rocketmq: send validated, pull loops, properties survive, CRC checked") {
    val (port, broker, _) = graft.tools.RocketMqWireServer.serve(maxPerPull = 3)
    val c = new graft.sources.net.RocketMqClient("127.0.0.1", port)
    (0 until 8).foreach { i =>
      val off = c.sendString("t1", 0, s"msg-$i",
        properties = Seq("k" -> s"v$i", "shared" -> "x"))
      assert(off == i.toLong) // broker assigns contiguous queue offsets
    }
    assert(c.maxOffset("t1", 0) == 8L)
    val all = c.pullAll("t1", 0)
    assert(all.map(m => new String(m.body)) == (0 until 8).map(i => s"msg-$i"))
    assert(all.map(_.queueOffset) == (0L until 8L))
    assert(all(3).properties.toMap == Map("k" -> "v3", "shared" -> "x"))
    assert(broker.pulls.get >= 3) // 8 msgs / 3 per pull
    // pull past the end is PULL_NOT_FOUND, surfaced as empty
    assert(c.pullOnce("t1", 0, 8L)._2.isEmpty)
    c.close()
  }

  test("rocketmq codec: frame and message round-trip, corrupt body rejected") {
    import graft.serde.RocketMqProto
    val cmd = RocketMqProto.Command(10, 7, 0, Some("note"),
      Map("topic" -> "t", "queueId" -> "0"), "payload".getBytes)
    val frame = RocketMqProto.encodeFrame(cmd)
    // strip the outer length prefix like the socket reader does
    val inner = java.util.Arrays.copyOfRange(frame, 4, frame.length)
    val back = RocketMqProto.decodeFrame(inner)
    assert(back.code == 10 && back.opaque == 7 &&
      back.remark.contains("note") && back.extFields("topic") == "t" &&
      new String(back.body) == "payload")
    val msg = RocketMqProto.encodeMessage("topic9", 2,
      RocketMqProto.StoredMessage(5L, 123L, Seq("a" -> "b"), "body!".getBytes))
    val Seq((topic, decoded)) = RocketMqProto.decodeMessages(msg)
    assert(topic == "topic9" && decoded.queueOffset == 5L &&
      decoded.bornTimestamp == 123L &&
      decoded.properties == Seq("a" -> "b") &&
      new String(decoded.body) == "body!")
    msg(msg.length - "body!".length - "topic9".length - 3 - 2) =
      'X'.toByte // corrupt a body byte
    assertThrows[IllegalArgumentException](RocketMqProto.decodeMessages(msg))
  }

  // ---- queue providers (chronicle-style spill) ----

  test("spill queue: FIFO across many cycle rolls, segments reclaimed") {
    val q = new graft.model.SpillQueueProvider(null, segmentBytes = 256)
    val n = 500 // hundreds of rolls at 256-byte segments
    (0 until n).foreach(i => q.enqueue(s"event-$i-${"x" * (i % 40)}"))
    assert(q.size == n)
    val out = Iterator.continually(q.poll()).takeWhile(_.isDefined)
      .map(_.get).toVector
    assert(out == (0 until n).map(i => s"event-$i-${"x" * (i % 40)}"))
    assert(q.poll().isEmpty)
    assert(q.segmentsOnDisk <= 2, "drained segments must be reclaimed")
    q.close()
  }

  test("spill queue: interleaved produce/consume stays FIFO") {
    val q = new graft.model.SpillQueueProvider(null, segmentBytes = 128)
    var next = 0; var expect = 0
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      if (rnd.nextBoolean() || q.size == 0) {
        q.enqueue(s"e$next"); next += 1
      } else {
        assert(q.poll().contains(s"e$expect")); expect += 1
      }
    }
    while (q.size > 0) { assert(q.poll().contains(s"e$expect")); expect += 1 }
    assert(expect == next)
    q.close()
  }

  test("hybrid queue: no disk under capacity, strict FIFO once spilling") {
    val q = new graft.model.HybridQueueProvider(maxMemory = 4)
    (0 until 4).foreach(i => q.enqueue(s"m$i"))
    assert(q.spillCount == 0, "under capacity must stay in memory")
    (4 until 20).foreach(i => q.enqueue(s"m$i"))
    assert(q.spillCount == 16, "oldest events must spill on overflow")
    val out = Iterator.continually(q.poll()).takeWhile(_.isDefined)
      .map(_.get).toVector
    assert(out == (0 until 20).map(i => s"m$i"),
      "FIFO must hold across the spill boundary")
    q.close()
  }

  // ---- Redis ----

  test("RESP2 replies parse across all five types and AUTH is enforced") {
    val (port, state, _) = RedisWireServer.serve("pw")
    // unauthenticated commands are rejected
    val bad = new RedisClient("127.0.0.1", port)
    bad.command("PING") match {
      case RedisClient.Err(e) => assert(e.contains("NOAUTH"))
      case other => fail(s"expected NOAUTH, got $other")
    }
    bad.close()
    assertThrows[IllegalStateException](new RedisClient("127.0.0.1", port, "wrong"))
    val c = new RedisClient("127.0.0.1", port, "pw")
    assert(c.command("PING") == RedisClient.Simple("PONG"))
    assert(c.hset("h", "f1", "v1") == 1L)
    assert(c.hset("h", "f1", "v2") == 0L) // overwrite adds no field
    assert(c.hgetAll("h") == Map("f1" -> "v2"))
    assert(c.hdel("h", "f1") == 1L)
    assert(c.hgetAll("h") == Map.empty[String, String])
    val id1 = c.xadd("st", "schema" -> "one")
    val id2 = c.xadd("st", "schema" -> "two")
    assert(id1 < id2) // monotone stream ids
    assert(c.xrangeAll("st").map(_._2("schema")) == Seq("one", "two"))
    assert(c.command("HGET", "h", "missing") == RedisClient.Bulk(null))
    assert(state.authSeen)
    c.close()
  }

  // ---- Blob REST ----

  test("S3 dialect: 404 NoSuchKey, put/get round-trip, prefix listing") {
    val (port, state, server) = BlobHttpServer.serve()
    val base = s"http://127.0.0.1:$port"
    val (miss, missBody) =
      graft.model.BlobHttp.request("GET", s"$base/b/nope", null, Nil)
    assert(miss == 404 && new String(missBody).contains("NoSuchKey"))
    val (put, _) = graft.model.BlobHttp.request("PUT", s"$base/b/k1",
      "hello".getBytes, Nil)
    assert(put == 200)
    graft.model.BlobHttp.request("PUT", s"$base/b/other", "x".getBytes, Nil)
    val (got, body) = graft.model.BlobHttp.request("GET", s"$base/b/k1", null, Nil)
    assert(got == 200 && new String(body) == "hello")
    val (_, listing) = graft.model.BlobHttp.request("GET",
      s"$base/b?list-type=2&prefix=k", null, Nil)
    val l = new String(listing)
    assert(l.contains("<Key>k1</Key>") && !l.contains("<Key>other</Key>"))
    assert(state.puts.get == 2)
    server.stop(0)
  }

  test("Kube apiserver: manifest validation, resourceVersion bumps, 404/409") {
    val (port, state, server) = graft.tools.KubeApiServer.serve()
    val base = s"http://127.0.0.1:$port/api/v1/namespaces/ns1/configmaps"
    def put(url: String, body: String) =
      graft.model.BlobHttp.request("PUT", url, body.getBytes("UTF-8"), Nil)
    def post(body: String) =
      graft.model.BlobHttp.request("POST", base, body.getBytes("UTF-8"), Nil)
    def get(url: String) = graft.model.BlobHttp.request("GET", url, null, Nil)
    // missing object is a Status/NotFound document
    val (miss, missBody) = get(s"$base/cm1")
    assert(miss == 404 && new String(missBody).contains("NotFound"))
    // PUT before create is 404; wrong kind is rejected
    assert(put(s"$base/cm1",
      """{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"cm1"},"data":{"a":"1"}}""")._1 == 404)
    assert(post("""{"kind":"Secret","apiVersion":"v1","metadata":{"name":"cm1"}}""")._1 == 400)
    // create, duplicate create conflicts, resourceVersion bumps on PUT
    val (created, createdBody) = post(
      """{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"cm1"},"data":{"a":"1"}}""")
    assert(created == 201 && new String(createdBody).contains("\"resourceVersion\""))
    assert(post("""{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"cm1"},"data":{}}""")._1 == 409)
    val (ok, okBody) = put(s"$base/cm1",
      """{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"cm1"},"data":{"a":"2","b":"3"}}""")
    assert(ok == 200)
    assert(state.data("ns1", "cm1") == Map("a" -> "2", "b" -> "3"))
    // path/metadata name mismatch and bad key alphabet are rejected
    assert(put(s"$base/cm1",
      """{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"other"},"data":{}}""")._1 == 400)
    assert(put(s"$base/cm1",
      """{"kind":"ConfigMap","apiVersion":"v1","metadata":{"name":"cm1"},"data":{"bad/key":"x"}}""")._1 == 422)
    assert(state.rejectedKeys == 1)
    server.stop(0)
  }

  test("redis pipeline: one flush, ordered replies, stream order kept") {
    import graft.sources.net.RedisClient
    val (port, state, _) = graft.tools.RedisWireServer.serve("pw")
    val c = new RedisClient("127.0.0.1", port, "pw")
    val replies = c.pipeline((1 to 50).map(i =>
      Seq("XADD", "s", "*", "key", s"k$i", "value", s"v$i")))
    assert(replies.size == 50)
    assert(replies.forall { case RedisClient.Bulk(id) => id != null; case _ => false })
    val entries = c.xrangeAll("s")
    assert(entries.map(_._2("key")) == (1 to 50).map(i => s"k$i"))
    // KEYS surfaces the stream for the verification read
    assert(c.command("KEYS", "*") ==
      RedisClient.Arr(Seq(RedisClient.Bulk("s"))))
    c.close()
    assert(state.streamLen("s") == 50)
  }

  test("kafka idempotence: dedup exact retry, reject gaps, pid starts at 0") {
    import graft.sources.net.KafkaClient
    val (port, broker, _) = graft.tools.KafkaWireServer.serve()
    val c = new KafkaClient("127.0.0.1", port)
    val (pid, epoch) = c.initProducerId()
    assert(pid >= 1000L && epoch == 0)
    def recs(tag: String) =
      Seq((s"k-$tag".getBytes("UTF-8"), s"v-$tag".getBytes("UTF-8")))
    // first batch from a pid must start at sequence 0
    intercept[Exception] {
      c.produce("t", 0, recs("bad"), producerId = pid,
        producerEpoch = epoch, baseSequence = 5)
    }
    val b0 = c.produce("t", 0, recs("a"), producerId = pid,
      producerEpoch = epoch, baseSequence = 0)
    // exact retry: same offset back, nothing appended
    val b0r = c.produce("t", 0, recs("a"), producerId = pid,
      producerEpoch = epoch, baseSequence = 0)
    assert(b0r == b0 && broker.recordCount("t") == 1)
    assert(broker.duplicatesDropped.get == 1)
    // a sequence gap is rejected
    intercept[Exception] {
      c.produce("t", 0, recs("gap"), producerId = pid,
        producerEpoch = epoch, baseSequence = 7)
    }
    // the successor sequence appends
    val b1 = c.produce("t", 0, recs("b"), producerId = pid,
      producerEpoch = epoch, baseSequence = 1)
    assert(b1 == b0 + 1 && broker.recordCount("t") == 2)
    // a second producer id has its own sequence space
    val c2 = new KafkaClient("127.0.0.1", port)
    val (pid2, e2) = c2.initProducerId()
    assert(pid2 != pid)
    c2.produce("t", 0, recs("c"), producerId = pid2,
      producerEpoch = e2, baseSequence = 0)
    assert(broker.recordCount("t") == 3)
    c.close(); c2.close()
  }

  test("redis XADD explicit ids: server rejects non-increasing (replay fence)") {
    import graft.sources.net.RedisClient
    val (port, _, _) = graft.tools.RedisWireServer.serve("pw")
    val c = new RedisClient("127.0.0.1", port, "pw")
    assert(c.command("XADD", "s", "10-0", "key", "a", "value", "1") ==
      RedisClient.Bulk("10-0"))
    assert(c.command("XADD", "s", "20", "key", "b", "value", "2") ==
      RedisClient.Bulk("20-0"))
    // equal and smaller both rejected, like real redis
    c.command("XADD", "s", "20-0", "key", "x", "value", "x") match {
      case RedisClient.Err(m) => assert(m.contains("equal or smaller"))
      case other => fail(s"expected error, got $other")
    }
    c.command("XADD", "s", "5-0", "key", "x", "value", "x") match {
      case RedisClient.Err(m) => assert(m.contains("equal or smaller"))
      case other => fail(s"expected error, got $other")
    }
    assert(c.xrangeAll("s").map(_._1) == Seq("10-0", "20-0"))
    c.close()
  }

  test("redis stream sink: per-topic counts match, AUTH enforced") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val (port, _, _) = graft.tools.RedisWireServer.serve("pw")
    val df = (1 to 300).map(i => (s"t${i % 3}", s"k$i", s"v$i"))
      .toDF("topic", "key", "value")
    intercept[Exception] {
      graft.streaming.RedisStreamSink.write(df, "127.0.0.1", port,
        password = "wrong").collect()
    }
    val counts = graft.streaming.RedisStreamSink
      .write(df, "127.0.0.1", port, batchSize = 64, password = "pw")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("t0" -> 100L, "t1" -> 100L, "t2" -> 100L))
    val back = graft.streaming.RedisStreamSink
      .readBack(spark, "127.0.0.1", port, password = "pw")
    assert(back.count() == 300)
    assert(back.select("topic").distinct().count() == 3)
  }

  test("Azure dialect: BlockBlob header required, 201 on put") {
    val (port, _, server) = BlobHttpServer.serve()
    val base = s"http://127.0.0.1:$port"
    val az = Seq("x-ms-version" -> "2021-08-06", "x-ms-blob-type" -> "BlockBlob")
    val (noHeader, _) = graft.model.BlobHttp.request("PUT", s"$base/c/b1",
      "x".getBytes, Seq("x-ms-version" -> "2021-08-06"))
    assert(noHeader == 400)
    val (ok, _) = graft.model.BlobHttp.request("PUT", s"$base/c/b1",
      "data".getBytes, az)
    assert(ok == 201)
    val (got, body) = graft.model.BlobHttp.request("GET", s"$base/c/b1",
      null, Seq("x-ms-version" -> "2021-08-06"))
    assert(got == 200 && new String(body) == "data")
    server.stop(0)
  }
}
