package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.Similarity
import graft.expressions.GraftFunctions
import graft.functions.{Geo, Names, Vectors}
import graft.operators.{Embeddings, SchemaEvolution}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  test("native cosine expression matches the declarative formulation exactly") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val l = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val r = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = l.join(r, col("ia") < col("ib") && col("ia") % 29 === 0)
    val diff = pairs
      .withColumn("c1", Similarity.cosine(col("ea"), col("eb")))
      .withColumn("c2", GraftFunctions.cosine(col("ea"), col("eb")))
      .filter(col("c1") =!= col("c2"))
      .count()
    assert(diff == 0, "native expression drifted from declarative cosine")
  }

  test("native nearest_cells matches the interpreted probe exactly") {
    GraftFunctions.register(spark)
    import graft.analytics.Ivf
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // duplicated centroids force distance ties — tie order (lower index
    // first) must match array_sort's struct ordering
    val cents = Ivf.pretrainedCentroids(14, 64) ++
      Ivf.pretrainedCentroids(2, 64)
    Seq(3, 7, 16, 99).foreach { nprobe => // 99 > k exercises the clamp
      val diff = e.select(
        Ivf.probeCells(col("embedding"), cents, nprobe).as("a"),
        Ivf.probeCellsNative(e)(col("embedding"), cents, nprobe).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(diff == 0, s"native probe drifted at nprobe=$nprobe")
    }
  }

  test("pq_encode: codes match driver-side arithmetic; dim mismatch is NULL") {
    GraftFunctions.register(spark)
    import graft.analytics.Pq
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    val m = 8; val ksub = 16; val dsub = 8
    val cbs = Pq.pretrainedCodebooks(m, ksub, dsub)
    val rows = e.select(col("vec_id"), col("embedding"),
      Pq.encodeNative(e)(col("embedding"), cbs).as("codes")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emb = r.getSeq[Float](1).map(_.toDouble).toArray
      val n = math.sqrt(emb.map(x => x * x).sum)
      val expect = (0 until m).map { sub =>
        val d = (0 until ksub).map { c =>
          (0 until dsub).map { j =>
            val dj = emb(sub * dsub + j) / n - cbs(sub)(c)(j)
            dj * dj
          }.sum
        }
        d.indexOf(d.min)
      }
      assert(r.getSeq[Int](2) == expect,
        s"codes drifted for vec ${r.getLong(0)}")
      r.getSeq[Int](2).foreach(c => assert(c >= 0 && c < ksub))
    }
    // wrong dims (codebooks for 32-dim input vs 64-dim vectors) => NULL
    val bad = Pq.pretrainedCodebooks(4, ksub, dsub)
    val nulls = e.select(Pq.encodeNative(e)(col("embedding"), bad).as("c"))
      .filter(col("c").isNotNull).count()
    assert(nulls == 0, "dimension mismatch must yield NULL, not prefix codes")
  }

  test("pq reconstruction has full dims; ADC search is deterministic top-k") {
    GraftFunctions.register(spark)
    import graft.analytics.Pq
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = Pq.pretrainedCodebooks(8, 16, 8)
    val rec = e.limit(50).select(
      size(Pq.reconstruct(Pq.encodeNative(e)(col("embedding"), cbs), cbs))
        .as("d")).collect()
    assert(rec.forall(_.getInt(0) == 64), "reconstruction must restore dims")
    val res = Pq.searchTopK(e, e.filter(col("vec_id") % 100 === 0), cbs, 5)
      .collect()
    val res2 = Pq.searchTopK(e, e.filter(col("vec_id") % 100 === 0), cbs, 5)
      .collect()
    assert(res.map(_.toString).sorted.sameElements(
      res2.map(_.toString).sorted), "ADC search must be deterministic")
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 5)
    }
  }

  test("ivf-pq search: sims agree with brute-force ADC on returned pairs") {
    GraftFunctions.register(spark)
    import graft.analytics.{Ivf, Pq}
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Ivf.pretrainedCentroids(16, 64)
    val cbs = Pq.pretrainedCodebooks(8, 16, 8)
    val q = e.filter(col("vec_id") % 100 === 0)
    val ivf = Pq.searchTopKIvf(e, q, cents, cbs, k = 5, nprobe = 4).collect()
    assert(ivf.nonEmpty, "ivf-pq returned no rows")
    // rank structure per query: 1..n, n <= k
    ivf.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 5)
    }
    // every returned sim must equal the brute-force ADC score of the same
    // pair (cells prune candidates; they must not change scores)
    val brute = Pq.searchTopK(e, q, cbs, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.get(key).contains(r.getDouble(3)),
        s"sim mismatch vs brute-force ADC at $key")
    }
  }

  test("vector_sum aggregate: elementwise sums, null vectors skipped, dims strict") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("a", Some(Seq(1.0, 2.0))),
      ("a", None),
      ("a", Some(Seq(0.5, -1.0))),
      ("b", Some(Seq(10.0, 20.0)))
    ).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(GraftFunctions.vectorSum(col("v")).as("s"), count(col("v")).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(got("a") == ((Seq(1.5, 1.0), 2L)))
    assert(got("b") == ((Seq(10.0, 20.0), 1L)))
    // all-null group evaluates to NULL, not a zero vector
    val nullOnly = Seq(("c", Option.empty[Seq[Double]])).toDF("g", "v")
      .groupBy("g").agg(GraftFunctions.vectorSum(col("v")).as("s")).head()
    assert(nullOnly.isNullAt(1))
    // all-EMPTY-ARRAY group is an empty array, not NULL — and stays so
    // across a forced shuffle (serialize must keep the two distinct)
    val emptyOnly = Seq(("e", Seq.empty[Double]), ("e", Seq.empty[Double]))
      .toDF("g", "v").repartition(4, col("v"))
      .groupBy("g").agg(GraftFunctions.vectorSum(col("v")).as("s")).head()
    assert(!emptyOnly.isNullAt(1) && emptyOnly.getSeq[Double](1).isEmpty)
    // mixed dimensions are corrupt input: raise, never sum a prefix
    val ex = intercept[Exception] {
      Seq(("d", Seq(1.0)), ("d", Seq(1.0, 2.0))).toDF("g", "v")
        .groupBy("g").agg(GraftFunctions.vectorSum(col("v"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null)
  }

  test("WKB point roundtrip is exact, including byte-order handling") {
    assert(Geo.decodePointWkb(Geo.encodePointWkb(1.5, -2.25)) ===
      Some((1.5, -2.25)))
    // big-endian variant decodes too
    val be = java.nio.ByteBuffer.allocate(21)
    be.put(0.toByte); be.putInt(1); be.putDouble(3.0); be.putDouble(4.0)
    assert(Geo.decodePointWkb(be.array()) === Some((3.0, 4.0)))
    assert(Geo.decodePointWkb(Array[Byte](1, 2, 3)) === None)
  }

  test("Wkb traverser: all geometry types, mixed endianness, Z/M, EWKB") {
    import java.nio.{ByteBuffer, ByteOrder}
    import graft.functions.Wkb
    // hand-built: little-endian GEOMETRYCOLLECTION holding a BIG-endian
    // POINT and a little-endian LINESTRING — per-scope byte orders
    val bePoint = {
      val bb = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
      bb.put(0.toByte); bb.putInt(1); bb.putDouble(1.5); bb.putDouble(-2.5)
      bb.array()
    }
    val leLine = Wkb.makeLineString(Seq((10.0, 20.0), (30.0, 40.0)))
    val coll = {
      val bb = ByteBuffer.allocate(9 + bePoint.length + leLine.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte); bb.putInt(Wkb.GeometryCollection); bb.putInt(2)
      bb.put(bePoint); bb.put(leLine)
      bb.array()
    }
    assert(Wkb.geometryType(coll) == Wkb.GeometryCollection)
    assert(Wkb.ordinates(coll) == Seq(1.5, -2.5, 10.0, 20.0, 30.0, 40.0))
    // swap preserves each scope's byte order, swaps every pair
    val swapped = Wkb.swapAxes(coll)
    assert(swapped(9) == 0.toByte, "nested big-endian marker preserved")
    assert(Wkb.ordinates(swapped) == Seq(-2.5, 1.5, 20.0, 10.0, 40.0, 30.0))
    assert(java.util.Arrays.equals(Wkb.swapAxes(swapped), coll))
    // endianness conversion normalizes every scope and round-trips
    val le = Wkb.toLittleEndian(coll)
    assert(le(9) == 1.toByte, "nested point rewritten little-endian")
    assert(Wkb.ordinates(le) == Wkb.ordinates(coll))
    assert(java.util.Arrays.equals(
      Wkb.toLittleEndian(Wkb.toBigEndian(coll)), le))
    // EWKB: srid flag + word at the top level only; strip recovers both
    val ewkb = Wkb.toEwkb(leLine, 4326)
    assert(Wkb.sridOf(ewkb) == Some(4326) && Wkb.sridOf(leLine).isEmpty)
    assert(java.util.Arrays.equals(Wkb.toEwkb(ewkb, 9999), ewkb),
      "toEwkb is idempotent")
    val (plain, srid) = Wkb.toWkb(ewkb)
    assert(java.util.Arrays.equals(plain, leLine) && srid == Some(4326))
    // Z-flagged polygon: stride 3, only the leading pair swaps
    val polyZ = {
      val bb = ByteBuffer.allocate(9 + 4 + 3 * 24)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte); bb.putInt(Wkb.Polygon | Wkb.ZFlag); bb.putInt(1)
      bb.putInt(3)
      Seq((1.0, 2.0, 9.0), (3.0, 4.0, 9.5), (1.0, 2.0, 9.0)).foreach {
        case (x, y, z) => bb.putDouble(x); bb.putDouble(y); bb.putDouble(z)
      }
      bb.array()
    }
    assert(Wkb.ordinates(Wkb.swapAxes(polyZ)) ==
      Seq(2.0, 1.0, 9.0, 4.0, 3.0, 9.5, 2.0, 1.0, 9.0))
    // multipolygon via the sub-geometry path
    val mp = {
      val p1 = Wkb.makePolygon(Seq(Seq((0.0, 0.0), (1.0, 0.0), (0.0, 0.0))))
      val bb = ByteBuffer.allocate(9 + p1.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte); bb.putInt(Wkb.MultiPolygon); bb.putInt(1); bb.put(p1)
      bb.array()
    }
    assert(Wkb.geometryType(mp) == Wkb.MultiPolygon &&
      Wkb.ordinates(mp).size == 6)
    // column-level contract: malformed / truncated / unsupported WKB
    // yields SQL NULL, never a thrown task
    import spark.implicits._
    val bad = Seq(
      Array[Byte](1, 2, 3),                       // truncated header
      Array[Byte](9) ++ Array.fill[Byte](20)(0),  // bad byte-order marker
      {                                            // ISO-Z type code 1001
        val bb = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
        bb.put(1.toByte); bb.putInt(1001)
        bb.putDouble(1); bb.putDouble(2); bb.putDouble(3); bb.array()
      })
      .toDF("wkb").select(struct(col("wkb"), lit(0).as("srid")).as("geom"))
    val r = bad.select(
      graft.functions.Geo.swapCoordinates(col("geom"))("wkb").as("sw"),
      graft.functions.Geo.ordinates(col("geom")).as("o"),
      graft.functions.Geo.geometryType(col("geom")).as("t")).collect()
    assert(r.forall(row => row.isNullAt(0) && row.isNullAt(1) &&
      row.isNullAt(2)))
  }

  test("sparse vector text parse") {
    import spark.implicits._
    val df = Seq("{0:0.5,3:-1.25}/8").toDF("s")
      .select(Vectors.parseSparseVector(col("s")).as("v"))
    val row = df.select(col("v.dimensions"), size(map_values(col("v.vector"))),
      element_at(col("v.vector"), 3)).head()
    assert(row.getInt(0) == 8 && row.getInt(1) == 2 && row.getDouble(2) == -1.25)
  }

  test("schema evolution: add/widen/drop, narrow rejected") {
    import SchemaEvolution._
    val base = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val evolved = applyAll(base, Seq(
      AddColumn("c", DoubleType), WidenColumn("a", LongType), DropColumn("b")))
    assert(evolved.fieldNames.toSeq == Seq("a", "c"))
    assert(evolved("a").dataType == LongType)
    intercept[IllegalArgumentException](
      apply(evolved, WidenColumn("a", IntegerType)))
    intercept[IllegalArgumentException](apply(evolved, DropColumn("zz")))
  }

  test("field->embedding is deterministic, normalized, partition-independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def run(parts: Int) = Embeddings
      .fieldToEmbedding(docs.repartition(parts), "text", "emb")
      .select(col("doc_id"), col("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = run(2); val b = run(7)
    assert(a == b, "embedding depends on partitioning")
    assert(a.values.forall(v => v.length == 64))
  }

  test("source metadata propagates into field metadata (T5)") {
    import graft.operators.Transforms
    val base = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val out = Transforms.propagateSourceMetadata(base, "orders",
      Map("a" -> "NUMBER(10)"))
    assert(out("a").metadata.getString("__graft.source.table") == "orders")
    assert(out("a").metadata.getString("__graft.source.column.type") == "NUMBER(10)")
    assert(out("b").metadata.getString("__graft.source.table") == "orders")
    assert(!out("b").metadata.contains("__graft.source.column.type"))
  }

  test("decodeMessageContent: INSERT-shaped after, null-field flag (T23)") {
    import graft.operators.Transforms
    import spark.implicits._
    // two messages; `note` is null in BOTH, `extra` only in the second
    val msgs = Seq(
      ("""{"id":1,"name":"a","note":null}""", 10L),
      ("""{"id":2,"name":"b","note":null,"extra":7}""", 20L))
      .toDF("json", "ts_ms")
      .select(
        struct(lit("pfx").as("prefix")).as("key"),
        struct(lit("pfx").as("prefix"),
          col("json").cast("binary").as("content")).as("message"),
        lit("m").as("op"), col("ts_ms"))
    // default fields.null.include=false: all-null `note` is dropped from
    // the decoded schema; partially-present `extra` survives (null where
    // absent) — the reference's IGNORE null-field behavior
    val dec = Transforms.decodeMessageContent(msgs)
    assert(!dec.columns.contains("message"))
    val after = dec.schema("after").dataType.asInstanceOf[StructType]
    assert(after.fieldNames.toSet == Set("id", "name", "extra"))
    val rows = dec.select(col("op"), col("key"), col("after.id"),
      col("after.extra")).collect()
    assert(rows.forall(_.getString(0) == "c"), "op rewritten to INSERT")
    assert(rows.forall(_.isNullAt(1)), "key cleared like the reference")
    assert(rows.map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSet == Set((1L, -1L), (2L, 7L)))
    // fields.null.include=true: the all-null field is kept in the schema
    val keep = Transforms.decodeMessageContent(msgs, fieldsNullInclude = true)
    val afterKeep = keep.schema("after").dataType.asInstanceOf[StructType]
    assert(afterKeep.fieldNames.contains("note"))
  }

  test("avroSafe column and scala twins agree") {
    import spark.implicits._
    val samples = Seq("PROMO BURNISHED", "9abc", "x-y.z", "ok_name")
    val fromCol = samples.toDF("s").select(Names.avroSafe(col("s")))
      .collect().map(_.getString(0)).toSeq
    assert(fromCol == samples.map(Names.avroSafe))
  }

  test("two-level cell assignment: full probe equals the flat scan; " +
      "partial probe is the probed-groups argmin") {
    import graft.analytics.Ivf
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Ivf.pretrainedCentroids(64, 64)
    val (coarse, members) = Ivf.coarseGroups(cents)
    assert(members.flatten.sorted == (0 until 64),
      "groups must partition the 64 cells")
    // probing EVERY group degrades to the exact flat scan
    val diff = e.select(
      Ivf.cellOfNative(e)(col("embedding"), cents).as("flat"),
      Ivf.cellOfTwoLevelNative(e)(col("embedding"), cents,
        probeGroups = coarse.length).as("two"))
      .filter(col("flat") =!= col("two")).count()
    assert(diff == 0, "full-probe two-level must equal the flat argmin")
    // partial probe: every result is a valid cell id (approximation
    // moves boundary vectors to a neighboring cell, never off the map)
    // and agreement with the flat scan improves monotonically with the
    // probe width. The absolute level is data-dependent — on THIS
    // fixture (random vectors vs random pretrained centroids in d=64,
    // distances concentrate) probeGroups=2 sits around 0.6; fitted
    // centroids with real cluster structure sit far higher.
    def res(p: Int) = e.select(
      Ivf.cellOfNative(e)(col("embedding"), cents).as("flat"),
      Ivf.cellOfTwoLevelNative(e)(col("embedding"), cents, p).as("two"))
      .collect()
    val r2 = res(2)
    assert(r2.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 64))
    def agree(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(r => r.getInt(0) == r.getInt(1)).toDouble / rs.length
    val (a2, a4) = (agree(r2), agree(res(4)))
    assert(a2 >= 0.5, s"probeGroups=2 agreement $a2 unexpectedly low")
    assert(a4 >= a2, s"agreement must improve with probe width: $a2 -> $a4")
    // dimension mismatch nulls, like NearestCell
    import spark.implicits._
    val bad = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
    assert(bad.select(Ivf.cellOfTwoLevelNative(bad)(col("embedding"),
      cents, 2).as("c")).collect()(0).isNullAt(0))
    // a zero-norm vector (all coarse distances NaN) must not crash and
    // lands in cell 0, matching the flat scan on the same input
    val zero = Seq(Seq.fill(64)(0.0f)).toDF("embedding")
    val z = zero.select(
      Ivf.cellOfNative(zero)(col("embedding"), cents).as("flat"),
      Ivf.cellOfTwoLevelNative(zero)(col("embedding"), cents, 2).as("two"))
      .collect()(0)
    assert(z.getInt(0) == 0 && z.getInt(1) == 0)
  }

  test("reselect cache: a legitimate NULL in a reselect column survives " +
      "(routed to the hit side, not dropped by a NULL predicate)") {
    import graft.operators.Transforms
    import spark.implicits._
    val stream = Seq(
      (1L, "r", "first", 10L),
      (1L, "u", "__unavailable", 15L), // cache hit: refills to "first"
      (2L, "u", null.asInstanceOf[String], 20L), // legit NULL: keep as-is
      (3L, "u", "__unavailable", 30L) // cache miss: source fallback
    ).toDF("id", "op", "v", "pos")
    val source = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val got = Transforms.reselectColumnsCached(stream, source,
      "id", "pos", Seq("v"))
      .select(col("id"), col("pos"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got == Set((1L, 10L, "first"), (1L, 15L, "first"),
      (2L, 20L, null), (3L, 30L, "t3")),
      s"NULL row must survive with its NULL intact; got $got")
  }

  test("heartbeat action: offset advances through the idle tail") {
    import graft.operators.Heartbeat
    import graft.sources.{ChangeFeedGen, Tables}
    val fd = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    // monitored table idle after pos 5000; log really runs to 15000
    val beats = Heartbeat
      .actionBeats(fd.filter(col("source.pos") <= 5000L), 1000L, 15000L)
      .orderBy(col("interval")).collect()
    assert(beats.length == 15) // ticks at every..logEnd, none past logEnd
    assert(beats.forall(_.getLong(1) <= 15000L),
      "no tick position may exceed logEnd")
    beats.foreach { r =>
      assert(r.getLong(3) == (r.getLong(0) + 1) * 1000L,
        "offset must advance to the tick position on EVERY tick")
    }
    val idle = beats.filter(_.getBoolean(4))
    assert(idle.nonEmpty && idle.forall(_.getLong(0) >= 5),
      "idle ticks (heartbeat-only advance) are exactly the post-cutoff tail")
    // last_data_pos freezes at the cutoff while offset_pos keeps moving
    val lastData = beats.last.getLong(2)
    assert(lastData <= 5000L && beats.last.getLong(3) == 15000L)
  }

  test("CloudEvents binary mode: ce_ headers + content-type per serializer") {
    import graft.functions.CloudEvents
    import graft.sources.{ChangeFeedGen, Tables}
    val fd = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val b = CloudEvents.binaryMode(fd, dataSerializer = "avro")
    val hm = b.select(map_from_entries(col("headers")).as("h"),
      col("content_type"), col("op")).limit(1).collect()(0)
    val h = hm.getMap[String, String](0)
    assert(h.keys.toSet == Set("ce_id", "ce_source", "ce_specversion",
      "ce_type", "ce_time", "content-type"))
    assert(h("ce_specversion") == "1.0")
    assert(h("content-type") == "application/avro" &&
      hm.getString(1) == "application/avro")
    assert(CloudEvents.dataContentType("json") == "application/json")
    intercept[IllegalArgumentException](CloudEvents.dataContentType("xml"))
    // the value section carries ONLY data columns — no attribute fields
    assert(b.columns.toSet ==
      Set("headers", "content_type", "key", "before", "after", "op"))
  }

  test("mongo outbox router: extended-JSON field resolution, op filter, " +
      "tombstone on empty payload") {
    import graft.operators.Router
    import spark.implicits._
    val feed = Seq(
      // canonical extended JSON: $oid id, $numberLong key, $date timestamp
      ("c", 10L, """{"_id":{"$oid":"aabbccddeeff001122334455"},""" +
        """"aggregatetype":"Order","aggregateid":{"$numberLong":"7"},""" +
        """"type":"created","timestamp":{"$date":{"$numberLong":"1700"}},""" +
        """"payload":{"k":1}}"""),
      // relaxed scalars pass through unchanged
      ("c", 20L, """{"_id":"plain","aggregatetype":"Order",""" +
        """"aggregateid":"8","type":"upd","timestamp":1800,""" +
        """"payload":{"k":2}}"""),
      // empty payload — dropped unless tombstones are on
      ("c", 30L, """{"_id":"e1","aggregatetype":"Order",""" +
        """"aggregateid":"9","type":"del","timestamp":1900}"""),
      // non-insert op — never routed (operation.invalid.behavior=skip)
      ("u", 40L, """{"_id":"u1","aggregatetype":"Order",""" +
        """"aggregateid":"10","type":"x","timestamp":2000,""" +
        """"payload":{"k":3}}"""),
      // relaxed-mode $date carries an ISO-8601 STRING: ts_ms must fall
      // back through a timestamp parse to epoch millis (the reference
      // converts ISO dates the same way)
      ("c", 50L, """{"_id":"iso1","aggregatetype":"Order",""" +
        """"aggregateid":"11","type":"created",""" +
        """"timestamp":{"$date":"1970-01-01T00:00:02.1Z"},""" +
        """"payload":{"k":4}}"""),
      // legacy mongo-shell output: UNQUOTED numbers inside the wrappers
      // ({"$numberLong":12}, {"$date":2200}) must unwrap like the
      // canonical quoted forms
      ("c", 60L, """{"_id":{"$oid":"ffeeddccbbaa998877665544"},""" +
        """"aggregatetype":"Order","aggregateid":{"$numberLong":12},""" +
        """"type":"created","timestamp":{"$date":2200},""" +
        """"payload":{"k":5}}""")
    ).toDF("op", "pos", "after_json")
    val routed = Router.mongoOutbox(feed, timestampField = Some("timestamp"))
      .select("topic", "key", "value", "id", "ts_ms").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(routed == Set(
      ("outbox.event.Order", "7", """{"k":1}""",
        "aabbccddeeff001122334455", 1700L),
      ("outbox.event.Order", "8", """{"k":2}""", "plain", 1800L),
      ("outbox.event.Order", "11", """{"k":4}""", "iso1", 2100L),
      ("outbox.event.Order", "12", """{"k":5}""",
        "ffeeddccbbaa998877665544", 2200L)),
      s"got $routed")
    // tombstone mode keeps the empty-payload event with a null value
    val tomb = Router.mongoOutbox(feed, timestampField = Some("timestamp"),
      tombstoneOnEmptyPayload = true)
      .filter(col("id") === "e1").select("value").collect()
    assert(tomb.length == 1 && tomb(0).isNullAt(0),
      "empty payload must emit a null-value tombstone when enabled")
    // expanded mode parses the payload into a typed struct
    val exp = Router.mongoOutbox(feed, expandPayload = true)
      .select(col("key"), col("value.k").as("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exp == Set(("7", 1L), ("8", 2L), ("11", 4L), ("12", 5L)))
    // collection.field.event.type is configurable (not hardwired to
    // "type"): a collection whose event-type field is named `kind`
    // still routes, resolving `type` out of that field
    val kindFeed = Seq(("c", 1L,
      """{"_id":"t1","aggregatetype":"Order","aggregateid":"12",""" +
        """"kind":"renamed","payload":{"k":9}}"""))
      .toDF("op", "pos", "after_json")
    val kinds = Router.mongoOutbox(kindFeed, typeField = "kind")
      .select("type").collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("renamed"))
  }
}
