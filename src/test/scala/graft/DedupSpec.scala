package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.{Dedup, Similarity}

/** Verifies the approximate dedup/ANN operators against their exact
  * counterparts on sf0.001 (the operators the DuckDB oracle can't express).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Exact all-pairs Jaccard >= j (500 docs → 125k pairs, fine locally).
    * shingleN = 1 → token-set Jaccard; >1 → shingle Jaccard (MinHash metric).
    */
  def exactPairs(minJ: Double, shingleN: Int = 1): Set[(Long, Long)] = {
    val d = docs.select(col("doc_id"), col("text"))
    val l = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val r = d.select(col("doc_id").as("id_b"), col("text").as("text_b"))
    val j = if (shingleN <= 1) Dedup.jaccard(col("text_a"), col("text_b"))
            else Dedup.jaccardShingles(col("text_a"), col("text_b"), shingleN)
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("j", j)
      .filter(col("j") >= minJ)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("jaccardPairsBy: NULL buckets are candidates of nothing") {
    import spark.implicits._
    // identical texts, but bucket is null (no blocking key) — must emit
    // no pairs, matching the self-join formulation where null === null
    // never matches (the null group must not become an all-pairs bucket)
    val d = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "same text here")).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsBy(d, lit(null).cast("string"),
      array_distinct(split(col("text"), " ")), 0.1)
    assert(got.count() == 0)
    // sanity: a real bucket still pairs them
    val paired = Dedup.jaccardPairsBy(d, lit("b"),
      array_distinct(split(col("text"), " ")), 0.1)
    assert(paired.count() == 3)
  }

  test("int8 quantization: dequant error within scale/254, zero-vector safe") {
    import spark.implicits._
    val out = embs.select(col("embedding"),
      Similarity.quantizeInt8(col("embedding")).as("q"))
      .collect()
    out.foreach { r =>
      val e = r.getSeq[Float](0).map(_.toDouble)
      val q = r.getSeq[Int](1)
      val scale = e.map(math.abs).max
      assert(q.forall(v => v >= -127 && v <= 127))
      e.zip(q).foreach { case (x, v) =>
        assert(math.abs(x - v * scale / 127) <= scale / 254 + 1e-12,
          s"dequant error above the absmax bound for $x -> $v")
      }
    }
    val zero = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(Similarity.quantizeInt8(col("embedding"))).head().getSeq[Int](0)
    assert(zero == Seq(0, 0, 0))
  }

  test("dedupClusters resolves pair graphs to min-id components") {
    import spark.implicits._
    // two chains and a singleton: {1,2,3} via 1-2,2-3; {5,6}; 4 and 7 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L))
      .toDF("id_a", "id_b")
    val docs = (1L to 7L).toDF("doc_id")
    val got = Dedup.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false), (7L, 7L, true)))
  }

  test("dedupClusters converges on a long path (diameter > 1 round)") {
    import spark.implicits._
    // path 10-11-12-...-17: one component, min label must traverse 7 hops
    val pairs = (10L until 17L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val docs = (10L to 17L).toDF("doc_id")
    val got = Dedup.dedupClusters(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((10L to 17L).forall(got(_) == 10L))
  }

  test("dedupClusters distributed path matches the driver union-find") {
    import spark.implicits._
    // force the label-propagation loop (driverMax = 0) on a graph with
    // several shapes: a 30-hop path (pointer doubling must cover
    // diameter >> rounds), a star, a triangle, singletons
    val pathPairs = (100L until 130L).map(i => (i, i + 1))
    val star = Seq((50L, 51L), (50L, 52L), (50L, 53L))
    val tri = Seq((60L, 61L), (61L, 62L), (60L, 62L))
    val pairs = (pathPairs ++ star ++ tri).toDF("id_a", "id_b")
    val docs = ((100L to 130L) ++ (50L to 53L) ++ (60L to 62L) ++ Seq(999L))
      .toDF("doc_id")
    val viaDriver = Dedup.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaLoop = Dedup.dedupClusters(docs, pairs, driverMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaDriver == viaLoop)
    assert(viaDriver.contains((999L, 999L, true)))
    assert((100L to 130L).forall(i =>
      viaDriver.contains((i, 100L, i == 100L))))
  }

  test("minhash-LSH finds most true near-dup pairs, no false positives") {
    val truth = exactPairs(0.8, shingleN = 3)
    val got = Dedup.minhashLshPairs(docs, 3, 8, 4, 0.8)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain near-dups")
    // final Jaccard verification makes precision exact
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall too low (${got.size}/${truth.size})")
  }

  test("lshParams: banding climbs with corpus size, recall target held") {
    // the dial the r7 10x step showed must scale: r (and b with it)
    // must grow as N grows, so chance candidates stay ~N
    val byN = Seq(500L, 5000L, 50000L, 1000000000L)
      .map(n => n -> Dedup.lshParams(0.8, n))
    val rs = byN.map(_._2._2)
    assert(rs == rs.sorted, s"rowsPerBand must be monotone in N: $byN")
    assert(rs.head >= 2 && rs.last >= 7,
      s"1e9 docs should land near the documented r~8 regime: $byN")
    byN.foreach { case (n, (b, r)) =>
      // recall: miss probability at the threshold stays under target
      val miss = math.pow(1 - math.pow(0.8, r), b)
      assert(miss <= 1e-6, s"n=$n (b=$b,r=$r) miss=$miss")
      // bounded chance-candidate volume per doc at the default s_bg
      assert(n / 2.0 * b * math.pow(0.05, r) <= 1.0 + 1e-9,
        s"n=$n (b=$b,r=$r) fp volume unbounded")
    }
    // auto entry point delegates to the derived dial: same pairs as the
    // explicit call with those parameters
    val (b0, r0) = Dedup.lshParams(0.8, docs.count())
    val auto = Dedup.minhashLshPairsAuto(docs, 3, 0.8)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val explicit = Dedup.minhashLshPairs(docs, 3, b0, r0, 0.8)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto == explicit)
  }

  test("OPH densify: rotation semantics, cyclic wrap, all-empty fill") {
    import graft.expressions.OnePermMinHash.densify
    val E = Long.MaxValue
    // interior empties borrow the nearest non-empty to the cyclic RIGHT,
    // offset by the borrow distance
    val a = Array(E, 5L, E, E, 9L)
    densify(a)
    assert(a.toSeq == Seq(6L, 5L, 11L, 10L, 9L))
    // top suffix wraps to the lowest non-empty bin
    val b = Array(E, 7L, E, E, E)
    densify(b)
    assert(b.toSeq == Seq(8L, 7L, 11L, 10L, 9L))
    // no shingles at all: deterministic position-keyed fill
    val c1 = Array.fill(8)(E); val c2 = Array.fill(8)(E)
    densify(c1); densify(c2)
    assert(c1.toSeq == c2.toSeq && c1.forall(_ != E))
  }

  test("OPH signature: slot agreement tracks Jaccard; codegen = eval") {
    import spark.implicits._
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    // |A ∩ B| = 90, |A ∪ B| = 110 → J ≈ 0.818
    val A = (1 to 100).map(_.toString)
    val B = (11 to 110).map(_.toString)
    val df = Seq((1L, A), (2L, B)).toDF("doc_id", "sh")
      .select(col("doc_id"), GraftFunctions.onePermMinhash(col("sh"), 200).as("sig"))
    val rows = df.orderBy("doc_id").collect()
      .map(_.getSeq[Long](1).toArray)
    val agree = rows(0).zip(rows(1)).count { case (x, y) => x == y } / 200.0
    assert(agree > 0.6 && agree < 0.95,
      s"slot agreement $agree should track J≈0.82")
    // interpreted eval path must match the codegen path
    val expr = graft.expressions.OnePermMinHash(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          A.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 200)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(interp.toSeq == rows(0).toSeq)
  }

  test("OPH minhash-LSH: exact-verified pairs equal ground truth") {
    val truth = exactPairs(0.8, shingleN = 3)
    val (b0, r0) = Dedup.lshParams(0.8, docs.count())
    val got = Dedup.minhashLshPairs(docs, 3, b0, r0, 0.8, onePerm = true)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(5)}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall (${got.size}/${truth.size})")
  }

  test("semanticDedupAuto equals semanticDedup at heuristicK(N)") {
    import graft.analytics.Ivf
    val k = Ivf.heuristicK(embs.count())
    assert(k == 22, s"500 vectors should size to k=22 cells, got $k")
    val auto = Similarity.semanticDedupAuto(embs, minSim = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val explicit = Similarity.semanticDedup(embs,
      Ivf.pretrainedCentroids(k, 64), minSim = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(auto == explicit)
  }

  test("simhash pairs are mostly high-jaccard") {
    val pairs = Dedup.simhashPairs(docs, 3)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs.nonEmpty, "expected some simhash-close pairs")
    val loose = exactPairs(0.5)
    val precision = pairs.count(loose).toDouble / pairs.size
    assert(precision >= 0.8, s"simhash precision vs jaccard>=0.5 was $precision")
  }

  test("native simhash expression equals the explode+agg formulation, both hashes") {
    val byAgg64 = Dedup.simhash(docs, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native64 = Dedup.simhashNative(docs, 64, useMd5 = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native64 == byAgg64)
    val byAgg32 = Dedup.simhash(docs, 32, Dedup.md5Hash32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native32 = Dedup.simhashNative(docs, 32, useMd5 = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native32 == byAgg32)
  }

  test("LSH ANN returns a subset of true high-similarity pairs") {
    val e = embs.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val f = embs.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val truth = e.crossJoin(f).filter(col("id_a") < col("id_b"))
      .withColumn("sim", Similarity.cosine(col("ea"), col("eb")))
      .filter(col("sim") >= 0.3)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = Similarity.annLsh(embs, 64, 8, 0.3)
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.subsetOf(truth), s"ANN false positives: ${(got -- truth).take(5)}")
    assert(got.nonEmpty, "LSH buckets should capture some close pairs")
  }

  test("containment flags a near-superset pair whose Jaccard stays low") {
    import spark.implicits._
    // doc 1 is wholly contained in doc 2 (a 4× expansion): containment_a
    // = 1.0 but Jaccard = 5/20 — symmetric near-dup misses it entirely
    val short = (1 to 5).map(i => s"w$i").mkString(" ")
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, short), (2L, long), (3L, "unrelated other stuff"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, lit("b"),
      array_distinct(split(col("text"), " ")), 0.9).collect()
    assert(got.length == 1, s"expected one pair, got ${got.toSeq}")
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0, "short side must be fully contained")
    assert(r.getDouble(3) == 0.25, "long side containment = 5/20")
    // and Jaccard at the same threshold finds nothing
    assert(Dedup.jaccardPairsBy(d, lit("b"),
      array_distinct(split(col("text"), " ")), 0.9).count() == 0)
  }

  test("annHamming: signature matches driver bit math; ranks deterministic") {
    val e = embs.limit(200)
    val sigs = e.select(col("vec_id"),
      Similarity.signBits(col("embedding"), 64).as("sig"),
      col("embedding")).collect()
    sigs.foreach { r =>
      val emb = r.getSeq[Float](2)
      var expected = 0L
      emb.indices.foreach { i =>
        if (emb(i) >= 0) expected ^= (1L << i)
      }
      assert(r.getLong(1) == expected, s"sig mismatch at vec ${r.getLong(0)}")
    }
    val q = e.filter(col("vec_id") % 50 === 0)
    val res = Similarity.annHamming(e, q, 64, 5).collect()
    assert(res.nonEmpty)
    // hamming values agree with the signatures; ranks are 1..n per query
    val sigMap = sigs.map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { r =>
      val expect = java.lang.Long.bitCount(
        sigMap(r.getLong(0)) ^ sigMap(r.getLong(2)))
      assert(r.getInt(3) == expect, "hamming disagrees with signatures")
    }
    res.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }
}
