package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.{Ivf, Similarity}
import graft.operators.{IncrementalSnapshot, Materialize}
import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.{MergeSink, SnapshotCoordinator}

class CoordinatorIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).sorted.toSeq
  }

  test("signal-driven snapshot: pause/resume interleaved with stream == full merge") {
    import SnapshotCoordinator._
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val snap = IncrementalSnapshot.chunked(
      feed.filter(col("op") === "r"), Seq(col("source.pos")), 256)
    val stream = feed.filter(col("op") =!= "r")
    val sink = new MergeSink(Files.createTempDirectory("coord").toString)
    val progress = SnapshotCoordinator.run(snap, sink, Seq(
      ExecuteSnapshot,             // chunk 0
      StreamBatch(stream),         // live events arrive mid-snapshot
      PauseSnapshot,
      ResumeSnapshot))             // chunk 1 .. rest drain after script
    assert(!progress.aborted)
    assert(progress.chunksDone.size > 2, "expected multiple chunks")
    assert(canon(sink.view(spark)) == canon(Materialize.latestState(feed)),
      "coordinator result differs from full merge")
  }

  test("re-snapshot over an existing sink seeds epochs above the committed version") {
    import SnapshotCoordinator._
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "orders"), "orders")
    val reads = feed.filter(col("op") === "r")
    val snap = IncrementalSnapshot.chunked(reads, Seq(col("source.pos")), 256)
    val sink = new MergeSink(Files.createTempDirectory("coord2").toString)
    // first run: a partial snapshot (first two chunks only)
    val p1 = SnapshotCoordinator.run(snap.filter(col("chunk") < 2), sink,
      Seq(ExecuteSnapshot))
    assert(!p1.aborted && p1.chunksDone.size == 2)
    val committed1 = sink.committedEpoch.get
    // second run over the SAME sink dir: its epoch counter must start
    // above the committed version — with a 0-seeded counter the replay
    // guard would silently drop every chunk and the view would keep only
    // the first two chunks' keys
    val p2 = SnapshotCoordinator.run(snap, sink, Seq(ExecuteSnapshot))
    assert(!p2.aborted && p2.chunksDone.size > 2)
    assert(sink.committedEpoch.get > committed1,
      "second run committed nothing — epoch counter restarted below the sink")
    assert(canon(sink.view(spark)) ==
      canon(reads.select(col("after.*"))),
      "re-snapshot result differs from the full read state")
  }

  test("stop-snapshot aborts remaining chunks") {
    import SnapshotCoordinator._
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "customer"), "customer")
    val snap = IncrementalSnapshot.chunked(
      feed.filter(col("op") === "r"), Seq(col("source.pos")), 100)
    val sink = new MergeSink(Files.createTempDirectory("coord").toString)
    val progress = SnapshotCoordinator.run(snap, sink,
      Seq(ExecuteSnapshot, StopSnapshot))
    assert(progress.aborted)
    assert(progress.chunksDone.size == 1, "only the first chunk should land")
    assert(sink.view(spark).count() > 0)
  }

  test("IVF search recall vs brute force") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = Ivf.fitCentroids(embs, "vec_id", "embedding", k = 16)
    assert(centroids.size == 16 && centroids.head.length == 64)
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val ivf = Ivf.searchTopK(embs, queries, centroids, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, embs, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.count(brute).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (${ivf.size} vs ${brute.size})")
    // every IVF hit must be a real corpus vector pair (sanity)
    assert(ivf.forall { case (q, n) => q != n })
  }

  test("distributed Lloyd's trains k=4096 cells and keeps search recall") {
    // synthetic 20k x 64 corpus, deterministic per-id hash components
    val corpus = spark.range(20000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 500.0
          - 1.0).cast("float")).as("embedding"))
      .persist()
    try {
      val centroids = Ivf.fitCentroidsDistributed(
        corpus, "vec_id", "embedding", k = 4096, iters = 2)
      assert(centroids.size == 4096 && centroids.head.length == 64)
      // means of unit vectors stay inside the unit ball, and no cell
      // collapsed to the origin
      val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
      assert(norms.forall(n => n > 0.0 && n <= 1.0 + 1e-9))
      val queries = corpus.filter(col("vec_id") % 1000 === 0)
      val ivf = Ivf.searchTopK(corpus, queries, centroids, k = 5, nprobe = 256)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Similarity.bruteForceTopK(queries, corpus, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = ivf.count(brute).toDouble / brute.size
      assert(recall >= 0.5, s"distributed-fit IVF recall too low: $recall")
    } finally corpus.unpersist()
  }

  test("mini-batch k-means converges to cluster means with per-cell rates") {
    // three tight clusters around orthogonal axes: after a few fresh
    // batches each centroid must sit near its cluster's direction
    val corpus = spark.range(3000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)), d =>
        (when(d === (col("id") % 3).cast("int"), lit(10.0))
          .otherwise(lit(0.0)) +
          (pmod(xxhash64(col("id"), d), lit(100)).cast("double") / 500.0))
          .cast("float")).as("embedding"))
    val centroids = Ivf.fitCentroidsMiniBatch(
      corpus, "vec_id", "embedding", k = 3, iters = 6, batchPerCell = 64)
    assert(centroids.size == 3 && centroids.head.length == 4)
    // each cluster axis is the dominant component of exactly one centroid
    val dominant = centroids.map(c => c.indexOf(c.max)).toSet
    assert(dominant == Set(0, 1, 2), s"centroids collapsed: $dominant")
    centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(n > 0.9 && n <= 1.0 + 1e-9,
        s"tight-cluster centroid should stay near the unit sphere: $n")
    }
  }

  test("mini-batch trainer holds k=4096 search recall with fresh batches") {
    val corpus = spark.range(20000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 500.0
          - 1.0).cast("float")).as("embedding"))
      .persist()
    try {
      val centroids = Ivf.fitCentroidsMiniBatch(
        corpus, "vec_id", "embedding", k = 4096, iters = 3)
      assert(centroids.size == 4096 && centroids.head.length == 64)
      val norms = centroids.map(c => math.sqrt(c.map(x => x * x).sum))
      assert(norms.forall(n => n > 0.0 && n <= 1.0 + 1e-9))
      val queries = corpus.filter(col("vec_id") % 1000 === 0)
      val ivf = Ivf.searchTopK(corpus, queries, centroids, k = 5, nprobe = 256)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Similarity.bruteForceTopK(queries, corpus, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = ivf.count(brute).toDouble / brute.size
      assert(recall >= 0.5, s"mini-batch IVF recall too low: $recall")
    } finally corpus.unpersist()
  }

  test("auto-fit routes k > driverKMax to the distributed trainer") {
    // 1.15M tiny vectors push heuristicK past driverKMax=1024
    val corpus = spark.range(1150000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        d => (pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 500.0
          - 1.0).cast("float")).as("embedding"))
    val (k, centroids) = Ivf.fitCentroidsAuto(corpus, "vec_id", "embedding",
      iters = 2)
    assert(k == Ivf.heuristicK(1150000) && k > Ivf.driverKMax)
    assert(centroids.size == k && centroids.head.length == 4)
  }

  test("file signal channel drives the coordinator: execute-snapshot from disk") {
    import SnapshotCoordinator._
    val sigDir = Files.createTempDirectory("sigchan")
    Files.write(sigDir.resolve("signals.jsonl"),
      ("""{"id":"s-1","type":"log","data":"{\"message\":\"hi\"}"}""" + "\n" +
        """{"id":"s-2","type":"execute-snapshot",""" +
        """"data":"{\"data-collections\":[\"orders\"],\"type\":\"incremental\"}"}""" + "\n" +
        """{"id":"s-3","type":"mystery-op","data":"{}"}""" + "\n")
        .getBytes("UTF-8"))
    val parsed = graft.operators.Signals.fromFile(spark, sigDir.toString)
      .orderBy(col("signal_id")).collect()
    assert(parsed.map(_.getAs[String]("action")).toSeq ==
      Seq("log", "execute-snapshot", "ignore"))
    assert(parsed(1).getAs[String]("collection") == "orders")
    // interpret file signals into coordinator actions, exactly the
    // SignalProcessor -> ExecuteSnapshot path of the reference
    val actions = graft.operators.Signals.snapshotCommands(
      graft.operators.Signals.fromFile(spark, sigDir.toString))
      .orderBy(col("signal_id"))
      .collect().map(_.getAs[String]("action")).toSeq.collect {
        case "execute-snapshot" => ExecuteSnapshot
        case "pause-snapshot"   => PauseSnapshot
        case "resume-snapshot"  => ResumeSnapshot
        case "stop-snapshot"    => StopSnapshot
      }
    assert(actions == Seq(ExecuteSnapshot))
    val feed = ChangeFeedGen.standardFeed(
      Tables.load(spark, sfDir, "nation"), "nation")
    val reads = feed.filter(col("op") === "r")
    val snap = IncrementalSnapshot.chunked(reads, Seq(col("source.pos")), 8)
    val sink = new MergeSink(Files.createTempDirectory("sigcoord").toString)
    val progress = SnapshotCoordinator.run(snap, sink, actions)
    assert(!progress.aborted && progress.chunksDone.nonEmpty)
    assert(canon(sink.view(spark)) == canon(reads.select(col("after.*"))))
  }

  test("IVF auto-fit sizes cells at sqrt(N) and keeps recall") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = embs.count()
    val (k, centroids) = Ivf.fitCentroidsAuto(embs, "vec_id", "embedding")
    assert(k == Ivf.heuristicK(n) && centroids.size == k)
    // clamps and the sqrt curve
    assert(Ivf.heuristicK(1) == 4)
    assert(Ivf.heuristicK(1000000) == 1000)
    assert(Ivf.heuristicK(Long.MaxValue) == 65536)
    val queries = embs.filter(col("vec_id") % 50 === 0)
    val ivf = Ivf.searchTopK(embs, queries, centroids, k = 5,
      nprobe = math.max(2, k / 4))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, embs, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.count(brute).toDouble / brute.size
    assert(recall >= 0.5, s"auto-fit IVF recall too low: $recall")
  }
}
