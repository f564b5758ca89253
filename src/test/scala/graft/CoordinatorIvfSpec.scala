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
