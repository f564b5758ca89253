package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming APPLY-RATE probe (r14): can each MERGE sink kind apply a
  * streamed change feed at least as fast as the synthetic generator
  * produces it? BASELINE.md names this as the derived streaming
  * target — "sustained apply-rate ≥ the generator rate at sf0.1 with
  * the MERGE sink, measured via `StreamingQueryProgress`" — and until
  * r14 it had never been committed as a number.
  *
  * Method: stage the orders change feed as `epochs` single-file parquet
  * slices (timing that production = the GENERATOR rate), then stream
  * them through a real Structured Streaming file source
  * (`maxFilesPerTrigger=1`, AvailableNow) into `foreachBatch →
  * sink.merge(batch, epochId)` and read per-epoch `numInputRows` /
  * `triggerExecution` off the query's `recentProgress` — the sustained
  * apply rate is the MEDIAN epoch's, so one warm-up or compaction epoch
  * doesn't define the number.
  *
  *   sbt 'runMain graft.tools.ApplyRateProbe /root/testdata/sf0.1'
  *   sbt 'runMain graft.tools.ApplyRateProbe /tmp/sf1'   # 10x fixture
  *
  * 4th arg `filesPerTrigger` (default 1) sets `maxFilesPerTrigger` —
  * the Spark-native epoch-sizing lever (the reference's own batching
  * is arrival-sized: max.batch.size=2048 over a 500 ms poll, never
  * one-transport-file-per-trigger). At small SFs the per-micro-batch
  * fixed floor dominates slice-sized epochs (BASELINE.md breakdown);
  * doubling the epoch is the documented Delta-style knob, measured
  * here as an explicit A/B, not silently substituted for the
  * one-file number.
  */
object ApplyRateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ApplyRateProbe <sfDir> [kinds] [epochs] [filesPerTrigger]")
    val sfDir = args(0)
    val kinds = if (args.length > 1) args(1).split(",").toSeq
                else Seq("full", "bucketed", "lsm", "scd2")
    val epochs = if (args.length > 2) args(2).toInt else 10
    val filesPerTrigger = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, kinds, epochs, filesPerTrigger)
    finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def run(spark: SparkSession, sfDir: String, kinds: Seq[String],
          epochs: Int, filesPerTrigger: Int = 1): Unit = {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
      .cache()
    val rows = feed.count()

    // GENERATOR: produce the feed as `epochs` single-file slices, timed
    // — this is the rate the transport is fed at, the bar the sinks
    // must clear (an apply rate below it means unbounded backlog).
    // Slices are POSITION RANGES, not key-hash groups: epochs replay in
    // commit order, so later epochs genuinely UPDATE keys written by
    // earlier ones — the cross-epoch merge cost (prev-bucket reads,
    // open-row closure) a real streaming arrival pays. A key-hash slice
    // would put each key's whole history in one epoch and understate it.
    val stage = Files.createTempDirectory("aprobe-stage").toString
    val t0 = System.nanoTime()
    val Array(posMin, posMax) = feed
      .agg(min(col("source.pos")), max(col("source.pos")))
      .head().toSeq.map(_.toString.toLong).toArray
    val span = math.max(1L, posMax - posMin + 1L)
    val sliceOf = floor((col("source.pos") - posMin) * epochs / span)
      .cast("long")
    for (e <- 0 until epochs) {
      val tmp = Files.createTempDirectory(s"aprobe-slice$e").toString
      feed.filter(sliceOf === e)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(stage, f"epoch-$e%03d.parquet"))
    }
    val genS = (System.nanoTime() - t0) / 1e9
    // batch order must follow the intended epoch order (file source
    // admits by mtime with nondeterministic ties)
    graft.streaming.StreamingMaterialize.stampLogOrder(stage)
    println(s"# ApplyRateProbe sfDir=$sfDir rows=$rows epochs=$epochs " +
      s"filesPerTrigger=$filesPerTrigger " +
      f"gen_s=$genS%.1f gen_rows_per_s=${rows / genS}%.0f")

    val feedSchema = feed.schema
    for (kind <- kinds) {
      // the ENGINE'S OWN sizing, not a fixed override: bucket count from
      // CdcSink.heuristicBuckets (file count is the dominant term of a
      // small epoch's write floor — measured in EpochCostProbe: 64
      // buckets cost ~1.35x the job time of 16 at 18k-row epochs) and
      // the default compaction cadence
      val props = Map("buckets" ->
        graft.streaming.CdcSink.heuristicBuckets(rows).toString)
      val dir = Files.createTempDirectory(s"aprobe-$kind").toString
      val ckpt = Files.createTempDirectory(s"aprobe-ck-$kind").toString
      val sink = graft.sinks.v2.GraftSinkCatalog.sinkFor(kind, dir, props)
      val t1 = System.nanoTime()
      val q = spark.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", filesPerTrigger.toString)
        .parquet(stage)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.merge(b, id): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wallS = (System.nanoTime() - t1) / 1e9
      val progs = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val perEpoch = progs.map(p => p.numInputRows.toDouble /
        (p.durationMs.get("triggerExecution").toDouble / 1000.0))
      val applied = progs.map(_.numInputRows).sum
      val sustained = median(perEpoch)
      println(f"$kind%-9s applied=$applied " +
        f"sustained_rows_per_s=$sustained%.0f " +
        f"min=${perEpoch.min}%.0f max=${perEpoch.max}%.0f " +
        f"wall_s=$wallS%.1f vs_gen=${sustained / (rows / genS)}%.2fx")
      deleteRecursively(Paths.get(dir))
      deleteRecursively(Paths.get(ckpt))
    }
    deleteRecursively(Paths.get(stage))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
      st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(java.nio.file.Files.delete(_))
    }
}
