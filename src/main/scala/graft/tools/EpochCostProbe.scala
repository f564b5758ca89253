package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-epoch fixed-cost breakdown (r15, the sf0.1 apply-rate gap): how
  * much of a small epoch's wall time is the SINK (claims, manifest,
  * pointer, sidecars) vs the bare Spark job (reduce + parquet write of
  * the same batch, no commit machinery)? The residual gap between the
  * two and the streaming probe's per-epoch time is Spark's own
  * micro-batch scheduling + checkpoint I/O.
  *
  *   sbt 'runMain graft.tools.EpochCostProbe /root/testdata/sf0.1'
  */
object EpochCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir) finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String): Unit = {
    val epochs = 10
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
    // stage one ~1/epochs slice as a PARQUET FILE and re-read it, so
    // each timed merge consumes a frozen batch (no recompute skew)
    val staged = Files.createTempDirectory("ecp-slice").toString
    feed.limit(feed.count().toInt / epochs).write
      .mode("overwrite").parquet(staged)
    val batch = spark.read.parquet(staged)
    val rows = batch.count()

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    // A) bare Spark job grid: the same reduce + clustered parquet write
    // the LSM delta append runs, minus every piece of commit machinery,
    // across write-task counts and bucket counts (what is the floor
    // actually made of — task scheduling, sort, or file count?)
    var bareMed = Double.NaN
    for (buckets <- Seq(16, 64); tasks <- Seq(2, 4, 8, 16, 32)) {
      val bareT = (1 to epochs).map { i =>
        val out = Files.createTempDirectory(s"ecp-bare$i").toString
        val t0 = System.nanoTime()
        graft.operators.Materialize.reduceToBuckets(batch, buckets, tasks)
          .write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .partitionBy("_bucket").parquet(out)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"bare buckets=$buckets%3d tasks=$tasks%2d " +
        f"job_s=${med(bareT)}%.3f min=${bareT.min}%.3f")
      if (buckets == 64 && tasks == 32) bareMed = med(bareT)
    }
    println(f"# EpochCostProbe rows=$rows bare_job_s=$bareMed%.3f " +
      f"(median of $epochs)")

    // B) full sink merge: same batch as consecutive epochs
    val dir = Files.createTempDirectory("ecp-lsm").toString
    val sink = new graft.streaming.LsmMergeSink(dir, buckets = 64,
      compactEvery = 4)
    val mergeT = (0 until epochs).map { e =>
      val t0 = System.nanoTime()
      sink.merge(batch, e.toLong)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"lsm merge_s=${med(mergeT)}%.3f min=${mergeT.min}%.3f " +
      f"max=${mergeT.max}%.3f sink_overhead_s=${med(mergeT) - bareMed}%.3f")
    println("per-epoch merge times: " +
      mergeT.map(t => f"$t%.2f").mkString(" "))
  }
}
