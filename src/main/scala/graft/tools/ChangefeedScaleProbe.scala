package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.v2.SinkChanges

/** Changefeed-at-scale probe (r13): does deriving one epoch's
  * `$changes` rows cost O(change rate) or O(table), per sink kind?
  *
  * Method: snapshot the orders feed as epoch 0, commit a ~1k-row
  * update as epoch 1 (touched-row count held ~constant as the table
  * scales — `ScaleFixture` provides the 10× fixture), then time
  * `SinkChanges.changesFor(epoch=1)` and sum the BYTES of the files
  * the derivation actually reads (`DataFrame.inputFiles`). Run against
  * sf0.1 and the scaled fixture:
  *
  *   sbt 'runMain graft.tools.ChangefeedScaleProbe /root/testdata/sf0.1'
  *   sbt 'runMain graft.tools.ChangefeedScaleProbe /tmp/sf1'
  *
  * Kinds: `lsm` (delta dir), `bucketed` (touched-bucket manifest
  * diff), `scd2` (epoch partitions), `full_cf` (the opt-in
  * `changefeed=true` change-delta sidecar) — all epoch-local, expected
  * FLAT in table size — vs `full` (no sidecar: the state-vs-state diff
  * fallback), expected O(table). `merge1_s` times the epoch-1 commit
  * itself, isolating the sidecar's write overhead on `full_cf` vs
  * `full` (expected: batch-sized, dwarfed by the full-state rewrite).
  */
object ChangefeedScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ChangefeedScaleProbe <sfDir> [kinds] [reps] [touchedRows]")
    val sfDir = args(0)
    val kinds = if (args.length > 1) args(1).split(",").toSeq
                else Seq("lsm", "bucketed", "bucketed_cf", "scd2",
                  "scd2_cf", "full_cf", "full")
    val reps = if (args.length > 2) args(2).toInt else 3
    val touched = if (args.length > 3) args(3).toLong else 1000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, kinds, reps, touched) finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
      st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(java.nio.file.Files.delete(_))
    }

  def run(spark: SparkSession, sfDir: String, kinds: Seq[String],
          reps: Int, touched: Long): Unit = {
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
      .filter(col("op") === "r").cache()
    val rows = feed.count()
    val mod = math.max(1L, rows / touched)
    // epoch 1: a fixed ~1k-row slice, positions past the snapshot's
    val epoch1 = feed.filter(col("key.o_orderkey") % mod === 1)
      .withColumn("op", lit("u"))
      .withColumn("source", struct(
        (col("source.pos") + 1000000000L).as("pos")))
    println(s"# ChangefeedScaleProbe sfDir=$sfDir rows=$rows " +
      s"touched~${rows / mod} reps=$reps")
    for (k <- kinds) {
      val (kind, props) = k match {
        case "full_cf" => ("full", Map("changefeed" -> "true"))
        case cf if cf.endsWith("_cf") => (cf.stripSuffix("_cf"),
          Map("buckets" -> "64", "compactEvery" -> "1000",
            "changefeed" -> "true"))
        case other => (other,
          Map("buckets" -> "64", "compactEvery" -> "1000"))
      }
      val (mrgT, cfT) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      var feedRows = 0L
      var readMb = 0.0
      for (_ <- 1 to reps) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"cfsp-$k").toString
        val sink = graft.sinks.v2.GraftSinkCatalog.sinkFor(kind, dir, props)
        sink.merge(feed, 0L)
        val t0 = System.nanoTime()
        sink.merge(epoch1, 1L)
        mrgT += (System.nanoTime() - t0) / 1e9
        val cf = SinkChanges.changesFor(spark, kind, dir, props,
          epoch = 1L, prev = Some(0L))
        val t1 = System.nanoTime()
        feedRows = cf.count()
        cfT += (System.nanoTime() - t1) / 1e9
        readMb = cf.inputFiles.map(f => java.nio.file.Files.size(
          java.nio.file.Paths.get(f.stripPrefix("file:")))).sum / 1e6
        deleteRecursively(java.nio.file.Paths.get(dir))
      }
      println(f"$k%-8s merge1_s=${median(mrgT.result())}%.2f " +
        f"changes_s=${median(cfT.result())}%.2f read_mb=$readMb%.1f " +
        s"feed_rows=$feedRows")
    }
  }
}
