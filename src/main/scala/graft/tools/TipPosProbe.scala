package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Statement-latency-vs-delta-count probe (r15): is a point DML
  * statement's wall time FLAT in the table's outstanding file count?
  *
  * Before the `.maxpos` commit sidecar, every DML statement resolved
  * its merge position via `tipPos` = parquet footer opens over EVERY
  * manifest-referenced file — O(#files) driver metadata I/O that grows
  * with the outstanding delta count on an LSM table (measured as the
  * dominant term of point UPDATE latency at high delta counts). With
  * the sidecar the resolution is ONE tiny file read, so the latency
  * must stay flat as deltas accumulate.
  *
  * Method: lsm table with compaction OFF (`compactEvery` huge), append
  * batches of tiny single-key epochs to grow the delta count past 100,
  * and time a bucket-pruned point UPDATE (median of `reps`) at each
  * level.
  *
  *   sbt 'runMain graft.tools.TipPosProbe /root/testdata/sf0.01'
  */
object TipPosProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TipPosProbe <sfDir> [levels] [reps]")
    val sfDir = args(0)
    val levels = if (args.length > 1) args(1).toInt else 4
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions",
        classOf[graft.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, levels, reps) finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def run(spark: SparkSession, sfDir: String, levels: Int,
          reps: Int): Unit = {
    if (spark.conf.getOption("spark.sql.catalog.graft_tpp").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_tpp",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_tpp.root",
        java.nio.file.Files.createTempDirectory("tpp-cat").toString)
    }
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
      .filter(col("op") === "r").cache()
    val rows = feed.count()
    val tbl = "graft_tpp.lsm.orders_tpp"
    feed.writeTo(tbl).tableProperty("buckets", "64")
      .tableProperty("compactEvery", "100000").create()
    val keys = feed.select(col("key.o_orderkey")).limit(200)
      .collect().map(_.get(0).toString.toLong)
    val sink = graft.sinks.v2.GraftSinkCatalog.sinkFor("lsm",
      spark.conf.get("spark.sql.catalog.graft_tpp.root") + "/lsm/orders_tpp",
      Map("buckets" -> "64", "compactEvery" -> "100000"))
        .asInstanceOf[graft.streaming.LsmMergeSink]
    println(s"# TipPosProbe sfDir=$sfDir rows=$rows (lsm, compaction off)")
    var ki = 0
    for (level <- 0 until levels) {
      // grow the outstanding delta count with tiny single-key epochs
      // (each a full commit: claim, delta write, manifest, swap)
      if (level > 0) {
        for (_ <- 1 to 40) {
          ki += 1
          spark.sql(s"UPDATE $tbl SET after.o_orderpriority = 'G$ki' " +
            s"WHERE key.o_orderkey = ${keys(ki % 100)}")
        }
      }
      val times = (1 to reps).map { r =>
        val k = keys(100 + ((level * reps + r) % 100))
        val t0 = System.nanoTime()
        spark.sql(s"UPDATE $tbl SET after.o_orderpriority = 'P$level$r' " +
          s"WHERE key.o_orderkey = $k").collect()
        (System.nanoTime() - t0) / 1e9
      }
      val deltas = sink.manifest.deltas.size
      println(f"deltas=$deltas%4d point_update_s=${median(times)}%.2f " +
        f"(median of $reps)")
    }
  }
}
