package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DML-at-scale probe (r12 verdict item 4): does a SQL UPDATE / MERGE
  * INTO statement's wall time track the STATEMENT size or the TABLE
  * size, per sink kind?
  *
  * Method: build a catalog table of the given orders feed (snapshot
  * epoch only), then time statements whose TOUCHED-ROW COUNT is held
  * ~constant (~1k rows) while the table grows 10× between runs —
  * `ScaleFixture` provides the sf1 fixture. Median-of-3 per statement
  * on a fresh table per rep (epochs would otherwise accumulate LSM
  * deltas and skew later reps). Run once against sf0.1 and once
  * against the scaled fixture:
  *
  *   sbt 'runMain graft.tools.DmlScaleProbe /root/testdata/sf0.1 lsm,full'
  *   sbt 'runMain graft.tools.DmlScaleProbe /tmp/sf1 lsm,full'
  *
  * Expected shape (documented in NOTES): the statement's SCAN side is
  * O(table) for a non-pushable predicate on every kind (inherent — the
  * WHERE must look at the rows); the COMMIT side is O(statement) on
  * lsm (delta append) and O(table) on full (whole-state rewrite), so
  * the kinds' wall-time GAP isolates the rewrite cost.
  */
object DmlScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: DmlScaleProbe <sfDir> [kinds] [reps] [touchedRows]")
    val sfDir = args(0)
    val kinds = if (args.length > 1) args(1).split(",").toSeq
                else Seq("lsm", "full")
    val reps = if (args.length > 2) args(2).toInt else 3
    val touched = if (args.length > 3) args(3).toLong else 1000L
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
    try run(spark, sfDir, kinds, reps, touched) finally spark.stop()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def run(spark: SparkSession, sfDir: String, kinds: Seq[String],
          reps: Int, touched: Long = 1000L): Unit = {
    if (spark.conf.getOption("spark.sql.catalog.graft_dsp").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_dsp",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_dsp.root",
        java.nio.file.Files.createTempDirectory("dsp-cat").toString)
    }
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val feed = graft.sources.ChangeFeedGen.standardFeed(orders, "orders")
      .filter(col("op") === "r").cache()
    val rows = feed.count()
    // a modulus that keeps the touched-row count ~constant (~1k) as the
    // table scales — the statement size is the controlled variable
    val mod = math.max(1L, rows / touched)

    def freshTable(kind: String): String = {
      val name = s"graft_dsp.$kind.orders_" +
        java.util.UUID.randomUUID().toString.take(8)
      feed.writeTo(name).tableProperty("buckets", "64")
        .tableProperty("compactEvery", "1000").create()
      name
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    println(s"# DmlScaleProbe sfDir=$sfDir rows=$rows touched~${rows / mod}")
    // a key the point-UPDATE leg can pin (bucket-pruned scan: the
    // r13 point-lookup path — flat in TABLE size, unlike the
    // non-pushable `%` predicate whose scan half is O(table))
    val pointKey = feed.select(min(col("key.o_orderkey")))
      .head.get(0).toString.toLong
    for (kind <- kinds) {
      val (updT, mrgT, delT, pntT) = (Seq.newBuilder[Double],
        Seq.newBuilder[Double], Seq.newBuilder[Double],
        Seq.newBuilder[Double])
      for (_ <- 1 to reps) {
        val t = freshTable(kind)
        pntT += time(spark.sql(
          s"UPDATE $t SET after.o_orderpriority = 'PNT' " +
            s"WHERE key.o_orderkey = $pointKey").collect())
        updT += time(spark.sql(
          s"UPDATE $t SET after.o_orderpriority = 'DSP' " +
            s"WHERE key.o_orderkey % $mod = 1").collect())
        val v = s"dsp_src_${System.nanoTime()}"
        spark.sql(s"SELECT key.o_orderkey AS k FROM $t " +
          s"WHERE key.o_orderkey % $mod = 2").createOrReplaceTempView(v)
        mrgT += time(spark.sql(
          s"""MERGE INTO $t x USING $v s ON x.key.o_orderkey = s.k
             |WHEN MATCHED THEN UPDATE
             |  SET x.after.o_totalprice = x.after.o_totalprice + 1
             |""".stripMargin).collect())
        delT += time(spark.sql(
          s"DELETE FROM $t WHERE key.o_orderkey % $mod = 3").collect())
        spark.sql(s"DROP TABLE $t")
      }
      def f(b: scala.collection.mutable.Builder[Double, Seq[Double]]) =
        "%.2f".format(median(b.result()))
      println(s"$kind update_s=${f(updT)} merge_s=${f(mrgT)} " +
        s"delete_s=${f(delT)} point_update_s=${f(pntT)} " +
        s"(median of $reps, ~${rows / mod} rows/stmt)")
    }
  }
}
