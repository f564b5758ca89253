package graft.tools

import org.apache.spark.sql.SparkSession

/** Second-DRIVER test harness for the cross-process commit story: a
  * real Spark session in its own JVM running SQL UPDATEs against a
  * shared sink-catalog root while the spawning spec's driver commits
  * its own epochs to the SAME table. Exercises the whole stack across
  * process boundaries — claim files (O_EXCL create), heartbeats,
  * commitWithRetry rebase on lost epochs, the CAS pointer swap —
  * where `ClaimProcessSpec` covers only the claim primitive.
  *
  * args: <catalogRoot> <kind.table> <n>; prints `PEER_READY` once the
  * session is up and `PEER_DONE` after all n statements committed.
  * Driven by `DmlProcessSpec`.
  */
object DmlRaceWorker {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DmlRaceWorker <root> <kind.table> <n>")
    val (root, tbl, n) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.GraftSparkExtensions].getName)
      .config("spark.sql.catalog.graft_peer",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      .config("spark.sql.catalog.graft_peer.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      println("PEER_READY"); Console.out.flush()
      for (j <- 0 until n) {
        spark.sql(s"UPDATE graft_peer.$tbl SET after.n_name = 'peer-$j' " +
          "WHERE key.n_nationkey = 3")
        println(s"PEER_COMMIT $j"); Console.out.flush()
      }
      println("PEER_DONE"); Console.out.flush()
    } finally spark.stop()
  }
}
