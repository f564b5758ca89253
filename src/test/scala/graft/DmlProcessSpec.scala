package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TWO REAL SPARK DRIVERS committing to the SAME sink-catalog table —
  * the full cross-process commit stack (claim files via O_EXCL,
  * heartbeats, commitWithRetry rebase, CAS pointer swap), where
  * `ClaimProcessSpec` isolates the claim primitive and
  * `SinkConcurrencySpec` races writers inside ONE JVM. The invariant
  * is the same lost-epoch assertion: every commit from BOTH drivers
  * gets its own epoch; nothing is silently dropped or overwritten.
  *
  * Reference analog: multiple Connect workers against one sink table,
  * serialized by task ownership + DB transactions
  * (`JdbcChangeEventSink.java`); lakehouse analog: two Delta/Iceberg
  * drivers optimistically committing to one table.
  */
class DmlProcessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def envBatch(markers: (Int, String)*): DataFrame = {
    import spark.implicits._
    markers.toSeq.toDF("k", "name").select(
      struct(col("k").as("n_nationkey")).as("key"),
      lit(null).cast("struct<n_nationkey:int,n_name:string>").as("before"),
      struct(col("k").as("n_nationkey"), col("name").as("n_name"))
        .as("after"),
      lit("c").as("op"),
      struct((col("k") + 100000).cast("long").as("pos")).as("source"),
      lit(null).cast("string").as("transaction"),
      (col("k") + 100000).cast("long").as("ts_ms"))
  }

  /** Child classpath + the JDK17 add-opens a bare SparkSession needs
    * (same derivation as ClaimProcessSpec, same list as build.sbt).
    */
  private def childCmd(rootArgs: Seq[String]): java.util.List[String] = {
    def locOf(c: Class[_]) = java.nio.file.Paths.get(
      c.getProtectionDomain.getCodeSource.getLocation.toURI)
    val cp = s"${locOf(graft.streaming.SinkFs.getClass)}" +
      s"${java.io.File.pathSeparator}" +
      s"${locOf(classOf[org.apache.spark.sql.SparkSession]).getParent}/*"
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val opens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    import scala.jdk.CollectionConverters._
    ((javaBin +: opens) ++ Seq("-Xmx2g", "-cp", cp,
      "graft.tools.DmlRaceWorker") ++ rootArgs).asJava
  }

  test("two Spark drivers (separate JVMs) committing to one table: " +
      "every commit from both gets its own epoch — no epoch is ever " +
      "lost across process boundaries") {
    val root = Files.createTempDirectory("xproc-dml").toString
    val cat = "graft_xdml"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sinks.v2.GraftSinkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    } else spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val name = "race_" + java.util.UUID.randomUUID().toString.take(8)
    val tbl = s"$cat.lsm.$name"
    envBatch((1 to 10).map(k => (k, s"n$k")): _*).writeTo(tbl)
      .tableProperty("buckets", "4").create()

    val peerN = 4
    val peerLog = Files.createTempFile("xproc-dml-peer", ".log").toFile
    val proc = new ProcessBuilder(childCmd(
      Seq(root, s"lsm.$name", peerN.toString)))
      .redirectErrorStream(true)
      .redirectOutput(peerLog)
      .start()
    def peerOut: String =
      try Files.readString(peerLog.toPath) catch { case _: Exception => "" }
    def waitFor(marker: String, timeoutMs: Long): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!peerOut.contains(marker)) {
        assert(System.currentTimeMillis() < deadline,
          s"peer never printed $marker; peer output tail:\n" +
            peerOut.takeRight(4000))
        Thread.sleep(200)
      }
    }
    try {
      waitFor("PEER_READY", 120000)
      // OUR driver appends new keys while the peer UPDATEs key 3 —
      // both resolve default epochs against the same live tip
      val ourN = 6
      for (i <- 0 until ourN)
        envBatch(1000 + i -> s"ins-$i").writeTo(tbl).append()
      waitFor("PEER_DONE", 240000)
      assert(proc.waitFor(60, TimeUnit.SECONDS) && proc.exitValue() == 0,
        s"peer failed:\n${peerOut.takeRight(4000)}")

      // every append landed
      val inserted = spark.sql(s"SELECT key.n_nationkey FROM $tbl " +
        s"WHERE key.n_nationkey >= 1000 AND op <> 'd'")
        .collect().map(_.getInt(0)).toSet
      assert(inserted == (1000 until 1000 + ourN).toSet,
        s"lost appends: ${(1000 until 1000 + ourN).toSet -- inserted}")
      // the peer's LAST update is the visible value for key 3
      assert(spark.sql(s"SELECT after.n_name FROM $tbl " +
        "WHERE key.n_nationkey = 3").head.getString(0) ==
        s"peer-${peerN - 1}")
      // THE lost-epoch assertion across processes: 1 create + ourN +
      // peerN commits each took their own epoch
      val sink = graft.sinks.v2.GraftSinkCatalog.sinkFor("lsm",
        s"$root/lsm/$name", Map("buckets" -> "4"))
      assert(sink.committedEpoch.contains((ourN + peerN).toLong),
        s"expected ${ourN + peerN} committed epochs, " +
          s"got ${sink.committedEpoch}")
    } finally { proc.destroyForcibly(): Unit }
  }
}
