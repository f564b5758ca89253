package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sink family's commit machinery rides the Hadoop FileSystem API
  * (graft.streaming.SinkFs) — manifests, version listings, the atomic
  * CURRENT swap, commit-ts/.ddl sidecars, the `_floor`, and EpochClaim
  * claim files — so a sink root can be any Hadoop path (`file:`,
  * `hdfs://`, an object store with a connector), not just the driver's
  * local disk. Pinned here by driving the FULL lifecycle — CREATE →
  * append → SQL DML → `$changes` → time travel → CALL vacuum — through
  * an EXPLICIT `file:` URI root: every path the machinery touches then
  * carries a scheme, so any code still assuming `java.nio` local paths
  * fails loudly rather than silently resolving against the working dir.
  */
class SinkFsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def envBatch(markers: (Int, String, String)*): DataFrame = {
    import spark.implicits._
    markers.toSeq.toDF("k", "name", "o").select(
      struct(col("k").as("n_nationkey")).as("key"),
      lit(null).cast("struct<n_nationkey:int,n_name:string>").as("before"),
      when(col("o") === "d", lit(null)
        .cast("struct<n_nationkey:int,n_name:string>"))
        .otherwise(struct(col("k").as("n_nationkey"),
          col("name").as("n_name"))).as("after"),
      col("o").as("op"),
      struct((col("k") + 100000).cast("long").as("pos")).as("source"),
      lit(null).cast("string").as("transaction"),
      (col("k") + 100000).cast("long").as("ts_ms"))
  }

  private lazy val (cat, localRoot) = {
    val local = Files.createTempDirectory("sinkfs-cat").toString
    val c = "graft_fsuri"
    spark.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sinks.v2.GraftSinkCatalog].getName)
    // the point of the suite: a scheme-qualified Hadoop URI root
    spark.conf.set(s"spark.sql.catalog.$c.root", s"file://$local")
    (c, local)
  }

  for (kind <- Seq("full", "bucketed", "lsm", "scd2")) {
    test(s"$kind: create -> append -> DML -> $$changes -> time travel -> " +
        "vacuum, all through a file: URI sink root") {
      val name = s"t_" + java.util.UUID.randomUUID().toString.take(8)
      val tbl = s"$cat.$kind.$name"
      val props = Map("buckets" -> "4", "changefeed" -> "true")

      // CREATE (snapshot epoch 0): commit machinery writes manifests /
      // versions / CURRENT under the URI root
      val w = envBatch((1 to 10).map(k => (k, s"n$k", "r")): _*).writeTo(tbl)
      props.foldLeft(w) { case (w, (k, v)) => w.tableProperty(k, v) }.create()
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$localRoot/$kind/$name/CURRENT")),
        "the URI root must resolve to the same local directory")
      assert(spark.table(tbl).count() == 10)

      // append epoch 1 (explicit epoch: the replay-guard path)
      envBatch((3, "u3", "u")).withColumn("source",
        struct(lit(900000L).as("pos")))
        .writeTo(tbl).option("epoch", "1").append()
      assert(spark.sql(s"SELECT after.n_name FROM $tbl " +
        "WHERE key.n_nationkey = 3 AND op <> 'd'")
        .head.getString(0) == "u3")

      // SQL DML (default-epoch commitWithRetry path, epoch 2)
      spark.sql(s"UPDATE $tbl SET after.n_name = 'dml5' " +
        "WHERE key.n_nationkey = 5")
      assert(spark.sql(s"SELECT after.n_name FROM $tbl " +
        "WHERE key.n_nationkey = 5 AND op <> 'd'")
        .head.getString(0) == "dml5")

      // $changes: snapshot + both increments (sidecars under the URI root)
      val feed = spark.table(s"$cat.$kind.`$name$$changes`")
      val epochs = feed.select("epoch").collect().map(_.getLong(0))
      assert(epochs.count(_ == 0L) == 10 && epochs.count(_ > 0L) >= 2,
        s"$kind feed epochs: ${epochs.toSeq.sorted}")

      // time travel to the pre-DML epoch
      assert(spark.sql(s"SELECT after.n_name FROM $tbl VERSION AS OF 1 " +
        "WHERE key.n_nationkey = 5 AND op <> 'd'").head.getString(0) == "n5")

      // DELETE tombstones a key as a fresh epoch
      spark.sql(s"DELETE FROM $tbl WHERE key.n_nationkey = 7")
      assert(spark.sql(s"SELECT count(*) FROM $tbl " +
        "WHERE key.n_nationkey = 7 AND op <> 'd'").head.getLong(0) == 0L)

      // CALL vacuum runs the maintenance path through the URI root
      val removed = spark.sql(
        s"CALL $cat.system.vacuum(table => '$kind.$name')").collect()
      assert(removed.length == 1 && removed(0).getInt(0) >= 0)
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE op <> 'd'")
        .head.getLong(0) == 9L, s"$kind: post-vacuum read changed")
    }
  }

  test("point lookups and rename work through the URI root") {
    val name = s"t_" + java.util.UUID.randomUUID().toString.take(8)
    val tbl = s"$cat.bucketed.$name"
    envBatch((1 to 20).map(k => (k, s"n$k", "r")): _*).writeTo(tbl)
      .tableProperty("buckets", "4").create()
    assert(spark.sql(s"SELECT after.n_name FROM $tbl " +
      "WHERE key.n_nationkey = 11 AND op <> 'd'").head.getString(0) == "n11")
    spark.sql(s"ALTER TABLE $tbl RENAME TO bucketed.${name}_r")
    assert(spark.table(s"$cat.bucketed.${name}_r").count() == 20)
    assert(spark.catalog.tableExists(s"$cat.bucketed.${name}_r"))
  }
}
