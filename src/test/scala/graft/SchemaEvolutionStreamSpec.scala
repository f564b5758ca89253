package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.SchemaHistory
import graft.operators.SchemaEvolution
import graft.sources.{ChangeFeedGen, Tables}
import graft.streaming.MergeSink

/** Mid-stream schema evolution (SURVEY §7.4.3): the stream restarts on a
  * schema change; batches written under the evolved payload schema merge
  * into pre-evolution state, old rows surfacing the new column as null;
  * the schema history reconstructs the schema as-of any position.
  */
class SchemaEvolutionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  test("evolved batch merges into older state; history tracks the change") {
    val region = Tables.load(spark, sfDir, "region")
    val sink = new MergeSink(Files.createTempDirectory("evo").toString)

    // epoch 0: v1 snapshot
    val v1 = ChangeFeedGen.standardFeed(region, "region")
      .filter(col("op") === "r")
    sink.merge(v1, 0L)

    // schema change at pos 1000: add column r_zone
    val histDir = Files.createTempDirectory("hist").toString
    val hist = SchemaHistory.at(histDir, "region")
    hist.append(1000L, SchemaEvolution.AddColumn("r_zone",
      org.apache.spark.sql.types.StringType))

    // epoch 1: v2 updates carrying the new column at higher positions
    val regionV2 = region
      .withColumn("r_zone", concat(lit("Z"), col("r_regionkey") % 2))
    val v2 = ChangeFeedGen.feed(regionV2, "region",
      regionV2("r_regionkey").cast("long") + 1000L, Map.empty)
      .filter(col("op") === "r")
      .filter(col("key.r_regionkey") % 2 === 0) // only some keys evolve
    sink.merge(v2, 1L)

    val out = sink.view(spark)
    assert(out.columns.contains("r_zone"), "evolved column missing from state")
    val rows = out.select(col("r_regionkey"), col("r_zone")).collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    rows.foreach { case (k, z) =>
      if (k % 2 == 0) assert(z.contains(s"Z${k % 2}"), s"key $k missing zone")
      else assert(z.isEmpty, s"un-evolved key $k should read null zone")
    }

    // history: schema as-of before/after the change
    val base = region.schema
    assert(hist.recover(base, 999L) == base)
    assert(hist.recover(base, 1001L).fieldNames.contains("r_zone"))
  }
}
