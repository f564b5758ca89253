package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Self-parity harness: runs each SparkEntry query AND its oracle SQL (which
  * is ANSI enough for Spark too) inside Spark over sf0.001, comparing sorted
  * rows. The driver repeats the same comparison with DuckDB at sf0.01; this
  * spec catches logic drift early and locally.
  */
class OracleParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  def registerTables(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n)
    }

  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val sel = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    sel.collect().map(_.mkString("|")).sorted.toSeq
  }

  test("every oracle-declared query matches its oracle when run in Spark") {
    registerTables()
    val qs = SparkEntry.queries
    val skip = SparkEntry.duckdbOnlyOracles
    SparkEntry.oracleSql.filterNot(kv => skip(kv._1)).foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracleSql entry $name has no query")
      val got = canon(qs(name)(spark, sfDir))
      val want = canon(spark.sql(sql))
      if (got.isEmpty) fail(s"$name returned zero rows")
      if (got != want) {
        val extra = got.diff(want).take(3)
        val missing = want.diff(got).take(3)
        fail(s"$name mismatch: got ${got.size} rows, want ${want.size}; " +
          s"extra=$extra missing=$missing")
      }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries without oracle still run and return rows") {
    registerTables()
    val noOracle = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) ++
      SparkEntry.duckdbOnlyOracles
    noOracle.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name returned zero rows")
    }
  }
}

object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
