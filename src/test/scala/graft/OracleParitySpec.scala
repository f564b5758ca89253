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

  /** Driver-hash-safe output envelope: DECIMAL columns are banned from
    * verified query outputs. The driver's typed hash canonicalizes Spark
    * decimal128 differently from DuckDB's decimal→float64 pandas
    * conversion (and values > 2^53 can never round-trip through float64),
    * so a DecimalType output is a guaranteed hash mismatch even when the
    * values are bit-exact. Engine-level decimal semantics stay pinned in
    * ConfigSurfaceSpec; query OUTPUTS render decimals as strings.
    */
  def assertNoDecimal(name: String, dt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType =>
        fail(s"$name output schema contains DecimalType — render it as " +
          "STRING (or unscaled BIGINT + scale INT) for the driver hash")
      case s: StructType => s.fields.foreach(f => assertNoDecimal(name, f.dataType))
      case a: ArrayType => assertNoDecimal(name, a.elementType)
      case m: MapType =>
        assertNoDecimal(name, m.keyType); assertNoDecimal(name, m.valueType)
      case _ =>
    }
  }

  test("every oracle-declared query matches its oracle when run in Spark") {
    registerTables()
    val qs = SparkEntry.queries
    val skip = SparkEntry.duckdbOnlyOracles
    SparkEntry.oracleSql.filterNot(kv => skip(kv._1)).foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracleSql entry $name has no query")
      val df = qs(name)(spark, sfDir)
      assertNoDecimal(name, df.schema)
      val got = canon(df)
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
      val df = SparkEntry.queries(name)(spark, sfDir)
      assertNoDecimal(name, df.schema)
      val n = df.count()
      assert(n > 0, s"$name returned zero rows")
    }
  }
}

object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftSparkExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
