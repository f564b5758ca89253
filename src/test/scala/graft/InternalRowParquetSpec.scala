package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.v2.InternalRowParquet

/** The DML staging writer (sinks/v2/InternalRowParquet): InternalRows
  * written with the parquet Group API must round-trip BIT-EXACTLY
  * through `spark.read.parquet` — the staged files are what the
  * row-level DML commit reads back as the epoch's change rows.
  */
class InternalRowParquetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def roundTrip(df: org.apache.spark.sql.DataFrame): Unit = {
    val schema = df.schema
    val dir = Files.createTempDirectory("stage").toString
    val conf = InternalRowParquet.shippableConf(
      spark.sessionState.newHadoopConf())
    // the executor-side path: one staged file per partition, written
    // from the partition's InternalRows, only paths back to the driver
    val paths = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val w = InternalRowParquet.open(s"$dir/part-$pid.parquet", schema, conf)
        try it.foreach(w.write) finally w.close()
        Iterator.single(w.path)
      }
    }.collect()
    assert(paths.nonEmpty)
    val back = spark.read.schema(schema).parquet(dir)
    // Row.toString renders byte arrays by identity — canonicalize them
    def canon(r: Row): String =
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq.toString
        case x => String.valueOf(x)
      }.mkString("|")
    val a = df.collect().map(canon).sorted
    val b = back.collect().map(canon).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("full scalar type gamut round-trips") {
    val df = spark.range(100).select(
      col("id"),
      (col("id") % 2 === 0).as("b"),
      col("id").cast("int").as("i"),
      col("id").cast("smallint").as("s"),
      col("id").cast("tinyint").as("y"),
      (col("id") * 1.5).cast("float").as("f"),
      (col("id") * 2.25).as("d"),
      concat(lit("s-"), col("id")).as("str"),
      encode(concat(lit("b-"), col("id")), "utf-8").as("bin"),
      (col("id") * 100 + 0.07).cast("decimal(12,2)").as("dec2"),
      (col("id") * 1e10).cast("decimal(38,4)").as("decBig"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("id").cast("int")).as("dt"),
      timestamp_micros(col("id") * 1000000L + 123456L).as("ts"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id")).as("nl"))
    roundTrip(df)
  }

  test("nested structs, arrays, maps round-trip") {
    val df = spark.range(50).select(
      col("id"),
      struct(col("id").as("a"),
        struct(concat(lit("n"), col("id")).as("deep"),
          (col("id") * 0.5).cast("decimal(10,3)").as("dd")).as("inner"),
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("x"), col("id"))).as("ns")).as("st"),
      array(col("id"), col("id") + 1,
        when(col("id") % 4 === 0, lit(null).cast("long"))
          .otherwise(col("id") + 2)).as("arr"),
      array(struct(col("id").as("k"), lit("v").as("v"))).as("arrst"),
      map(concat(lit("k"), col("id")), col("id") * 2,
          lit("fixed"), col("id")).as("m"),
      when(col("id") % 5 === 0, lit(null).cast("array<bigint>"))
        .otherwise(array(col("id"))).as("narr"))
    roundTrip(df)
  }

  test("empty arrays/maps and all-null rows round-trip") {
    val df = spark.range(10).select(
      col("id"),
      when(col("id") % 2 === 0, array().cast("array<string>"))
        .otherwise(lit(null).cast("array<string>")).as("ea"),
      lit(null).cast("map<string,bigint>").as("nm"),
      lit(null).cast("struct<a:bigint,b:string>").as("nst"))
    roundTrip(df)
  }

  test("decimal byte widths are minimal and sign-correct") {
    assert(InternalRowParquet.decimalBytes(1) == 1)
    assert(InternalRowParquet.decimalBytes(2) == 1)
    assert(InternalRowParquet.decimalBytes(3) == 2)
    assert(InternalRowParquet.decimalBytes(9) == 4)
    assert(InternalRowParquet.decimalBytes(18) == 8)
    assert(InternalRowParquet.decimalBytes(38) == 16)
    // negative values: sign extension must survive the round trip
    val rows = java.util.Arrays.asList(
      Row(BigDecimal("-12345.67").bigDecimal),
      Row(BigDecimal("0.01").bigDecimal),
      Row(BigDecimal("-0.01").bigDecimal),
      Row(BigDecimal("9999999999.99").bigDecimal),
      Row(BigDecimal("-9999999999.99").bigDecimal),
      Row(null))
    val df = spark.createDataFrame(rows,
      StructType(Seq(StructField("v", DecimalType(12, 2)))))
    roundTrip(df)
  }
}
