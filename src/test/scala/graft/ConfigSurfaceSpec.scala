package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Snapshotter
import graft.operators.{CustomConverter, CustomConverterRegistry, Materialize, TypeHandling}
import graft.sources.ChangeFeedGen

/** Type-handling modes, CustomConverter SPI, snapshot-mode SPI matrix and
  * tombstone semantics (VERDICT r1 "what's missing" items 1-4).
  */
class ConfigSurfaceSpec extends AnyFunSuite {
  import TypeHandling._
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def sampleEnvelope() = {
    import spark.implicits._
    val df = Seq((1L, BigDecimal("12.34"), "abc"))
      .toDF("id", "dec", "s")
      .select(col("id"), col("dec").cast("decimal(10,2)").as("dec"),
        col("s").cast("binary").as("bin"),
        to_timestamp(lit("2024-03-01 12:00:00")).as("ts"),
        to_date(lit("2024-03-01")).as("d"))
    ChangeFeedGen.feed(df, "t", df("id"), Map.empty, Some(Seq("id")))
      .filter(col("op") === "r")
  }

  test("decimal handling modes: precise keeps decimal, double/string convert") {
    val fd = sampleEnvelope()
    val precise = convertEnvelope(fd, Config()).select(col("after.dec")).first()
    assert(precise.getDecimal(0).toPlainString == "12.34")
    val dbl = convertEnvelope(fd, Config(decimalMode = DecimalMode.AsDouble))
      .select(col("after.dec")).first()
    assert(dbl.getDouble(0) == 12.34)
    val str = convertEnvelope(fd, Config(decimalMode = DecimalMode.AsString))
      .select(col("after.dec")).first()
    assert(str.getString(0) == "12.34")
  }

  test("time precision modes: adaptive=µs, connect=ms, dates=epoch days") {
    val fd = sampleEnvelope()
    val us = convertEnvelope(fd, Config(timePrecision = TimePrecisionMode.Adaptive))
      .select(col("after.ts"), col("after.d")).first()
    val ms = convertEnvelope(fd, Config(timePrecision = TimePrecisionMode.Connect))
      .select(col("after.ts")).first()
    assert(us.getLong(0) == ms.getLong(0) * 1000, "adaptive µs == connect ms × 1000")
    assert(us.getInt(1) == java.time.LocalDate.of(2024, 3, 1).toEpochDay.toInt)
  }

  test("binary handling modes: base64 and hex renderings") {
    val fd = sampleEnvelope()
    val b64 = convertEnvelope(fd, Config(binaryMode = BinaryMode.Base64))
      .select(col("after.bin")).first().getString(0)
    assert(b64 == java.util.Base64.getEncoder.encodeToString("abc".getBytes))
    val hx = convertEnvelope(fd, Config(binaryMode = BinaryMode.Hex))
      .select(col("after.bin")).first().getString(0)
    assert(hx == "616263".toUpperCase)
  }

  test("type handling preserves a delete's null after-image") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val fd = ChangeFeedGen.standardFeed(df, "orders")
    val converted = convertEnvelope(fd,
      Config(timePrecision = TimePrecisionMode.Connect))
    assert(converted.filter(col("op") === "d" && col("after").isNotNull)
      .isEmpty, "delete after-image must stay null through conversion")
  }

  test("custom converter: table-scoped, first registration wins, others untouched") {
    val upper = new CustomConverter {
      def converterFor(table: String, field: StructField) =
        if (table == "t" && field.name == "s") Some((c: org.apache.spark.sql.Column) => upper1(c)) else None
      private def upper1(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.upper(c)
    }
    val lower = new CustomConverter {
      def converterFor(table: String, field: StructField) =
        if (field.name == "s") Some((c: org.apache.spark.sql.Column) => org.apache.spark.sql.functions.lower(c)) else None
    }
    import spark.implicits._
    val df = Seq((1L, "MiXeD")).toDF("id", "s")
    val fd = ChangeFeedGen.feed(df, "t", df("id"), Map.empty, Some(Seq("id")))
      .filter(col("op") === "r")
    val reg = new CustomConverterRegistry(Seq(upper, lower))
    assert(reg.convertEnvelope(fd, "t").select(col("after.s")).first()
      .getString(0) == "MIXED", "first matching converter wins")
    assert(reg.convertEnvelope(fd, "other").select(col("after.s")).first()
      .getString(0) == "mixed", "table scoping falls through to next converter")
    assert(reg.convertEnvelope(fd, "t").select(col("after.id")).first()
      .getLong(0) == 1L, "unconverted columns pass through")
  }

  test("snapshotter decision matrix (ref snapshot.mode impls)") {
    import Snapshotter._
    // (mode, offsetsExist, snapshotComplete) -> (data?, stream?)
    val matrix = Seq(
      (Initial, false, false, true, true),
      (Initial, true, false, true, true),
      (Initial, true, true, false, true),
      (InitialOnly, false, false, true, false),
      (InitialOnly, true, true, false, false),
      (Always, true, true, true, true),
      (NoData, false, false, false, true),
      (WhenNeeded, true, true, false, true),
      (WhenNeeded, false, true, true, true),
      (WhenNeeded, true, false, true, true),
      (Recovery, true, true, false, true))
    matrix.foreach { case (m, oe, sc, wantData, wantStream) =>
      assert(m.shouldSnapshotData(oe, sc) == wantData,
        s"${m.name}($oe,$sc) data")
      assert(m.shouldStream == wantStream, s"${m.name} stream")
    }
    assert(Recovery.shouldSnapshotSchema(true, true), "recovery rebuilds schema")
    assert(NoData.shouldSnapshotSchema(true, true))
    val cfg = ConfigurationBased(snapshotData = false, snapshotSchema = true,
      stream = false)
    assert(!cfg.shouldSnapshotData(false, false))
    assert(cfg.shouldSnapshotSchema(false, false))
    assert(!cfg.shouldStream)
  }

  test("enforceRecordSize fail mode aborts on oversize, passes small records") {
    import graft.operators.Transforms
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val fd = ChangeFeedGen.standardFeed(df, "orders")
    // generous cap: nothing oversize, fail mode passes everything through
    assert(Transforms.enforceRecordSize(fd, 10000, mode = "fail").count() ==
      fd.count())
    // tight cap: drop filters, fail throws
    val dropped = Transforms.enforceRecordSize(fd, 40).count()
    assert(dropped < fd.count())
    val e = intercept[Exception] {
      Transforms.enforceRecordSize(fd, 40, mode = "fail").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("record exceeds")), messages(e))
  }

  test("document schema inference extracts typed fields without a declared schema") {
    import graft.operators.Transforms
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val out = Transforms.extractDocumentInferred(events, "props")
      .select(col("event_id"), col("__doc.k").as("k"))
    assert(out.schema("k").dataType ==
      org.apache.spark.sql.types.LongType, "inferred k as integral")
    assert(out.filter(col("k").isNull).isEmpty, "every doc has k")
  }

  test("DDL parser: CREATE/ALTER subset onto the SchemaChange model") {
    import graft.model.DdlParser
    import graft.model.DdlParser.{AlterTable, CreateTable}
    import graft.operators.SchemaEvolution.{AddColumn, DropColumn, WidenColumn}
    import org.apache.spark.sql.types._
    DdlParser.parse(
      """CREATE TABLE IF NOT EXISTS db.s.t (
        | `id` BIGINT NOT NULL,
        | "name" VARCHAR(64) DEFAULT 'x',
        | price DECIMAL(10, 2),
        | ts TIMESTAMP(6),
        | payload BLOB,
        | PRIMARY KEY (id))""".stripMargin) match {
      case CreateTable(tid, schema) =>
        assert(tid.toString == "db.s.t")
        assert(schema == StructType(Seq(
          StructField("id", LongType), StructField("name", StringType),
          StructField("price", DecimalType(10, 2)),
          StructField("ts", TimestampType),
          StructField("payload", BinaryType))))
      case other => fail(s"expected CreateTable, got $other")
    }
    DdlParser.parse(
      "ALTER TABLE t ADD COLUMN a INT, DROP b, MODIFY c DOUBLE") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(AddColumn("a", IntegerType), DropColumn("b"),
          WidenColumn("c", DoubleType)))
      case other => fail(s"expected AlterTable, got $other")
    }
    import graft.model.DdlParser.{DropTable, RenameTable, TruncateTable}
    import graft.operators.SchemaEvolution.RenameColumn
    assert(DdlParser.parse("DROP TABLE IF EXISTS db.t") ==
      DropTable(graft.model.Envelope.TableId.parse("db.t")))
    assert(DdlParser.parse("TRUNCATE TABLE db.t") ==
      TruncateTable(graft.model.Envelope.TableId.parse("db.t")))
    assert(DdlParser.parse("RENAME TABLE t TO u") ==
      DdlParser.parse("ALTER TABLE t RENAME TO u"))
    DdlParser.parse("ALTER TABLE t RENAME TO u") match {
      case RenameTable(from, to) =>
        assert(from.table == "t" && to.table == "u")
      case other => fail(s"expected RenameTable, got $other")
    }
    DdlParser.parse(
      "ALTER TABLE t RENAME COLUMN a TO b, CHANGE COLUMN c d BIGINT," +
        " CHANGE e e BIGINT") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(RenameColumn("a", "b"), RenameColumn("c", "d"),
          WidenColumn("e", LongType)))
      case other => fail(s"expected AlterTable, got $other")
    }
    assertThrows[IllegalArgumentException] {
      DdlParser.parse("GRANT SELECT ON t TO role")
    }
  }

  test("DDL parser: real-world MySQL forms — table options, unsigned, " +
    "enum, position markers, index actions ignored") {
    import graft.model.DdlParser
    import graft.model.DdlParser.{AlterTable, CreateTable}
    import graft.operators.SchemaEvolution.{AddColumn, DropColumn, WidenColumn}
    import org.apache.spark.sql.types._
    // trailing table options after the column list (every mysqldump emits these)
    DdlParser.parse(
      """CREATE TABLE inventory.orders (
        | id INT UNSIGNED NOT NULL AUTO_INCREMENT,
        | qty BIGINT UNSIGNED,
        | flag TINYINT(1) DEFAULT 1,
        | status ENUM('open','closed') NOT NULL,
        | note MEDIUMTEXT CHARACTER SET utf8mb4 COLLATE utf8mb4_bin,
        | t TIME,
        | yr YEAR,
        | b BIT(1),
        | mask BIT(8),
        | updated DATETIME ON UPDATE CURRENT_TIMESTAMP,
        | PRIMARY KEY (id),
        | KEY idx_status (status)
        |) ENGINE=InnoDB AUTO_INCREMENT=17 DEFAULT CHARSET=utf8mb4""".stripMargin) match {
      case CreateTable(tid, schema) =>
        assert(tid.table == "orders")
        assert(schema == StructType(Seq(
          StructField("id", LongType),          // INT UNSIGNED promotes
          StructField("qty", DecimalType(20, 0)), // BIGINT UNSIGNED
          StructField("flag", BooleanType),     // TINYINT(1) convention
          StructField("status", StringType),
          StructField("note", StringType),
          StructField("t", LongType),           // µs-time INT64
          StructField("yr", IntegerType),
          StructField("b", BooleanType),
          StructField("mask", BinaryType),
          StructField("updated", TimestampType))))
        assert(DdlParser.primaryKeyOf(
          "CREATE TABLE t (id INT, PRIMARY KEY (id))") == Seq("id"))
      case other => fail(s"expected CreateTable, got $other")
    }
    // index/constraint/hint actions parse-and-drop; position markers strip
    DdlParser.parse(
      "ALTER TABLE t ADD COLUMN c INT UNSIGNED AFTER b, ADD INDEX idx_c (c)," +
        " DROP INDEX idx_old, ALTER COLUMN d SET DEFAULT 5," +
        " ALGORITHM=INPLACE, LOCK=NONE, ADD COLUMN e TEXT FIRST") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(AddColumn("c", LongType), AddColumn("e", StringType)))
      case other => fail(s"expected AlterTable, got $other")
    }
    // MySQL parenthesized multi-add
    DdlParser.parse("ALTER TABLE t ADD (x INT, y VARCHAR(4) NOT NULL)") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(AddColumn("x", IntegerType), AddColumn("y", StringType)))
      case other => fail(s"expected AlterTable, got $other")
    }
    // generated column body never parses as a type
    DdlParser.parse("ALTER TABLE t ADD g INT AS (a + b) STORED, DROP h") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(AddColumn("g", IntegerType), DropColumn("h")))
      case other => fail(s"expected AlterTable, got $other")
    }
    // JSON type survives the ON-UPDATE stop token (word boundary)
    DdlParser.parse("ALTER TABLE t MODIFY j JSON") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(WidenColumn("j", StringType)))
      case other => fail(s"expected AlterTable, got $other")
    }
  }

  test("DDL parser: Oracle dialect — quoted owner.name pairs, NUMBER " +
    "ladder, paren MODIFY/DROP groups") {
    import graft.model.DdlParser
    import graft.model.DdlParser.{AlterTable, CreateTable}
    import graft.operators.SchemaEvolution.{AddColumn, DropColumn, WidenColumn}
    import org.apache.spark.sql.types._
    // the statement LogMiner actually emits for an ADD
    DdlParser.parse(
      "ALTER TABLE \"ORA\".\"PRODUCTS\" ADD (\"STOCK\" NUMBER(10,0), " +
        "\"TAG\" VARCHAR2(64))") match {
      case AlterTable(tid, changes) =>
        assert(tid.schema == "ORA" && tid.table == "PRODUCTS",
          "quoted owner.name must split into schema/table, not strip one " +
            "outer quote pair")
        assert(changes == Seq(AddColumn("STOCK", LongType),
          AddColumn("TAG", StringType)))
      case other => fail(s"expected AlterTable, got $other")
    }
    // paren MODIFY and paren DROP (Oracle multi-column forms)
    DdlParser.parse(
      "ALTER TABLE \"ORA\".\"T\" MODIFY (\"P\" NUMBER(12,2))") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(WidenColumn("P", DecimalType(12, 2))))
      case other => fail(s"expected AlterTable, got $other")
    }
    DdlParser.parse("ALTER TABLE \"ORA\".\"T\" DROP (\"A\", \"B\")") match {
      case AlterTable(_, changes) =>
        assert(changes == Seq(DropColumn("A"), DropColumn("B")))
      case other => fail(s"expected AlterTable, got $other")
    }
    // CREATE with the Oracle type family and a per-column PRIMARY KEY
    val createSql =
      "CREATE TABLE \"ORA\".\"RATINGS\" (\"ID\" NUMBER(9,0) PRIMARY KEY, " +
        "\"W\" NUMBER(3,0), \"BIGN\" NUMBER(19,0), \"F\" BINARY_FLOAT, " +
        "\"SCORE\" BINARY_DOUBLE, \"ANY\" NUMBER, \"R\" RAW(16), " +
        "\"NM\" NVARCHAR2(10), \"NEG\" NUMBER(5,-2))"
    DdlParser.parse(createSql) match {
      case CreateTable(tid, schema) =>
        assert(tid.schema == "ORA" && tid.table == "RATINGS")
        assert(schema == StructType(Seq(
          StructField("ID", IntegerType),     // NUMBER(9,0) → INT32
          StructField("W", ShortType),        // NUMBER(3,0) → INT16
          StructField("BIGN", DecimalType(19, 0)), // p>18 stays decimal
          StructField("F", FloatType),
          StructField("SCORE", DoubleType),
          StructField("ANY", DoubleType),     // variable-scale NUMBER
          StructField("R", BinaryType),
          StructField("NM", StringType),
          StructField("NEG", IntegerType)))) // negative scale = integral
        assert(DdlParser.primaryKeyOf(createSql) == Seq("ID"))
      case other => fail(s"expected CreateTable, got $other")
    }
  }

  test("interval handling: numeric replays MicroDuration, string the ISO form") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, 2, 3, 4, 5, 6, 780000),  // P1Y2M3DT4H5M6.78S
      (2L, 0, 0, 0, 0, 0, 0, 0),       // zero interval — every component printed
      (3L, 0, 0, 1, 0, 0, 30, 500000)) // trailing-zero strip: 30.5
      .toDF("id", "y", "mo", "d", "h", "mi", "s", "us")
    val out = df.select(col("id"),
      intervalMicros(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s"), col("us")).as("n"),
      intervalIso(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s"), col("us")).as("iso"))
      .orderBy("id").collect()
    // reference arithmetic (MicroDuration.durationMicros, avg=365.25/12)
    def ref(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int, us: Int): Long = {
      val days = (y * 12 + mo) * (365.25 / 12.0) + d
      val secs = ((days * 24 + h) * 60 + mi) * 60 + s
      (secs * 1e6 + us).toLong
    }
    assert(out(0).getLong(1) == ref(1, 2, 3, 4, 5, 6, 780000))
    assert(out(0).getString(2) == "P1Y2M3DT4H5M6.78S")
    assert(out(1).getLong(1) == 0L)
    assert(out(1).getString(2) == "P0Y0M0DT0H0M0S")
    assert(out(2).getString(2) == "P0Y0M1DT0H0M30.5S")
  }

  test("hstore handling: map parses pairs, json renders the object") {
    import spark.implicits._
    val df = Seq((1L, "\"a\"=>\"x\", \"b\"=>\"2\"")).toDF("id", "hs")
    val got = df.select(
      element_at(hstoreToMap(col("hs")), "a").as("a"),
      element_at(hstoreToMap(col("hs")), "b").as("b"),
      hstoreToJson(col("hs")).as("j")).head()
    assert(got.getString(0) == "x" && got.getString(1) == "2")
    assert(got.getString(2) == """{"a":"x","b":"2"}""")
  }

  test("hstore handling: NULL values preserved, escaped quotes unescaped") {
    import spark.implicits._
    // PG renders a null value as unquoted NULL, and escapes quotes and
    // backslashes inside keys/values (ref convertHstoreToMap keeps nulls)
    val df = Seq((1L, """"a"=>NULL, "b\"q"=>"x\\y", "c"=>"NULL""""))
      .toDF("id", "hs")
    val m = df.select(hstoreToMap(col("hs")).as("m")).head()
      .getMap[String, String](0)
    assert(m.contains("a") && m("a") == null,
      "unquoted NULL must map to a null value")
    assert(m("""b"q""") == """x\y""",
      "escapes inside keys/values must unescape")
    assert(m("c") == "NULL", "quoted \"NULL\" stays the literal string")
  }

  test("unsigned handling: long keeps the wrapped image, precise adds 2^64") {
    import spark.implicits._
    val df = Seq(5L, -3L).toDF("u64")
    val got = df.select(col("u64"),
      unsignedAsLong(col("u64")).as("l"),
      unsignedAsPrecise(col("u64")).as("p")).orderBy(col("u64").desc).collect()
    assert(got(0).getLong(1) == 5L &&
      got(0).getDecimal(2) == new java.math.BigDecimal(5))
    // -3 as u64 = 2^64 - 3 = 18446744073709551613
    assert(got(1).getLong(1) == -3L &&
      got(1).getDecimal(2) ==
        new java.math.BigDecimal("18446744073709551613"))
  }

  test("money handling: precise rescales HALF_UP, double/string derive") {
    import spark.implicits._
    val df = Seq("1.0050", "2.3449", "7.9999").toDF("s")
      .select(col("s").cast(DecimalType(20, 4)).as("m"))
    val got = df.select(
      moneyPrecise(col("m")).as("p"),
      moneyDouble(col("m")).as("d"),
      moneyString(col("m")).as("str")).orderBy("p").collect()
    // .0050 is a tie — HALF_UP rounds away from zero
    assert(got(0).getDecimal(0) == new java.math.BigDecimal("1.01"))
    assert(got(1).getDecimal(0) == new java.math.BigDecimal("2.34"))
    assert(got(2).getDecimal(0) == new java.math.BigDecimal("8.00"))
    assert(got(0).getDouble(1) == 1.005)
    assert(got(0).getString(2) == "1.01")
    // non-default money.fraction.digits
    val d4 = df.select(moneyString(col("m"), 3).as("s3")).orderBy("s3").head()
    assert(d4.getString(0) == "1.005")
  }

  test("tombstones: emitted after deletes, ignored by materialization") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val plain = ChangeFeedGen.standardFeed(df, "orders")
    val withTombs = ChangeFeedGen.standardFeed(df, "orders",
      tombstonesOnDelete = true)
    val tombs = withTombs.filter(col("op") === "x")
    val nDeletes = plain.filter(col("op") === "d").count()
    assert(tombs.count() == nDeletes, "one tombstone per delete")
    assert(tombs.filter(col("before").isNotNull || col("after").isNotNull)
      .isEmpty, "tombstones carry only the key")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(d.columns.sorted.map(col): _*).collect()
        .map(_.mkString("|")).sorted.toSeq
    assert(canon(Materialize.latestState(withTombs)) ==
      canon(Materialize.latestState(plain)),
      "tombstones must not change materialized state")
  }
}
