package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Materialize
import graft.sinks.{JdbcChangeEventSink => Sink, SqlDialects}
import graft.sources.{ChangeFeedGen, Tables}

/** §3.3 JDBC sink: live Derby execution of the configured consume path
  * (insert/upsert/update modes, delete.enabled, reduction buffer, basic
  * schema evolution) and the reference dialect statement shapes.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  private def url() =
    s"jdbc:derby:${Files.createTempDirectory("jdbc-sink")}/db;create=true"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq
  }

  lazy val feed = ChangeFeedGen.standardFeed(
    Tables.load(spark, sfDir, "supplier"), "supplier").cache()

  test("upsert + delete.enabled materializes exactly the latest state") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "primary.key.mode" -> "record_key",
      "schema.evolution" -> "basic"))
    Sink.write(feed, "supplier_sink", cfg, numPartitions = 4)
    val got = Sink.readTable(spark, u, "supplier_sink")
    assert(canon(got) == canon(Materialize.latestState(feed)))
  }

  test("reduction buffer produces the same terminal state") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "primary.key.mode" -> "record_key",
      "schema.evolution" -> "basic",
      "use.reduction.buffer" -> "true"))
    Sink.write(feed, "supplier_red", cfg, numPartitions = 4)
    assert(canon(Sink.readTable(spark, u, "supplier_red")) ==
      canon(Materialize.latestState(feed)))
  }

  test("insert mode with primary.key.mode=none appends every row event") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "insert",
      "primary.key.mode" -> "none",
      "schema.evolution" -> "basic"))
    val rowEvents = feed.filter(col("op").isin("r", "c", "u"))
    Sink.write(rowEvents, "supplier_log", cfg, numPartitions = 4)
    assert(Sink.readTable(spark, u, "supplier_log").count() == rowEvents.count())
  }

  test("update mode never creates rows; delete.enabled=false ignores deletes") {
    val u = url()
    // seed with the snapshot only
    Sink.write(feed.filter(col("op") === "r"), "supplier_upd", Sink.fromProps(Map(
      "connection.url" -> u, "insert.mode" -> "insert",
      "primary.key.mode" -> "record_key", "schema.evolution" -> "basic")),
      numPartitions = 4)
    // apply updates + deletes in update mode with deletes disabled
    Sink.write(feed.filter(col("op").isin("u", "d")), "supplier_upd",
      Sink.fromProps(Map(
        "connection.url" -> u, "insert.mode" -> "update",
        "primary.key.mode" -> "record_key", "schema.evolution" -> "basic")),
      numPartitions = 4)
    val got = Sink.readTable(spark, u, "supplier_upd")
    // every key still present (no deletes applied), update images applied
    val want = Materialize.latestState(
      feed.filter(col("op").isin("r", "u")))
    assert(canon(got) == canon(want))
  }

  test("schema.evolution=basic adds missing target columns via ALTER") {
    val u = url()
    val narrow = feed.withColumn("after",
        struct(col("after.s_suppkey").as("s_suppkey"), col("after.s_name").as("s_name")))
      .withColumn("before",
        struct(col("before.s_suppkey").as("s_suppkey"), col("before.s_name").as("s_name")))
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u, "insert.mode" -> "upsert",
      "primary.key.mode" -> "record_key", "schema.evolution" -> "basic",
      "delete.enabled" -> "true"))
    Sink.write(narrow, "supplier_evo", cfg, numPartitions = 2)
    assert(Sink.readTable(spark, u, "supplier_evo").columns.length == 2)
    // evolved payload: the full supplier row set flows into the same table
    Sink.write(feed, "supplier_evo", cfg, numPartitions = 2)
    val got = Sink.readTable(spark, u, "supplier_evo")
    assert(got.columns.map(_.toLowerCase).toSet ==
      Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    assert(canon(got) == canon(Materialize.latestState(feed)))
    // schema.evolution=none refuses a widened payload against a narrow table
    val u2 = url()
    Sink.write(narrow, "supplier_evo2", cfg.copy(url = u2), numPartitions = 2)
    intercept[IllegalStateException] {
      Sink.write(feed, "supplier_evo2",
        cfg.copy(url = u2, schemaEvolution = "none"), numPartitions = 2)
    }
  }

  test("dialect upsert statements match the reference shapes") {
    val k = Seq("id"); val v = Seq("name", "score")
    assert(SqlDialects.Postgres.upsert("t", k, v) ==
      "INSERT INTO t (id,name,score) VALUES (?,?,?) ON CONFLICT (id) " +
        "DO UPDATE SET name=EXCLUDED.name,score=EXCLUDED.score")
    assert(SqlDialects.Postgres.upsert("t", k, Nil) ==
      "INSERT INTO t (id) VALUES (?) ON CONFLICT (id) DO NOTHING")
    assert(SqlDialects.MySql.upsert("t", k, v) ==
      "INSERT INTO t (id, name, score) VALUES (?, ?, ?) AS new " +
        "ON DUPLICATE KEY UPDATE name=new.name,score=new.score")
    assert(SqlDialects.SqlServer.upsert("t", k, v) ==
      "MERGE INTO t WITH (HOLDLOCK) AS TARGET USING " +
        "(SELECT ? AS id, ? AS name, ? AS score) AS INCOMING ON (TARGET.id=INCOMING.id)" +
        " WHEN MATCHED THEN UPDATE SET name=INCOMING.name,score=INCOMING.score" +
        " WHEN NOT MATCHED THEN INSERT (name, score, id) " +
        "VALUES (INCOMING.name,INCOMING.score,INCOMING.id);")
    assert(SqlDialects.Oracle.upsert("t", k, v) ==
      "MERGE INTO t USING (SELECT ? id, ? name, ? score FROM dual) INCOMING " +
        "ON (t.id=INCOMING.id)" +
        " WHEN MATCHED THEN UPDATE SET t.name=INCOMING.name,t.score=INCOMING.score" +
        " WHEN NOT MATCHED THEN INSERT (name,score,id) " +
        "VALUES (INCOMING.name,INCOMING.score,INCOMING.id)")
    // shared kinds (GeneralDatabaseDialect.java:355-415)
    assert(SqlDialects.Postgres.insert("t", k, v) ==
      "INSERT INTO t (id, name, score) VALUES (?, ?, ?)")
    assert(SqlDialects.Postgres.update("t", k, v) ==
      "UPDATE t SET name=?, score=? WHERE id=?")
    assert(SqlDialects.Postgres.delete("t", k) == "DELETE FROM t WHERE id=?")
    // quoting styles
    assert(SqlDialects.MySql.quote("a") == "`a`")
    assert(SqlDialects.SqlServer.quote("a") == "[a]")
    assert(SqlDialects.Postgres.quote("a") == "\"a\"")
  }

  test("extended dialect family matches the reference shapes") {
    val k = Seq("id"); val v = Seq("name", "score")
    // Db2 LUW: qualified SET, non-key-first INSERT branch
    // (Db2DatabaseDialect.java:143-170)
    assert(SqlDialects.Db2.upsert("t", k, v) ==
      "merge into t using (values(?,?,?)) as DAT(id,name,score) on t.id=DAT.id" +
        " WHEN MATCHED THEN UPDATE SET t.name=DAT.name, t.score=DAT.score" +
        " WHEN NOT MATCHED THEN INSERT(name,score,id)" +
        " values (DAT.name,DAT.score,DAT.id)")
    // key-only record: no WHEN MATCHED branch at all
    assert(SqlDialects.Db2.upsert("t", k, Nil) ==
      "merge into t using (values(?)) as DAT(id) on t.id=DAT.id" +
        " WHEN NOT MATCHED THEN INSERT(id) values (DAT.id)")
    // Db2 for i: TGT alias in ON, UNqualified SET, sysdummy1 projection
    // (Db2iDatabaseDialect.java:193-234)
    assert(SqlDialects.Db2i.upsert("t", k, v) ==
      "merge into t as TGT using (select ? as id,? as name,? as score" +
        " from sysibm.sysdummy1) as DAT on TGT.id=DAT.id" +
        " WHEN MATCHED THEN UPDATE SET name=DAT.name, score=DAT.score" +
        " WHEN NOT MATCHED THEN INSERT(name,score,id)" +
        " values (DAT.name,DAT.score,DAT.id)")
    // MariaDB keeps the pre-8.0.20 VALUES() form
    // (MariaDbDatabaseDialect.java:65-91); SingleStore inherits it
    assert(SqlDialects.MariaDb.upsert("t", k, v) ==
      "INSERT INTO t (id, name, score) VALUES (?, ?, ?)" +
        " ON DUPLICATE KEY UPDATE name=VALUES(name),score=VALUES(score)")
    assert(SqlDialects.SingleStore.upsert("t", k, v) ==
      SqlDialects.MariaDb.upsert("t", k, v))
    // CockroachDB statement shapes ARE Postgres'
    // (CockroachDBDatabaseDialect.java:32)
    assert(SqlDialects.CockroachDb.upsert("t", k, v) ==
      SqlDialects.Postgres.upsert("t", k, v))
    // StarRocks: upsert is a plain INSERT against a PRIMARY KEY table;
    // create orders keys first and hangs PK/DISTRIBUTED BY outside the
    // column list (StarRocksDatabaseDialect.java:224-313)
    assert(SqlDialects.StarRocks.upsert("t", k, v) ==
      SqlDialects.StarRocks.insert("t", k, v))
    assert(SqlDialects.StarRocks.createTable("t",
      Seq(("name", "STRING", true), ("id", "BIGINT", false),
        ("score", "DOUBLE", true)), k) ==
      "CREATE TABLE t (id BIGINT NOT NULL, name STRING NULL, score DOUBLE NULL)" +
        " PRIMARY KEY (id) DISTRIBUTED BY HASH (id)")
    // every dialect resolves by name (the sink's `dialect` property)
    Seq("postgres", "mysql", "sqlserver", "oracle", "derby", "db2", "db2i",
      "mariadb", "cockroachdb", "singlestore", "starrocks").foreach { n =>
      assert(SqlDialects.forName(n).name == n)
    }
  }

  test("field filters: exclude wins, topic-scoped entries, default include") {
    import graft.sinks.FieldFilters
    val none = FieldFilters.forLists("", "")
    assert(none("t", "anything"))
    // bare and topic-scoped entries in one exclude list
    val ex = FieldFilters.forLists("ignored", "orders:secret, phone")
    assert(!ex("orders", "secret"))
    assert(ex("customer", "secret"), "topic-scoped entry must not leak")
    assert(!ex("orders", "phone") && !ex("customer", "phone"))
    assert(ex("orders", "name"))
    // include list: only listed fields pass
    val in = FieldFilters.forLists("orders:id, name", "")
    assert(in("orders", "id") && in("anything", "name"))
    assert(!in("customer", "id") && !in("orders", "other"))
    // reference trims whitespace around entries and matches
    assert(!FieldFilters.forLists("", " a : b ")("a", "b"))
  }

  test("record_value keys come from the VALUE, not the key struct") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "primary.key.mode" -> "record_value",
      "primary.key.fields" -> "s_suppkey",
      "schema.evolution" -> "basic"))
    Sink.write(feed, "supplier_rv", cfg, numPartitions = 4)
    assert(canon(Sink.readTable(spark, u, "supplier_rv")) ==
      canon(Materialize.latestState(feed)))
  }

  test("reduction buffer with primary.key.mode=none is rejected") {
    val cfg = Sink.fromProps(Map(
      "connection.url" -> url(),
      "insert.mode" -> "insert",
      "primary.key.mode" -> "none",
      "schema.evolution" -> "basic",
      "use.reduction.buffer" -> "true"))
    intercept[IllegalArgumentException] {
      Sink.write(feed, "supplier_bad", cfg)
    }
  }

  test("mysql multi-column ALTER is one parenthesized group") {
    assert(SqlDialects.MySql.alterAddColumns("t",
      Seq(("a", "INT", true), ("b", "BIGINT", false))) ==
      "ALTER TABLE t ADD COLUMN (a INT NULL, b BIGINT NOT NULL)")
  }

  test("truncate is a barrier: only post-truncate events survive") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "truncate.enabled" -> "true",
      "primary.key.mode" -> "record_key",
      "schema.evolution" -> "basic"))
    // truncate positioned between the snapshot reads and the stream
    val maxReadPos = feed.filter(col("op") === "r")
      .agg(max(col("source.pos"))).head.getLong(0)
    val tEvent = feed.limit(1).select(
      col("key"), col("before"), col("after"),
      lit("t").as("op"),
      col("source").withField("pos", lit(maxReadPos + 1)).as("source"),
      col("transaction"), col("ts_ms"))
    Sink.write(feed.unionAll(tEvent), "supplier_tr", cfg, numPartitions = 4)
    // expected: snapshot wiped; only the u/d stream (pos > truncate) applied
    val want = feed.filter(col("source.pos") > maxReadPos + 1 &&
      col("op") === "u").select(col("after.*"))
    assert(canon(Sink.readTable(spark, u, "supplier_tr")) == canon(want))
  }

  test("quote.identifiers quotes DDL and DML end-to-end on Derby") {
    val u = url()
    val cfg = Sink.fromProps(Map(
      "connection.url" -> u,
      "insert.mode" -> "upsert",
      "delete.enabled" -> "true",
      "primary.key.mode" -> "record_key",
      "schema.evolution" -> "basic",
      "quote.identifiers" -> "true"))
    Sink.write(feed, "supplier_q", cfg, numPartitions = 4)
    // quoted create keeps the exact-case (lowercase) table name
    val got = Sink.readTable(spark, u, "\"supplier_q\"")
    assert(canon(got) == canon(Materialize.latestState(feed)))
  }
}
