package graft.sinks

import org.apache.spark.sql.types._

/** Per-target SQL generation for the JDBC sink (SURVEY §3.3; reference
  * `debezium-connector-jdbc/src/main/java/io/debezium/connector/jdbc/dialect/
  * DatabaseDialect.java` + `GeneralDatabaseDialect.java:261-415` and the
  * per-database subclasses). A dialect renders the five DML statement kinds
  * (insert / upsert / update / delete / truncate) plus DDL (create table,
  * alter-add-columns) with `?` parameter bindings, and maps Spark column
  * types to target column types — the Spark analogue of the reference's
  * `type/` registry keyed by Connect schemas.
  *
  * Statement SHAPES mirror the reference dialects exactly (each cited
  * below); they are pinned row-by-row in the `k_jdbc_sink_dialects` oracle.
  */
trait SqlDialect {
  def name: String

  /** Identifier quoting (ref `GeneralDatabaseDialect.toIdentifier`). */
  def quote(id: String): String = "\"" + id + "\""

  def quoteIfRequested(id: String, enabled: Boolean): String =
    if (enabled) quote(id) else id

  /** Spark type → target column type (ref dialect `type/` registries). */
  def sqlType(dt: DataType): String = dt match {
    case BooleanType          => "BOOLEAN"
    case ByteType             => "SMALLINT"
    case ShortType            => "SMALLINT"
    case IntegerType          => "INTEGER"
    case LongType             => "BIGINT"
    case FloatType            => "REAL"
    case DoubleType           => "DOUBLE PRECISION"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case StringType           => "TEXT"
    case BinaryType           => "BLOB"
    case DateType             => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case other => throw new IllegalArgumentException(
      s"$name: unmapped Spark type $other")
  }

  // --- DML (ref GeneralDatabaseDialect.java:355-415) ---

  def insert(table: String, key: Seq[String], nonKey: Seq[String]): String =
    s"INSERT INTO $table (${(key ++ nonKey).mkString(", ")}) VALUES (" +
      (key ++ nonKey).map(_ => "?").mkString(", ") + ")"

  def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String

  def update(table: String, key: Seq[String], nonKey: Seq[String]): String =
    s"UPDATE $table SET ${nonKey.map(c => s"$c=?").mkString(", ")}" +
      (if (key.isEmpty) "" else s" WHERE ${key.map(c => s"$c=?").mkString(" AND ")}")

  def delete(table: String, key: Seq[String]): String =
    s"DELETE FROM $table" +
      (if (key.isEmpty) "" else s" WHERE ${key.map(c => s"$c=?").mkString(" AND ")}")

  def truncate(table: String): String = s"TRUNCATE TABLE $table"

  // --- DDL (ref GeneralDatabaseDialect.java:261-352) ---

  /** Whether the dialect accepts an explicit `NULL` column constraint
    * (Derby only allows omitting it).
    */
  protected def explicitNull: Boolean = true
  protected def nullConstraint(nullable: Boolean): String =
    if (!nullable) " NOT NULL" else if (explicitNull) " NULL" else ""

  def createTable(table: String, columns: Seq[(String, String, Boolean)],
                  pk: Seq[String]): String = {
    val cols = columns.map { case (n, t, nullable) =>
      s"$n $t" + nullConstraint(nullable && !pk.contains(n))
    }
    val pkClause = if (pk.isEmpty) "" else s", PRIMARY KEY(${pk.mkString(",")})"
    s"CREATE TABLE $table (${cols.mkString(", ")}$pkClause)"
  }

  /** ref getAlterTablePrefix/getAlterTableColumnPrefix — dialect-varying. */
  protected def alterColumnPrefix: String = "ADD "
  protected def alterSuffix: String = ""

  def alterAddColumns(table: String, columns: Seq[(String, String, Boolean)]): String =
    s"ALTER TABLE $table " + columns.map { case (n, t, nullable) =>
      s"$alterColumnPrefix$n $t" + nullConstraint(nullable)
    }.mkString(", ") + alterSuffix

  /** Executable ALTER batch — most targets take one multi-column ALTER
    * (ref `getAlterTableStatement`); Derby needs one statement per column.
    */
  def alterStatements(table: String, columns: Seq[(String, String, Boolean)]): Seq[String] =
    Seq(alterAddColumns(table, columns))
}

object SqlDialects {

  /** PostgreSQL (ref `dialect/postgres/PostgresDatabaseDialect.java:102-123`):
    * INSERT … ON CONFLICT (keys) DO UPDATE SET c=EXCLUDED.c, or DO NOTHING
    * when the record is key-only.
    */
  object Postgres extends SqlDialect {
    val name = "postgres"
    override protected def alterColumnPrefix = "ADD COLUMN "
    override def sqlType(dt: DataType): String = dt match {
      case BinaryType => "BYTEA"
      case DoubleType => "double precision"
      case other      => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val head = s"INSERT INTO $table (${(key ++ nonKey).mkString(",")}) VALUES (" +
        (key ++ nonKey).map(_ => "?").mkString(",") + s") ON CONFLICT (${key.mkString(",")})"
      if (nonKey.isEmpty) s"$head DO NOTHING"
      else s"$head DO UPDATE SET ${nonKey.map(c => s"$c=EXCLUDED.$c").mkString(",")}"
    }

    /** Multi-row batch INSERT via UNNEST (the reference's
      * `postgres.unnest.insert` mode, `PostgresDatabaseDialect
      * .getBatchInsertStatement`): ONE `?::type[]` placeholder per
      * COLUMN, each bound as a SQL array — the SQL text is identical at
      * every batch size, so the server plans it once, and a 10k-row
      * batch ships as |columns| array binds instead of 10k row binds.
      * Columns arrive as (name, pg type) pairs because the array cast
      * needs the element type.
      */
    def unnestInsert(table: String, key: Seq[(String, String)],
                     nonKey: Seq[(String, String)]): String = {
      val cols = key ++ nonKey
      s"INSERT INTO $table (${cols.map(_._1).mkString(",")}) " +
        "SELECT * FROM UNNEST(" +
        cols.map { case (_, t) => s"?::$t[]" }.mkString(",") + ")"
    }

    /** The UNNEST batch form of [[upsert]] (`getBatchUpsertStatement`):
      * batch insert + the same ON CONFLICT tail, DO NOTHING for
      * key-only records.
      */
    def unnestUpsert(table: String, key: Seq[(String, String)],
                     nonKey: Seq[(String, String)]): String = {
      val head = unnestInsert(table, key, nonKey) +
        s" ON CONFLICT (${key.map(_._1).mkString(",")})"
      if (nonKey.isEmpty) s"$head DO NOTHING"
      else s"$head DO UPDATE SET " +
        nonKey.map { case (c, _) => s"$c=EXCLUDED.$c" }.mkString(",")
    }
  }

  /** MySQL ≥ 8.0.20 (ref `dialect/mysql/MySqlDatabaseDialect.java:199-231`):
    * INSERT … AS new ON DUPLICATE KEY UPDATE c=new.c (the post-8.0.20 alias
    * form; key-only records update their own keys, as the reference does).
    */
  object MySql extends SqlDialect {
    val name = "mysql"
    override def quote(id: String): String = s"`$id`"
    /** MySQL's multi-add form is ONE parenthesized group:
      * `ADD COLUMN (a INT NULL, b INT NULL)` — a per-column prefix with
      * a single closing paren would be malformed for 2+ columns.
      */
    override def alterAddColumns(table: String,
                                 columns: Seq[(String, String, Boolean)]): String =
      s"ALTER TABLE $table ADD COLUMN (" + columns.map {
        case (n, t, nullable) => s"$n $t" + nullConstraint(nullable)
      }.mkString(", ") + ")"
    override def sqlType(dt: DataType): String = dt match {
      case StringType => "LONGTEXT"
      case DoubleType => "DOUBLE"
      case other      => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val updateCols = if (nonKey.isEmpty) key else nonKey
      s"INSERT INTO $table (${(key ++ nonKey).mkString(", ")}) VALUES (" +
        (key ++ nonKey).map(_ => "?").mkString(", ") + ") AS new ON DUPLICATE KEY UPDATE " +
        updateCols.map(c => s"$c=new.$c").mkString(",")
    }
  }

  /** SQL Server (ref `dialect/sqlserver/SqlServerDatabaseDialect.java:
    * 134-166`): MERGE WITH (HOLDLOCK) against an INCOMING projection,
    * semicolon-terminated.
    */
  object SqlServer extends SqlDialect {
    val name = "sqlserver"
    override def quote(id: String): String = s"[$id]"
    override def sqlType(dt: DataType): String = dt match {
      case BooleanType => "BIT"
      case StringType  => "NVARCHAR(MAX)"
      case BinaryType  => "VARBINARY(MAX)"
      case DoubleType  => "FLOAT"
      case TimestampType | TimestampNTZType => "DATETIME2"
      case other => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val incoming = (key ++ nonKey).map(c => s"? AS $c").mkString(", ")
      val on = key.map(c => s"TARGET.$c=INCOMING.$c").mkString(" AND ")
      val matched =
        if (nonKey.isEmpty) ""
        else s" WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"$c=INCOMING.$c").mkString(",")}"
      val insCols = (nonKey ++ key).mkString(", ")
      val insVals = (nonKey ++ key).map(c => s"INCOMING.$c").mkString(",")
      s"MERGE INTO $table WITH (HOLDLOCK) AS TARGET USING (SELECT $incoming) AS INCOMING ON ($on)" +
        matched + s" WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals);"
    }

    /** `sqlserver.identity.insert` (reference `SqlServerDatabaseDialect
      * .wrapWithIdentityInsert`): bracket the statement with
      * SET IDENTITY_INSERT ON/OFF so explicit values land in identity
      * key columns.
      */
    def identityInsertWrap(table: String, sql: String): String =
      s"SET IDENTITY_INSERT $table ON ;$sql;SET IDENTITY_INSERT $table OFF ;"
  }

  /** Oracle (ref `dialect/oracle/OracleDatabaseDialect.java:113-134`):
    * MERGE against a `SELECT … FROM dual` INCOMING projection.
    */
  object Oracle extends SqlDialect {
    val name = "oracle"
    override def sqlType(dt: DataType): String = dt match {
      case StringType  => "CLOB"
      case LongType    => "NUMBER(19)"
      case IntegerType => "NUMBER(10)"
      case DoubleType  => "BINARY_DOUBLE"
      case other       => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val incoming = (key ++ nonKey).map(c => s"? $c").mkString(", ")
      val on = key.map(c => s"$table.$c=INCOMING.$c").mkString(" AND ")
      val matched =
        if (nonKey.isEmpty) ""
        else s" WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"$table.$c=INCOMING.$c").mkString(",")}"
      val insCols = (nonKey ++ key).mkString(",")
      val insVals = (nonKey ++ key).map(c => s"INCOMING.$c").mkString(",")
      s"MERGE INTO $table USING (SELECT $incoming FROM dual) INCOMING ON ($on)" +
        matched + s" WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
    }
  }

  /** Embedded Derby — the in-container live-execution target (the same role
    * Derby plays for the JDBC offset/history stores). Derby's MERGE rejects
    * untyped `?` bindings in the USING projection, so upsert renders the
    * portable UPDATE-then-INSERT pair; `JdbcChangeEventSink` executes the
    * second statement only when the first matched zero rows.
    */
  object Derby extends SqlDialect {
    val name = "derby"
    override protected def explicitNull: Boolean = false
    override protected def alterColumnPrefix: String = "ADD COLUMN "
    override def sqlType(dt: DataType): String = dt match {
      case StringType => "VARCHAR(32672)"
      case DoubleType => "DOUBLE"
      case other      => super.sqlType(other)
    }
    /** `<update>;<insert>` — split on '\n' by the executor. */
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String =
      update(table, key, nonKey) + "\n" + insert(table, key, nonKey)
    override def alterStatements(table: String,
                                 columns: Seq[(String, String, Boolean)]): Seq[String] =
      columns.map(c => alterAddColumns(table, Seq(c)))
  }

  /** Db2 LUW (ref `dialect/db2/Db2DatabaseDialect.java:143-170`): lowercase
    * MERGE against a `(values(…)) as DAT(cols)` derived table; the SET side
    * qualifies the target (`t.c=DAT.c`, ref `getMergeDatClause`:167-170);
    * the INSERT branch lists non-key columns before key columns; a key-only
    * record renders no WHEN MATCHED branch.
    */
  object Db2 extends SqlDialect {
    val name = "db2"
    override def sqlType(dt: DataType): String = dt match {
      case StringType => "CLOB"
      case DoubleType => "DOUBLE"
      case other      => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val all = key ++ nonKey
      val matched =
        if (nonKey.isEmpty) ""
        else " WHEN MATCHED THEN UPDATE SET " +
          nonKey.map(c => s"$table.$c=DAT.$c").mkString(", ")
      s"merge into $table using (values(${all.map(_ => "?").mkString(",")}))" +
        s" as DAT(${all.mkString(",")}) on " +
        key.map(c => s"$table.$c=DAT.$c").mkString(" AND ") + matched +
        s" WHEN NOT MATCHED THEN INSERT(${(nonKey ++ key).mkString(",")})" +
        s" values (${(nonKey ++ key).map(c => s"DAT.$c").mkString(",")})"
    }
  }

  /** Db2 for i (ref `dialect/db2i/Db2iDatabaseDialect.java:193-234`): the
    * derived table is a `select … from sysibm.sysdummy1` projection (column
    * aliases, not a DAT(cols) list), the target carries an explicit TGT
    * alias used in the ON clause, and — where Db2 for i differs from LUW —
    * the SET clause does NOT qualify column names (`c=DAT.c`).
    */
  object Db2i extends SqlDialect {
    val name = "db2i"
    override def sqlType(dt: DataType): String = Db2.sqlType(dt)
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val all = key ++ nonKey
      val matched =
        if (nonKey.isEmpty) ""
        else " WHEN MATCHED THEN UPDATE SET " +
          nonKey.map(c => s"$c=DAT.$c").mkString(", ")
      s"merge into $table as TGT using (select " +
        all.map(c => s"? as $c").mkString(",") +
        " from sysibm.sysdummy1) as DAT on " +
        key.map(c => s"TGT.$c=DAT.$c").mkString(" AND ") + matched +
        s" WHEN NOT MATCHED THEN INSERT(${(nonKey ++ key).mkString(",")})" +
        s" values (${(nonKey ++ key).map(c => s"DAT.$c").mkString(",")})"
    }
  }

  /** MariaDB (ref `dialect/mysql/MariaDbDatabaseDialect.java:65-91`):
    * MySQL-family quoting/DDL, but the upsert keeps the pre-8.0.20
    * `VALUES(col)` form — MariaDB has not followed MySQL's deprecation of
    * it in favor of row aliases.
    */
  object MariaDb extends SqlDialect {
    val name = "mariadb"
    override def quote(id: String): String = MySql.quote(id)
    override def alterAddColumns(table: String,
                                 columns: Seq[(String, String, Boolean)]): String =
      MySql.alterAddColumns(table, columns)
    override def sqlType(dt: DataType): String = MySql.sqlType(dt)
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String = {
      val updateCols = if (nonKey.isEmpty) key else nonKey
      s"INSERT INTO $table (${(key ++ nonKey).mkString(", ")}) VALUES (" +
        (key ++ nonKey).map(_ => "?").mkString(", ") +
        ") ON DUPLICATE KEY UPDATE " +
        updateCols.map(c => s"$c=VALUES($c)").mkString(",")
    }
  }

  /** CockroachDB (ref `dialect/cockroachdb/CockroachDBDatabaseDialect.java:32`
    * — `extends PostgresDatabaseDialect`): identical statement shapes to
    * Postgres; the reference subclass changes only type registrations and
    * the retriable-conflict exception set, not SQL generation.
    */
  object CockroachDb extends SqlDialect {
    val name = "cockroachdb"
    override protected def alterColumnPrefix = "ADD COLUMN "
    override def sqlType(dt: DataType): String = Postgres.sqlType(dt)
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String =
      Postgres.upsert(table, key, nonKey)
  }

  /** SingleStore (ref `dialect/singlestore/SingleStoreDatabaseDialect.java:22`
    * — `extends MariaDbDatabaseDialect`): MariaDB-shaped statements (the
    * `VALUES(col)` upsert form); the subclass changes only type
    * registrations (JSON / GEOGRAPHY / VECTOR).
    */
  object SingleStore extends SqlDialect {
    val name = "singlestore"
    override def quote(id: String): String = MySql.quote(id)
    override def alterAddColumns(table: String,
                                 columns: Seq[(String, String, Boolean)]): String =
      MySql.alterAddColumns(table, columns)
    override def sqlType(dt: DataType): String = MySql.sqlType(dt)
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String =
      MariaDb.upsert(table, key, nonKey)
  }

  /** StarRocks (ref `dialect/starrocks/StarRocksDatabaseDialect.java:
    * 224-313`): no ON DUPLICATE KEY — an INSERT listing all columns of a
    * PRIMARY KEY table executes as an upsert (`getUpsertStatement`:304-308);
    * CREATE TABLE orders key columns first and places the PRIMARY KEY and
    * DISTRIBUTED BY HASH clauses OUTSIDE the column list (:256-266); keys
    * are NOT NULL and the NULL/NOT NULL constraint precedes any DEFAULT;
    * ALTER adds columns as one `ADD COLUMN (…)` group (:311-313).
    */
  object StarRocks extends SqlDialect {
    val name = "starrocks"
    override def quote(id: String): String = s"`$id`"
    override def sqlType(dt: DataType): String = dt match {
      case StringType  => "STRING"
      case DoubleType  => "DOUBLE"
      case BinaryType  => "VARBINARY"
      case TimestampType | TimestampNTZType => "DATETIME"
      case other       => super.sqlType(other)
    }
    def upsert(table: String, key: Seq[String], nonKey: Seq[String]): String =
      insert(table, key, nonKey)
    override def createTable(table: String,
                             columns: Seq[(String, String, Boolean)],
                             pk: Seq[String]): String = {
      val (keys, rest) = columns.partition { case (n, _, _) => pk.contains(n) }
      val cols = (keys ++ rest).map { case (n, t, nullable) =>
        s"$n $t" + (if (pk.contains(n) || !nullable) " NOT NULL" else " NULL")
      }
      val pkClause =
        if (pk.isEmpty) ""
        else s" PRIMARY KEY (${pk.mkString(", ")})" +
          s" DISTRIBUTED BY HASH (${pk.mkString(", ")})"
      s"CREATE TABLE $table (${cols.mkString(", ")})$pkClause"
    }
    override def alterAddColumns(table: String,
                                 columns: Seq[(String, String, Boolean)]): String =
      s"ALTER TABLE $table ADD COLUMN (" + columns.map {
        case (n, t, nullable) => s"$n $t" + nullConstraint(nullable)
      }.mkString(", ") + ")"
  }

  val all: Seq[SqlDialect] =
    Seq(Postgres, MySql, SqlServer, Oracle, Derby,
      Db2, Db2i, MariaDb, CockroachDb, SingleStore, StarRocks)

  def forName(n: String): SqlDialect =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown dialect '$n'"))
}
