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

  val all: Seq[SqlDialect] = Seq(Postgres, MySql, SqlServer, Oracle, Derby)

  def forName(n: String): SqlDialect =
    all.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"unknown dialect '$n'"))
}
