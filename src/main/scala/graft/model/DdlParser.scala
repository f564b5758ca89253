package graft.model

import org.apache.spark.sql.types._
import graft.operators.SchemaEvolution.{AddColumn, DropColumn, RenameColumn, SchemaChange, WidenColumn}

/** Minimal DDL-text intake — the reference parses log-embedded DDL with
  * full ANTLR grammars (`debezium-ddl-parser`, interface
  * `relational/ddl/DdlParser.java`); that surface is a declared non-goal
  * (SURVEY §2.9). This hand parser covers the statements a MySQL-shaped
  * schema-change stream actually emits day to day — CREATE TABLE and
  * ALTER TABLE ADD/DROP/MODIFY/ALTER COLUMN (multi-action, quoted
  * identifiers) — and lowers them onto the structured `SchemaChange`
  * model that `SchemaHistory`/`SchemaEvolution` already replay.
  */
object DdlParser {

  sealed trait Parsed { def table: Envelope.TableId }
  final case class CreateTable(table: Envelope.TableId,
                               schema: StructType) extends Parsed
  final case class AlterTable(table: Envelope.TableId,
                              changes: Seq[SchemaChange]) extends Parsed
  final case class DropTable(table: Envelope.TableId) extends Parsed
  final case class TruncateTable(table: Envelope.TableId) extends Parsed
  final case class RenameTable(table: Envelope.TableId,
                               to: Envelope.TableId) extends Parsed

  /** SQL type name → Spark type (the common relational spellings). */
  def sqlType(t: String): DataType = {
    val norm = t.trim.toUpperCase
    val Paren = """([A-Z0-9 ]+)\s*\(([^)]*)\)""".r
    norm match {
      case "TINYINT"                       => ByteType
      case "SMALLINT" | "INT2"             => ShortType
      case "INT" | "INTEGER" | "INT4" | "MEDIUMINT" => IntegerType
      case "BIGINT" | "INT8"               => LongType
      case "REAL" | "FLOAT4"               => FloatType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8" | "FLOAT" => DoubleType
      case "BOOLEAN" | "BOOL"              => BooleanType
      case "DATE"                          => DateType
      case "TEXT" | "STRING" | "CLOB" | "JSON" => StringType
      case "BLOB" | "BYTEA" | "BINARY" | "VARBINARY" => BinaryType
      case "TIMESTAMP" | "DATETIME"        => TimestampType
      case Paren(base, args) => base.trim match {
        case "VARCHAR" | "CHAR" | "CHARACTER VARYING" | "NVARCHAR" => StringType
        case "VARBINARY" | "BINARY"        => BinaryType
        case "TIMESTAMP" | "DATETIME"      => TimestampType
        case "DECIMAL" | "NUMERIC" =>
          args.split(",").map(_.trim) match {
            case Array(p)    => DecimalType(p.toInt, 0)
            case Array(p, s) => DecimalType(p.toInt, s.toInt)
            case _ => throw new IllegalArgumentException(s"bad decimal: $t")
          }
        case "FLOAT" => DoubleType
        case other =>
          throw new IllegalArgumentException(s"unsupported type: $other")
      }
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("`") && t.endsWith("`")) ||
        (t.startsWith("\"") && t.endsWith("\"")))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split on top-level commas (outside parentheses/quotes). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Option[Char] = None
    s.foreach { c =>
      quote match {
        case Some(q) =>
          cur += c; if (c == q) quote = None
        case None => c match {
          case '`' | '"' => cur += c; quote = Some(c)
          case '(' => depth += 1; cur += c
          case ')' => depth -= 1; cur += c
          case ',' if depth == 0 => out += cur.result(); cur.clear()
          case _ => cur += c
        }
      }
    }
    val last = cur.result()
    if (last.trim.nonEmpty) out += last
    out.result().map(_.trim)
  }

  private val Create =
    """(?is)\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\S+)\s*\((.*)\)\s*;?\s*""".r
  private val Drop =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\S+?);?\s*""".r
  private val Truncate =
    """(?is)\s*TRUNCATE\s+(?:TABLE\s+)?(\S+?);?\s*""".r
  private val RenameTo = // MySQL RENAME TABLE a TO b / ALTER TABLE a RENAME [TO] b
    """(?is)\s*RENAME\s+TABLE\s+(\S+)\s+TO\s+(\S+?);?\s*""".r
  private val AlterRename =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+RENAME\s+(?!COLUMN\s)(?:TO\s+)?([^;\s]+);?\s*""".r
  private val Alter =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+(.*?);?\s*""".r

  def parse(sql: String): Parsed = sql match {
    case Create(_, name, body) =>
      val fields = splitTop(body).flatMap { colDef =>
        val parts = colDef.trim.split("\\s+", 2)
        val colName = unquote(parts(0))
        // skip table-level constraint clauses
        if (Seq("PRIMARY", "UNIQUE", "KEY", "CONSTRAINT", "FOREIGN", "INDEX")
          .contains(colName.toUpperCase)) None
        else Some(StructField(colName, sqlType(stripColumnOptions(parts(1)))))
      }
      CreateTable(Envelope.TableId.parse(unquote(name)), StructType(fields))
    case Drop(_, name) =>
      DropTable(Envelope.TableId.parse(unquote(name)))
    case RenameTo(from, to) =>
      RenameTable(Envelope.TableId.parse(unquote(from)),
        Envelope.TableId.parse(unquote(to)))
    case AlterRename(from, to) =>
      RenameTable(Envelope.TableId.parse(unquote(from)),
        Envelope.TableId.parse(unquote(to)))
    case Alter(name, actions) =>
      val changes = splitTop(actions).map(parseAction)
      AlterTable(Envelope.TableId.parse(unquote(name)), changes)
    case Truncate(name) =>
      TruncateTable(Envelope.TableId.parse(unquote(name)))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported DDL (CREATE/ALTER/DROP/RENAME/TRUNCATE TABLE): ${other.take(80)}")
  }

  /** Primary-key column names of a CREATE TABLE statement: per-column
    * `PRIMARY KEY` options plus table-level `[CONSTRAINT x] PRIMARY KEY
    * (a, b)` clauses — the key metadata a binlog consumer must resolve
    * from schema history, since row events carry none (ref
    * `relational/TableSchemaBuilder` key resolution).
    */
  def primaryKeyOf(sql: String): Seq[String] = sql match {
    case Create(_, _, body) =>
      splitTop(body).flatMap { part =>
        val up = part.toUpperCase
        val name = unquote(part.trim.split("\\s+")(0))
        if (name.equalsIgnoreCase("PRIMARY") || up.startsWith("CONSTRAINT")) {
          val i = up.indexOf("PRIMARY KEY")
          val tail = if (i < 0) "" else part.substring(i)
          val open = tail.indexOf('('); val close = tail.indexOf(')')
          if (i < 0 || open < 0 || close < open) Nil
          else tail.substring(open + 1, close).split(",")
            .map(s => unquote(s.trim)).toSeq
        } else if (up.contains("PRIMARY KEY")) Seq(name)
        else Nil
      }
    case _ => Nil
  }

  /** Drop trailing column options (NOT NULL, DEFAULT …, comments). */
  private def stripColumnOptions(rest: String): String = {
    val stop = Seq("NOT NULL", "NULL", "DEFAULT", "COMMENT", "PRIMARY",
      "UNIQUE", "AUTO_INCREMENT", "REFERENCES", "GENERATED")
    val upper = rest.toUpperCase
    val cut = stop.map(upper.indexOf).filter(_ >= 0)
    if (cut.isEmpty) rest else rest.substring(0, cut.min)
  }

  private val AddCol =
    """(?is)ADD\s+(?:COLUMN\s+)?(\S+)\s+(.+)""".r
  private val DropCol =
    """(?is)DROP\s+(?:COLUMN\s+)?(\S+)""".r
  private val ModifyCol = // MySQL MODIFY / CHANGE-less type change
    """(?is)MODIFY\s+(?:COLUMN\s+)?(\S+)\s+(.+)""".r
  private val AlterColType = // Postgres ALTER COLUMN c TYPE t
    """(?is)ALTER\s+(?:COLUMN\s+)?(\S+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+)""".r
  private val RenameCol = // Postgres/MySQL 8 RENAME COLUMN a TO b
    """(?is)RENAME\s+COLUMN\s+(\S+)\s+TO\s+(\S+)""".r
  private val ChangeCol = // MySQL CHANGE [COLUMN] old new type (rename keeps type in this subset)
    """(?is)CHANGE\s+(?:COLUMN\s+)?(\S+)\s+(\S+)\s+(.+)""".r

  private def parseAction(action: String): SchemaChange = action match {
    case AlterColType(n, t) => WidenColumn(unquote(n), sqlType(stripColumnOptions(t)))
    case RenameCol(f, to)   => RenameColumn(unquote(f), unquote(to))
    case ModifyCol(n, t)    => WidenColumn(unquote(n), sqlType(stripColumnOptions(t)))
    case ChangeCol(f, to, t) =>
      if (unquote(f) == unquote(to))
        WidenColumn(unquote(f), sqlType(stripColumnOptions(t)))
      else RenameColumn(unquote(f), unquote(to))
    case AddCol(n, t)       => AddColumn(unquote(n), sqlType(stripColumnOptions(t)))
    case DropCol(n)         => DropColumn(unquote(n))
    case other =>
      throw new IllegalArgumentException(s"unsupported ALTER action: $other")
  }
}
