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
  *
  * It also speaks the ORACLE dialect subset LogMiner actually emits
  * (reference grammar `debezium-ddl-parser/.../PlSqlParser.g4`,
  * listeners `debezium-connector-oracle/.../antlr/listener classes`): quoted
  * `"OWNER"."NAME"` pairs, parenthesized multi-column `ADD (…)` /
  * `MODIFY (…)` / `DROP (…)` action groups, and the
  * NUMBER/VARCHAR2/RAW/BINARY_FLOAT type family.
  */
object DdlParser {

  sealed trait Parsed { def table: Envelope.TableId }

  /** Outcome of [[parseWithPolicy]] — the reference's
    * `schema.history.internal.skip.unparseable.ddl` semantics
    * (`relational/history/SchemaHistory.java` config area): a DDL-shaped
    * statement the subset grammar cannot parse either fails the pipeline
    * (strict, the reference's default for its FULL grammars) or is
    * skipped with a warning, surfacing the referenced table so the
    * caller can mark its schema STALE. Non-DDL statements (BEGIN, SET,
    * DML) are never "unparseable" — they are filtered, not failed.
    */
  sealed trait Outcome
  final case class Applied(parsed: Parsed) extends Outcome
  case object NotDdl extends Outcome
  final case class SkippedUnparseable(table: Option[Envelope.TableId],
                                      reason: String) extends Outcome

  private val DdlVerbs = Set("CREATE", "ALTER", "DROP", "RENAME", "TRUNCATE")

  /** First word is a DDL verb — the statement is subject to the policy. */
  def isDdlShaped(sql: String): Boolean =
    sql.trim.split("[\\s(;]+", 2).headOption
      .exists(w => DdlVerbs.contains(w.toUpperCase))

  private val TableRef =
    """(?is).*?TABLE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?([^\s(;]+).*""".r

  /** Best-effort referenced-table extraction from an unparseable DDL
    * statement (for stale marking); None when no `TABLE <name>` appears
    * (CREATE INDEX, CREATE DATABASE, …).
    */
  def tableOf(sql: String): Option[Envelope.TableId] = sql match {
    case TableRef(name) =>
      // TableId.parse is quote-aware — pre-stripping outer quotes here
      // would MANGLE a dotted quoted name ('"ORA"."ITEMS"' loses only
      // the outermost pair, then parses as schema 'ORA.'), so the stale
      // mark would key a table that doesn't exist and the real one
      // would keep its out-of-date schema silently
      scala.util.Try(Envelope.TableId.parse(name.trim)).toOption
    case _ => None
  }

  /** [[parse]] under the unparseable-DDL policy. This engine's DEFAULT
    * at the decode-path call sites is skip (`skipUnparseable = true`) —
    * a hand subset grammar must degrade gracefully on a production
    * binlog/redo tail; the strict mode matches the reference's
    * fail-fast default and is what a schema-history RECOVERY should
    * use, where silently diverging from the recorded history is worse
    * than stopping.
    */
  def parseWithPolicy(sql: String, skipUnparseable: Boolean): Outcome = {
    if (!isDdlShaped(sql)) return NotDdl
    try Applied(parse(sql))
    catch {
      // NonFatal, not just IllegalArgumentException: a type argument
      // like Oracle's NUMBER(*,0) fails with NumberFormatException, a
      // >38-precision decimal with Spark's own error — ALL of them are
      // "this subset cannot parse the statement" and must follow the
      // policy, never crash the decode path
      case scala.util.control.NonFatal(e) =>
        if (!skipUnparseable)
          throw new IllegalArgumentException(
            "unparseable DDL under strict policy (the " +
              "skip.unparseable.ddl analog is off — pass " +
              "skipUnparseable=true to warn, skip, and mark the table " +
              s"schema stale): ${sql.trim.take(120)}", e)
        val t = tableOf(sql)
        Console.err.println(
          "[graft] skipping unparseable DDL" +
            t.map(x => " (table " +
              Seq(Option(x.catalog), Option(x.schema), Some(x.table))
                .flatten.mkString(".") + " marked stale)").getOrElse("") +
            s": ${sql.trim.replaceAll("\\s+", " ").take(120)}")
        SkippedUnparseable(t, e.getMessage)
    }
  }
  final case class CreateTable(table: Envelope.TableId,
                               schema: StructType) extends Parsed
  /** `CREATE TABLE a LIKE b` (MySQL) / `CREATE TABLE a (LIKE b …)`
    * (Postgres): the new table copies `source`'s column list — resolved
    * by the consumer from its own registry/history, since only it knows
    * the source's current shape (the reference's MySqlAntlrDdlParser
    * resolves LIKE from its in-memory `Tables` the same way).
    */
  final case class CreateTableLike(table: Envelope.TableId,
                                   source: Envelope.TableId) extends Parsed
  final case class AlterTable(table: Envelope.TableId,
                              changes: Seq[SchemaChange]) extends Parsed
  final case class DropTable(table: Envelope.TableId) extends Parsed
  final case class TruncateTable(table: Envelope.TableId) extends Parsed
  final case class RenameTable(table: Envelope.TableId,
                               to: Envelope.TableId) extends Parsed

  /** SQL type name → Spark type (the common relational spellings, incl.
    * MySQL width/charset suffixes: `UNSIGNED` promotes one width exactly
    * as the reference's binlog type registry does —
    * `debezium-connector-binlog` maps `INT UNSIGNED`→INT64,
    * `BIGINT UNSIGNED`→DECIMAL(20,0); `ZEROFILL` implies UNSIGNED).
    */
  def sqlType(t: String): DataType = {
    var norm = t.trim.toUpperCase.replaceAll("\\s+", " ")
    val zerofill = norm.endsWith(" ZEROFILL")
    if (zerofill) norm = norm.dropRight(9).trim
    val unsigned = zerofill || norm.endsWith(" UNSIGNED")
    if (norm.endsWith(" UNSIGNED")) norm = norm.dropRight(9).trim
    val Paren = """([A-Z0-9 ]+)\s*\(([^)]*)\)""".r
    val base = norm match {
      case "TINYINT"                       => ByteType
      case "SMALLINT" | "INT2"             => ShortType
      case "INT" | "INTEGER" | "INT4" | "MEDIUMINT" => IntegerType
      case "BIGINT" | "INT8"               => LongType
      case "REAL" | "FLOAT4"               => FloatType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8" | "FLOAT" => DoubleType
      case "BOOLEAN" | "BOOL"              => BooleanType
      case "DATE"                          => DateType
      case "TEXT" | "STRING" | "CLOB" | "JSON" | "UUID" |
           "TINYTEXT" | "MEDIUMTEXT" | "LONGTEXT" | "NCLOB" | "XML" => StringType
      case "BLOB" | "BYTEA" | "BINARY" | "VARBINARY" |
           "TINYBLOB" | "MEDIUMBLOB" | "LONGBLOB" => BinaryType
      case "TIMESTAMP" | "DATETIME"        => TimestampType
      // µs-since-midnight INT64 (ref io.debezium.time.MicroTime)
      case "TIME"                          => LongType
      case "YEAR"                          => IntegerType
      // Oracle: bare NUMBER / FLOAT are variable-scale (the reference
      // emits VariableScaleDecimal structs — OracleValueConverters);
      // this subset lowers them to the closest single Spark type
      case "NUMBER"                        => DoubleType
      case "BINARY_FLOAT"                  => FloatType
      case "BINARY_DOUBLE"                 => DoubleType
      case "RAW" | "LONG RAW"              => BinaryType
      case "LONG"                          => StringType // Oracle LONG = text
      case Paren(b, args) => b.trim match {
        case "VARCHAR" | "CHAR" | "CHARACTER VARYING" | "NVARCHAR" |
             "NCHAR" | "CHARACTER" | "VARCHAR2" | "NVARCHAR2" => StringType
        case "ENUM" | "SET"                => StringType
        case "VARBINARY" | "BINARY" | "RAW" => BinaryType
        case "TIMESTAMP" | "DATETIME"      => TimestampType
        case "TIME"                        => LongType
        // Oracle NUMBER(p[,s]): integral scales lower to the narrowest
        // integer width (the reference's OracleValueConverters ladder:
        // p≤2→INT8, ≤4→INT16, ≤9→INT32, ≤18→INT64), fractional to
        // DECIMAL(p,s); a negative scale (rounding to tens) is integral
        case "NUMBER" =>
          args.split(",").map(_.trim) match {
            case Array(p) => integralNumber(p.toInt)
            case Array(p, s) if s.toInt <= 0 => integralNumber(p.toInt)
            case Array(p, s) => DecimalType(p.toInt, s.toInt)
            case _ => throw new IllegalArgumentException(s"bad NUMBER: $t")
          }
        case "TINYINT" =>
          // MySQL display width: TINYINT(1) is the BOOLEAN convention
          if (args.trim == "1") BooleanType else ByteType
        case "SMALLINT"                    => ShortType
        case "INT" | "INTEGER" | "MEDIUMINT" => IntegerType
        case "BIGINT"                      => LongType
        case "BIT" =>
          if (args.trim == "1") BooleanType else BinaryType
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
      case "BIT" => BooleanType // bare BIT == BIT(1)
      case other =>
        throw new IllegalArgumentException(s"unsupported type: $other")
    }
    if (!unsigned) base
    else base match { // one-width promotion (ref binlog unsigned handling)
      case ByteType    => ShortType
      case ShortType   => IntegerType
      case IntegerType => LongType
      case LongType    => DecimalType(20, 0)
      case other       => other
    }
  }

  /** NUMBER(p,0) → narrowest holding integer type (see sqlType). */
  private def integralNumber(p: Int): DataType =
    if (p <= 2) ByteType
    else if (p <= 4) ShortType
    else if (p <= 9) IntegerType
    else if (p <= 18) LongType
    else DecimalType(p, 0)

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("`") && t.endsWith("`")) ||
        (t.startsWith("\"") && t.endsWith("\"")))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split on top-level commas (outside parentheses/quotes). Inside a
    * quoted region, a backslash escapes the next character (MySQL
    * strings outside NO_BACKSLASH_ESCAPES: `DEFAULT 'a\'b'`) and a
    * DOUBLED quote char is an escaped quote (standard SQL `'a''b'`,
    * MySQL ``a``b`` identifiers) — both must not desync the tracker.
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Option[Char] = None
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      quote match {
        case Some(q) =>
          cur += c
          if (c == '\\' && q == '\'' && i + 1 < s.length) {
            cur += s.charAt(i + 1); i += 1 // escaped char stays in-string
          } else if (c == q) {
            if (i + 1 < s.length && s.charAt(i + 1) == q) {
              cur += q; i += 1 // doubled quote = escaped quote, stay in
            } else quote = None
          }
        case None => c match {
          // single-quoted STRINGS too (matchingParen agrees): a quoted
          // DEFAULT like 'x,y' or 'a)b' must not steer the splitter
          case '`' | '"' | '\'' => cur += c; quote = Some(c)
          case '(' => depth += 1; cur += c
          case ')' => depth -= 1; cur += c
          case ',' if depth == 0 => out += cur.result(); cur.clear()
          case _ => cur += c
        }
      }
      i += 1
    }
    val last = cur.result()
    if (last.trim.nonEmpty) out += last
    out.result().map(_.trim)
  }

  private val CreateHead =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([^\s(;]+)\s*(.*?);?\s*""".r
  private val LikeRest = // MySQL: CREATE TABLE a LIKE b
    """(?is)LIKE\s+(\S+)\s*""".r
  private val LikeBody = // Postgres: CREATE TABLE a (LIKE b [INCLUDING …])
    """(?is)\s*LIKE\s+(\S+)(?:\s+(?:INCLUDING|EXCLUDING)\s+.*)?\s*""".r

  /** Table options / partition clauses allowed AFTER the column body —
    * parsed and dropped (partitioning changes storage layout, never the
    * row schema the change feed carries). Anything else after the body
    * is out of subset and follows the unparseable policy.
    */
  private val CreateTail =
    ("(?is)\\s*(ENGINE|DEFAULT|CHARSET|CHARACTER|COLLATE|COMMENT|" +
      "AUTO_INCREMENT|ROW_FORMAT|KEY_BLOCK_SIZE|STATS_|MAX_ROWS|" +
      "MIN_ROWS|PACK_KEYS|TABLESPACE|WITH|WITHOUT|INHERITS|" +
      "ON\\s+COMMIT|USING|PARTITION\\s+BY|DATA\\s+DIRECTORY|" +
      "INDEX\\s+DIRECTORY|COMPRESSION|ENCRYPTION|CHECKSUM|" +
      "DELAY_KEY_WRITE|AVG_ROW_LENGTH|INSERT_METHOD|CONNECTION|" +
      "SECONDARY_ENGINE|TRANSACTIONAL|UNION|PAGE_CHECKSUM|" +
      "STATS_PERSISTENT|STATS_AUTO_RECALC|STATS_SAMPLE_PAGES|" +
      "AUTOEXTEND_SIZE|START\\s+TRANSACTION).*").r

  /** `AS SELECT` anywhere at top level of a CREATE tail (quoted strings
    * blanked first so a COMMENT 'as select' cannot trip it). A column
    * body followed by AS SELECT is a MySQL CTAS that APPENDS the
    * query's columns to the declared ones — the declared list is NOT
    * the full schema, so accepting it would mislabel later row events;
    * the statement is out of subset and follows the unparseable policy.
    */
  private def tailHasAsSelect(tail: String): Boolean = {
    val blanked = tail.replaceAll("'(?:[^'\\\\]|\\\\.|'')*'", "''")
    "(?is)(?:^|\\s)AS\\s+SELECT\\b".r.findFirstIn(blanked).isDefined
  }

  /** Index of the ')' matching the '(' at `open` (quote-aware — same
    * backslash/doubled-quote escapes as [[splitTop]]), or -1.
    */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var quote: Option[Char] = None
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      quote match {
        case Some(q) =>
          if (c == '\\' && q == '\'') i += 1 // escaped char stays in-string
          else if (c == q) {
            if (i + 1 < s.length && s.charAt(i + 1) == q) i += 1
            else quote = None
          }
        case None => c match {
          case '`' | '"' | '\'' => quote = Some(c)
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return i
          case _ => ()
        }
      }
      i += 1
    }
    -1
  }

  /** CREATE TABLE forms: column body (+ tolerated tail), LIKE (both
    * dialect spellings). Returns None for a non-CREATE statement.
    */
  private def parseCreate(sql: String): Option[Parsed] = sql match {
    case CreateHead(name, rest) =>
      val table = Envelope.TableId.parse(name)
      rest match {
        case LikeRest(src) =>
          Some(CreateTableLike(table, Envelope.TableId.parse(src)))
        case _ if rest.startsWith("(") =>
          val close = matchingParen(rest, 0)
          if (close < 0)
            throw new IllegalArgumentException(
              s"unbalanced CREATE TABLE body: ${sql.take(80)}")
          val body = rest.substring(1, close)
          val tail = rest.substring(close + 1).trim
          if (tailHasAsSelect(tail))
            throw new IllegalArgumentException(
              "CREATE TABLE (columns) AS SELECT appends the query's " +
                s"columns to the declared list — out of subset: ${sql.take(80)}")
          if (tail.nonEmpty && !CreateTail.pattern.matcher(tail).matches())
            throw new IllegalArgumentException(
              s"unsupported CREATE TABLE tail: ${tail.take(80)}")
          body match {
            case LikeBody(src) =>
              Some(CreateTableLike(table, Envelope.TableId.parse(src)))
            case _ =>
              val fields = splitTop(body).flatMap { colDef =>
                val parts = colDef.trim.split("\\s+", 2)
                val colName = unquote(parts(0))
                // skip table-level constraint clauses
                if (Seq("PRIMARY", "UNIQUE", "KEY", "CONSTRAINT",
                  "FOREIGN", "INDEX", "LIKE").contains(colName.toUpperCase))
                  None
                else Some(StructField(colName,
                  sqlType(stripColumnOptions(parts(1)))))
              }
              Some(CreateTable(table, StructType(fields)))
          }
        case other =>
          throw new IllegalArgumentException(
            s"unsupported CREATE TABLE form (columns or LIKE): " +
              s"${other.take(80)}")
      }
    case _ => None
  }

  /** The column body of a CREATE TABLE statement, when it has one. */
  private def createBody(sql: String): Option[String] = sql match {
    case CreateHead(_, rest) if rest.startsWith("(") =>
      val close = matchingParen(rest, 0)
      if (close < 0) None else Some(rest.substring(1, close))
    case _ => None
  }

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

  def parse(sql: String): Parsed = parseCreate(sql).getOrElse(sql match {
    case Drop(_, name) =>
      DropTable(Envelope.TableId.parse(name))
    case RenameTo(from, to) =>
      RenameTable(Envelope.TableId.parse(from),
        Envelope.TableId.parse(to))
    case AlterRename(from, to) =>
      RenameTable(Envelope.TableId.parse(from),
        Envelope.TableId.parse(to))
    case Alter(name, actions) =>
      val changes = splitTop(actions).flatMap(parseAction)
      AlterTable(Envelope.TableId.parse(name), changes)
    case Truncate(name) =>
      TruncateTable(Envelope.TableId.parse(name))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported DDL (CREATE/ALTER/DROP/RENAME/TRUNCATE TABLE): ${other.take(80)}")
  })

  /** Primary-key column names of a CREATE TABLE statement: per-column
    * `PRIMARY KEY` options plus table-level `[CONSTRAINT x] PRIMARY KEY
    * (a, b)` clauses — the key metadata a binlog consumer must resolve
    * from schema history, since row events carry none (ref
    * `relational/TableSchemaBuilder` key resolution).
    */
  def primaryKeyOf(sql: String): Seq[String] =
    createBody(sql).toSeq.flatMap { body =>
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
    }

  /** Drop trailing column options — constraints, defaults, charset and
    * collation clauses, generated-column bodies, MySQL position markers
    * (`FIRST` / `AFTER c`), `ON UPDATE` actions (word-boundary matched so
    * type names like JSON never truncate).
    */
  private val ColumnOptionStart =
    ("(?i)\\b(NOT NULL|NULL|DEFAULT|COMMENT|PRIMARY|UNIQUE|AUTO_INCREMENT|" +
      "REFERENCES|GENERATED|AFTER|FIRST|CHARACTER SET|CHARSET|COLLATE|" +
      "ON UPDATE|CHECK|STORED|VIRTUAL|KEY|CONSTRAINT|AS\\s*\\()").r
  private def stripColumnOptions(rest: String): String =
    ColumnOptionStart.findFirstMatchIn(rest) match {
      case Some(m) => rest.substring(0, m.start)
      case None    => rest
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

  /** ALTER actions that do not change the row schema — index/constraint
    * management, default mutation, storage and lock hints — parse and drop,
    * as the reference's listeners do (`debezium-ddl-parser` alter parsers
    * consume them without emitting a table change).
    */
  private val IgnorableAction =
    ("(?is)\\s*(ADD\\s+(INDEX|KEY|UNIQUE|FULLTEXT|SPATIAL|CONSTRAINT|" +
      "PRIMARY\\s+KEY|FOREIGN\\s+KEY)|" +
      "DROP\\s+(INDEX|KEY|PRIMARY\\s+KEY|FOREIGN\\s+KEY|CONSTRAINT)|" +
      "ALTER\\s+(COLUMN\\s+)?\\S+\\s+(SET|DROP)\\s+DEFAULT|" +
      "RENAME\\s+(INDEX|KEY)|" +
      "ALGORITHM\\s*=|LOCK\\s*=|ENGINE\\s*=|AUTO_INCREMENT\\s*=|" +
      "CONVERT\\s+TO\\s+CHARACTER\\s+SET|DEFAULT\\s+CHARACTER\\s+SET|" +
      "CHARACTER\\s+SET|COMMENT\\s*=|ROW_FORMAT\\s*=|" +
      "ENABLE\\s+KEYS|DISABLE\\s+KEYS|FORCE|ORDER\\s+BY|" +
      // partition management changes storage layout, never row schema
      // (the reference's MySqlAntlrDdlParser consumes partition clauses
      // without emitting a table change)
      "PARTITION\\s+BY|REMOVE\\s+PARTITIONING|" +
      "(ADD|DROP|TRUNCATE|ANALYZE|OPTIMIZE|REBUILD|REPAIR|COALESCE|" +
      "REORGANIZE|EXCHANGE|DISCARD|IMPORT)\\s+PARTITION).*").r

  private val ParenAdd = // MySQL/Oracle multi-add: ADD [COLUMN] (a INT, b TEXT)
    """(?is)\s*ADD\s+(?:COLUMN\s+)?\((.*)\)\s*""".r
  private val ParenModify = // Oracle: MODIFY ("PRICE" NUMBER(12,2), …)
    """(?is)\s*MODIFY\s+\((.*)\)\s*""".r
  private val ParenDrop = // Oracle: DROP ("A", "B")
    """(?is)\s*DROP\s+\((.*)\)\s*""".r

  private def parseAction(action: String): Seq[SchemaChange] = action match {
    case IgnorableAction(_*) => Nil
    case ParenAdd(body) =>
      splitTop(body).map { colDef =>
        val parts = colDef.trim.split("\\s+", 2)
        AddColumn(unquote(parts(0)), sqlType(stripColumnOptions(parts(1))))
      }
    case ParenModify(body) =>
      splitTop(body).map { colDef =>
        val parts = colDef.trim.split("\\s+", 2)
        WidenColumn(unquote(parts(0)), sqlType(stripColumnOptions(parts(1))))
      }
    case ParenDrop(body) =>
      splitTop(body).map(c => DropColumn(unquote(c.trim)))
    case other => parseSingleAction(other).toSeq
  }

  private def parseSingleAction(action: String): Option[SchemaChange] = action match {
    case AlterColType(n, t) => Some(WidenColumn(unquote(n), sqlType(stripColumnOptions(t))))
    case RenameCol(f, to)   => Some(RenameColumn(unquote(f), unquote(to)))
    case ModifyCol(n, t)    => Some(WidenColumn(unquote(n), sqlType(stripColumnOptions(t))))
    case ChangeCol(f, to, t) =>
      if (unquote(f) == unquote(to))
        Some(WidenColumn(unquote(f), sqlType(stripColumnOptions(t))))
      else Some(RenameColumn(unquote(f), unquote(to)))
    case AddCol(n, t)       => Some(AddColumn(unquote(n), sqlType(stripColumnOptions(t))))
    case DropCol(n)         => Some(DropColumn(unquote(n)))
    case other =>
      throw new IllegalArgumentException(s"unsupported ALTER action: $other")
  }
}
