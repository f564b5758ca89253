package graft.sources.wire

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Decoder for Oracle LogMiner redo streams — SURVEY S10. The wire
  * format is the `V$LOGMNR_CONTENTS` result set a LogMiner session
  * returns: one row per redo record with `SCN`, `OPERATION_CODE`
  * (1=INSERT, 2=DELETE, 3=UPDATE, 6=START, 7=COMMIT, 36=ROLLBACK — ref
  * `debezium-connector-oracle/.../logminer/events/EventType.java:13-33`),
  * the reconstructed DML text in `SQL_REDO` (split across rows when
  * `CSF`=1), the transaction id `XID`, and a `ROLLBACK` flag marking
  * compensating records that undo an earlier event of the same
  * transaction + `ROW_ID` (partial rollback).
  *
  * The redo-SQL grammar and its parse semantics follow the reference's
  * hand-rolled parser (`logminer/parser/LogMinerDmlParser.java:1-766`):
  *   - `insert into "O"."T"("C1",..) values (v1,..);`
  *   - `update "O"."T" set "C1" = v, .. where "C2" = v and "C3" IS NULL;`
  *   - `delete from "O"."T" where ..;`
  *   - values: `'text'` with `''` escapes, bare numbers, `NULL`,
  *     `Unsupported Type` (→ unavailable placeholder), and verbatim
  *     function calls (`TO_DATE('..','..')`, `TO_TIMESTAMP('..')`,
  *     `HEXTORAW('..')`, `EMPTY_BLOB()`);
  *   - update reconciliation: the SET clause is the after-image, the
  *     WHERE clause the before-image, and columns absent from SET copy
  *     their before value while explicit `NULL` stays null.
  *
  * Spark-first shape — every cross-row concern is declarative, the
  * string parse is per-row in executors:
  *   1. CSF continuation chunks regroup by redo-record id (one
  *      map-side-combinable aggregation, ordered by the recording's
  *      cursor index);
  *   2. partial rollbacks cancel their target via a left-anti join on
  *      (XID, ROW_ID);
  *   3. only committed transactions emit, via an inner join to the
  *      COMMIT rows on XID (a tx ended by ROLLBACK(36) has no commit row
  *      and drops out) which also attaches the commit SCN — the batch
  *      analogue of TxReassembly's buffered release;
  *   4. `SQL_REDO` parses in a `flatMap` per partition — the same
  *      record-local work the reference does per JDBC row, but
  *      distributed.
  */
object LogMiner {

  val UnavailableValue = "__unavailable"

  // V$LOGMNR_CONTENTS operation codes (subset we decode)
  val OpInsert = 1
  val OpDelete = 2
  val OpUpdate = 3
  val OpDdl = 5
  val OpStart = 6
  val OpCommit = 7
  val OpSelLobLocator = 9
  val OpLobWrite = 10
  val OpLobTrim = 11
  val OpLobErase = 29
  val OpRollback = 36
  val OpXmlBegin = 68
  val OpXmlWrite = 70
  val OpXmlEnd = 71
  val OpXsBegin = 91  // 32K extended-string (VARCHAR2(32767)) chains
  val OpXsWrite = 92
  val OpXsEnd = 93

  /** One parsed DML: maps are name → Some(text) | None (SQL NULL); a
    * column absent from a map was not mentioned in that clause.
    */
  final case class DmlEntry(op: String, owner: String, table: String,
                            before: Map[String, Option[String]],
                            after: Map[String, Option[String]])

  /** One decoded, committed change event. */
  final case class WireEvent(table: String, op: String, scn: Long,
                             commit_scn: Long, xid: String, key_json: String,
                             before_json: String, after_json: String)

  // ------------------------------------------------------------ parser

  private final class Cursor(val s: String) {
    var i = 0
    def done: Boolean = i >= s.length
    def ch: Char = s.charAt(i)
    def startsWith(lit: String): Boolean = s.startsWith(lit, i)
    def expect(lit: String): Unit = {
      require(startsWith(lit), s"expected '$lit' at $i in: $s")
      i += lit.length
    }
    def skipSpaces(): Unit = while (!done && ch == ' ') i += 1
  }

  private def parseQuotedIdent(c: Cursor): String = {
    c.expect("\"")
    val start = c.i
    while (c.ch != '"') c.i += 1
    val name = c.s.substring(start, c.i)
    c.i += 1
    name
  }

  /** `"OWNER"."TABLE"` (possibly with an alias after — ignored). */
  private def parseQualifiedName(c: Cursor): (String, String) = {
    val owner = parseQuotedIdent(c)
    c.expect(".")
    val table = parseQuotedIdent(c)
    (owner, table)
  }

  /** One value: quoted string (with `''` escapes, unescaped here), NULL,
    * `Unsupported Type`, or verbatim function/number text (tracking
    * paren nesting and quotes inside function args). Stops BEFORE the
    * delimiter that ends the value.
    */
  private def parseValue(c: Cursor, delims: Seq[String]): Option[String] = {
    c.skipSpaces()
    if (c.ch == '\'') {
      c.i += 1
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        if (c.ch == '\'') {
          if (!c.done && c.i + 1 < c.s.length && c.s.charAt(c.i + 1) == '\'') {
            sb += '\''; c.i += 2
          } else { closed = true; c.i += 1 }
        } else { sb += c.ch; c.i += 1 }
      }
      Some(sb.toString)
    } else if (c.startsWith("NULL") && atBoundary(c, 4, delims)) {
      c.i += 4
      None
    } else if (c.startsWith("Unsupported Type")) {
      c.i += "Unsupported Type".length
      Some(UnavailableValue)
    } else {
      // bare number or function call — verbatim, nesting-aware
      val start = c.i
      var nested = 0
      var inQuote = false
      var stop = false
      while (!stop && !c.done) {
        val ch = c.ch
        if (inQuote) {
          if (ch == '\'') inQuote = false
          c.i += 1
        } else if (ch == '\'') { inQuote = true; c.i += 1 }
        else if (ch == '(') { nested += 1; c.i += 1 }
        else if (ch == ')' && nested > 0) { nested -= 1; c.i += 1 }
        else if (nested == 0 && delims.exists(c.startsWith)) stop = true
        else c.i += 1
      }
      Some(c.s.substring(start, c.i))
    }
  }

  private def atBoundary(c: Cursor, len: Int, delims: Seq[String]): Boolean = {
    val after = c.i + len
    after >= c.s.length || delims.exists(d => c.s.startsWith(d, after))
  }

  /** WHERE conditions: `"C" = v` / `"C" IS NULL`, joined by ` and `. */
  private def parseWhere(c: Cursor): Map[String, Option[String]] = {
    val m = Map.newBuilder[String, Option[String]]
    var more = true
    while (more) {
      c.skipSpaces()
      val name = parseQuotedIdent(c)
      c.skipSpaces()
      if (c.startsWith("IS NULL")) {
        c.i += "IS NULL".length
        m += name -> None
      } else {
        c.expect("=")
        m += name -> parseValue(c, Seq(" and ", ";"))
      }
      c.skipSpaces()
      if (c.startsWith("and ")) c.i += 4 else more = false
    }
    m.result()
  }

  /** Parse one reassembled redo-SQL statement. */
  def parseDml(sql: String): DmlEntry = {
    val c = new Cursor(sql.trim)
    if (c.startsWith("insert into ")) {
      c.i += "insert into ".length
      val (owner, table) = parseQualifiedName(c)
      c.skipSpaces(); c.expect("(")
      val names = Seq.newBuilder[String]
      var more = true
      while (more) {
        names += parseQuotedIdent(c)
        if (c.ch == ',') c.i += 1 else { c.expect(")"); more = false }
      }
      c.skipSpaces(); c.expect("values"); c.skipSpaces(); c.expect("(")
      val values = Seq.newBuilder[Option[String]]
      more = true
      while (more) {
        values += parseValue(c, Seq(",", ")"))
        if (c.ch == ',') c.i += 1 else { c.expect(")"); more = false }
      }
      DmlEntry("c", owner, table, Map.empty,
        names.result().zip(values.result()).toMap)
    } else if (c.startsWith("update ")) {
      c.i += "update ".length
      val (owner, table) = parseQualifiedName(c)
      c.skipSpaces(); c.expect("set ")
      val set = Map.newBuilder[String, Option[String]]
      var more = true
      while (more) {
        c.skipSpaces()
        val name = parseQuotedIdent(c)
        c.skipSpaces(); c.expect("="); c.i += 0
        set += name -> parseValue(c, Seq(",", " where ", ";"))
        c.skipSpaces()
        if (!c.done && c.ch == ',') c.i += 1
        else more = false
      }
      val before =
        if (c.startsWith("where ")) { c.i += 6; parseWhere(c) }
        else Map.empty[String, Option[String]]
      // reconciliation (ref LogMinerDmlParser.parseUpdate): columns not
      // in SET copy their before value; explicit NULL stays null
      val after = before ++ set.result()
      DmlEntry("u", owner, table, before, after)
    } else if (c.startsWith("delete from ")) {
      c.i += "delete from ".length
      val (owner, table) = parseQualifiedName(c)
      c.skipSpaces()
      val before =
        if (c.startsWith("where ")) { c.i += 6; parseWhere(c) }
        else Map.empty[String, Option[String]]
      DmlEntry("d", owner, table, before, Map.empty)
    } else {
      throw new IllegalArgumentException(s"unparseable redo SQL: $sql")
    }
  }

  // --------------------------------------------------- LOB chain parse
  // With `lob.enabled`, CLOB/BLOB mutations arrive as PL/SQL blocks:
  // SEL_LOB_LOCATOR (9) locks the target row and names the column,
  // then LOB_WRITE (10) rows carry chunks (`dbms_lob.write(loc, len,
  // offset, buf)`) and LOB_TRIM (11) truncates — ref
  // `SelectLobParser` + `TransactionCommitConsumer` merge semantics.

  /** Parsed SEL_LOB_LOCATOR: target column, table, and row conditions. */
  final case class LobLocator(owner: String, table: String, column: String,
                              where: Map[String, Option[String]])

  /** `select "COL" into loc from "O"."T" where <conds> for update;`
    * possibly inside a declare/begin block.
    */
  def parseSelectLob(sql: String): LobLocator = {
    val at = sql.indexOf("select \"")
    require(at >= 0, s"not a SEL_LOB_LOCATOR redo: $sql")
    val c = new Cursor(sql.substring(at))
    c.expect("select ")
    val column = parseQuotedIdent(c)
    val from = c.s.indexOf(" from ", c.i)
    c.i = from + " from ".length
    val (owner, table) = parseQualifiedName(c)
    c.skipSpaces()
    val wh = c.s.indexOf("where ", c.i)
    val tail0 = c.s.substring(wh + 6)
    val cut = tail0.indexOf(" for update")
    val condText = (if (cut >= 0) tail0.substring(0, cut) else tail0).trim
    val wc = new Cursor(condText + ";")
    LobLocator(owner, table, column, parseWhere(wc))
  }

  // ----------------------------------------------- XML chain parse
  // XMLTYPE columns mutate as their own chain grammar (same fold shape
  // as LOBs, different redo): XML_BEGIN (68) names the target column and
  // row, XML_WRITE (70) rows carry document fragments that CONCATENATE
  // in cursor order (no offsets, unlike dbms_lob.write), XML_END (71)
  // closes the chain — ref `logminer/parser/XmlBeginParser.java`,
  // `XmlWriteParser.java`, fold `TransactionCommitConsumer.java:200-290`
  // (XmlUnderConstruction.merge appends fragments).

  /** XML_BEGIN redo → target column/table/row. Two grammars:
    * binary-serialized storage `XML DOC BEGIN: select "COL" from
    * "O"."T" where … for update;` (same select shape as
    * SEL_LOB_LOCATOR), and text storage `update "O"."T" a set
    * a."COL" = XMLTYPE() where …;` — ref `XmlBeginParser`'s
    * binary/text parser pair.
    */
  def parseXmlBegin(sql: String): LobLocator =
    if (sql.contains("select \"")) parseSelectLob(sql)
    else {
      val at = sql.indexOf("update \"")
      require(at >= 0, s"not an XML_BEGIN redo: $sql")
      val c = new Cursor(sql.substring(at))
      c.expect("update ")
      val (owner, table) = parseQualifiedName(c)
      val setAt = c.s.indexOf(" set a.", c.i)
      require(setAt >= 0, s"no aliased SET clause in XML_BEGIN redo: $sql")
      c.i = setAt + " set a.".length
      val column = parseQuotedIdent(c)
      val wh = c.s.indexOf("where ", c.i)
      require(wh >= 0, s"no WHERE clause in XML_BEGIN redo: $sql")
      var cond = c.s.substring(wh + 6).trim
      val cut = cond.indexOf(" for update")
      if (cut >= 0) cond = cond.substring(0, cut)
      if (cond.endsWith(";")) cond = cond.dropRight(1)
      val wc = new Cursor(cond + ";")
      LobLocator(owner, table, column, parseWhere(wc))
    }

  /** XML_WRITE redo → document fragment. `XML_REDO := NULL` sets the
    * column to SQL NULL (None); `XML_REDO := '<text>' [: len]` is the
    * text between the first and LAST quote (no `''` unescaping — the
    * reference takes the raw slice); `XML_REDO := HEXTORAW('…') [: len]`
    * decodes hex→UTF-8, tolerating Oracle's missing-end-quote bug where
    * the final chunk closes with `)` instead of `')` (ref
    * `XmlWriteParser.parseBinary`). A redo WITHOUT the preamble is
    * text-serialized storage: the whole redo is the fragment.
    */
  def parseXmlWrite(sql: String): Option[String] = {
    val P = "XML_REDO := "
    if (!sql.startsWith(P)) return Some(sql)
    val rest = sql.substring(P.length)
    if (rest.trim == "NULL") None
    else if (rest.startsWith("'")) {
      val last = rest.lastIndexOf('\'')
      require(last > 0, s"unterminated XML_WRITE text: $sql")
      Some(rest.substring(1, last))
    } else {
      require(rest.startsWith("HEXTORAW('"), s"bad XML_WRITE redo: $sql")
      val lastParen = rest.lastIndexOf(')')
      require(lastParen > 0, s"unterminated HEXTORAW in XML_WRITE: $sql")
      var hex = rest.substring("HEXTORAW('".length, lastParen)
      if (hex.endsWith("'")) hex = hex.dropRight(1)
      Some(new String(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  // ------------------------------------- 32K extended-string chains
  // VARCHAR2(32767) columns (MAX_STRING_SIZE = EXTENDED) mutate as
  // 32K_BEGIN (91) / 32K_WRITE (92) / 32K_END (93) chains — same
  // concatenating fold as XML, different redo grammar: the BEGIN wraps
  // an UPDATE statement in a PL/SQL `Stmt := '…';` assignment with ''
  // escaping, the WRITE carries a raw data slice — ref
  // `logminer/parser/ExtendedStringParser.java`,
  // `AbstractLogMinerStreamingChangeEventSource.java:744-795` (write
  // data = substring(12, second-last ';' - 1)).

  /** 32K_BEGIN redo → target column/table/row:
    * `declare … begin  Stmt := 'update "O"."T" set "COL" = :V where
    * …';end;` — the embedded statement unescapes `''` before parsing.
    */
  def parseExtendedStringBegin(sql: String): LobLocator = {
    val p = " Stmt := '"
    val at = sql.indexOf(p)
    require(at >= 0, s"not a 32K_BEGIN redo: $sql")
    val close = sql.lastIndexOf("';")
    require(close > at, s"unterminated Stmt in 32K_BEGIN redo: $sql")
    val stmt = sql.substring(at + p.length, close).replace("''", "'")
    val c = new Cursor(stmt)
    c.expect("update ")
    val (owner, table) = parseQualifiedName(c)
    c.skipSpaces(); c.expect("set ")
    val column = parseQuotedIdent(c)
    val wh = c.s.indexOf("where ", c.i)
    require(wh >= 0, s"no WHERE clause in 32K_BEGIN redo: $sql")
    var cond = c.s.substring(wh + 6).trim
    if (cond.endsWith(";")) cond = cond.dropRight(1)
    val wc = new Cursor(cond + ";")
    LobLocator(owner, table, column, parseWhere(wc))
  }

  /** 32K_WRITE redo → raw data slice: characters from fixed offset 12
    * to just before the second-to-last `;` (exclusive of the closing
    * quote) — the reference's exact extraction.
    */
  def parseExtendedStringWrite(sql: String): String = {
    val last = sql.lastIndexOf(";")
    require(last >= 0, "no terminator in 32K_WRITE redo")
    val end = sql.lastIndexOf(";", last - 1)
    require(end >= 12, s"no data terminator in 32K_WRITE redo: $sql")
    sql.substring(12, end - 1)
  }

  /** One parsed LOB_WRITE chunk: 1-based offset (chars for CLOB, bytes
    * for BLOB) and the data — quoted text, or hex when the buffer was
    * assigned `HEXTORAW('…')`.
    */
  final case class LobWrite(offset: Int, data: String, isHex: Boolean)

  def parseLobWrite(sql: String): LobWrite = {
    // buffer assignment: `buf_X := '<data>';` or `buf_X := HEXTORAW('…');`
    val asg = sql.indexOf(":= ")
    require(asg >= 0, s"no buffer assignment in LOB_WRITE redo: $sql")
    val vc = new Cursor(sql.substring(asg + 3))
    val data = parseValue(vc, Seq(";")).get
    val (payload, isHex) =
      if (data.startsWith("HEXTORAW(")) {
        val a = data.indexOf('\''); val b = data.indexOf('\'', a + 1)
        (data.substring(a + 1, b), true)
      } else (data, false)
    val call = sql.indexOf("dbms_lob.write(")
    require(call >= 0, s"no dbms_lob.write call in redo: $sql")
    val args = sql.substring(call + "dbms_lob.write(".length)
    val offset = args.split(",")(2).trim.toInt
    LobWrite(offset, payload, isHex)
  }

  /** `dbms_lob.trim(loc, <newLen>)` → new length. */
  def parseLobTrim(sql: String): Int = {
    val call = sql.indexOf("dbms_lob.trim(")
    require(call >= 0, s"no dbms_lob.trim call in redo: $sql")
    sql.substring(call + "dbms_lob.trim(".length)
      .split(",")(1).takeWhile(ch => ch.isDigit || ch == ' ').trim.toInt
  }

  /** One assembled LOB chain: the final column value for a (tx, row),
    * plus everything needed to merge it into that row's DML — or to
    * synthesize an update when the tx touched only the LOB (direct
    * `dbms_lob` mutation), where non-key non-LOB columns are
    * unavailable exactly as the reference emits them.
    */
  final case class LobChain(xid: String, row_id: String, table: String,
                            column: String, value: String, scn: Long,
                            key_json: String, synthetic_after_json: String)

  // ------------------------------------------------ value → JSON typing

  /** Render one parsed text value as a typed JSON literal. Dispatch on
    * the verbatim function prefix mirrors the reference's converter
    * (`TO_DATE`/`TO_TIMESTAMP` → first quoted literal; `HEXTORAW` →
    * hex payload; `EMPTY_BLOB/CLOB()` → empty string).
    */
  def jsonLiteral(value: Option[String], dataType: String): String =
    value match {
      case None => "null"
      case Some(v) =>
        def firstLiteral(s: String): String = {
          val a = s.indexOf('\'')
          val b = s.indexOf('\'', a + 1)
          s.substring(a + 1, b)
        }
        if (v == UnavailableValue) "\"" + UnavailableValue + "\""
        else if (v.startsWith("TO_DATE(") || v.startsWith("TO_TIMESTAMP("))
          "\"" + firstLiteral(v) + "\""
        else if (v.startsWith("HEXTORAW(")) "\"" + firstLiteral(v) + "\""
        else if (v.startsWith("EMPTY_BLOB()") || v.startsWith("EMPTY_CLOB()"))
          "\"\""
        else dataType match {
          case "long" | "double" | "int" => v
          case _ => JsonText.jsonString(v) // quotes, backslashes, ctrl chars
        }
    }

  private def imageJson(img: Map[String, Option[String]],
                        schema: Seq[(String, String)]): String =
    if (img.isEmpty) null
    else schema.map { case (name, tpe) =>
      "\"" + name + "\":" + jsonLiteral(img.getOrElse(name, None), tpe)
    }.mkString("{", ",", "}")

  // ------------------------------------------------ declarative pipeline

  /** Expected input columns of the recorded V$LOGMNR_CONTENTS poll. */
  val ContentColumns: Seq[String] = Seq("rownum", "scn", "opcode", "xid",
    "csf", "rbk", "row_id", "rs_id", "seg_owner", "table_name", "sql_redo")

  /** Decode a recorded contents poll into committed change events.
    *
    * Purely lazy: builds the plan, runs no Spark action — safe to call
    * per poll in a stream loop.
    *
    * @param schemas    per "OWNER.TABLE": ordered (column, type) with type
    *                   in {long, int, double, string, timestamp}
    * @param keys       per "OWNER.TABLE": key column names
    * @param lobEnabled decode SEL_LOB_LOCATOR/LOB_WRITE/LOB_TRIM chains.
    *                   Mirrors the reference's `lob.enabled` switch
    *                   (default off — `OracleConnectorConfig.java` LOB_ENABLED):
    *                   off skips the chain fold and its joins entirely
    *                   (LOB opcodes pass through undecoded); on pays the
    *                   fold every poll, present or not, instead of an
    *                   eager per-poll emptiness probe.
    */
  /** Schema-change feed — the Oracle leg of the reference's
    * `include.schema.changes` topic: OPERATION_CODE=5 rows (ref
    * `logminer/events/EventType.java` DDL(5), processed by the streaming
    * source into schema history + schema-change events) carry the
    * statement in SQL_REDO and the affected object in
    * SEG_OWNER/TABLE_NAME; Oracle auto-commits DDL, so no transaction
    * join applies. Declarative map-only projection of one filtered scan
    * — `kind` is the statement's leading keyword, everything stays in
    * whole-stage codegen, no shuffle.
    */
  def schemaChanges(contents: DataFrame): DataFrame =
    contents.filter(col("opcode") === OpDdl)
      .select(col("scn"), col("seg_owner").as("owner"),
        col("table_name").as("object_name"),
        upper(element_at(split(trim(col("sql_redo")), "\\s+"), 1)).as("kind"),
        col("sql_redo").as("ddl"))

  /** Step 1 of [[decode]] — CSF reassembly: chunks of one redo record
    * share rs_id; cursor order (rownum) concatenates them.
    * min(struct(...)) carries the head chunk's metadata without a
    * second shuffle.
    */
  private def assemble(contents: DataFrame): DataFrame =
    contents
      .groupBy(col("rs_id"))
      .agg(
        min(struct(col("rownum"), col("scn"), col("opcode"), col("xid"),
          col("rbk"), col("row_id"), col("seg_owner"), col("table_name")))
          .as("m"),
        array_join(transform(
          array_sort(collect_list(struct(col("rownum"), col("sql_redo")))),
          x => x.getField("sql_redo")), "").as("sql"))
      .select(col("m.rownum").as("rownum"), col("m.scn").as("scn"),
        col("m.opcode").as("opcode"), col("m.xid").as("xid"),
        col("m.rbk").as("rbk"), col("m.row_id").as("row_id"),
        col("m.seg_owner").as("seg_owner"),
        col("m.table_name").as("table_name"), col("sql"))

  /** Steps 2-3 of [[decode]] — surviving DML of committed transactions
    * (partial rollbacks cancelled, uncommitted/rolled-back txs dropped),
    * with the commit SCN attached. Returns (events, committed); `events`
    * is needed separately by the LOB synthetic-update path.
    */
  private def committedOf(assembled: DataFrame): (DataFrame, DataFrame) = {
    val dml = assembled.filter(col("opcode").isin(OpInsert, OpDelete, OpUpdate))
    // partial rollback: a compensating row cancels its target event
    val rollbacks = dml.filter(col("rbk") === 1)
      .select(col("xid").as("r_xid"), col("row_id").as("r_row_id"))
    val events = dml.filter(col("rbk") === 0)
      .join(rollbacks, col("xid") === col("r_xid") &&
        col("row_id") === col("r_row_id"), "left_anti")
    // committed transactions only; attach the commit SCN. A tx ended
    // by ROLLBACK(36) has no commit row and drops out here.
    val commits = assembled.filter(col("opcode") === OpCommit)
      .select(col("xid").as("c_xid"), col("scn").as("commit_scn"))
    val committed = events
      .join(commits, col("xid") === col("c_xid"))
      .select("scn", "commit_scn", "xid", "row_id", "seg_owner",
        "table_name", "sql")
    (events, committed)
  }

  def decode(contents: DataFrame, schemas: Map[String, Seq[(String, String)]],
             keys: Map[String, Seq[String]],
             lobEnabled: Boolean = false): DataFrame = {
    val spark = contents.sparkSession
    val assembled = assemble(contents)
    val (events, committed) = committedOf(assembled)
    val commits = assembled.filter(col("opcode") === OpCommit)
      .select(col("xid").as("c_xid"), col("scn").as("commit_scn"))

    // 3b. LOB chains (lobEnabled only): per-tx cursor-order fold
    //     attributes every LOB_WRITE/LOB_TRIM to the most recent
    //     SEL_LOB_LOCATOR (the reference's TransactionCommitConsumer
    //     association), and chunk offsets assemble the final column
    //     value. One group per transaction — bounded by tx size like
    //     TxReassembly.
    // 4 (shared). per-row parse + typed JSON rendering in executors;
    //   assembled LOB values (the `lobs` column, possibly all-null)
    //   override their column in the DML's after image
    def render(committedWithLobs: DataFrame): DataFrame =
      renderTyped(committedWithLobs, (tableId, _) =>
        (schemas.getOrElse(tableId,
          throw new IllegalArgumentException(s"no schema for $tableId")),
          keys.getOrElse(tableId, Nil)))

    if (!lobEnabled)
      return render(committed.withColumn("lobs",
        lit(null).cast("array<struct<c:string,v:string>>")))

    val chains = assembleLobChains(assembled, schemas, keys)
    val overrides = chains.toDF()
      .groupBy(col("xid").as("o_xid"), col("row_id").as("o_row_id"))
      .agg(collect_list(struct(col("column").as("c"), col("value").as("v")))
        .as("lobs"))
    val committedL = committed.join(overrides,
      col("xid") === col("o_xid") && col("row_id") === col("o_row_id"),
      "left").drop("o_xid", "o_row_id")
    val dmlEvents = render(committedL)

    // 3c. chains whose tx had NO DML for the row (direct dbms_lob
    //     mutation) synthesize an update: key + LOB columns set, other
    //     columns unavailable — committed txs only, like everything else
    val dmlKeys = events.select(col("xid").as("d_xid"),
      col("row_id").as("d_row_id")).distinct()
    val synthetic = chains.toDF()
      .join(dmlKeys, col("xid") === col("d_xid") &&
        col("row_id") === col("d_row_id"), "left_anti")
      .join(commits, col("xid") === col("c_xid"))
      // one update per mutated row; a row with several LOB columns has
      // one chain per column (identical key/synthetic images), so min()
      // collapses them DETERMINISTICALLY — the scn is the row's first
      // locator, not whichever chain a partition happened to order first
      .groupBy(col("xid"), col("row_id"), col("table"), col("commit_scn"))
      .agg(min(col("scn")).as("scn"), min(col("key_json")).as("key_json"),
        min(col("synthetic_after_json")).as("after_json"))
      .select(col("table"), lit("u").as("op"), col("scn"),
        col("commit_scn"), col("xid"), col("key_json"),
        lit(null).cast("string").as("before_json"), col("after_json"))

    dmlEvents.unionByName(synthetic)
  }

  /** Step 4's executor-side rendering, parameterized by a SCHEMA
    * RESOLVER `(tableId, scn) → (columns, keyColumns)` so the plain
    * decode (one fixed schema per table) and [[decodeEvolving]] (a
    * per-SCN timeline) share one implementation.
    */
  private def renderTyped(committedWithLobs: DataFrame,
                          resolve: (String, Long) => (Seq[(String, String)],
                            Seq[String])): DataFrame =
    committedWithLobs.as(Encoders.row(committedWithLobs.schema)).mapPartitions {
      (rows: Iterator[Row]) =>
        rows.map { r =>
          val entry = parseDml(r.getAs[String]("sql"))
          val lobCols = Option(r.getAs[Seq[Row]]("lobs")).getOrElse(Nil)
            .map(l => l.getAs[String]("c") -> Option(l.getAs[String]("v")))
            .toMap
          val tableId = s"${entry.owner}.${entry.table}"
          val scn = r.getAs[Long]("scn")
          val (schema0, keyCols0) = resolve(tableId, scn)
          // STALE tombstone (null schema — a skipped-unparseable DDL,
          // e.g. CTAS, invalidated the registry at an earlier SCN):
          // decode from the statement's OWN column names, string-typed,
          // with the whole image as the key — deterministic and
          // lossless, never the out-of-date column list (the binlog
          // path's positional/wire-metadata fallback, in LogMiner terms
          // where the redo SQL itself names the columns)
          val stale = schema0 == null
          val schema =
            if (!stale) schema0
            else (entry.after.keys ++ entry.before.keys).toSeq
              .distinct.map(_ -> "string")
          val keyCols = if (!stale) keyCols0 else schema.map(_._1)
          val after =
            if (entry.op == "d" || lobCols.isEmpty) entry.after
            else entry.after ++ lobCols
          val keyImg = if (entry.op == "d") entry.before else after
          val keySchema = schema.filter { case (n, _) => keyCols.contains(n) }
          WireEvent(tableId, entry.op, scn,
            r.getAs[Long]("commit_scn"), r.getAs[String]("xid"),
            imageJson(keyImg.filter { case (k, _) => keyCols.contains(k) },
              keySchema),
            imageJson(entry.before, schema),
            imageJson(after, schema))
        }
    }(Encoders.product[WireEvent]).toDF()

  /** Spark type → the decoder's JSON-typing tag (see [[jsonLiteral]]). */
  private def lmType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => "long"
      case DoubleType | FloatType | _: DecimalType => "double"
      case TimestampType | DateType => "timestamp"
      case _ => "string"
    }
  }

  /** Per-table `(scn, columns, keys)` schema TIMELINE: the poll's own
    * OPERATION_CODE=5 rows replayed in SCN order onto the initial
    * registry through [[graft.model.DdlParser]]'s Oracle grammar —
    * the reference's schema-history mechanism for LogMiner
    * (`OracleDatabaseSchema.applySchemaChange`, fed by the
    * `debezium-connector-oracle/.../antlr/listener classes` parse listeners;
    * the binlog analogue is `MySqlBinlog.applyDdl`). DDL is rare and
    * auto-committed, so the fold runs on the DRIVER over exactly the
    * rows the reference writes to its schema-history topic — bounded
    * metadata, never the DML volume. Unparseable statements (grants,
    * index DDL) are skipped, as the reference's listeners skip
    * non-table statements.
    */
  def schemaTimeline(contents: DataFrame,
                     schemas: Map[String, Seq[(String, String)]],
                     keys: Map[String, Seq[String]])
      : Map[String, Seq[(Long, Seq[(String, String)], Seq[String])]] = {
    import graft.model.DdlParser
    import graft.operators.SchemaEvolution.{AddColumn, DropColumn, RenameColumn, WidenColumn}
    val ddl = schemaChanges(contents)
      .select(col("scn"), col("owner"), col("ddl"))
      .orderBy(col("scn")).collect() // bounded: the DDL rows only
    val state = scala.collection.mutable.Map.from(schemas)
    val keyState = scala.collection.mutable.Map.from(keys)
    val timeline = scala.collection.mutable.Map.from(
      schemas.map { case (t, cols) =>
        t -> Vector((Long.MinValue, cols, keys.getOrElse(t, Seq.empty)))
      })
    def push(full: String, scn: Long): Unit =
      timeline(full) = timeline.getOrElse(full, Vector.empty) :+
        ((scn, state.getOrElse(full, Seq.empty),
          keyState.getOrElse(full, Seq.empty)))
    ddl.foreach { r =>
      val scn = r.getLong(0)
      val sql = r.getString(2)
      def qual(t: graft.model.Envelope.TableId): String =
        s"${Option(t.schema).getOrElse(r.getString(1))}.${t.table}"
      // skip-unparseable policy (same as the binlog registry): an
      // out-of-subset statement warns and marks its table stale —
      // subsequent rows for it decode against no schema rather than a
      // column list known to be out of date
      (DdlParser.parseWithPolicy(sql, skipUnparseable = true) match {
        case DdlParser.Applied(p) => Some(p)
        case DdlParser.SkippedUnparseable(t, _) =>
          t.foreach { tid =>
            val full = qual(tid)
            state.remove(full); keyState.remove(full)
            // the TIMELINE must also record the staleness at this SCN:
            // removing the registry entry only stops FUTURE pushes, but
            // a later row resolves to the newest version <= its scn —
            // exactly the column list the skip policy just declared out
            // of date. The binlog registry is a point-in-time map, so
            // its remove suffices; the SCN timeline needs an explicit
            // stale tombstone (null schema → rows after it decode from
            // their OWN statement columns, see renderTyped).
            timeline(full) = timeline.getOrElse(full, Vector.empty) :+
              ((scn, null, null))
          }
          None
        case DdlParser.NotDdl => None
      }).foreach {
        case DdlParser.CreateTable(t, st) =>
          val full = qual(t)
          val cols = st.fields.toSeq.map(f => f.name -> lmType(f.dataType))
          state(full) = cols
          val pk = DdlParser.primaryKeyOf(sql)
          keyState(full) =
            if (pk.nonEmpty) pk else cols.take(1).map(_._1)
          push(full, scn)
        case DdlParser.AlterTable(t, changes) =>
          val full = qual(t)
          state.get(full).foreach { cur0 =>
            var cur = cur0
            changes.foreach {
              case AddColumn(n, dt) => cur = cur :+ (n -> lmType(dt))
              case DropColumn(n) =>
                cur = cur.filterNot(_._1 == n)
                keyState.get(full).foreach(ks =>
                  keyState(full) = ks.filter(_ != n))
              case RenameColumn(f, to) =>
                cur = cur.map { case (n, tp) =>
                  (if (n == f) to else n) -> tp }
                keyState.get(full).foreach(ks =>
                  keyState(full) = ks.map(k => if (k == f) to else k))
              case WidenColumn(n, dt) =>
                cur = cur.map { case (m, tp) =>
                  m -> (if (m == n) lmType(dt) else tp) }
              case _ => ()
            }
            state(full) = cur
            push(full, scn)
          }
        case DdlParser.CreateTableLike(t, src) =>
          // copy the source's CURRENT timeline shape; unknown source →
          // unseeded (rows for it decode positionally, like any unseen
          // table)
          val full = qual(t); val from = qual(src)
          state.get(from).foreach { cols =>
            state(full) = cols
            keyState(full) =
              keyState.getOrElse(from, cols.take(1).map(_._1))
            push(full, scn)
          }
        case DdlParser.RenameTable(from0, to0) =>
          val from = qual(from0); val to = qual(to0)
          state.remove(from).foreach(state(to) = _)
          keyState.remove(from).foreach(keyState(to) = _)
          push(to, scn)
        case DdlParser.DropTable(t) =>
          val full = qual(t)
          state.remove(full); keyState.remove(full): Unit
        case _: DdlParser.TruncateTable => () // no row-shape change
      }
    }
    timeline.view.mapValues(_.sortBy(_._1)).toMap
  }

  /** [[decode]] with IN-STREAM SCHEMA EVOLUTION: rows decode against
    * the schema version in force AT THEIR SCN, so an `ALTER TABLE …
    * ADD (…)` mid-poll changes how later inserts of the same poll
    * parse — the LogMiner analogue of the binlog path's mid-segment
    * `applyDdl` (reference: `LogMinerStreamingChangeEventSource`
    * dispatches DDL to the schema registry before later DML resolves
    * against it). The timeline broadcasts in the render closure
    * (driver-bounded, see [[schemaTimeline]]); resolution per row is a
    * reverse scan of that table's few versions. Pre-ALTER rows render
    * the old column set; columns added later are simply absent from
    * their JSON, exactly as the reference emits them.
    */
  def decodeEvolving(contents: DataFrame,
                     schemas: Map[String, Seq[(String, String)]],
                     keys: Map[String, Seq[String]]): DataFrame = {
    val timeline = schemaTimeline(contents, schemas, keys)
    val (_, committed) = committedOf(assemble(contents))
    renderTyped(
      committed.withColumn("lobs",
        lit(null).cast("array<struct<c:string,v:string>>")),
      (tableId, scn) => {
        val versions = timeline.getOrElse(tableId,
          throw new IllegalArgumentException(s"no schema for $tableId"))
        val v = versions.reverseIterator.find(_._1 <= scn).getOrElse(
          throw new IllegalArgumentException(
            s"no schema version for $tableId at scn $scn"))
        (v._2, v._3)
      })
  }

  /** Fold the LOB operation rows of each transaction in cursor order
    * into assembled [[LobChain]]s (see decode step 3b/3c).
    */
  private def assembleLobChains(assembled: DataFrame,
                                schemas: Map[String, Seq[(String, String)]],
                                keys: Map[String, Seq[String]]): Dataset[LobChain] = {
    val lobRows = assembled
      .filter(col("opcode").isin(OpSelLobLocator, OpLobWrite, OpLobTrim,
        OpLobErase,
        OpXmlBegin, OpXmlWrite, OpXmlEnd, OpXsBegin, OpXsWrite, OpXsEnd))
      .select("rownum", "scn", "opcode", "xid", "row_id", "sql")
    lobRows.as(Encoders.row(lobRows.schema))
      .groupByKey(_.getAs[String]("xid"))(Encoders.STRING)
      .flatMapGroups { (xid: String, it: Iterator[Row]) =>
        final class Tgt(val rowId: String, val loc: LobLocator,
                        val scn: Long) {
          val sb = new StringBuilder
          var hex = false
          var explicitNull = false // XML_REDO := NULL
        }
        val targets = scala.collection.mutable.LinkedHashMap[(String, String), Tgt]()
        var cur: Option[Tgt] = None
        // XML and 32K chains each track their own open target, like the
        // reference's separate per-kind construction state
        var curXml: Option[Tgt] = None
        var curXs: Option[Tgt] = None
        it.toSeq.sortBy(_.getAs[Long]("rownum")).foreach { r =>
          r.getAs[Int]("opcode") match {
            case OpSelLobLocator =>
              val loc = parseSelectLob(r.getAs[String]("sql"))
              val rowId = r.getAs[String]("row_id")
              cur = Some(targets.getOrElseUpdate((rowId, loc.column),
                new Tgt(rowId, loc, r.getAs[Long]("scn"))))
            case OpLobWrite =>
              val t = cur.getOrElse(throw new IllegalStateException(
                "LOB_WRITE before any SEL_LOB_LOCATOR"))
              val w = parseLobWrite(r.getAs[String]("sql"))
              if (w.isHex) t.hex = true
              val pos = if (w.isHex) (w.offset - 1) * 2 else w.offset - 1
              while (t.sb.length < pos) t.sb += (if (t.hex) '0' else ' ')
              t.sb.replace(pos, pos + w.data.length, w.data): Unit
            case OpLobTrim =>
              val t = cur.getOrElse(throw new IllegalStateException(
                "LOB_TRIM before any SEL_LOB_LOCATOR"))
              val n = parseLobTrim(r.getAs[String]("sql"))
              val len = if (t.hex) n * 2 else n
              if (t.sb.length > len) t.sb.setLength(len)
            case OpLobErase =>
              // unsupported manipulation: the reference warns and
              // DISCARDS the open chain's merge state
              // (TransactionCommitConsumer.acceptLobManipulationEvent)
              cur.foreach(t => targets.remove((t.rowId, t.loc.column)))
              cur = None
            case OpXmlBegin =>
              val loc = parseXmlBegin(r.getAs[String]("sql"))
              val rowId = r.getAs[String]("row_id")
              val t = targets.getOrElseUpdate((rowId, loc.column),
                new Tgt(rowId, loc, r.getAs[Long]("scn")))
              // a re-begin STARTS A NEW DOCUMENT: fragments concatenate
              // with no offsets, so the old builder must not leak into
              // the new value (ref initConstructable builds a fresh
              // XmlUnderConstruction per XML_BEGIN)
              t.sb.setLength(0); t.explicitNull = false
              curXml = Some(t)
            case OpXmlWrite =>
              val t = curXml.getOrElse(throw new IllegalStateException(
                "XML_WRITE before any XML_BEGIN"))
              parseXmlWrite(r.getAs[String]("sql")) match {
                case None => t.explicitNull = true; t.sb.setLength(0)
                case Some(frag) => // fragments concatenate in cursor order
                  t.explicitNull = false; t.sb.append(frag): Unit
              }
            case OpXmlEnd =>
              curXml = None // chain closed; value already assembled
            case OpXsBegin =>
              val loc = parseExtendedStringBegin(r.getAs[String]("sql"))
              val rowId = r.getAs[String]("row_id")
              val t = targets.getOrElseUpdate((rowId, loc.column),
                new Tgt(rowId, loc, r.getAs[Long]("scn")))
              t.sb.setLength(0); t.explicitNull = false // new document
              curXs = Some(t)
            case OpXsWrite =>
              val t = curXs.getOrElse(throw new IllegalStateException(
                "32K_WRITE before any 32K_BEGIN"))
              t.sb.append(parseExtendedStringWrite(r.getAs[String]("sql"))): Unit
            case OpXsEnd =>
              curXs = None
          }
        }
        // synthetic after-image per ROW (all of the row's LOB columns
        // set, keys from the locator WHERE, the rest unavailable)
        val byRow = targets.values.toSeq.groupBy(_.rowId)
        targets.values.iterator.map { t =>
          val tableId = s"${t.loc.owner}.${t.loc.table}"
          val schema = schemas.getOrElse(tableId,
            throw new IllegalArgumentException(s"no schema for $tableId"))
          val keyCols = keys.getOrElse(tableId, Nil)
          val keySchema = schema.filter { case (n, _) => keyCols.contains(n) }
          val rowTs = byRow(t.rowId)
          val lobVals: Map[String, Option[String]] = rowTs.map(x =>
            x.loc.column ->
              (if (x.explicitNull) None else Some(x.sb.toString))).toMap
          val synth = schema.map { case (n, tp) =>
            val v: Option[String] =
              if (lobVals.contains(n)) lobVals(n)
              else if (keyCols.contains(n)) t.loc.where.getOrElse(n, None)
              else Some(UnavailableValue)
            "\"" + n + "\":" + jsonLiteral(v, tp)
          }.mkString("{", ",", "}")
          LobChain(xid, t.rowId, tableId, t.loc.column,
            if (t.explicitNull) null else t.sb.toString,
            t.scn,
            imageJson(t.loc.where.filter { case (k, _) => keyCols.contains(k) },
              keySchema),
            synth)
        }
      }(Encoders.product[LobChain])
  }
}
