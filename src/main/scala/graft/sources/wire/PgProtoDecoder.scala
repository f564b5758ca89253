package graft.sources.wire

import java.nio.charset.StandardCharsets

import graft.serde.Protobuf

/** Postgres `decoderbufs` logical-decoding plugin decoder — the
  * reference's SECOND Postgres decode path next to pgoutput (ref
  * `debezium-connector-postgres/src/main/java/io/debezium/connector/postgresql/connection/pgproto/PgProtoMessageDecoder.java:44-73`,
  * `PgProtoReplicationMessage.java`, message schema
  * `debezium-connector-postgres/src/main/proto/pg_logicaldec.proto`).
  * decoderbufs delivers ONE protobuf `RowMessage` per WAL frame:
  *
  * {{{
  * RowMessage { transaction_id=1 commit_time=2 table=3 op=4
  *              new_tuple=5(rep) old_tuple=6(rep) new_typeinfo=7(rep) }
  * DatumMessage { column_name=1 column_type=2(oid)
  *                oneof datum: int32=3 int64=4 float=5 double=6 bool=7
  *                             string=8 bytes=9 point=10 missing=11 }
  * Op { UNKNOWN=-1 INSERT=0 UPDATE=1 DELETE=2 BEGIN=3 COMMIT=4 }
  * }}}
  *
  * Decoded over the in-repo wire codec ([[graft.serde.Protobuf]], no
  * schema compiler) into the same `(table, op, pos, key_json,
  * payload_json)` wire rows as pgoutput, so decoderbufs segments drop
  * straight into the DSv2 [[graft.sources.v2.ChangeLogSource]] pipeline.
  * Unlike pgoutput there are no Relation messages: each RowMessage is
  * self-describing (column names + type OIDs ride on every datum), and
  * the key is the REPLICA IDENTITY image the plugin puts in `old_tuple`
  * for updates/deletes; inserts key on the first column, the plugin's
  * positional convention (the reference resolves names against its
  * TypeRegistry instead — a live-catalog concern outside a recorded
  * segment).
  *
  * Scale shape: segments decode independently inside Spark tasks (the
  * parse distributes with the data); a frame is one protobuf message —
  * no cross-frame state at all, which makes decoderbufs the cheapest
  * decoder to parallelize.
  */
object PgProtoDecoder {

  val OpInsert = 0
  val OpUpdate = 1
  val OpDelete = 2
  val OpBegin = 3
  val OpCommit = 4

  /** One decoded datum: name, type oid, rendered JSON literal, and the
    * TOAST-missing flag (datum_missing — the column was not present in
    * the WAL record; renders as the shared unchanged-toast marker).
    */
  final case class Datum(name: String, typeOid: Long, json: String)

  final case class RowMessage(txId: Long, commitTime: Long, table: String,
                              op: Int, newTuple: Seq[Datum],
                              oldTuple: Seq[Datum])

  /** The engine-wide TOAST placeholder (same marker the pgoutput path
    * emits for unchanged TOAST columns, so T22 reselect works over
    * either decode path).
    */
  private val UnchangedToast = "\"__graft_unchanged_toast__\""

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').result()
  }

  private def decodeDatum(m: Protobuf.Msg): Datum = {
    val name = m.string(1).getOrElse("")
    val oid = m.varint(2).getOrElse(0L)
    // oneof datum — exactly one of fields 3..11 is present
    val json = m.fields.collectFirst {
      case (3, Protobuf.VarInt(v)) => v.toInt.toString // int32 (sign-ext)
      case (4, Protobuf.VarInt(v)) => v.toString // int64
      case (5, Protobuf.Fixed32(v)) => // float
        floatJson(java.lang.Float.intBitsToFloat(v).toDouble)
      case (6, Protobuf.Fixed64(v)) => // double
        floatJson(java.lang.Double.longBitsToDouble(v))
      case (7, Protobuf.VarInt(v)) => if (v != 0) "true" else "false"
      case (8, Protobuf.Bytes(b)) =>
        jsonString(new String(b, StandardCharsets.UTF_8))
      case (9, Protobuf.Bytes(b)) => // bytea → pg hex form
        jsonString("\\x" + b.map("%02x".format(_)).mkString)
      case (10, Protobuf.Bytes(b)) => // Point{x=1,y=2} as fixed64 doubles
        val p = Protobuf.decode(b)
        def d(no: Int) = p.fields.collectFirst {
          case (`no`, Protobuf.Fixed64(v)) =>
            java.lang.Double.longBitsToDouble(v)
        }.getOrElse(0.0)
        s"""{"x":${floatJson(d(1))},"y":${floatJson(d(2))}}"""
      case (11, Protobuf.VarInt(_)) => UnchangedToast // datum_missing
    }.getOrElse("null")
    Datum(name, oid, json)
  }

  /** Finite doubles render bare (Java's shortest-round-trip text, the
    * same family as PG 12+ Ryu output); non-finite must be quoted to
    * stay JSON.
    */
  private def floatJson(d: Double): String =
    if (d.isNaN) "\"NaN\""
    else if (d.isPosInfinity) "\"Infinity\""
    else if (d.isNegInfinity) "\"-Infinity\""
    else if (d == d.toLong.toDouble && math.abs(d) < 1e15)
      s"${d.toLong}.0" // integral doubles as x.0 (pg/duckdb text form)
    else d.toString

  def decodeRowMessage(bytes: Array[Byte]): RowMessage = {
    val m = Protobuf.decode(bytes)
    RowMessage(
      txId = m.varint(1).getOrElse(0L),
      commitTime = m.varint(2).getOrElse(0L),
      table = m.string(3).getOrElse(""),
      // UNKNOWN=-1 arrives as the 10-byte sign-extended varint
      op = m.varint(4).map(_.toInt).getOrElse(OpInsert),
      newTuple = m.msgs(5).map(decodeDatum),
      oldTuple = m.msgs(6).map(decodeDatum))
  }

  private def jsonObject(ds: Seq[Datum]): String =
    ds.map(d => s"${jsonString(d.name)}:${d.json}").mkString("{", ",", "}")

  /** Project a recorded decoderbufs segment (the shared `(wal, frame)`
    * container, one RowMessage per frame) to envelope wire rows.
    * BEGIN/COMMIT frames carry no row, matching the pgoutput path;
    * unknown ops are skipped with the reference's tolerance
    * (`PgProtoMessageDecoder.java:61-67` warns and drops).
    */
  def segmentRows(bytes: Array[Byte]): Iterator[PgOutput.WireRow] =
    PgOutput.readSegmentFrames(bytes).flatMap { case (wal, frame) =>
      val rm = decodeRowMessage(frame)
      rm.op match {
        case OpInsert =>
          Seq(PgOutput.WireRow(rm.table, "c", wal,
            jsonObject(rm.newTuple.take(1)), jsonObject(rm.newTuple)))
        case OpUpdate =>
          val key =
            if (rm.oldTuple.nonEmpty) rm.oldTuple else rm.newTuple.take(1)
          Seq(PgOutput.WireRow(rm.table, "u", wal,
            jsonObject(key), jsonObject(rm.newTuple)))
        case OpDelete =>
          Seq(PgOutput.WireRow(rm.table, "d", wal,
            jsonObject(rm.oldTuple), "null"))
        case OpBegin | OpCommit => Nil
        case _ => Nil // UNKNOWN: tolerate-and-skip
      }
    }
}
