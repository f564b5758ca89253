package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.serde.Bson
import graft.serde.Bson.{BArr, BBool, BDoc, BDouble, BInt32, BInt64, BStr, BVal}
import graft.sources.net.MongoWireClient

/** The MongoDB consume-side sink (reference
  * `debezium-connector-mongodb/.../sink/MongoDbChangeEventSink.java` +
  * `MongoDbSinkConnectorConfig.java:34-39`): change events become the
  * reference's write models — row events a replaceOne-with-upsert on
  * `_id` (`ReplaceDefaultStrategy.java:25-39`), deletes/tombstones a
  * deleteOne on `_id` (`DeleteDefaultStrategy`) — issued as BULK OP_MSG
  * `update`/`delete` commands over the live wire client
  * (`MongoWireClient.CommandSession`), `field.include/exclude.list`
  * projections applied sink-side.
  *
  * Spark shape: identical to the JDBC sink — repartition by key, sort by
  * source position, one wire session per executor partition, consecutive
  * same-kind write models batched into one bulk command (the reference's
  * `bulkWrite` per collection batch). The fixture target is
  * `tools.MongoSinkServer` (zero egress); the bytes are the real protocol.
  */
object MongoChangeEventSink {

  final case class Config(
      host: String,
      port: Int,
      /** ref `sink.database` */
      database: String = "sink",
      fieldInclude: Option[Set[String]] = None,
      fieldExclude: Set[String] = Set.empty,
      deleteEnabled: Boolean = true,
      bulkSize: Int = 100,
      /** Interpret string values that are Extended JSON `$`-wrappers
        * (`{"$oid":…}`, `{"$date":…}`, …) as their BSON types — the
        * reference sink's `Document.parse` semantics (extended JSON in
        * the record value becomes typed BSON), so an ObjectId `_id`
        * captured from a change stream round-trips as an ObjectId, not
        * a string. Off = strings write verbatim.
        */
      parseExtendedJson: Boolean = true)

  /** A string that is an Extended JSON wrapper, as its typed BVal. */
  private def extendedWrapper(s: String): Option[BVal] =
    if (!(s.length > 4 && s.charAt(0) == '{' && s.charAt(1) == '"' &&
        s.charAt(2) == '$' && s.endsWith("}"))) None
    else scala.util.Try(Bson.parseJson(s)).toOption.collect {
      // only a WRAPPER conversion counts — a plain JSON object string
      // (parse returns BDoc) stays a string
      case v if !v.isInstanceOf[BDoc] => v
    }

  private def toB(v: Any, extJson: Boolean): BVal = v match {
    case null                         => Bson.BNull
    case b: Boolean                   => BBool(b)
    case i: Int                       => BInt32(i)
    case l: Long                      => BInt64(l)
    case s: Short                     => BInt32(s.toInt)
    case b: Byte                      => BInt32(b.toInt)
    case d: Double                    => BDouble(d)
    case f: Float                     => BDouble(f.toDouble)
    case b: Array[Byte]               => Bson.BBinary(0, b)
    case s: String if extJson         => extendedWrapper(s).getOrElse(BStr(s))
    case s: String                    => BStr(s)
    case d: java.math.BigDecimal      => BStr(d.toPlainString)
    case t: java.time.LocalDateTime   => // µs precision survives as epoch-µs
      BInt64(t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        t.getNano / 1000L)
    case t: java.sql.Timestamp        => // keep the sub-ms digits getTime drops
      BInt64(t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
    case d: java.time.LocalDate       => BStr(d.toString)
    case d: java.sql.Date             => BStr(d.toString)
    case other => throw new IllegalArgumentException(
      s"unsupported sink value ${other.getClass}")
  }

  /** Apply an envelope feed. The key struct's single/composite value
    * becomes `_id` (composite keys as a sub-document, the reference's
    * `IdStrategy` full-key mode).
    */
  def write(envelope: DataFrame, collection: String, cfg: Config,
            numPartitions: Int = 8): Unit = {
    val keyFields = envelope.schema("key").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    val payloadFields0 = envelope.schema("after").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    val payloadFields = payloadFields0
      .filter(f => cfg.fieldInclude.forall(_.contains(f)))
      .filterNot(cfg.fieldExclude.contains)
      // the key-derived _id is prepended to every write model; a payload
      // column of the same name would duplicate the field (malformed BSON)
      .filterNot(_ == "_id")

    val routed = envelope
      .withColumn("__pos", col("source.pos"))
      .repartition(numPartitions, keyFields.map(f => col(s"key.`$f`")): _*)
      .sortWithinPartitions(col("__pos"))
      .select(
        col("op") +:
          keyFields.map(f => col(s"key.`$f`").as(s"__k_$f")) ++:
          payloadFields.map(f => col(s"after.`$f`").as(s"__v_$f")): _*)

    val host = cfg.host; val port = cfg.port; val db = cfg.database
    val deleteEnabled = cfg.deleteEnabled; val bulk = cfg.bulkSize
    val extJson = cfg.parseExtendedJson
    val kf = keyFields; val pf = payloadFields

    routed.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val session = new MongoWireClient.CommandSession(host, port)
        try {
          def idVal(r: Row): BVal =
            if (kf.length == 1)
              toB(r.get(r.fieldIndex(s"__k_${kf.head}")), extJson)
            else BDoc(kf.map(f =>
              f -> toB(r.get(r.fieldIndex(s"__k_$f")), extJson)))

          // consecutive same-kind run batching into one bulk command
          val buf = scala.collection.mutable.ArrayBuffer.empty[BDoc]
          var kind: String = null
          def flush(): Unit = {
            if (buf.nonEmpty) {
              val cmd = kind match {
                case "update" => BDoc(Seq(
                  "update" -> BStr(collection),
                  "updates" -> BArr(buf.toSeq),
                  "ordered" -> BBool(true),
                  "$db" -> BStr(db)))
                case "delete" => BDoc(Seq(
                  "delete" -> BStr(collection),
                  "deletes" -> BArr(buf.toSeq),
                  "ordered" -> BBool(true),
                  "$db" -> BStr(db)))
              }
              session.command(cmd)
              buf.clear()
            }
          }
          def add(k: String, model: BDoc): Unit = {
            if (kind != k) { flush(); kind = k }
            buf += model
            if (buf.size >= bulk) flush()
          }

          rows.foreach { r =>
            val id = idVal(r)
            r.getString(r.fieldIndex("op")) match {
              case "d" | "x" =>
                if (deleteEnabled)
                  add("delete", BDoc(Seq(
                    "q" -> BDoc(Seq("_id" -> id)),
                    "limit" -> BInt32(1))))
              case "t" => () // collection truncation is not a write model
              case _ =>
                val doc = BDoc(("_id" -> id) +:
                  pf.map(f => f -> toB(r.get(r.fieldIndex(s"__v_$f")), extJson)))
                add("update", BDoc(Seq(
                  "q" -> BDoc(Seq("_id" -> id)),
                  "u" -> doc,
                  "upsert" -> BBool(true),
                  "multi" -> BBool(false))))
            }
          }
          flush()
        } finally session.close()
      }
    }
  }

  /** Read a collection back as a DataFrame of JSON documents
    * (verification path; `find` over the same wire).
    */
  def readCollection(spark: SparkSession, cfg: Config,
                     collection: String): DataFrame = {
    val session = new MongoWireClient.CommandSession(cfg.host, cfg.port)
    val docs =
      try {
        // follow the cursor with getMore until it closes (cursor id 0) —
        // firstBatch alone silently truncates at the server batch size
        val acc = Seq.newBuilder[BDoc]
        def drainBatch(c: BDoc, batchKey: String): Long = {
          c.get(batchKey) match {
            case Some(BArr(items)) =>
              acc ++= items.collect { case d: BDoc => d }
            case _ => ()
          }
          c.get("id") match {
            case Some(Bson.BInt64(id)) => id
            case _                     => 0L
          }
        }
        val first = session.command(BDoc(Seq(
          "find" -> BStr(collection), "$db" -> BStr(cfg.database))))
        var cursorId = first.get("cursor") match {
          case Some(c: BDoc) => drainBatch(c, "firstBatch")
          case _             => 0L
        }
        while (cursorId != 0L) {
          val more = session.command(BDoc(Seq(
            "getMore" -> Bson.BInt64(cursorId),
            "collection" -> BStr(collection), "$db" -> BStr(cfg.database))))
          cursorId = more.get("cursor") match {
            case Some(c: BDoc) => drainBatch(c, "nextBatch")
            case _             => 0L
          }
        }
        acc.result()
      } finally session.close()
    import spark.implicits._
    spark.read.json(docs.map(Bson.renderJson).toDS())
  }
}
