package graft.sources.wire

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Decoder for MongoDB change streams — SURVEY S12. The wire format is
  * the sequence of change-stream event documents a `watch()` cursor
  * returns (here a JSONL recording of that cursor): each event carries a
  * resume token (`_id._data`, a hex string whose byte order is the
  * stream's total order), `clusterTime` (`{t: seconds, i: increment}`),
  * `operationType`, `ns.{db,coll}`, `documentKey`, and depending on the
  * operation `fullDocument` and/or `updateDescription`
  * (`updatedFields` / `removedFields`).
  *
  * Reference semantics:
  *  - operation mapping insert→c, update→u, replace→u, delete→d —
  *    `recordemitter/MongoDbChangeRecordEmitter.java:43-46`; the server
  *    pipeline filters to exactly those four types
  *    (`ChangeStreamPipelineFactory.java`), so collection-level events
  *    (drop/rename/invalidate) never become data events;
  *  - events larger than 16 MB arrive split into fragments (each with
  *    its own resume token and a `splitEvent: {fragment, of}` marker)
  *    that must be reassembled before emitting —
  *    `events/SplitEventHandler.java:33-60`; fragments partition the
  *    top-level fields of the original event, and their resume tokens
  *    share the event's position prefix (the fragment ordinal is the
  *    token's suffix);
  *  - the event order / offset is the resume token; `clusterTime`
  *    provides `source.ts_ms` (`MongoDbOffsetContext`).
  *
  * Spark-first shape: the recording is a text DataFrame, every field
  * extraction is a `get_json_object` column expression (codegen, no
  * UDFs). Only rows carrying a `splitEvent` marker enter the fragment
  * reassembly — ONE map-side-combinable `groupBy(position-prefix)`
  * (fields are disjoint across fragments so `max` of each column merges
  * them); ordinary events bypass the aggregation entirely, so the
  * common path is map-only and two distinct unsplit events can never be
  * merged no matter how their tokens collide. No ordering assumption
  * beyond the resume-token prefix rule, so a 100 TB recording decodes
  * with a shuffle only over the (rare, >16 MB) split fragments.
  */
object MongoChangeStream {

  /** Hex digits of the resume token that encode the event position for
    * fragment grouping. Real `_data` v1 tokens open with the `82`
    * canonical-type header followed by the 8-byte BsonTimestamp, so 18
    * chars cover the full (t, i) identity — one second with many events
    * still separates, because the increment's low byte sits at chars
    * 17-18. (The recorded-fixture layout — 16 hex of position + 4 of
    * fragment ordinal — also groups correctly under this prefix: the
    * ordinal's two high chars are constant across fragments.)
    */
  val TokenPositionLen = 18

  /** Decode a recorded change-stream cursor (one JSON event document
    * per line in `lines.value`) into change events:
    * `(table, op, resume_token, ord, key_json, before_json,
    * after_json, updated_json, removed_fields)`.
    *
    * `after_json` is the full post-image when the capture mode recorded
    * one (inserts, replaces, and updates under update-lookup);
    * `before_json` is the collection pre-image when the server recorded
    * one (`fullDocumentBeforeChange` — the reference's
    * `capture.mode=*_with_pre_image` family, emitted as the envelope's
    * `before`); update events additionally carry the patch
    * (`updated_json` + `removed_fields`), mirroring the reference's
    * change-streams capture modes.
    */
  def decode(lines: DataFrame): DataFrame = {
    val v = col("value")
    val parsed = lines.select(
      get_json_object(v, "$._id._data").as("token"),
      get_json_object(v, "$.operationType").as("op_type"),
      get_json_object(v, "$.ns.db").as("db"),
      get_json_object(v, "$.ns.coll").as("coll"),
      (get_json_object(v, "$.clusterTime.t").cast("long") * lit(4294967296L) +
        get_json_object(v, "$.clusterTime.i").cast("long")).as("ord"),
      get_json_object(v, "$.documentKey").as("key_json"),
      get_json_object(v, "$.fullDocumentBeforeChange").as("before_json"),
      get_json_object(v, "$.fullDocument").as("after_json"),
      get_json_object(v, "$.updateDescription.updatedFields").as("updated_json"),
      get_json_object(v, "$.updateDescription.removedFields").as("removed_json"),
      get_json_object(v, "$.splitEvent").isNotNull.as("is_split"))

    val whole = parsed.filter(!col("is_split")).select(
      col("token").as("resume_token"), col("op_type"), col("db"),
      col("coll"), col("ord"), col("key_json"), col("before_json"),
      col("after_json"), col("updated_json"), col("removed_json"))

    // Fragment reassembly — split rows ONLY: group on the token's
    // position prefix; the split fields are disjoint, so max() collapses
    // each to its single non-null value. max(token) is the last
    // fragment's token — the one a client resumes from
    // (SplitEventHandler buffers until `of`).
    val reassembled = parsed.filter(col("is_split"))
      .groupBy(substring(col("token"), 1, TokenPositionLen).as("pos_prefix"))
      .agg(
        max(col("token")).as("resume_token"),
        max(col("op_type")).as("op_type"),
        max(col("db")).as("db"), max(col("coll")).as("coll"),
        max(col("ord")).as("ord"),
        max(col("key_json")).as("key_json"),
        max(col("before_json")).as("before_json"),
        max(col("after_json")).as("after_json"),
        max(col("updated_json")).as("updated_json"),
        max(col("removed_json")).as("removed_json"))
      .drop("pos_prefix")

    whole.unionByName(reassembled)
      .filter(col("op_type").isin("insert", "update", "replace", "delete"))
      .select(
        concat_ws(".", col("db"), col("coll")).as("table"),
        when(col("op_type") === "insert", "c")
          .when(col("op_type") === "delete", "d")
          .otherwise("u").as("op"),
        col("resume_token"), col("ord"), col("key_json"),
        col("before_json"), col("after_json"), col("updated_json"),
        array_join(from_json(col("removed_json"), ArrayType(StringType)), ",")
          .as("removed_fields"))
  }

  // ------------------------------------------------- cursor-order decode

  /** Decode a change-stream cursor in ARRIVAL order into wire rows for
    * the DSv2 change-log source — the executor-side counterpart of
    * [[decode]] for `.cs` segments: split-event fragments buffer until
    * the final fragment and merge field-wise, exactly the reference's
    * `SplitEventHandler.handle` (`events/SplitEventHandler.java:33-60`,
    * including its missing-fragment error). `pos` is the clusterTime
    * order; the payload is the post-image when recorded, else the
    * updateDescription patch document.
    */
  def segmentRows(lines: Iterator[String]): Iterator[PgOutput.WireRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val buffer = scala.collection.mutable.ArrayBuffer[
      com.fasterxml.jackson.databind.node.ObjectNode]()
    lines.filter(_.nonEmpty).flatMap { line =>
      val node = mapper.readTree(line)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val split = node.get("splitEvent")
      val complete =
        if (split == null) {
          if (buffer.nonEmpty)
            throw new IllegalStateException("missing event fragment")
          Some(node)
        } else {
          buffer += node
          if (split.get("fragment").asInt() == split.get("of").asInt()) {
            val out = mapper.createObjectNode()
            // fields are disjoint across fragments (explicit type arg:
            // Jackson's generic return otherwise infers Unit and miscasts)
            buffer.foreach(f =>
              out.setAll[com.fasterxml.jackson.databind.node.ObjectNode](f))
            buffer.clear()
            out.remove("splitEvent")
            Some(out)
          } else None
        }
      complete.flatMap(toWireRow)
    } ++ new Iterator[PgOutput.WireRow] {
      // a segment ending mid-split is a protocol error, same as a
      // non-split event following a partial buffer — dropping the
      // buffered fragments silently would lose the event
      def hasNext: Boolean = {
        if (buffer.nonEmpty)
          throw new IllegalStateException(
            "segment truncated inside a split event")
        false
      }
      def next(): PgOutput.WireRow = throw new NoSuchElementException
    }
  }

  private def toWireRow(ev: com.fasterxml.jackson.databind.node.ObjectNode)
      : Option[PgOutput.WireRow] = {
    val op = ev.path("operationType").asText("") match {
      case "insert" => "c"
      case "update" | "replace" => "u"
      case "delete" => "d"
      case _ => return None // collection-level events never become data
    }
    val ns = ev.get("ns")
    val table = s"${ns.get("db").asText()}.${ns.get("coll").asText()}"
    val ct = ev.get("clusterTime")
    val ord = ct.get("t").asLong() * 4294967296L + ct.get("i").asLong()
    val key = Option(ev.get("documentKey")).map(_.toString).getOrElse("null")
    val payload = Option(ev.get("fullDocument")).map(_.toString)
      .orElse(Option(ev.get("updateDescription")).map(_.toString))
      .getOrElse("null")
    Some(PgOutput.WireRow(table, op, ord, key, payload))
  }

  /** BSON total-order sort key for a JSON-rendered `_id` value — the
    * ordering the reference's `_id`-chunked incremental snapshot pages
    * by (`MongoDbIncrementalSnapshotChangeEventSource
    * .createDataEventsForDataCollection`: `find().sort({_id: 1})` with
    * `$gt lastKey` keyset pagination; MongoDB sorts mixed-type `_id`s
    * by BSON TYPE RANK first — null < numbers < string < object <
    * array < boolean — then by value within the type). Returns a
    * sortable struct `(rank, num, str)`: numbers compare numerically,
    * everything else lexically on its JSON rendering.
    *
    * Caveat of the JSON rendering: `get_json_object` strips string
    * quotes, so a STRING `_id` that happens to look numeric ranks as a
    * number here; callers with typed key columns should order by the
    * typed value instead (the rank only matters for mixed-type ids).
    */
  def bsonSortKey(idJson: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val num = idJson.try_cast("double") // non-numeric → null, ANSI-safe
    // a $numberDecimal wrapper is a NUMBER in BSON's sort order — it
    // ranks with doubles/ints and compares by its numeric value
    val dec = get_json_object(idJson, "$.$numberDecimal").try_cast("double")
    struct(
      when(idJson.isNull || idJson === "null", 5)
        .when(num.isNotNull, 10)
        .when(dec.isNotNull, 10)
        // Extended JSON wrappers rank as their BSON type (spec order:
        // … Array < BinData < ObjectId < Boolean < Date < Timestamp <
        // Regex); the checks must precede the generic object case
        .when(idJson.startsWith("{\"$binary\""), 30)
        .when(idJson.startsWith("{\"$oid\""), 35)
        .when(idJson.startsWith("{\"$date\""), 45)
        .when(idJson.startsWith("{\"$timestamp\""), 50)
        .when(idJson.startsWith("{\"$regularExpression\""), 55)
        .when(idJson.startsWith("{"), 20)
        .when(idJson.startsWith("["), 25)
        .when(idJson.isin("true", "false"), 40)
        .otherwise(15).as("rank"),
      coalesce(num, dec, lit(0.0)).as("num"),
      coalesce(idJson, lit("")).as("str"))
  }
}
