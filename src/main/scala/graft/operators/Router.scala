package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Routing / partitioning / topology operators (SURVEY §2.4). All are pure
  * projections — no shuffle is introduced by routing itself; `repartitionBy`
  * is the only one that moves data and it shuffles exactly once on the
  * declared routing key (the Spark analogue of Kafka partition assignment).
  */
object Router {

  /** R5: default topic naming — `prefix.schema.table` (reference
    * `schema/DefaultTopicNamingStrategy.java`).
    */
  def defaultTopic(prefix: String): Column =
    concat_ws(".", lit(prefix), col("source.schema"), col("source.table"))

  /** R1: logical table router — regex-rewrite the topic of N sharded
    * physical tables into one logical topic, keeping the physical table id
    * as an extra key field so keys stay unique (reference
    * `ToLogicalTopicRouter.java:57-118`).
    */
  def logicalTableRouter(df: DataFrame, pattern: String, replacement: String,
                         keyFieldName: String = "__graft_physicalTableIdentifier")
      : DataFrame =
    df
      .withColumn("topic", regexp_replace(defaultTopic("graft"), pattern, replacement))
      .withColumn("key", col("key").withField(keyFieldName, col("source.table")))

  /** R2: partition routing — stable partition = f(payload fields) % n
    * (reference `partitions/PartitionRouting.java:46,243-247`). The hash
    * column is caller-supplied so tests can use an oracle-expressible
    * function; production default is `xxhash64`.
    */
  def partitionRouting(df: DataFrame, n: Int, hashCol: Column): DataFrame =
    df.withColumn("partition", pmod(hashCol, lit(n)).cast("int"))

  def partitionRoutingDefault(df: DataFrame, n: Int, fields: Seq[String]): DataFrame =
    partitionRouting(df, n, xxhash64(fields.map(col): _*))

  /** Physically co-locate by the routing key (one shuffle; downstream
    * per-partition consumers see all events of a key in one partition).
    */
  def repartitionBy(df: DataFrame, n: Int, fields: Seq[String]): DataFrame =
    df.repartition(n, fields.map(col): _*)

  /** R4: TimescaleDB router (reference
    * `postgresql/transforms/timescaledb/TimescaleDb.java:33-48`): remap
    * physical chunk tables `_hyper_<ht>_<n>_chunk` to their logical
    * hypertable topic, keeping the physical name as provenance.
    */
  def timescale(df: DataFrame, chunkTableCol: Column,
                hypertableNames: Column => Column = id =>
                  concat(lit("metrics_"), id)): DataFrame = {
    val htId = regexp_extract(chunkTableCol, "_hyper_(\\d+)_", 1)
    df
      .withColumn("hypertable", hypertableNames(htId))
      .withColumn("physical_table", chunkTableCol)
  }

  /** R3: outbox event router (reference `outbox/EventRouterDelegate.java:59,96,164`):
    * rows of an outbox-shaped table route by aggregate type; key becomes the
    * aggregate id; value becomes the payload.
    */
  def outbox(df: DataFrame, routeByField: String = "aggregatetype",
             keyField: String = "aggregateid", payloadField: String = "payload",
             topicPrefix: String = "outbox.event"): DataFrame =
    df.select(
      concat(lit(topicPrefix + "."), col(routeByField)).as("topic"),
      col(keyField).as("key"),
      col(payloadField).as("value"),
      col("*"))

  /** [[outbox]] with `table.expand.json.payload=true` (reference
    * `EventRouterConfigDefinition.java:342` +
    * `EventRouterDelegate`'s JSON expansion): the string payload parses
    * into a STRUCTURED `value` — schema inferred once from the payload
    * corpus (the reference builds a schema per record; one
    * corpus-consistent schema is the Spark-native equivalent, and
    * fields null in every payload drop like the reference's
    * JsonPayloadNullFieldBehavior.IGNORE). Unparseable payloads surface
    * as a null struct rather than poisoning the batch.
    */
  def outboxExpanded(df: DataFrame, routeByField: String = "aggregatetype",
                     keyField: String = "aggregateid",
                     payloadField: String = "payload",
                     topicPrefix: String = "outbox.event"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = spark.read.option("dropFieldIfAllNull", "true")
      .json(df.select(col(payloadField)).as[String]).schema
    df.select(
      concat(lit(topicPrefix + "."), col(routeByField)).as("topic"),
      col(keyField).as("key"),
      from_json(col(payloadField), schema).as("value"),
      col("*"))
  }

  /** Extract a field from a MongoDB extended-JSON document column and
    * unwrap the extended-JSON scalar wrappers the outbox fields use:
    * `{"$numberLong":"n"}` / `{"$numberInt":"n"}` (int64/int32),
    * `{"$oid":"hex"}` (ObjectId as its hex string) and
    * `{"$date":{"$numberLong":"ms"}}` / `{"$date":"iso"}` (epoch-millis
    * or relaxed ISO string). A plain (relaxed-mode) scalar passes
    * through unchanged — `get_json_object` on a non-object returns NULL
    * and the coalesce falls back to the raw extraction.
    */
  def extendedJsonField(doc: Column, field: String): Column = {
    val raw = get_json_object(doc, s"$$.$field")
    coalesce(
      get_json_object(raw, "$['$numberLong']"),
      get_json_object(raw, "$['$numberInt']"),
      get_json_object(raw, "$['$oid']"),
      get_json_object(raw, "$['$date']['$numberLong']"),
      get_json_object(raw, "$['$date']"),
      raw)
  }

  /** R3 (MongoDB): outbox event router over a change-stream feed of an
    * outbox COLLECTION (reference
    * `mongodb/transforms/outbox/MongoEventRouter.java:71,118` +
    * `MongoEventRouterConfigDefinition.java:22-113`). Differences from
    * the relational [[outbox]], mirrored here:
    *
    *   - the captured image is not a typed struct but an extended-JSON
    *     STRING (`after_json` from `MongoChangeStream.decode`);
    *     `expandAfterField` parses it and this router resolves every
    *     outbox field out of that document, unwrapping extended-JSON
    *     scalars (`$numberLong`, `$oid`, `$date`) on the way;
    *   - `collection.field.event.*` names replace `table.field.event.*`
    *     (defaults: id=`_id`, type=`type`, payload=`payload`) — the
    *     reference converts them and delegates to the shared
    *     `EventRouterDelegate`, so routing semantics are identical:
    *     topic = `<prefix>.<routedByValue>`, key = the aggregate id,
    *     Kafka timestamp overridable from `collection.field.event.timestamp`;
    *   - a sub-DOCUMENT payload stays a JSON string unless
    *     `collection.expand.json.payload=true`, in which case it parses
    *     into a corpus-schema struct exactly like [[outboxExpanded]];
    *   - only insert events route (the reference expects an append-only
    *     outbox; `operation.invalid.behavior=skip` drops the rest), and
    *     an empty/absent payload with `route.tombstone.on.empty.payload`
    *     emits a null-value tombstone instead of being dropped.
    */
  def mongoOutbox(df: DataFrame, afterCol: String = "after_json",
                  routeByField: String = "aggregatetype",
                  idField: String = "_id", keyField: String = "aggregateid",
                  payloadField: String = "payload",
                  timestampField: Option[String] = None,
                  expandPayload: Boolean = false,
                  tombstoneOnEmptyPayload: Boolean = false,
                  topicPrefix: String = "outbox.event"): DataFrame = {
    val inserts = df.filter(col("op") === "c" || col("op") === "r")
    val doc = col(afterCol)
    val payloadJson = get_json_object(doc, s"$$.$payloadField")
    val keep =
      if (tombstoneOnEmptyPayload) lit(true)
      else payloadJson.isNotNull && payloadJson =!= ""
    val value: Column =
      if (expandPayload) {
        val spark = df.sparkSession
        import spark.implicits._
        val schema = spark.read.option("dropFieldIfAllNull", "true")
          .json(inserts.select(payloadJson).as[String]).schema
        from_json(payloadJson, schema)
      } else when(payloadJson.isNotNull && payloadJson =!= "", payloadJson)
    val ts = timestampField.map(f =>
      extendedJsonField(doc, f).cast("long")).getOrElse(col("pos"))
    inserts
      .filter(keep)
      .select(
        concat(lit(topicPrefix + "."),
          extendedJsonField(doc, routeByField)).as("topic"),
        extendedJsonField(doc, keyField).as("key"),
        value.as("value"),
        extendedJsonField(doc, idField).as("id"),
        extendedJsonField(doc, "type").as("type"),
        ts.as("ts_ms"),
        col("*"))
  }
}
