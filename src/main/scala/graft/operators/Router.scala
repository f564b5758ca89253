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
}
