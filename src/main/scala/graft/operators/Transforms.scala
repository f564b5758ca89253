package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.model.Envelope

/** Record-at-a-time transforms over the envelope DataFrame — the engine's
  * equivalent of the reference's single-message-transform chain (reference
  * `debezium-embedded/src/main/java/io/debezium/embedded/Transformations.java:30,92`).
  * Every transform is `DataFrame => DataFrame` so a chain stays one Catalyst
  * plan: projections fuse into a single whole-stage-codegen'd select, and a
  * transform never forces a shuffle.
  */
object Transforms {

  private def payloadFields(df: DataFrame): Seq[String] =
    df.schema("after").dataType.asInstanceOf[StructType].fieldNames.toSeq

  // --- T1: table include/exclude filter (reference `relational/Selectors.java`) ---
  def tableFilter(df: DataFrame, include: Option[String],
                  exclude: Option[String]): DataFrame = {
    val inc = include.map(r => col("source.table").rlike(r)).getOrElse(lit(true))
    val exc = exclude.map(r => !col("source.table").rlike(r)).getOrElse(lit(true))
    df.filter(inc && exc)
  }

  // --- T2: column include/exclude projection on before/after
  //     (reference `TableSchemaBuilder.java:155-203`) ---
  def columnFilter(df: DataFrame, keep: String => Boolean): DataFrame = {
    val dropped = payloadFields(df).filterNot(keep)
    if (dropped.isEmpty) df
    else df
      .withColumn("before", col("before").dropFields(dropped: _*))
      .withColumn("after", col("after").dropFields(dropped: _*))
  }

  // --- T3: column masking — constant stars or salted SHA-256
  //     (reference `relational/mapping/MaskStrings.java:34,111-122`) ---
  def maskConstant(df: DataFrame, column: String, mask: String = "***"): DataFrame =
    mapPayloadField(df, column, _ => lit(mask))

  def maskHash(df: DataFrame, column: String, salt: String): DataFrame =
    mapPayloadField(df, column, c => sha2(concat(lit(salt), c.cast(StringType)), 256))

  // --- T4: column truncation (reference `relational/mapping/TruncateColumn.java`) ---
  def truncateColumn(df: DataFrame, column: String, length: Int): DataFrame =
    mapPayloadField(df, column, c => substring(c, 1, length))

  /** Apply `f` to one payload field in both row images (null-struct-safe:
    * `withField` on a null struct stays null).
    */
  def mapPayloadField(df: DataFrame, column: String, f: Column => Column): DataFrame =
    df
      .withColumn("before", col("before").withField(column, f(col(s"before.`$column`"))))
      .withColumn("after", col("after").withField(column, f(col(s"after.`$column`"))))

  // --- T6: expression filter (replaces the reference's scripted Filter SMT,
  //     `debezium-scripting/.../transforms/Filter.java` — Spark SQL `expr`
  //     is the sandboxed, Catalyst-optimized replacement) ---
  def filterExpr(df: DataFrame, sqlExpr: String): DataFrame =
    df.filter(expr(sqlExpr))

  // --- T7: content-based router (reference `ContentBasedRouter.java:23-35`) ---
  def contentRouter(df: DataFrame, topicExpr: Column): DataFrame =
    df.withColumn("topic", topicExpr)

  // --- T8: ExtractNewRecordState — unwrap envelope to a flat row (reference
  //     `debezium-connect-plugins/.../ExtractNewRecordState.java:53,105-167`).
  //     deleteMode: "rewrite" keeps deletes with __deleted=true using the
  //     before image; "drop" removes them; "none" passes after (null fields). ---
  def unwrap(df: DataFrame, deleteMode: String = "rewrite",
             addFields: Seq[String] = Nil,
             addHeaders: Seq[String] = Nil,
             fieldPrefix: String = "__",
             headerPrefix: String = "__",
             routeByField: Option[String] = None): DataFrame = {
    val fields = payloadFields(df)
    val isDelete = col("op") === Envelope.OpDelete
    val base0 = deleteMode match {
      case "drop" => df.filter(!isDelete)
      case _      => df
    }
    // "tombstone" (ref ExtractNewRecordStateConfigDefinition.java:72
    // delete.tombstone.handling.mode=tombstone): a delete flattens to its
    // null AFTER image — the record becomes a tombstone-shaped all-null row
    val image =
      if (deleteMode == "tombstone") col("after")
      else when(isDelete, col("before")).otherwise(col("after"))
    val flat = fields.map(f => image.getField(f).as(f))
    def envelopeRef(name: String): (String, Column) = name match {
      case "op"    => ("op", col("op"))
      case "ts_ms" => ("ts_ms", col("ts_ms"))
      case s if s.startsWith("source.") => (s.stripPrefix("source."), col(s))
      case other   => (other, col(other))
    }
    // add.fields / add.fields.prefix (ref ExtractNewRecordStateConfigDefinition
    // .java:94-102): envelope metadata carried as prefixed flat columns
    val added = addFields.map { f =>
      val (n, c) = envelopeRef(f); c.as(fieldPrefix + n)
    }
    // add.headers / add.headers.prefix (ref :113-121): the same metadata as
    // a transport-header map column (the frame shape HeaderToValue and the
    // HasHeaderKey predicate consume)
    val headerCol =
      if (addHeaders.isEmpty) Nil
      else Seq(map(addHeaders.flatMap { h =>
        val (n, c) = envelopeRef(h)
        Seq(lit(headerPrefix + n), c.cast(StringType))
      }: _*).as("headers"))
    // route.by.field (ref :86): the routed topic becomes the value of one
    // payload field
    val routed = routeByField.toSeq.map(f => image.getField(f)
      .cast(StringType).as("topic"))
    val deleted =
      if (deleteMode == "rewrite")
        Seq(isDelete.cast(StringType).as("__deleted"))
      else Nil
    base0.select(flat ++ deleted ++ added ++ headerCol ++ routed: _*)
  }

  // --- T10: ExtractChangedRecordState — names of fields that differ between
  //     before and after (reference `ExtractChangedRecordState.java:36-68`).
  //     Emitted as a sorted comma-joined string for stable comparison. ---
  def changedFields(df: DataFrame): DataFrame = {
    val fields = payloadFields(df)
    val changed = array(fields.map { f =>
      when(!(col(s"before.`$f`") <=> col(s"after.`$f`")), lit(f))
        .otherwise(lit(null).cast(StringType))
    }: _*)
    df.withColumn("changed_fields",
      array_join(array_sort(filter(changed, _.isNotNull)), ","))
  }

  // --- T13: EnforceRecordSize (reference `EnforceRecordSize.java:48`).
  //     Record size := total length of all payload fields rendered as text
  //     (deterministic, engine-independent definition). ---
  def recordSize(df: DataFrame, sized: Seq[String] = Nil): Column = {
    val fields = if (sized.nonEmpty) sized else payloadFields(df)
    val image = when(col("op") === Envelope.OpDelete, col("before")).otherwise(col("after"))
    fields.map(f => coalesce(length(image.getField(f).cast(StringType)), lit(0)))
      .reduce(_ + _)
  }

  /** `mode` mirrors the reference's two behaviors: "drop" filters
    * oversize records out; "fail" aborts the job on the first oversize
    * record (ref `EnforceRecordSize.java:48`). Fail mode rides on
    * `assert_true` inside the filter condition so Catalyst cannot prune
    * the check away.
    */
  def enforceRecordSize(df: DataFrame, maxSize: Int,
                        sized: Seq[String] = Nil,
                        mode: String = "drop"): DataFrame = {
    val sz = recordSize(df, sized)
    mode match {
      case "fail" =>
        df.filter(coalesce(
          assert_true(sz <= maxSize,
            concat(lit(s"record exceeds $maxSize bytes: "), sz.cast(StringType)))
            .cast("boolean"),
          lit(true)))
      case _ => df.filter(sz <= maxSize)
    }
  }

  // --- T9 (inference form): extract a schemaless JSON document column by
  //     inferring its struct schema from a bounded sample of the data —
  //     the engine's answer to the reference's Mongo document schema
  //     inference (`transforms/MongoDataConverter.java`): Spark's JSON
  //     reader unions field types across sampled documents. ---
  def extractDocumentInferred(df: DataFrame, jsonCol: String,
                              sampleN: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).limit(sampleN).as[String]
    val schema = spark.read.json(sample).schema
    df.withColumn("__doc", from_json(col(jsonCol), schema))
  }

  // --- T23: DecodeLogicalDecodingMessageContent (reference
  //     `debezium-connector-postgres/.../transforms/
  //     DecodeLogicalDecodingMessageContent.java:96-135,166-205`): convert
  //     the binary JSON content of a pg logical decoding message
  //     (`pg_logical_emit_message`, surfaced by LogicalDecodingMessageMonitor
  //     as op="m" records with a `message {prefix, content}` struct) into a
  //     structured `after` image so the record reads as an INSERT (op="c")
  //     and is routable by the outbox EventRouter. The `message` struct is
  //     dropped and the key cleared (the reference emits a null key/schema).
  //     `fields.null.include=false` (the reference default) omits fields
  //     that are null in every message: Spark's `dropFieldIfAllNull` JSON
  //     inference option is the engine-level analog of the reference's
  //     JsonPayloadNullFieldBehavior.IGNORE. Inference reads EVERY
  //     message by default (one extra pass; the reference derives fields
  //     per record, so a field appearing only late in the frame must
  //     still make the schema) — pass sampleN > 0 to trade that pass for
  //     a bounded prefix when the content shape is known uniform. ---
  def decodeMessageContent(df: DataFrame, fieldsNullInclude: Boolean = false,
                           sampleN: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val contentStr = col("message.content").cast("string")
    val sampled =
      if (sampleN > 0) df.select(contentStr).limit(sampleN)
      else df.select(contentStr)
    val schema = spark.read
      .option("dropFieldIfAllNull", (!fieldsNullInclude).toString)
      .json(sampled.as[String]).schema
    df.withColumn("after", from_json(contentStr, schema))
      .withColumn("op", lit("c"))
      .withColumn("key", lit(null).cast(StringType))
      .drop("message")
  }

  // --- T14: TimezoneConverter (reference `TimezoneConverter.java:57-128`):
  //     shift designated timestamp payload fields to a target zone. ---
  def convertTimezone(df: DataFrame, columns: Seq[String], tz: String): DataFrame =
    columns.foldLeft(df)((d, c) =>
      mapPayloadField(d, c, x => from_utc_timestamp(x, tz)))

  // --- T16: ReadToInsertEvent (reference
  //     `debezium-connector-mysql/.../ReadToInsertEvent.java`) ---
  def readToInsert(df: DataFrame): DataFrame =
    df.withColumn("op",
      when(col("op") === Envelope.OpRead, Envelope.OpCreate).otherwise(col("op")))

  // --- P11: skipped operations (reference `CommonConnectorConfig.java:865-872`,
  //     default skips truncate) ---
  def skipOperations(df: DataFrame, skipped: Seq[String] = Seq("t")): DataFrame =
    df.filter(!col("op").isin(skipped: _*))

  // --- T11: ExtractSchemaToNewRecord — copy source schema metadata into a
  //     sub-struct of the record (reference `ExtractSchemaToNewRecord.java`) ---
  def extractSchemaInfo(df: DataFrame): DataFrame = {
    val fields = payloadFields(df)
    df.withColumn("__schema", struct(
      col("source.table").as("table"),
      lit(fields.mkString(",")).as("fields"),
      lit(fields.size).as("n_fields")))
  }

  // --- T12: HeaderToValue — copy/move a transport header into a payload
  //     field (reference `HeaderToValue.java:38-79`; headers are a
  //     MAP<STRING,STRING> column on the frame) ---
  def headerToValue(df: DataFrame, header: String, field: String,
                    move: Boolean = false): DataFrame = {
    val added = df.withColumn(field, col("headers").getItem(header))
    if (move) added.withColumn("headers",
      map_filter(col("headers"), (k, _) => k =!= header))
    else added
  }

  // --- T15: SchemaChangeEventFilter — drop schema-change events by type
  //     (reference `SchemaChangeEventFilter.java`) ---
  def schemaChangeFilter(df: DataFrame, excludedTypes: Seq[String],
                         typeCol: String = "change_type"): DataFrame =
    df.filter(!col(typeCol).isin(excludedTypes: _*))

  // --- T22: reselect-columns post processor — refill placeholder (TOAST/
  //     LOB) values by re-querying the source table (reference
  //     `processors/reselect/ReselectColumnsPostProcessor.java:68`). Runs on
  //     unwrapped rows; the source side is broadcast when small, else it is
  //     a keyed join — either way one declarative join, no per-row lookups. ---
  def reselectColumns(unwrapped: DataFrame, source: DataFrame, keyCol: String,
                      cols: Seq[String],
                      placeholder: String = "__unavailable"): DataFrame = {
    val src = source.select((keyCol +: cols).map(c => col(c).as(s"_src_$c")): _*)
    val joined = unwrapped.join(src,
      unwrapped(keyCol) === col(s"_src_$keyCol"), "left")
    val refilled = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col(c) === placeholder, col(s"_src_$c")).otherwise(col(c)))
    }
    refilled.drop((s"_src_$keyCol" +: cols.map(c => s"_src_$c")): _*)
  }

  /** [[reselectColumns]] with the reference's RESELECT CACHE semantics
    * (`processors/reselect/cache/MemoryReselectColumnCache.java`): an
    * unavailable (TOAST/LOB) value refills from the key's MOST RECENT
    * known value already seen IN THE STREAM — the cache hit, a pure
    * per-key window over `posCol`, no source access — and only keys
    * with no earlier in-stream value fall back to the source-table
    * reselect (the cache miss; the fallback join's probe side is
    * pre-filtered to the still-missing rows, so at scale the re-query
    * cost tracks MISSES, not unavailable volume — exactly why the
    * reference added the cache).
    */
  def reselectColumnsCached(unwrapped: DataFrame, source: DataFrame,
                            keyCol: String, posCol: String,
                            cols: Seq[String],
                            placeholder: String = "__unavailable"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(posCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cached = cols.foldLeft(unwrapped) { (d, c) =>
      d.withColumn(c,
        when(col(c) === placeholder,
          // last_value over the preceding frame skips placeholders via
          // the null trick (ignoreNulls), i.e. the newest CACHED value
          coalesce(
            last(when(col(c) =!= placeholder, col(c)), ignoreNulls = true)
              .over(w),
            col(c)))
          .otherwise(col(c)))
    }
    // null-safe equality: a legitimate NULL in a reselect column must
    // route the row to the hit side, not evaluate the predicate to NULL
    // (which would fail BOTH filters and silently drop the row)
    val stillMissing = cols.map(c => col(c) <=> placeholder).reduce(_ || _)
    val hits = cached.filter(!stillMissing)
    val misses = reselectColumns(cached.filter(stillMissing), source,
      keyCol, cols, placeholder)
    hits.unionByName(misses)
  }

  // --- T5: propagate source metadata into field metadata (reference
  //     `relational/mapping/PropagateSourceMetadataToSchemaParameter.java`) ---
  def propagateSourceMetadata(schema: StructType, table: String,
                              nativeTypes: Map[String, String]): StructType =
    StructType(schema.fields.map { f =>
      val mb = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(f.metadata)
        .putString("__graft.source.table", table)
      nativeTypes.get(f.name).foreach(t => mb.putString("__graft.source.column.type", t))
      f.copy(metadata = mb.build())
    })
}
