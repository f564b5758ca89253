package graft

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators.{Predicates, Router, Transforms}
import graft.operators.TypeHandling

/** The reference-keyed configuration surface (SURVEY §3.1): a user of the
  * reference configures an embedded engine with a flat `Properties` map —
  * `connector.class`, `table.include.list`, `transforms=unwrap,route` with
  * `transforms.<name>.type` class names, `snapshot.mode`, storage backend
  * class names, and the dynamic `column.mask.*`/`column.truncate.*` key
  * families. This object accepts THE SAME KEY NAMES and class-name values
  * (reference `debezium-embedded/src/main/java/io/debezium/embedded/
  * EmbeddedEngineConfig.java:29-139`, `debezium-connector-common/.../config/
  * CommonConnectorConfig.java:670-892`, `.../relational/
  * RelationalDatabaseConnectorConfig.java:283-533`) and compiles them into
  * the engine's native `Pipeline.Spec` + an ordered SMT chain of
  * `DataFrame => DataFrame` links — so a reference user's connector
  * `.properties` file drives this engine unchanged.
  *
  * Everything compiles to ONE declarative Column/DataFrame expression chain;
  * Catalyst optimizes across the whole configured pipeline exactly as it
  * does for the programmatic `Pipeline.Spec` path.
  *
  * Documented divergence: scripted SMTs (`io.debezium.transforms.Filter` /
  * `ContentBasedRouter`) accept `language=spark.sql` here — conditions are
  * Spark SQL expressions, not Groovy/GraalJS scripts (SURVEY §2.8: the
  * script engines are a deliberate non-goal; `expr()` replaces them).
  */
object EngineConfig {

  /** One configured SMT chain link (reference `embedded/Transformations.java:
    * 50-55` builds the same ordered list from the `transforms` value).
    */
  final case class Link(name: String, smtClass: String,
                        apply: DataFrame => DataFrame)

  final case class Compiled(
      engineName: String,
      connectorClass: String,
      topicPrefix: String,
      /** ref `tombstones.on.delete` (`CommonConnectorConfig.java:690`),
        * default true — the FEED emits post-delete tombstones.
        */
      tombstonesOnDelete: Boolean,
      /** ref `message.key.columns` (`RelationalDatabaseConnectorConfig
        * .java:323`): `db.table:col1,col2;...` → per-table key override.
        */
      messageKeyColumns: Map[String, Seq[String]],
      spec: Pipeline.Spec,
      /** ref `schema.name.adjustment.mode` / `field.name.adjustment.mode`
        * (`CommonConnectorConfig.java:904,915`): identifier sanitizers for
        * sink-side catalog/field names (avro → `Names.avroSafe`).
        */
      schemaNameAdjuster: String => String,
      fieldNameAdjuster: String => String,
      /** ref `event.processing.failure.handling.mode`
        * (`CommonConnectorConfig.java:836`): fail | warn | skip.
        */
      failureHandlingMode: String,
      /** ref `snapshot.select.statement.overrides`
        * (`RelationalDatabaseConnectorConfig.java:348`): the WHERE clause
        * of this table's snapshot override statement, applied to op=r
        * events only (`SELECT *` form — projections belong to
        * `column.include.list`).
        */
      snapshotOverrideWhere: Option[String],
      /** payload columns kept by `column.include.list` (applied as the
        * first chain stage; None = keep all).
        */
      columnInclude: Option[String => Boolean],
      chain: Seq[Link],
      offsetStore: Option[() => OffsetBackingStore],
      history: Option[() => HistoryStorage]) {

    def keyOverrideFor(table: String): Option[Seq[String]] =
      messageKeyColumns.get(table)

    /** Run the compiled pipeline over an envelope feed: connector-level
      * spec first (include lists, snapshot gate, masks, type handling),
      * then the SMT chain in configured order — the reference's
      * source-connector → `Transformations.transform` shape.
      */
    def run(feed: DataFrame): DataFrame = {
      val base0 = Pipeline(feed, spec)
      // snapshot override WHERE: bare payload column refs resolve against
      // the after image; stream events (op != r) are untouched — the
      // reference applies the statement only to the snapshot SELECT
      val base = snapshotOverrideWhere match {
        case Some(pred) =>
          // resolve the WHERE against the after image by EXPANDING the
          // struct into scope, never by text rewriting — a regex replace
          // would corrupt string literals containing column names and
          // names with regex metacharacters. Every envelope column is
          // first moved to a reserved-prefix temporary so the payload
          // fields are the ONLY bare names in scope: a payload field
          // named like an envelope column (key, op, source, ts_ms …)
          // neither collides (AMBIGUOUS_REFERENCE) nor loses resolution
          // to the envelope — matching the reference, where the override
          // statement is SQL against the source table and sees only its
          // columns (`snapshot.select.statement.overrides`,
          // `RelationalDatabaseConnectorConfig.java:348`).
          val envCols = base0.columns.toSeq
          def tmp(c: String) = s"__graft_env_$c"
          val renamed = base0.select(
            envCols.map(c => base0(s"`$c`").as(tmp(c))): _*)
          renamed
            .select(envCols.map(c => col(tmp(c))) :+
              col(s"${tmp("after")}.*"): _*)
            .filter(col(tmp("op")) =!= Envelope.OpRead || expr(pred))
            .select(envCols.map(c => col(tmp(c)).as(c)): _*)
        case None => base0
      }
      val included = columnInclude match {
        case Some(keep) => Transforms.columnFilter(base, keep)
        case None       => base
      }
      chain.foldLeft(included)((df, l) => l.apply(df))
    }

    /** Apply the configured failure handling to records failing `valid`
      * (ref `pipeline/ErrorHandler.java` + EventProcessingFailureHandling
      * Mode): `fail` raises on the first invalid record AT EXECUTION (a
      * codegen'd conditional, no extra pass), `warn`/`skip` drop them —
      * `warn` keeps the dead letters observable via
      * `ErrorHandling.quarantine` downstream.
      */
    def handleFailures(df: DataFrame, valid: Column): DataFrame =
      failureHandlingMode match {
        case "fail" =>
          df.filter(coalesce(assert_true(coalesce(valid, lit(false)),
            lit("event processing failed and " +
              "event.processing.failure.handling.mode=fail")), lit(true)))
        case "warn" | "skip" => df.filter(coalesce(valid, lit(false)))
        case other => fail(s"unsupported failure handling mode '$other'")
      }
  }

  // Dynamic key families (reference `RelationalDatabaseConnectorConfig
  // .java:472-488` — the key itself carries the parameter, the value is a
  // comma list of fully-qualified columns).
  private val MaskHashKey = "^column\\.mask\\.hash\\.([^.]+)\\.with\\.salt\\.(.+)$".r
  private val MaskCharsKey = "^column\\.mask\\.with\\.(\\d+)\\.chars$".r
  private val TruncateKey = "^column\\.truncate\\.to\\.(\\d+)\\.chars$".r

  /** Resolve a comma list of fully-qualified `db.table.column` (or
    * `table.column`, or bare `column`) names against the configured table:
    * entries naming another table are dropped, matching the reference's
    * per-table column-mapper resolution (`relational/ColumnMappers.java`).
    */
  private def columnsFor(value: String, table: String): Seq[String] =
    value.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { fq =>
      val parts = fq.split("\\.")
      if (parts.length == 1) Some(parts(0))
      else if (table.isEmpty || parts(parts.length - 2) == table)
        Some(parts.last)
      else None
    }

  /** Comma-separated regex list → one alternation regex (the reference's
    * include/exclude lists are comma-separated regexes —
    * `RelationalDatabaseConnectorConfig.java:283-314`).
    */
  private def regexAlternation(value: String): String =
    value.split(",").map(_.trim).filter(_.nonEmpty)
      .map(r => s"(?:$r)").mkString("|")

  private def parseSnapshotter(props: Map[String, String],
                               custom: Map[String, Snapshotter]): Snapshotter =
    props.getOrElse("snapshot.mode", "initial") match {
      case "initial"      => Snapshotter.Initial
      case "initial_only" => Snapshotter.InitialOnly
      case "always"       => Snapshotter.Always
      case "no_data" | "never" => Snapshotter.NoData
      case "when_needed"  => Snapshotter.WhenNeeded
      case "recovery"     => Snapshotter.Recovery
      case "configuration_based" =>
        // ref CommonConnectorConfig.java:1168-1212
        def b(k: String) = props.get(k).exists(_.toBoolean)
        Snapshotter.ConfigurationBased(
          snapshotData = b("snapshot.mode.configuration.based.snapshot.data"),
          snapshotSchema = b("snapshot.mode.configuration.based.snapshot.schema"),
          stream = b("snapshot.mode.configuration.based.start.stream"))
      case "custom" =>
        // ref snapshot.mode.custom.name (CommonConnectorConfig.java:1088)
        // resolved against the caller-registered SPI implementations
        val name = props.getOrElse("snapshot.mode.custom.name",
          fail("snapshot.mode.custom.name is required for snapshot.mode=custom"))
        custom.getOrElse(name,
          fail(s"no custom snapshotter registered under '$name'"))
      case other => fail(s"unsupported snapshot.mode '$other'")
    }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private val OverrideStmt =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+\S+(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r

  /** ref `snapshot.select.statement.overrides` = fq-table list, with the
    * statement under `snapshot.select.statement.overrides.<db>.<table>`
    * (`RelationalDatabaseConnectorConfig.java:348`). Only the `SELECT *
    * … WHERE` form carries information here (projection belongs to
    * `column.include.list`); returns the WHERE clause for this table.
    */
  private def parseSnapshotOverride(props: Map[String, String],
                                    table: String): Option[String] = {
    val P = "snapshot.select.statement.overrides."
    props.collectFirst {
      case (k, stmt) if k.startsWith(P) &&
          k.split("\\.").last == table && table.nonEmpty =>
        stmt match {
          case OverrideStmt(sel, where) =>
            if (sel.trim != "*")
              fail("snapshot override projections are unsupported — use " +
                "column.include.list; only SELECT * [WHERE …] is accepted")
            Option(where)
          case _ => fail(s"unparseable snapshot override statement: $stmt")
        }
    }.flatten
  }

  /** Sub-view of the properties under a prefix, prefix stripped —
    * the reference's `Configuration.subset(prefix, true)`.
    */
  private def subset(props: Map[String, String], prefix: String): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }

  private def scriptLanguage(conf: Map[String, String], smt: String): Unit =
    conf.get("language").foreach { l =>
      if (l != "spark.sql")
        fail(s"$smt language '$l' unsupported: this engine evaluates " +
          "conditions as Spark SQL expressions (language=spark.sql)")
    }

  /** The tombstone test every scripted SMT's `null.handling.mode` gates on
    * (reference `ScriptingTransformation.java:121` — a record with a null
    * value).
    */
  private val isTombstone: Column = col("after").isNull && col("before").isNull

  private def buildSmt(smtClass: String, conf: Map[String, String],
                       topicPrefix: String): DataFrame => DataFrame =
    smtClass match {
      case "io.debezium.transforms.ExtractNewRecordState" =>
        // ref ExtractNewRecordStateConfigDefinition.java:72-121
        val mode = conf.getOrElse("delete.tombstone.handling.mode", "drop")
        def csv(k: String) = conf.get(k).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val addFields = csv("add.fields")
        val addHeaders = csv("add.headers")
        val fieldPrefix = conf.getOrElse("add.fields.prefix", "__")
        val headerPrefix = conf.getOrElse("add.headers.prefix", "__")
        val routeBy = conf.get("route.by.field")
        val deleteMode = mode match {
          case "drop"                    => "drop"
          case "rewrite"                 => "rewrite"
          case "rewrite-with-tombstone"  => "rewrite"
          case "tombstone"               => "tombstone"
          case other => fail(s"unsupported delete.tombstone.handling.mode '$other'")
        }
        df => {
          val pre = if (mode == "rewrite-with-tombstone") df
                    else df.filter(col("op") =!= Envelope.OpTombstone)
          Transforms.unwrap(pre, deleteMode, addFields, addHeaders,
            fieldPrefix, headerPrefix, routeBy)
        }

      case "io.debezium.transforms.Filter" =>
        // ref debezium-scripting/.../transforms/Filter.java:23 (condition),
        // ScriptingTransformation.java:112-121 (language, null.handling.mode)
        scriptLanguage(conf, "Filter")
        val cond = conf.getOrElse("condition", fail("Filter requires 'condition'"))
        conf.getOrElse("null.handling.mode", "keep") match {
          case "keep"     => df => df.filter(isTombstone || expr(cond))
          case "drop"     => df => df.filter(!isTombstone && expr(cond))
          case "evaluate" => df => df.filter(expr(cond))
          case other => fail(s"unsupported null.handling.mode '$other'")
        }

      case "io.debezium.transforms.ContentBasedRouter" =>
        // ref ContentBasedRouter.java:25 (topic.expression)
        scriptLanguage(conf, "ContentBasedRouter")
        val e = conf.getOrElse("topic.expression",
          fail("ContentBasedRouter requires 'topic.expression'"))
        df => Transforms.contentRouter(df, expr(e))

      case "io.debezium.transforms.ByLogicalTableRouter" |
           "io.debezium.transforms.ToLogicalTopicRouter" =>
        // ref ToLogicalTopicRouter.java:59-112
        val pattern = conf.getOrElse("topic.regex",
          fail("router requires 'topic.regex'"))
        val replacement = conf.getOrElse("topic.replacement",
          fail("router requires 'topic.replacement'"))
        val keyField = conf.getOrElse("key.field.name",
          "__dbz__physicalTableIdentifier")
        df => Router.logicalTableRouter(df, pattern, replacement, keyField)

      case "io.debezium.transforms.outbox.EventRouter" =>
        // ref outbox/EventRouterConfigDefinition.java:239-305; the reference
        // SMT internally after-extracts the envelope before routing
        // (EventRouterDelegate.java:96 afterExtractor) — same here: deletes
        // and tombstones are skipped, the after image is the outbox row
        val routeBy = conf.getOrElse("route.by.field", "aggregatetype")
        val keyField = conf.getOrElse("table.field.event.key", "aggregateid")
        val payload = conf.getOrElse("table.field.event.payload", "payload")
        df => {
          val rows = df
            .filter(!col("op").isin(Envelope.OpDelete, Envelope.OpTombstone))
            .select(col("after.*"))
          Router.outbox(rows, routeBy, keyField, payload)
        }

      case "io.debezium.transforms.TimezoneConverter" =>
        // ref TimezoneConverter.java:60-82
        val tz = conf.getOrElse("converted.timezone",
          fail("TimezoneConverter requires 'converted.timezone'"))
        val fields = conf.get("include.list").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        df => Transforms.convertTimezone(df, fields, tz)

      case "io.debezium.transforms.HeaderToValue" =>
        // ref HeaderToValue.java:72-93
        def list(k: String) = conf.getOrElse(k, fail(s"HeaderToValue requires '$k'"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val headers = list("headers")
        val fields = list("fields")
        require(headers.length == fields.length,
          "HeaderToValue: 'headers' and 'fields' must have the same length")
        val move = conf.getOrElse("operation", "copy") == "move"
        df => headers.zip(fields).foldLeft(df) { case (d, (h, f)) =>
          Transforms.headerToValue(d, h, f, move)
        }

      case "io.debezium.transforms.ExtractChangedRecordState" =>
        df => Transforms.changedFields(df)

      case "io.debezium.connector.postgresql.transforms.DecodeLogicalDecodingMessageContent" =>
        // ref DecodeLogicalDecodingMessageContent.java:57-64 (the single
        // fields.null.include config) — a message-monitor frame's binary
        // JSON content becomes the structured after image
        val keepNulls =
          conf.getOrElse("fields.null.include", "false").toBoolean
        df => Transforms.decodeMessageContent(df, keepNulls)

      case other => fail(s"unsupported transform type '$other'")
    }

  private def predicateColumn(ptype: String, conf: Map[String, String]): Column =
    ptype match {
      // ref embedded/Predicates.java binds these three Connect predicates
      case "org.apache.kafka.connect.transforms.predicates.TopicNameMatches" =>
        Predicates.topicNameMatches(conf.getOrElse("pattern",
          fail("TopicNameMatches requires 'pattern'")))
      case "org.apache.kafka.connect.transforms.predicates.HasHeaderKey" =>
        Predicates.hasHeaderKey(conf.getOrElse("name",
          fail("HasHeaderKey requires 'name'")))
      case "org.apache.kafka.connect.transforms.predicates.RecordIsTombstone" =>
        Predicates.recordIsTombstone
      case other => fail(s"unsupported predicate type '$other'")
    }

  private def parseOffsetStore(props: Map[String, String])
      : Option[() => OffsetBackingStore] =
    props.get("offset.storage").map {
      case "org.apache.kafka.connect.storage.MemoryOffsetBackingStore" =>
        () => new MemoryOffsetBackingStore
      case "org.apache.kafka.connect.storage.FileOffsetBackingStore" =>
        val f = props.getOrElse("offset.storage.file.filename",
          fail("offset.storage.file.filename is required"))
        () => new FileOffsetBackingStore(Paths.get(f))
      case "io.debezium.storage.jdbc.offset.JdbcOffsetBackingStore" =>
        // ref JdbcOffsetBackingStoreConfig.java:34-61
        val url = props.getOrElse("offset.storage.jdbc.url",
          fail("offset.storage.jdbc.url is required"))
        () => new JdbcOffsetBackingStore(url)
      case "org.apache.kafka.connect.storage.KafkaOffsetBackingStore" =>
        // Connect's standard embedded-engine value; topic + bootstrap
        // keys as the reference passes them through
        val (host, port) = hostPort(props, "offset.storage.kafka.bootstrap.servers")
        val topic = props.getOrElse("offset.storage.topic",
          fail("offset.storage.topic is required"))
        () => new graft.model.KafkaOffsetBackingStore(host, port, topic)
      case "io.debezium.storage.redis.offset.RedisOffsetBackingStore" =>
        // ref RedisOffsetBackingStoreConfig: offset.storage.redis.address
        val (host, port) = hostPort(props, "offset.storage.redis.address")
        val pw = props.getOrElse("offset.storage.redis.password", "")
        val key = props.getOrElse("offset.storage.redis.key", "metadata:debezium:offsets")
        () => new RedisOffsetBackingStore(host, port, pw, key)
      case "io.debezium.storage.configmap.ConfigMapOffsetStore" =>
        val endpoint = props.getOrElse("offset.storage.configmap.endpoint",
          fail("offset.storage.configmap.endpoint is required"))
        val ns = props.getOrElse("offset.storage.configmap.namespace", "default")
        val name = props.getOrElse("offset.storage.configmap.name",
          fail("offset.storage.configmap.name is required"))
        () => new ConfigMapOffsetBackingStore(endpoint, ns, name)
      case other => fail(s"unsupported offset.storage '$other'")
    }

  private def parseHistory(props: Map[String, String])
      : Option[() => HistoryStorage] = {
    val P = "schema.history.internal"
    props.get(P).map {
      case "io.debezium.relational.history.MemorySchemaHistory" =>
        () => new MemoryHistoryStorage
      case "io.debezium.storage.file.history.FileSchemaHistory" =>
        val f = props.getOrElse(s"$P.file.filename",
          fail(s"$P.file.filename is required"))
        () => new FileHistoryStorage(Paths.get(f))
      case "io.debezium.storage.jdbc.history.JdbcSchemaHistory" =>
        val url = props.getOrElse(s"$P.jdbc.url", fail(s"$P.jdbc.url is required"))
        () => new JdbcHistoryStorage(url)
      case "io.debezium.storage.kafka.history.KafkaSchemaHistory" =>
        val (host, port) = hostPort(props, s"$P.kafka.bootstrap.servers")
        val topic = props.getOrElse(s"$P.kafka.topic", fail(s"$P.kafka.topic is required"))
        () => new KafkaHistoryStorage(host, port, topic)
      case "io.debezium.storage.redis.history.RedisSchemaHistory" =>
        val (host, port) = hostPort(props, s"$P.redis.address")
        val pw = props.getOrElse(s"$P.redis.password", "")
        val key = props.getOrElse(s"$P.redis.key", "metadata:debezium:schema_history")
        () => new RedisHistoryStorage(host, port, pw, key)
      case "io.debezium.storage.s3.history.S3SchemaHistory" =>
        // ref S3SchemaHistory: bucket.name / object.name / endpoint
        val endpoint = props.getOrElse(s"$P.s3.endpoint", fail(s"$P.s3.endpoint is required"))
        val bucket = props.getOrElse(s"$P.s3.bucket.name", fail(s"$P.s3.bucket.name is required"))
        val key = props.getOrElse(s"$P.s3.object.name", "debezium-history.log")
        () => new S3HistoryStorage(endpoint, bucket, key)
      case "io.debezium.storage.azure.blob.history.AzureBlobSchemaHistory" =>
        val endpoint = props.getOrElse(s"$P.azure.storage.account.endpoint",
          fail(s"$P.azure.storage.account.endpoint is required"))
        val container = props.getOrElse(s"$P.azure.storage.account.container.name",
          fail(s"$P.azure.storage.account.container.name is required"))
        val blob = props.getOrElse(s"$P.azure.storage.blob.name", "debezium-history.log")
        () => new AzureBlobHistoryStorage(endpoint, container, blob)
      case "io.debezium.storage.rocketmq.history.RocketMqSchemaHistory" =>
        val (host, port) = hostPort(props, s"$P.rocketmq.name.srv.addr")
        val topic = props.getOrElse(s"$P.rocketmq.topic", fail(s"$P.rocketmq.topic is required"))
        () => new RocketMqHistoryStorage(host, port, topic)
      case other => fail(s"unsupported schema history '$other'")
    }
  }

  /** Parse a connection address the way reference configs write them:
    * a comma-separated bootstrap LIST is legal (the engine connects to
    * the first entry), the port is everything after the LAST colon (so
    * `[::1]:9092` IPv6 forms parse), and a bare `host:port` still works.
    */
  private def hostPort(props: Map[String, String], key: String): (String, Int) = {
    val v = props.getOrElse(key, fail(s"$key is required"))
    val first = v.split(",").head.trim
    val cut = first.lastIndexOf(':')
    if (cut <= 0 || cut == first.length - 1)
      fail(s"$key must be host:port, got '$v'")
    val host = first.substring(0, cut).stripPrefix("[").stripSuffix("]")
    val port = try first.substring(cut + 1).toInt
      catch { case _: NumberFormatException =>
        fail(s"$key must be host:port, got '$v'") }
    (host, port)
  }

  private def parseTypeHandling(props: Map[String, String])
      : Option[TypeHandling.Config] = {
    import TypeHandling._
    val dec = props.get("decimal.handling.mode").map {
      case "precise" => DecimalMode.Precise
      case "double"  => DecimalMode.AsDouble
      case "string"  => DecimalMode.AsString
      case other => fail(s"unsupported decimal.handling.mode '$other'")
    }
    val time = props.get("time.precision.mode").map {
      case "adaptive" | "adaptive_time_microseconds" => TimePrecisionMode.Adaptive
      case "connect"     => TimePrecisionMode.Connect
      case "isostring"   => TimePrecisionMode.IsoString
      case "nanoseconds" => TimePrecisionMode.Nanoseconds
      case "structured"  => TimePrecisionMode.Structured
      case other => fail(s"unsupported time.precision.mode '$other'")
    }
    val bin = props.get("binary.handling.mode").map {
      case "bytes"  => BinaryMode.Bytes
      case "base64" => BinaryMode.Base64
      case "hex"    => BinaryMode.Hex
      case other => fail(s"unsupported binary.handling.mode '$other'")
    }
    if (dec.isEmpty && time.isEmpty && bin.isEmpty) None
    else Some(Config(
      decimalMode = dec.getOrElse(DecimalMode.Precise),
      timePrecision = time.getOrElse(TimePrecisionMode.Native),
      binaryMode = bin.getOrElse(BinaryMode.Bytes)))
  }

  /** Compile a reference-keyed properties map for one captured table.
    *
    * @param table   the physical table this pipeline instance serves —
    *                fully-qualified column keys resolve against it
    * @param custom  `snapshot.mode=custom` SPI registry
    *                (`snapshot.mode.custom.name` → implementation)
    */
  /** `converters` SPI factories keyed by the `<name>.type` class-name value
    * (ref `CommonConnectorConfig.java:847` + `CustomConverter.configure` —
    * the sub-keyed properties reach the factory as its parameter map).
    */
  type ConverterFactory = Map[String, String] => graft.operators.CustomConverter

  def compile(props: Map[String, String], table: String = "",
              custom: Map[String, Snapshotter] = Map.empty,
              converterRegistry: Map[String, ConverterFactory] = Map.empty): Compiled = {
    // --- connector-level spec ---
    val masks = scala.collection.mutable.LinkedHashMap.empty[String, Pipeline.Mask]
    val truncates = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    props.foreach {
      case (MaskHashKey(algo, salt), cols) =>
        if (algo.toUpperCase != "SHA-256")
          fail(s"unsupported mask hash algorithm '$algo' (SHA-256 only)")
        columnsFor(cols, table).foreach(c => masks(c) = Pipeline.Mask.SaltedHash(salt))
      case (MaskCharsKey(n), cols) =>
        columnsFor(cols, table).foreach(c => masks(c) = Pipeline.Mask.Constant("*" * n.toInt))
      case (TruncateKey(n), cols) =>
        columnsFor(cols, table).foreach(c => truncates(c) = n.toInt)
      case _ =>
    }

    val columnExclude = props.get("column.exclude.list")
      .map(v => columnsFor(v, table).toSet).getOrElse(Set.empty)
    val columnInclude = props.get("column.include.list").map { v =>
      val keep = columnsFor(v, table).toSet
      (c: String) => keep(c)
    }

    val skipped = props.get("skipped.operations") match {
      case Some("none") => Nil
      case Some(v)      => v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None         => Seq("t") // ref default (CommonConnectorConfig.java:865)
    }

    // converters=<n1,n2> with <n>.type resolving through the SPI registry
    // (ref CommonConnectorConfig.java:847 CUSTOM_CONVERTERS)
    val converters = props.get("converters").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { name =>
        val sub = subset(props, s"$name.")
        val tpe = sub.getOrElse("type", fail(s"$name.type is required"))
        converterRegistry.getOrElse(tpe,
          fail(s"no converter factory registered for '$tpe'")).apply(sub)
      }

    val spec = Pipeline.Spec(
      tableInclude = props.get("table.include.list").map(regexAlternation),
      tableExclude = props.get("table.exclude.list").map(regexAlternation),
      snapshotter = parseSnapshotter(props, custom),
      columnExclude = columnExclude,
      masks = masks.toMap,
      truncates = truncates.toMap,
      skippedOperations = skipped,
      typeHandling = parseTypeHandling(props),
      converters = converters,
      tableName = table)

    // --- SMT chain (ref embedded/Transformations.java:43-88) ---
    val chain = props.get("transforms").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { name =>
        val conf = subset(props, s"transforms.$name.")
        val smtClass = conf.getOrElse("type",
          fail(s"transforms.$name.type is required"))
        val base = buildSmt(smtClass, conf,
          props.getOrElse("topic.prefix", "graft"))
        val gated = conf.get("predicate") match {
          case Some(pname) =>
            val pconf = subset(props, s"predicates.$pname.")
            val ptype = pconf.getOrElse("type",
              fail(s"predicates.$pname.type is required"))
            val pcol = predicateColumn(ptype, pconf)
            val negate = conf.get("negate").exists(_.toBoolean)
            (df: DataFrame) => Predicates.predicated(df, pcol, negate)(base)
          case None => base
        }
        Link(name, smtClass, gated)
      }

    val msgKeyCols = props.get("message.key.columns").map { v =>
      // ref format: db.table1:col1,col2;db.table2:col3
      v.split(";").map(_.trim).filter(_.nonEmpty).map { entry =>
        val Array(tbl, cols) = entry.split(":", 2)
        tbl.split("\\.").last ->
          cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      }.toMap
    }.getOrElse(Map.empty)

    def nameAdjuster(key: String): String => String =
      props.getOrElse(key, "none") match {
        case "none"                    => identity
        case "avro" | "avro_unicode"   => graft.functions.Names.avroSafe(_: String)
        case other => fail(s"unsupported $key '$other'")
      }

    Compiled(
      engineName = props.getOrElse("name", "graft-engine"),
      connectorClass = props.getOrElse("connector.class", ""),
      topicPrefix = props.getOrElse("topic.prefix", "graft"),
      tombstonesOnDelete = props.get("tombstones.on.delete").forall(_.toBoolean),
      messageKeyColumns = msgKeyCols,
      spec = spec,
      schemaNameAdjuster = nameAdjuster("schema.name.adjustment.mode"),
      fieldNameAdjuster = nameAdjuster("field.name.adjustment.mode"),
      failureHandlingMode = props.getOrElse(
        "event.processing.failure.handling.mode", "fail"),
      snapshotOverrideWhere = parseSnapshotOverride(props, table),
      columnInclude = columnInclude,
      chain = chain,
      offsetStore = parseOffsetStore(props),
      history = parseHistory(props))
  }
}
