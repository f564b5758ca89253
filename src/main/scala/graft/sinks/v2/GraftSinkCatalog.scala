package graft.sinks.v2

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.{BucketedMergeSink, CdcSink, LsmMergeSink, MergeSink, Scd2Sink}

/** DataSourceV2 `TableCatalog` exposing the MERGE-sink family as catalog
  * tables, so the DataFrameWriterV2 path works end-to-end:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     classOf[graft.sinks.v2.GraftSinkCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/sinks")
  *   feed.writeTo("graft.lsm.orders").create()          // snapshot epoch
  *   delta.writeTo("graft.lsm.orders").append()         // next epoch
  *   delta.writeTo("graft.lsm.orders")
  *     .option("epoch", "7").append()                   // exactly-once replay guard
  * }}}
  *
  * The NAMESPACE selects the sink flavor — `graft.full.*`
  * ([[MergeSink]], full-state rewrite), `graft.bucketed.*`
  * ([[BucketedMergeSink]]), `graft.lsm.*` ([[LsmMergeSink]],
  * merge-on-read deltas) and `graft.scd2.*` ([[Scd2Sink]], type-2
  * history) — mirroring how the reference picks a sink writer per
  * connector config (`JdbcSinkConnectorConfig.java`) while the table
  * identity stays `catalog.namespace.table`.
  *
  * Writes go through the V1 write bridge (`V1Write` /
  * `InsertableRelation`, `TableCapability.V1_BATCH_WRITE`) rather than
  * per-partition `DataWriter`s, deliberately: a MERGE epoch is a
  * DataFrame-level transaction — key-shuffled reduce, touched-bucket
  * probe, manifest swap — not a row stream; the bridge hands the sink
  * the whole batch DataFrame so the existing epoch protocol (atomic
  * CURRENT swap + replay guard) stays the single commit path. Each
  * `append()` is one epoch: explicit via the `epoch` write option
  * (foreachBatch-style exactly-once — replaying a committed epoch is a
  * warned no-op), else committedEpoch+1.
  *
  * The stored schema (`_table.ddl`, written by `create()`) is the
  * ENVELOPE schema; appends are resolved against it by Spark's v2
  * output resolution, so a drifted feed fails analysis instead of
  * corrupting sink state.
  */
class GraftSinkCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def name(): String = catalogName

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root"))
  }

  private def kindOf(ident: Identifier): String = {
    require(ident.namespace.length == 1,
      s"expected $catalogName.<kind>.<table>, got $ident")
    val kind = ident.namespace()(0)
    require(GraftSinkCatalog.kinds.contains(kind),
      s"unknown sink kind '$kind' (one of ${GraftSinkCatalog.kinds.mkString("/")})")
    kind
  }

  private def tableDir(ident: Identifier): Path =
    Paths.get(root, kindOf(ident), ident.name)

  private def metaFile(ident: Identifier): Path =
    tableDir(ident).resolve("_table.ddl")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(ns)) Array.empty
    else scala.util.Using.resource(Files.list(ns)) { st =>
      st.iterator().asScala
        .filter(p => Files.exists(p.resolve("_table.ddl")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val meta = metaFile(ident)
    if (!Files.exists(meta)) throw new NoSuchTableException(ident)
    val lines = Files.readAllLines(meta).asScala
    val schema = DataType.fromDDL(lines.head).asInstanceOf[StructType]
    val props = lines.drop(1).flatMap { l =>
      l.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    new CdcSinkTable(kindOf(ident), tableDir(ident).toString,
      ident.toString, schema, props)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (Files.exists(metaFile(ident)))
      throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "sink tables bucket internally by key — PARTITIONED BY is not supported")
    val dir = tableDir(ident)
    Files.createDirectories(dir)
    val props = properties.asScala.toSeq.sortBy(_._1)
      .filter { case (k, _) => k == "buckets" || k == "compactEvery" }
    Files.writeString(metaFile(ident),
      (schema.toDDL +: props.map { case (k, v) => s"$k=$v" })
        .mkString("\n"))
    new CdcSinkTable(kindOf(ident), dir.toString, ident.toString, schema,
      props.toMap)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER on sink tables: schema follows the feed (K4 evolution)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!Files.exists(dir)) false
    else {
      scala.util.Using.resource(Files.walk(dir)) { st =>
        st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!Files.exists(metaFile(oldIdent))) throw new NoSuchTableException(oldIdent)
    if (Files.exists(metaFile(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
    require(kindOf(oldIdent) == kindOf(newIdent),
      "cannot rename across sink kinds — the on-disk layouts differ")
    Files.createDirectories(tableDir(newIdent).getParent)
    Files.move(tableDir(oldIdent), tableDir(newIdent)): Unit
  }
}

object GraftSinkCatalog {
  val kinds: Set[String] = Set("full", "bucketed", "lsm", "scd2")

  /** The sink instance a (kind, path, properties) triple denotes. */
  def sinkFor(kind: String, path: String,
              props: Map[String, String]): CdcSink = {
    def buckets = props.get("buckets").map(_.toInt).getOrElse(16)
    def compactEvery = props.get("compactEvery").map(_.toInt).getOrElse(8)
    kind match {
      case "full"     => new MergeSink(path)
      case "bucketed" => new BucketedMergeSink(path, buckets)
      case "lsm"      => new LsmMergeSink(path, buckets, compactEvery)
      case "scd2"     => new Scd2Sink(path, buckets, compactEvery)
      case other =>
        throw new IllegalArgumentException(s"unknown sink kind '$other'")
    }
  }
}

private[v2] class CdcSinkTable(kind: String, path: String, ident: String,
                               tableSchema: StructType,
                               props: Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              require(!overwrite,
                "overwrite is not an epoch — use a fresh table (createOrReplace)")
              val sink = GraftSinkCatalog.sinkFor(kind, path, props)
              // one append = one epoch; an explicit `epoch` option gets
              // the sink's replay guard (exactly-once under foreachBatch
              // retries), the default continues after the committed tip
              val epoch = Option(info.options.get("epoch")).map(_.toLong)
                .getOrElse(sink.committedEpoch.map(_ + 1L).getOrElse(0L))
              sink.merge(data, epoch)
            }
          }
      }
    }
}
