package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Snapshotter
import graft.operators.{CustomConverter, CustomConverterRegistry, Materialize, Transforms, TypeHandling}

/** The engine's user-facing configuration surface (SURVEY §7.1): a pipeline
  * spec mirroring the reference's connector-config options (include lists,
  * masks, truncation, skipped ops, scripted filter, unwrap, routing, sink
  * mode — reference `RelationalDatabaseConnectorConfig` /
  * `CommonConnectorConfig` keys), compiled into ONE DataFrame expression
  * chain so Catalyst optimizes across every stage. Stage order follows the
  * reference SMT chain semantics: filters first, then per-column mappers,
  * then unwrap/route, then sink.
  */
object Pipeline {

  /** Start-time state the snapshotter decides from (ref
    * `Snapshotter.shouldSnapshotData(offsetsExist, snapshotCompleted)`).
    * Defaults model a fresh connector start.
    */
  final case class SnapshotContext(offsetsExist: Boolean = false,
                                   snapshotComplete: Boolean = false)

  sealed trait Mask
  object Mask {
    case class Constant(value: String = "***") extends Mask
    case class SaltedHash(salt: String) extends Mask
  }

  final case class Spec(
      tableInclude: Option[String] = None,
      tableExclude: Option[String] = None,
      /** snapshot.mode — any `graft.model.Snapshotter`, incl. custom SPI
        * impls (ref debezium-core `snapshot.mode` package)
        */
      snapshotter: Snapshotter = Snapshotter.Initial,
      snapshotContext: SnapshotContext = SnapshotContext(),
      columnExclude: Set[String] = Set.empty,
      masks: Map[String, Mask] = Map.empty,
      truncates: Map[String, Int] = Map.empty,
      skippedOperations: Seq[String] = Seq("t"),
      filterExpr: Option[String] = None,
      topicExpr: Option[Column] = None,
      /** decimal/time/binary handling modes (ref
        * `RelationalDatabaseConnectorConfig.java:337,419`)
        */
      typeHandling: Option[TypeHandling.Config] = None,
      /** per-column CustomConverter SPI overrides (ref
        * `CustomConverter.java:18-48`); resolved against `tableName`
        */
      converters: Seq[CustomConverter] = Nil,
      tableName: String = "",
      unwrapDeleteMode: Option[String] = None,
      unwrapAddFields: Seq[String] = Nil)

  /** Compile the spec over an envelope feed. Returns the transformed feed
    * (or flat rows when unwrap is configured).
    */
  def apply(feed: DataFrame, spec: Spec): DataFrame = {
    var df = feed
    df = Transforms.tableFilter(df, spec.tableInclude, spec.tableExclude)
    val snap = spec.snapshotter
    val ctx = spec.snapshotContext
    df = (snap.shouldSnapshotData(ctx.offsetsExist, ctx.snapshotComplete),
          snap.shouldStream) match {
      case (true, true)   => df
      case (true, false)  => df.filter(col("op") === "r")
      case (false, true)  => df.filter(col("op") =!= "r")
      case (false, false) => df.filter(lit(false))
    }
    df = Transforms.skipOperations(df, spec.skippedOperations)
    if (spec.columnExclude.nonEmpty)
      df = Transforms.columnFilter(df, c => !spec.columnExclude(c))
    df = spec.masks.foldLeft(df) {
      case (d, (c, Mask.Constant(v)))   => Transforms.maskConstant(d, c, v)
      case (d, (c, Mask.SaltedHash(s))) => Transforms.maskHash(d, c, s)
    }
    df = spec.truncates.foldLeft(df) { case (d, (c, n)) =>
      Transforms.truncateColumn(d, c, n)
    }
    if (spec.converters.nonEmpty)
      df = new CustomConverterRegistry(spec.converters)
        .convertEnvelope(df, spec.tableName)
    df = spec.typeHandling.map(TypeHandling.convertEnvelope(df, _)).getOrElse(df)
    df = spec.filterExpr.map(Transforms.filterExpr(df, _)).getOrElse(df)
    df = spec.topicExpr.map(Transforms.contentRouter(df, _)).getOrElse(df)
    spec.unwrapDeleteMode match {
      case Some(mode) => Transforms.unwrap(df, mode, spec.unwrapAddFields)
      case None => df
    }
  }

  /** Spec + materialization: the full source→table path. */
  def materialize(feed: DataFrame, spec: Spec): DataFrame =
    Materialize.latestState(apply(feed, spec.copy(unwrapDeleteMode = None)))
}
