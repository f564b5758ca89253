package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema evolution (SURVEY §2.9, K4): structured schema-change events
  * applied to the engine's catalog, and evolution-tolerant unions of
  * envelope frames produced under different payload schema versions
  * (reference `schema/SchemaChangeEvent.java`, history
  * `relational/history/TableChanges.java`; sink evolution
  * `JdbcSinkConnectorConfig.java:374` basic mode = create/alter from record
  * schema — here Delta-style mergeSchema semantics).
  */
object SchemaEvolution {

  sealed trait SchemaChange
  final case class AddColumn(name: String, dataType: DataType) extends SchemaChange
  final case class DropColumn(name: String) extends SchemaChange
  /** widen only: int→long, float→double, decimal scale growth */
  final case class WidenColumn(name: String, to: DataType) extends SchemaChange
  final case class RenameColumn(from: String, to: String) extends SchemaChange

  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType) | (ShortType, IntegerType | LongType) |
         (ByteType, ShortType | IntegerType | LongType) |
         (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.precision >= a.precision && b.scale >= a.scale
    case _ => false
  }

  /** Apply one change to a schema; illegal changes throw (mirrors the
    * reference's inconsistent-schema hook).
    */
  def apply(schema: StructType, change: SchemaChange): StructType = change match {
    case AddColumn(n, t) =>
      require(!schema.fieldNames.contains(n), s"column $n already exists")
      schema.add(n, t, nullable = true)
    case DropColumn(n) =>
      require(schema.fieldNames.contains(n), s"column $n does not exist")
      StructType(schema.fields.filterNot(_.name == n))
    case WidenColumn(n, to) =>
      val f = schema.fields.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"column $n missing"))
      require(widens(f.dataType, to), s"cannot narrow ${f.dataType} to $to")
      StructType(schema.fields.map(x => if (x.name == n) x.copy(dataType = to) else x))
    case RenameColumn(from, to) =>
      require(schema.fieldNames.contains(from), s"column $from does not exist")
      require(!schema.fieldNames.contains(to), s"column $to already exists")
      StructType(schema.fields.map(x => if (x.name == from) x.copy(name = to) else x))
  }

  def applyAll(schema: StructType, changes: Seq[SchemaChange]): StructType =
    changes.foldLeft(schema)(apply)

  /** mergeSchema-style union: frames written under different payload
    * versions combine; columns missing in a version read as null (the Delta
    * `mergeSchema=true` behavior the sink relies on).
    */
  def unionEvolved(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
}
