package graft.model

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.operators.SchemaEvolution
import graft.operators.SchemaEvolution.{AddColumn, DropColumn, RenameColumn, SchemaChange, WidenColumn}

/** Durable schema history (SURVEY §1.2/§2.9; reference
  * `relational/history/SchemaHistory.java:34` + `TableChanges.java`
  * serialized records): an append-only log of schema-change events keyed by
  * source position, from which the schema AS OF any offset can be
  * reconstructed after restart. Storage is pluggable via [[HistoryStorage]]
  * (the K7 backend SPI — reference `debezium-storage-*`); the default is
  * the reference's file channel.
  *
  * Record line format: `pos\tkind\tcolumn\tdatatype-ddl`.
  */
final class SchemaHistory(storage: HistoryStorage) {

  def this(path: Path) = this(new FileHistoryStorage(path))

  def append(pos: Long, change: SchemaChange): Unit = {
    val line = change match {
      case AddColumn(n, t)   => s"$pos\tadd\t$n\t${t.sql}"
      case WidenColumn(n, t) => s"$pos\twiden\t$n\t${t.sql}"
      case DropColumn(n)       => s"$pos\tdrop\t$n\t-"
      case RenameColumn(f, to) => s"$pos\trename\t$f\t$to"
    }
    storage.append(line)
  }

  def changes(upToPos: Long = Long.MaxValue): Seq[(Long, SchemaChange)] = {
    storage.readAll().map { line =>
      val Array(p, kind, name, ddl) = line.split("\t", 4)
      val change = kind match {
        case "add"   => AddColumn(name, DataType.fromDDL(ddl))
        case "widen" => WidenColumn(name, DataType.fromDDL(ddl))
        case "drop"   => DropColumn(name)
        case "rename" => RenameColumn(name, ddl)
      }
      p.toLong -> change
    }.filter(_._1 <= upToPos).sortBy(_._1)
  }

  /** Reconstruct the schema as of `pos` by replaying the log over the
    * initial schema (the restart path of the reference's
    * `HistorizedDatabaseSchema`).
    */
  def recover(initial: StructType, pos: Long = Long.MaxValue): StructType =
    SchemaEvolution.applyAll(initial, changes(pos).map(_._2))
}

object SchemaHistory {
  def at(dir: String, table: String): SchemaHistory =
    new SchemaHistory(Paths.get(dir, s"$table.history"))

  def inMemory(): SchemaHistory = new SchemaHistory(new MemoryHistoryStorage)
}
