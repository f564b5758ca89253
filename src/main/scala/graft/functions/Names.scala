package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identifier sanitization (SURVEY §2.7; reference
  * `schema/SchemaNameAdjuster.java`): make arbitrary source identifiers
  * Avro-safe — [A-Za-z_][A-Za-z0-9_]*, invalid chars replaced by '_', and a
  * leading digit prefixed with '_'.
  */
object Names {

  def avroSafe(id: Column): Column = {
    val cleaned = regexp_replace(id, "[^A-Za-z0-9_]", "_")
    when(cleaned.rlike("^[0-9]"), concat(lit("_"), cleaned)).otherwise(cleaned)
  }

  /** Scala-side twin for driver-side catalog names. */
  def avroSafe(id: String): String = {
    val cleaned = id.replaceAll("[^A-Za-z0-9_]", "_")
    if (cleaned.headOption.exists(_.isDigit)) "_" + cleaned else cleaned
  }
}
