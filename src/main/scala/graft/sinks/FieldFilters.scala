package graft.sinks

/** Sink-side field include/exclude filtering (reference
  * `debezium-sink/src/main/java/io/debezium/sink/filter/
  * FieldFilterFactory.java`): entries are `column` or `topic:column`,
  * comma-separated; an exclude list takes precedence over an include
  * list; with neither, every field passes. Matching is trim-exact, like
  * the reference.
  */
object FieldFilters {

  /** (topicName, columnName) => keep? */
  type FieldNameFilter = (String, String) => Boolean

  val DefaultFilter: FieldNameFilter = (_, _) => true

  private def entryFilter(fieldList: String, include: Boolean): FieldNameFilter = {
    val entries = fieldList.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { e =>
        e.split(":") match {
          case Array(col)        => (None, col.trim)
          case Array(topic, col) => (Some(topic.trim), col.trim)
          case _ =>
            throw new IllegalArgumentException(s"bad field list entry '$e'")
        }
      }
    (topic, field) => {
      val hit = entries.exists {
        case (None, col)    => col == field.trim
        case (Some(t), col) => t == topic.trim && col == field.trim
      }
      if (hit) include else !include
    }
  }

  /** Exclude wins over include; neither set → default-include. */
  def forLists(includeList: String, excludeList: String): FieldNameFilter =
    if (excludeList != null && excludeList.nonEmpty)
      entryFilter(excludeList, include = false)
    else if (includeList != null && includeList.nonEmpty)
      entryFilter(includeList, include = true)
    else DefaultFilter
}
