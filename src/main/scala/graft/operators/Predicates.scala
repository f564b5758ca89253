package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-transform predicate gating for SMT chains (SURVEY §2.3;
  * reference `debezium-embedded/src/main/java/io/debezium/embedded/
  * Predicates.java` binding Connect's `transforms.X.predicate` /
  * `transforms.X.negate` config to the built-in predicate set —
  * TopicNameMatches, HasHeaderKey, RecordIsTombstone): a chain link
  * applies its transform ONLY to records the predicate selects and
  * passes every other record through untouched.
  *
  * Spark shape: the predicate is a Column; gating is a split-union of
  * two filters of the SAME scan (Catalyst merges the scans and both
  * filters push down), with a schema identity check standing in for
  * Connect's record-type contract. No per-row branching UDF, no second
  * pass.
  */
object Predicates {

  /** Connect `TopicNameMatches`: regex on the routed topic column. */
  def topicNameMatches(pattern: String): Column = col("topic").rlike(pattern)

  /** Connect `RecordIsTombstone`: a keyed record with no value — in the
    * envelope, both images absent.
    */
  def recordIsTombstone: Column = col("after").isNull && col("before").isNull

  /** Connect `HasHeaderKey` over a map-typed `headers` column. */
  def hasHeaderKey(name: String): Column =
    map_contains_key(col("headers"), lit(name))

  /** Apply `transform` only where `predicate` holds (`negate` flips the
    * selection, Connect's `transforms.X.negate`); everything else passes
    * through unchanged. The transform must preserve the schema — the
    * same contract a predicated Connect SMT has.
    */
  def predicated(df: DataFrame, predicate: Column, negate: Boolean = false)
                (transform: DataFrame => DataFrame): DataFrame = {
    val p = if (negate) !coalesce(predicate, lit(false))
            else coalesce(predicate, lit(false))
    val transformed = transform(df.filter(p))
    // catalogString = names + types, nullability-insensitive (a masked
    // field may tighten nullability without breaking the record type)
    require(transformed.schema.catalogString == df.schema.catalogString,
      "a predicated transform must preserve the record schema")
    transformed.unionByName(df.filter(!p))
  }
}
