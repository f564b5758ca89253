package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Vector logical types (SURVEY §1.3): FloatVector / DoubleVector are
  * ARRAY<FLOAT/DOUBLE>; SparseDoubleVector is STRUCT<dimensions INT,
  * vector MAP<INT,DOUBLE>> as in the reference
  * (`data/vector/FloatVector.java:28`, `SparseDoubleVector.java:28`); text
  * parsing mirrors `data/vector/Vectors.java` (pg `[x,y]` dense and
  * `{i:v,...}/dims` sparse forms). All pure column expressions.
  */
object Vectors {

  /** Render a dense vector as pg-style text `[x,y,...]`. */
  def toText(v: Column): Column =
    concat(lit("["), array_join(transform(v, _.cast("string")), ","), lit("]"))

  /** Parse pg-style `[x,y,...]` text into ARRAY<FLOAT>. */
  def parseFloatVector(s: Column): Column =
    transform(
      split(regexp_replace(s, "[\\[\\]\\s]", ""), ","),
      x => x.cast(FloatType))

  def parseDoubleVector(s: Column): Column =
    transform(
      split(regexp_replace(s, "[\\[\\]\\s]", ""), ","),
      x => x.cast(DoubleType))

  /** Sparse form of a dense vector: entries with |v| > threshold, as
    * STRUCT<dimensions INT, vector MAP<INT,DOUBLE>>.
    */
  def toSparse(v: Column, threshold: Double): Column = {
    val idx = sequence(lit(0), size(v) - 1)
    val entries = filter(
      zip_with(idx, v, (i, x) =>
        struct(i.cast(IntegerType).as("i"), x.cast(DoubleType).as("v"))),
      e => abs(e.getField("v")) > threshold)
    struct(
      size(v).cast(IntegerType).as("dimensions"),
      map_from_entries(entries).as("vector"))
  }

  /** Parse sparse text `{i:v,i:v}/dims`. */
  def parseSparseVector(s: Column): Column = {
    val body = regexp_extract(s, "\\{(.*)\\}", 1)
    val dims = regexp_extract(s, "/(\\d+)\\s*$", 1).cast(IntegerType)
    val entries = filter(
      transform(split(body, ","),
        kv => struct(
          split(kv, ":").getItem(0).cast(IntegerType).as("i"),
          split(kv, ":").getItem(1).cast(DoubleType).as("v"))),
      e => e.getField("i").isNotNull)
    struct(dims.as("dimensions"), map_from_entries(entries).as("vector"))
  }

  /** T18 VectorToJsonConverter: dense vector → JSON array text. */
  def vectorToJson(v: Column): Column = to_json(v)
}
