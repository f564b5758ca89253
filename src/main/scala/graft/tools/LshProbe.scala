package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: LSH candidate-pair volume vs corpus size (the
  * scale-validation probe behind NOTES' sf0.1→sf1 table).
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // the AUTO dial (Dedup.lshParams): banding follows corpus size
      val (bands, rpb) = graft.analytics.Dedup.lshParams(0.8, docs.count())
      // GRAFT_LSH_ONEPERM=1: probe the one-permutation signature's
      // candidate volume instead of the classic per-permutation one
      val sig =
        if (sys.env.get("GRAFT_LSH_ONEPERM").contains("1"))
          docs.select(col("doc_id"),
            graft.expressions.GraftFunctions.onePermMinhash(
              graft.analytics.Dedup.shingles(col("text"), 3),
              bands * rpb).as("sig"))
        else graft.analytics.Dedup.minhashSignatures(docs, 3, bands * rpb)
      val banded = sig.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            hash(slice(col("sig"), b * rpb + 1, rpb)).as("sig"))
        }: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"),
          col("bs.sig").as("sig"))
      val occ = banded.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      val stats = occ.agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"),
        max(col("n")).as("maxBucket"), count(lit(1)).as("buckets")).head
      println(s"PROBE $dir bands=$bands rowsPerBand=$rpb " +
        s"pairs=${stats.get(0)} maxBucket=${stats.get(1)} " +
        s"buckets=${stats.get(2)}")
    }
    spark.stop()
  }
}
