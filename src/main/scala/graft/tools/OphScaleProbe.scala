package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: classic vs one-permutation MinHash signature wall
  * clock at the auto-derived banding, per corpus size (the NOTES sf0.1 →
  * sf1 table's `a_minhash_lsh` row). The banding, verify join, and output
  * pairs are identical between the two arms — only the signature
  * expression differs, so the delta isolates the O(shingles × perms) vs
  * O(shingles + perms) signature term.
  */
object OphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val (bands, rpb) = graft.analytics.Dedup.lshParams(0.8, n)
      Seq(false, true).foreach { onePerm =>
        val t0 = System.nanoTime()
        val pairs = graft.analytics.Dedup
          .minhashLshPairs(docs, 3, bands, rpb, 0.8, onePerm = onePerm)
          .count()
        println(f"PROBE $dir docs=$n onePerm=$onePerm bands=$bands " +
          f"rowsPerBand=$rpb pairs=$pairs " +
          f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
