package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.{CountMin, TextAnalysis}

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  val (depth, width) = (4, 1024)

  private def tokens = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(explode(TextAnalysis.tokens(col("text"))).as("term"))

  test("estimates overestimate only, within the e/width bound") {
    val tok = tokens.cache()
    try {
      val n = tok.count()
      val exact = tok.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sk = CountMin.sketch(tok, col("term"), depth, width)
      val est = CountMin.estimate(sk, exact.keys.toSeq :+ "never_seen",
          depth, width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"CMS must never underestimate ($t)")
        assert(est(t) <= c + (math.E / width * n).toLong + 1,
          s"$t: est ${est(t)} exceeds bound over exact $c")
      }
      assert(est("never_seen") <= (math.E / width * n).toLong + 1)
    } finally { tok.unpersist(); () }
  }

  test("cell-sum merge of partial sketches equals the whole sketch") {
    import spark.implicits._
    val words = (1 to 4000).map(i => s"w${i % 131}")
    def sk(part: Seq[String]) =
      CountMin.sketch(part.toDF("term"), col("term"), depth, width)
    val (a, b) = words.splitAt(1500)
    val merged = sk(a).unionAll(sk(b))
      .groupBy("row", "bucket").agg(sum("n").as("n"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(merged) == canon(sk(words)))
  }

  test("sketch size is depth x width bounded regardless of vocabulary") {
    import spark.implicits._
    val big = (1 to 20000).map(i => s"unique_$i")
    val sk = CountMin.sketch(big.toDF("term"), col("term"), depth, width)
    assert(sk.count() <= depth.toLong * width)
  }
}
