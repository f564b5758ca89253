package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("z-value interleaves bits (known Morton codes)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (1023L, 1023L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(x: Long, y: Long): Long =
      (0 until 10).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    assert(got == rows.map { case (x, y) => morton(x, y) })
  }

  test("z-sorted layout prunes a 2-d box query better than 1-d sort") {
    import spark.implicits._
    // synthetic 2-d data; "files" = consecutive runs of 512 rows in the
    // layout order; a box predicate on (x, y) should touch FEWER files
    // under z-order than under a single-column sort
    val rnd = new scala.util.Random(42)
    val pts = (0 until 65536).map { _ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }
    def filesTouched(layout: Seq[(Long, Long)]): Int =
      layout.grouped(512).zipWithIndex.count { case (file, _) =>
        file.exists { case (x, y) =>
          x >= 100 && x < 164 && y >= 700 && y < 764
        }
      }
    val zSorted = pts.map { case (x, y) =>
      val z = (0 until 10).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
      (z, x, y)
    }.sortBy(_._1).map(t => (t._2, t._3))
    val xSorted = pts.sortBy(_._1)
    val (zf, xf) = (filesTouched(zSorted), filesTouched(xSorted))
    assert(zf < xf, s"z-order touched $zf files, x-sort $xf")
    // and the Spark expression agrees with the reference morton fold
    val sparkZ = pts.take(100).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 10)).collect()
      .map(_.getLong(0)).toSeq
    val refZ = pts.take(100).map { case (x, y) =>
      (0 until 10).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    }
    assert(sparkZ == refZ)
  }
}
