package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: correctness of the Morton interleave and a
  * quantitative locality measure (the property file pruning relies
  * on: each clustered partition covers a small hyper-rectangle of the
  * key space in EVERY dimension). */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue: hand-checked Morton codes, bijective on the clamped grid") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L), (0L, 2L),
      (3L, 5L)).toDF("x", "y")
    val z = df.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L && z((1L, 0L)) == 1L && z((0L, 1L)) == 2L)
    assert(z((1L, 1L)) == 3L && z((2L, 0L)) == 4L && z((0L, 2L)) == 8L)
    // (3,5): x bits 11 -> positions 0,2 = 5; y bits 101 -> positions 1,5 = 34
    assert(z((3L, 5L)) == 39L)
    // bijection over the full 16x16 grid
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val n = grid.select(Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .distinct().count()
    assert(n == 256, s"z-values collide: $n distinct of 256")
  }

  test("zOrderBy partitions cover small hyper-rectangles in BOTH dimensions") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(8192)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y")
    def avgSpread(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head
      (s.getDouble(0), s.getDouble(1))
    }
    val (zx, zy) = avgSpread(Layout.zOrderBy(pts, Seq("x", "y"), 8, 16))
    val (rx, ry) = avgSpread(pts.repartition(16))
    // random layout: every partition spans ~the whole 0..255 range in
    // both dims; z-order: each partition is a compact z-range
    assert(rx > 200 && ry > 200, s"control broken: $rx/$ry")
    assert(zx < 140 && zy < 140, s"z layout not local: $zx/$zy")
    assert(zx + zy < (rx + ry) * 0.6, s"no locality win: z $zx/$zy vs random $rx/$ry")
    // single-column sort control: locality in x only, none in y
    val (sx, sy) = avgSpread(
      pts.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(sx < 40 && sy > 200, s"sort control unexpected: $sx/$sy")
  }
}
