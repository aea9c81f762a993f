package graft

import org.apache.spark.sql.functions._
import graft.sinks.ZOrderLayout

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("spreadBits / zValue2 match hand-computed Morton codes") {
    val df = Seq((11L, 0L), (3L, 1L), (0L, 0L), (1023L, 1023L)).toDF("x", "y")
      .select(ZOrderLayout.spreadBits(col("x")).as("sx"),
        ZOrderLayout.zValue2(col("x"), col("y")).as("z"))
      .as[(Long, Long)].collect().toSeq
    assert(df(0)._1 == 69L)           // 0b1011 -> 0b1000101
    assert(df(1)._2 == 7L)            // morton(3,1) = 0b111
    assert(df(2)._2 == 0L)
    assert(df(3)._2 == (1L << 20) - 1) // all 20 bits set
  }

  test("z-order files bound BOTH columns; x-sort leaves y full-width") {
    // 64x64 grid: every (x, y) combination once
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.groupBy(col("pid"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy"))).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val z = ZOrderLayout.withZValue(grid, "x", "y", bits = 6)
      .repartitionByRange(16, col("zv")).sortWithinPartitions(col("zv"))
      .withColumn("pid", spark_partition_id())
    val plain = grid.repartitionByRange(16, col("x"), col("y"))
      .withColumn("pid", spark_partition_id())
    val (zx, zy) = spans(z)
    val (px, py) = spans(plain)
    // x-major range layout: x tightly bounded, y spans the full 0..63
    assert(py > 60.0, s"x-major layout should leave y unbounded, got $py")
    // z-order: BOTH columns bounded well under full width
    assert(zx < 32.0 && zy < 32.0, s"z-order spans ($zx, $zy) not compact")
    assert(px < zx, "sanity: x-major bounds x tighter than z-order does")
  }

  test("writeZOrdered round-trips rows and drops the helper column") {
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = graft.TempDirs.scratch("zorder")
    ZOrderLayout.writeZOrdered(grid, "x", "y", dir, numFiles = 8, bits = 5)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSeq.sorted == Seq("x", "y"))
    assert(back.count() == 1024)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
  }
}
