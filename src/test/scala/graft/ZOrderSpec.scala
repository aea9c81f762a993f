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

  test("spreadBits3 / zValue3 match hand-computed Morton-3 codes") {
    val got = Seq((0b1011L, 0L, 0L), (1L, 1L, 1L), (1023L, 1023L, 1023L))
      .toDF("x", "y", "z")
      .select(ZOrderLayout.spreadBits3(col("x")).as("sx"),
        ZOrderLayout.zValue3(col("x"), col("y"), col("z")).as("zv"))
      .as[(Long, Long)].collect().toSeq
    // 0b1011 spread to every 3rd bit: 0b1000001001
    assert(got(0)._1 == 0x209L)
    assert(got(1)._2 == 7L)                 // (1,1,1) → bits 0,1,2
    assert(got(2)._2 == (1L << 30) - 1)     // all 30 bits set
  }

  test("3-column z-order bounds ALL THREE columns; lexicographic bounds one") {
    // 16x16x16 cube, every combination once
    val cube = (0 until 16).flatMap(x => (0 until 16).flatMap(y =>
      (0 until 16).map(z => (x.toLong, y.toLong, z.toLong)))).toDF("x", "y", "z")
    val stats = ZOrderLayout.zorderStats3(cube, "x", "y", "z", bits = 4, bucketBits = 3)
      .collect()
    assert(stats.length == 8)
    // every 512-cell bucket is a half-cube: each column spans ≤ 8 of 16
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 8)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 8)
      assert(r.getAs[Long]("max_z") - r.getAs[Long]("min_z") <= 8)
    }
    // a lexicographic (x, y, z) sort cut into 8 chunks leaves y and z
    // full-width in every chunk
    import org.apache.spark.sql.expressions.Window
    val lex = cube.withColumn("rn",
        row_number().over(Window.orderBy("x", "y", "z")))
      .withColumn("chunk", ((col("rn") - 1) / 512).cast("int"))
    val spans = lex.groupBy("chunk")
      .agg((max("y") - min("y")).as("sy"), (max("z") - min("z")).as("sz"))
      .agg(avg("sy"), avg("sz")).head()
    assert(spans.getDouble(0) > 14.0 && spans.getDouble(1) > 14.0)
  }

  test("skewed keys: linear codes collapse one column; rank codes bound both") {
    // x: a uniform 1..512 working set plus ONE outlier at 10^12 — the
    // linear (min,max) quantizer maps every regular x to code 0, so
    // buckets split only on y and x stays full-width per bucket; rank
    // codes ignore magnitudes entirely and keep buckets balanced
    val rows = (1 to 512).flatMap(x => (1 to 4).map(y =>
      (x.toLong, ((x * 7 + y * 13) % 64).toLong))) :+ (1000000000000L, 1L)
    val df = rows.toDF("x", "y")
    def maxRegularXSpan(stats: org.apache.spark.sql.DataFrame): Long =
      stats.filter(col("max_x") < 1000000L) // outlier bucket aside
        .agg(max(col("max_x") - col("min_x"))).head().getLong(0)
    val lin = ZOrderLayout.zorderStats(df, "x", "y", bits = 10, bucketBits = 4)
    val rnk = ZOrderLayout.zorderStatsRank(df, "x", "y", bits = 10, bucketBits = 4)
    // linear: regular rows all landed in x-code 0 → some bucket carries
    // (nearly) the whole 1..512 span
    assert(maxRegularXSpan(lin) > 400L, s"linear=${maxRegularXSpan(lin)}")
    // rank: 16 buckets over 513 distinct x values → spans stay bounded
    assert(maxRegularXSpan(rnk) < 200L, s"rank=${maxRegularXSpan(rnk)}")
    // and the rank buckets hold balanced row counts (within 3x)
    val counts = rnk.select(col("n_rows")).as[Long].collect()
    assert(counts.max <= 3 * math.max(counts.min, 1))
  }

  test("rankCodes: exact integer quantiles, code range [0, 2^bits)") {
    val df = (1 to 100).map(i => (i.toLong, 0L)).toDF("x", "y")
    val codes = ZOrderLayout.rankCodes(df, "x", 3)
      .orderBy(col("v")).as[(Long, Long)].collect()
    // 100 values into 8 buckets: code = prior*8 div 100 — 12..13 per code
    assert(codes.map(_._2).min == 0L && codes.map(_._2).max == 7L)
    assert(codes.groupBy(_._2).values.map(_.size).max <= 13)
    // monotone: codes never decrease with value
    assert(codes.map(_._2).sliding(2).forall(p => p.head <= p.last))
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
