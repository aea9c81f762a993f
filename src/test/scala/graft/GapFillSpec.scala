package graft

import org.apache.spark.sql.functions._
import graft.operators.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("densifies the calendar, carries last observation, null before first") {
    val df = Seq(
      (1L, "2024-01-02", 10.0), (1L, "2024-01-02", 2.5), (1L, "2024-01-04", 7.0),
      (2L, "2024-01-03", 1.0)
    ).toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val out = GapFill.dailyCarryForward(df, "k", "d", "v", "2024-01-01", "2024-01-05")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "2024-01-01", null, null, false),
      (1L, "2024-01-02", 12.5, 12.5, false),  // same-day rows aggregate
      (1L, "2024-01-03", null, 12.5, true),   // gap filled
      (1L, "2024-01-04", 7.0, 7.0, false),
      (1L, "2024-01-05", null, 7.0, true),
      (2L, "2024-01-01", null, null, false),
      (2L, "2024-01-02", null, null, false),
      (2L, "2024-01-03", 1.0, 1.0, false),
      (2L, "2024-01-04", null, 1.0, true),
      (2L, "2024-01-05", null, 1.0, true)))
  }

  test("observations outside the range are excluded but keep the key on the spine") {
    val df = Seq((9L, "2023-12-25", 5.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val out = GapFill.dailyCarryForward(df, "k", "d", "v", "2024-01-01", "2024-01-03")
      .collect()
    assert(out.length == 3 && out.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }
}
