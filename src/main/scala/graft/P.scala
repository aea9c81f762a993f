import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object P {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.build()
    val dir = "/root/testdata/sf0.1"
    SparkEntry.queries("dedup_exact")(s, dir).write.format("noop").mode("overwrite").save()
    def time(n: String)(f: => Unit): Unit = { val t0=System.nanoTime(); f; println(f"XTIME $n: ${(System.nanoTime()-t0)/1e9}%.2f s") }
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18,2))).cast("double").as("sum_qty"),
           sum(col("l_extendedprice").cast(DecimalType(18,2))).cast("double").as("sum_base"),
           sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(22,4))).cast("double").as("sum_disc_price"),
           count(lit(1)).as("count_order"))
    val li = Tables.load(s, dir, "lineitem")
    time("q1 with repartition") { agg(graft.operators.Partitioning.ensureMinParallelism(li)).write.format("noop").mode("overwrite").save() }
    time("q1 no repartition") { agg(li).write.format("noop").mode("overwrite").save() }
    time("q1 with repartition 2") { agg(graft.operators.Partitioning.ensureMinParallelism(li)).write.format("noop").mode("overwrite").save() }
    time("q1 no repartition 2") { agg(li).write.format("noop").mode("overwrite").save() }
    s.stop()
  }
}
