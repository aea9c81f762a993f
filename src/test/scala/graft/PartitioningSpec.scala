package graft

import org.apache.spark.sql.functions._
import graft.operators.Partitioning

class PartitioningSpec extends SparkSpec {

  test("saltedAggregate equals the plain aggregate on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key — the classic straggler shape
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Partitioning.saltedAggregate(skewed, "k", nSalts = 8)(
      g => g.agg(sum("v").as("ps"), count(lit(1)).as("pn")),
      g => g.agg(sum("ps").as("s"), sum("pn").as("n"))
    ).as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted partial stage splits the hot key across sub-groups") {
    import spark.implicits._
    val skewed = spark.range(1000).repartition(8)
      .select(lit(1L).as("k"), col("id").as("v"))
    val partials = Partitioning.saltedAggregate(skewed, "k", nSalts = 8)(
      g => g.agg(count(lit(1)).as("pn")),
      g => g.agg(count(lit(1)).as("n_subgroups"))
    ).as[(Long, Long)].collect().toMap
    assert(partials(1L) > 1, s"hot key must split into multiple sub-groups, got ${partials(1L)}")
  }
}
