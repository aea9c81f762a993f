package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.DebeziumEnvelope
import graft.streaming.LagMetrics

/** K6 envelope + O7 lag metrics. */
class DebeziumEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("envelope value carries after/source/op/ts_ms; null before omitted") {
    val cdc = Seq((1L, 100L)).toDF("id", "ev")
      .select(
        lit("db").as("db"), lit("t").as("table"), lit("c").as("op"),
        lit(null).cast("struct<id:bigint>").as("before"),
        struct(col("id")).as("after"),
        lit(123L).as("tsMillis"), lit("s1").as("originServerId"),
        col("ev").as("seq"), col("id"))
    val out = DebeziumEnvelope.encode(cdc, Seq("id"), "pfx").as[(String, String, String)].head()
    assert(out._1 == """{"id":1}""")
    assert(out._2 ==
      """{"after":{"id":1},"source":{"name":"graft","db":"db","table":"t","server_id":"s1","pos":100},"op":"c","ts_ms":123}""")
    assert(out._3 == "pfx.db.t")
  }

  test("schema block maps Spark types to Debezium field types") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("bal", DecimalType(10, 2)),
      StructField("born", DateType),
      StructField("seen", TimestampType)))
    val js = DebeziumEnvelope.schemaJson(st, "db.t.Value")
    assert(js.contains("""{"type":"int64","optional":false,"field":"id"}"""))
    assert(js.contains("""{"type":"string","optional":true,"field":"name"}"""))
    assert(js.contains("""{"type":"bytes","optional":true,"field":"bal"}"""))
    assert(js.contains("""{"type":"int32","optional":true,"field":"born"}"""))
    assert(js.contains("""{"type":"int64","optional":true,"field":"seen"}"""))
    assert(js.contains(""""name":"db.t.Value""""))
  }

  test("lag metric: delay vs newest event ts, None when batch empty") {
    val batch = Seq("2024-01-01 00:00:00", "2024-01-01 00:10:00").toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val newest = batch.agg(max(unix_millis(col("ts").cast("timestamp")))).first().getLong(0)
    val lag = LagMetrics.delayOf(batch, "ts", newest + 5000L)
    assert(lag.contains(5000L))
    val empty = batch.filter(lit(false))
    assert(LagMetrics.delayOf(empty, "ts", 1L).isEmpty)
  }

  test("schemaChange publishes DDL envelopes keyed by database (K6)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ddl = Seq(("shop", "ALTER TABLE `shop`.`t` ADD COLUMN x INT", 5000L, "server-1", 5L))
      .toDF("db", "ddl", "tsMillis", "originServerId", "seq")
    val out = DebeziumEnvelope.schemaChange(ddl, "graft").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("key") == """{"databaseName":"shop"}""")
    assert(r.getAs[String]("topic") == "graft")
    val v = r.getAs[String]("value")
    assert(v.contains(""""databaseName":"shop""""))
    assert(v.contains(""""ddl":"ALTER TABLE `shop`.`t` ADD COLUMN x INT""""))
    assert(v.contains(""""ts_ms":5000"""))
    assert(v.contains(""""pos":5"""))
  }

  test("decode(encode(x)) round-trips the envelope") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cdc = Seq(
      ("shop", "t", "c", 42L, "srv-1", 7L, "k1", "v1"),
      ("shop", "t", "d", 43L, "srv-2", 8L, "k2", null.asInstanceOf[String])
    ).toDF("db", "table", "op", "tsMillis", "originServerId", "seq", "pk", "payload")
      .withColumn("before", when(col("op") === "d", struct(col("pk"), col("payload"))))
      .withColumn("after", when(col("op") =!= "d", struct(col("pk"), col("payload"))))
    val encoded = DebeziumEnvelope.encode(cdc, Seq("pk"), "graft")
    val decoded = DebeziumEnvelope.decode(encoded)
      .select("db", "table", "op", "ts_ms", "origin_server_id", "seq", "after")
      .as[(String, String, String, Long, String, Long, String)].collect().sortBy(_._6)
    assert(decoded(0) == (("shop", "t", "c", 42L, "srv-1", 7L, """{"pk":"k1","payload":"v1"}""")))
    assert(decoded(1)._3 == "d" && decoded(1)._7 == null) // delete: after absent
  }
}
