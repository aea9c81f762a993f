package graft.sinks

import org.apache.spark.sql.functions._

/** Throughput probe for the from-scratch Kafka wire (run with
  * `Test/runMain graft.sinks.KafkaWireProbe [nRows]`): produces
  * Debezium-sized records through [[KafkaWireSink]] into the loopback
  * broker (CRC-validated server-side), then reads them all back via
  * [[graft.sources.KafkaWireSource]]. Loopback TCP, single host — an
  * upper bound on protocol+framing cost, not network reality; the
  * numbers land in BUILD_EVIDENCE so the wire layer ships with a
  * measured cost like every other operator.
  */
object KafkaWireProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = graft.GraftSession.build()
    import spark.implicits._
    val broker = new LoopbackKafka.Broker(numPartitions = 8)
    try {
      // ~220-byte values — the envelope size the CDC fixture produces
      val payload = "x" * 180
      val rows = spark.range(n).select(
        concat(lit("{\"key\":\""), col("id"), lit("\"}")).as("key"),
        concat(lit("{\"before\":null,\"after\":{\"id\":"), col("id"),
          lit(s""","p":"$payload"},"op":"c","ts_ms":1}""")).as("value"),
        lit("probe.topic").as("topic")).cache()
      rows.count()

      // warm the produce path (codegen, socket classes)
      KafkaWireSink.produce(rows.limit(100), broker.host, broker.port)

      val t0 = System.nanoTime()
      val produced = KafkaWireSink.produce(rows.repartition(8), broker.host, broker.port)
      val dtP = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val consumed = spark.read
        .format(classOf[graft.sources.KafkaWireSource].getName)
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "probe.topic").load()
        .count()
      val dtC = (System.nanoTime() - t1) / 1e9

      println(f"""{"probe":"kafka_wire","rows":$n,"produced":$produced,""" +
        f""""produce_sec":$dtP%.2f,"produce_rows_per_sec":${produced / dtP}%.0f,""" +
        f""""consumed":$consumed,"consume_sec":$dtC%.2f,"consume_rows_per_sec":${consumed / dtC}%.0f}""")
    } finally { broker.close(); spark.stop() }
  }
}
