package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K6 — Kafka sink with Debezium-compatible envelope (SURVEY.md §2.2;
  * reference `driver/kafka/kafka3.go:867-1063`
  * kafkaTransformDMLEventQueries, envelope schemas
  * `driver/kafka/kafka2.go:111-230`).
  *
  * The envelope is `{before, after, source:{...}, op, ts_ms}` with the
  * key a struct of PK columns; topic = `prefix.schema.table`. Built
  * entirely with `to_json(struct(...))` so the encode stage is codegen'd
  * and the writer is the stock Kafka sink:
  *
  * {{{
  * DebeziumEnvelope.encode(df, ...).writeStream.format("kafka")
  *   .option("kafka.bootstrap.servers", ...).start()
  * }}}
  */
object DebeziumEnvelope {

  /** Envelope value as canonical JSON. `before`/`after` are struct
    * columns (null for the absent half of insert/delete — the reference
    * encodes a filtered-out update half as a nil row,
    * `binlog_reader.go:1963-1981`).
    */
  def value(before: Column, after: Column, op: Column, tsMillis: Column,
            db: Column, table: Column, serverId: Column, pos: Column): Column =
    to_json(struct(
      before.as("before"),
      after.as("after"),
      struct(
        lit("graft").as("name"),
        db.as("db"),
        table.as("table"),
        serverId.as("server_id"),
        pos.as("pos")
      ).as("source"),
      op.as("op"),
      tsMillis.as("ts_ms")
    ))

  /** Message key: PK columns as a JSON struct (reference keys messages
    * by the table's PK, `kafka3.go:917-930`).
    */
  def key(df: DataFrame, pkCols: Seq[String]): Column =
    to_json(struct(pkCols.map(col): _*))

  /** Topic routing `prefix.schema.table` (reference `kafka3.go:1045`). */
  def topic(prefix: String, db: Column, table: Column): Column =
    concat_ws(".", lit(prefix), db, table)

  /** Debezium `schema` block for a row struct (reference envelope
    * schema templates, `driver/kafka/kafka2.go:111-230`): field-type
    * descriptors for the before/after payload. Static per table
    * version — generate once from the schema registry and prepend to
    * the envelope (or publish on the schema-change topic).
    */
  def schemaJson(st: org.apache.spark.sql.types.StructType, name: String): String = {
    import org.apache.spark.sql.types._
    def dbzType(dt: DataType): String = dt match {
      case BooleanType => "boolean"
      case ByteType => "int8"
      case ShortType => "int16"
      case IntegerType => "int32"
      case LongType => "int64"
      case FloatType => "float"
      case DoubleType => "double"
      case _: DecimalType => "bytes" // unscaled big-int bytes (C1)
      case BinaryType => "bytes"
      case DateType => "int32"      // epoch days (C4)
      case TimestampType => "int64" // epoch millis (C3)
      case _ => "string"
    }
    val fields = st.fields.map { f =>
      s"""{"type":"${dbzType(f.dataType)}","optional":${f.nullable},"field":"${f.name}"}"""
    }.mkString(",")
    s"""{"type":"struct","fields":[$fields],"optional":true,"name":"$name"}"""
  }

  /** K6 — schema-change topic: DDL events publish a Debezium-style
    * schema-change envelope `{source, databaseName, ddl, ts_ms}` keyed by
    * database name onto the server-level topic (reference emits DDL to
    * the schema-change topic on the full-copy path, `kafka3.go:684-865`;
    * envelope shape `kafka2.go:111-230`). Runs alongside [[encode]]: the
    * data topic gets rows, this gets the DDL that reshapes them, so a
    * consumer can replay both in `ts_ms` order.
    */
  def schemaChange(ddl: DataFrame, topicPrefix: String,
                   dbCol: String = "db", ddlCol: String = "ddl",
                   tsCol: String = "tsMillis", serverCol: String = "originServerId",
                   posCol: String = "seq"): DataFrame =
    ddl.select(
      to_json(struct(col(dbCol).as("databaseName"))).as("key"),
      to_json(struct(
        struct(
          lit("graft").as("name"),
          col(dbCol).as("db"),
          col(serverCol).as("server_id"),
          col(posCol).as("pos")
        ).as("source"),
        col(dbCol).as("databaseName"),
        col(ddlCol).as("ddl"),
        col(tsCol).as("ts_ms")
      )).as("value"),
      lit(topicPrefix).as("topic")
    )

  /** Full encode: CDC DataFrame with struct before/after → Kafka-ready
    * (key, value, topic) frame.
    */
  def encode(cdc: DataFrame, pkCols: Seq[String], topicPrefix: String): DataFrame =
    cdc.select(
      key(cdc, pkCols).as("key"),
      value(col("before"), col("after"), col("op"), col("tsMillis"),
        col("db"), col("table"), col("originServerId"), col("seq")).as("value"),
      topic(topicPrefix, col("db"), col("table")).as("topic")
    )

  /** [[encode]]'s schema-on-read twin for streams whose before/after
    * travel as JSON OBJECT TEXT already ([[graft.sources.CdcFileSource]]
    * emits them that way; [[decode]] returns them that way): the images
    * splice into the envelope verbatim instead of being re-parsed into
    * structs, so the value stays one codegen'd `concat` and the payload
    * schema can drift mid-stream without touching the plan (SURVEY §7.4
    * hard part 3). `op` values are the engine's closed vocabulary
    * ([[graft.model.Op]]) so the bare-quote splice is injection-safe;
    * ts_ms is numeric. Key = the engine's row-key string as a JSON
    * struct (the reference keys by PK, `kafka3.go:917-930`).
    */
  def encodeRaw(cdc: DataFrame, topicPrefix: String): DataFrame = {
    // the batch CDC frames carry camelCase (ChangeEvent encoder); the
    // streaming file-source schema carries the wire-friendly snake_case
    // — accept both so the sink plugs into either side unchanged
    def pick(a: String, b: String): Column =
      if (cdc.columns.contains(a)) col(a) else col(b)
    cdc.select(
      to_json(struct(col("key"))).as("key"),
      concat(
        lit("{\"before\":"), coalesce(col("before"), lit("null")),
        lit(",\"after\":"), coalesce(col("after"), lit("null")),
        lit(",\"source\":"), to_json(struct(
          lit("graft").as("name"),
          col("db").as("db"),
          col("table").as("table"),
          pick("originServerId", "origin_server_id").as("server_id"),
          col("seq").as("pos"))),
        lit(",\"op\":\""), col("op"), lit("\""),
        lit(",\"ts_ms\":"), pick("tsMillis", "ts_ms").cast("string"),
        lit("}")).as("value"),
      topic(topicPrefix, col("db"), col("table")).as("topic")
    )
  }

  /** Decode a Debezium envelope stream (e.g. `spark.readStream
    * .format("kafka")`'s `value`) back into the engine's CDC frame —
    * the consumer side of S1's "Kafka+Debezium topic read" deployment
    * (SURVEY §2.1). `before`/`after` stay RAW JSON text
    * (`get_json_object` returns the object's source text), i.e.
    * schema-on-read like [[graft.sources.CdcFileSource]] — the payload
    * schema can drift mid-stream without breaking the plan (SURVEY §7.4
    * hard part 3).
    */
  def decode(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    raw.select(
      get_json_object(v, "$.source.db").as("db"),
      get_json_object(v, "$.source.table").as("table"),
      get_json_object(v, "$.op").as("op"),
      get_json_object(v, "$.before").as("before"),
      get_json_object(v, "$.after").as("after"),
      get_json_object(v, "$.ts_ms").cast("long").as("ts_ms"),
      get_json_object(v, "$.source.server_id").as("origin_server_id"),
      get_json_object(v, "$.source.pos").cast("long").as("seq")
    )
  }
}
