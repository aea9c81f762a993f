package graft

import org.apache.spark.sql.functions._
import graft.model._

/** §3.2/§3.3 end-to-end: snapshot with transforms + watermark, then
  * change replay — the reference's full job lifecycle on fixtures.
  */
class JobRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot: chunked read + filter + projection + rename + watermark") {
    val runner = new JobRunner(spark, ReplicationSpec())
    val dir = java.nio.file.Files.createTempDirectory("graft-job").toString
    val orders = Tables.load(spark, sf, "orders")
    val spec = TableSpec("sales", "orders",
      renameSchema = Some("analytics"), renameTable = Some("orders_cdc"),
      where = Some("o_totalprice > 1000"),
      columnMapFrom = Seq("o_orderkey", "o_custkey", "o_totalprice"))
    val res = runner.snapshot(orders, spec, Seq("o_orderkey"), 4, dir, seqCol = Some("o_orderkey"))
    assert(res.table == "analytics.orders_cdc")
    val written = spark.read.parquet(s"$dir/analytics.orders_cdc")
    assert(written.columns.toSeq == Seq("o_orderkey", "o_custkey", "o_totalprice"))
    val expected = orders.filter(col("o_totalprice") > 1000).count()
    assert(res.rows == expected && written.count() == expected)
    assert(res.watermark == orders.agg(max("o_orderkey")).first().getLong(0))
  }

  test("a dtle job JSON drives the full lifecycle: parse -> snapshot -> transforms") {
    // the config a reference user already has, verbatim field names
    val json =
      """{
        |  "ReplicateDoDb": [
        |    {"TableSchema": "sales", "TableSchemaRename": "analytics",
        |     "Tables": [{"TableName": "orders", "TableRename": "orders_cdc",
        |       "Where": "o_totalprice > 1000",
        |       "ColumnMapFrom": ["o_orderkey", "o_custkey", "o_totalprice"]}]}
        |  ],
        |  "SqlFilter": ["NoDMLDelete"],
        |  "ChunkSize": 2000
        |}""".stripMargin
    val (runner, cfg) = JobRunner.fromJson(spark, json)
    assert(cfg.repl.skipOps == Set(Op.Delete))
    val tableSpec = cfg.repl.doDb.head.tables.head
      .copy(schema = cfg.repl.doDb.head.schema,
        renameSchema = cfg.repl.doDb.head.renameSchema)
    val dir = java.nio.file.Files.createTempDirectory("graft-json-job").toString
    val res = runner.snapshot(Tables.load(spark, sf, "orders"), tableSpec,
      Seq("o_orderkey"), numChunks = 4, outDir = dir)
    assert(res.table == "analytics.orders_cdc")
    val written = spark.read.parquet(s"$dir/analytics.orders_cdc")
    assert(written.columns.toSeq == Seq("o_orderkey", "o_custkey", "o_totalprice"))
    assert(written.count() ==
      Tables.load(spark, sf, "orders").filter(col("o_totalprice") > 1000).count())
  }

  test("replayBatch: routed change log over snapshot state gives final state") {
    val repl = ReplicationSpec(doDb = Seq(SchemaSpec("db")), skipOps = Set("ddl"),
      selfServerId = Some("self"))
    val runner = new JobRunner(spark, repl)
    val state = Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")).toDF("pk", "payload")
    val changes = Seq(
      ("db", "t", "u", "k1", 1L, "v1b", "peer"),
      ("db", "t", "d", "k2", 2L, null.asInstanceOf[String], "peer"),
      ("db", "t", "i", "k4", 3L, "v4", "peer"),
      ("other", "t", "u", "k3", 4L, "IGNORED", "peer"), // routed out
      ("db", "t", "u", "k3", 5L, "LOOP", "self"),       // cycle-filtered
      ("db", "t", "ddl", "k3", 6L, "DDL", "peer")       // op-filtered
    ).toDF("db", "table", "op", "pk", "seq", "payload", "originServerId")
    val out = runner.replayBatch(state, changes, "pk", "seq", "op")
      .select("pk", "payload").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "v1b", "k3" -> "v3", "k4" -> "v4"))
  }
}
