package graft

import graft.model._

/** Parses a reference-shaped job JSON (the config a dtle user already
  * runs) into the engine's ReplicationSpec + tuning, and feeds the
  * parsed spec straight into the routing/discovery operators.
  */
class JobConfigSpec extends SparkSpec {
  import spark.implicits._

  private val jobJson =
    """{
      |  "ReplicateDoDb": [
      |    {
      |      "TableSchema": "shop",
      |      "TableSchemaRename": "shop_out",
      |      "Tables": [
      |        {"TableName": "orders", "TableRename": "orders_v2",
      |         "Where": "total > 100",
      |         "ColumnMapFrom": ["id", "total"], "ColumnMapTo": ["order_id", "amount"]},
      |        {"TableName": "customers"}
      |      ]
      |    },
      |    {"TableSchemaRegex": "^src(\\d)$", "TableSchemaRename": "shard_$1",
      |     "Tables": [{"TableRegex": "^(.*)$", "TableRename": "t_$1"}]}
      |  ],
      |  "ReplicateIgnoreDb": [
      |    {"TableSchema": "tmp"},
      |    {"TableSchema": "shop", "Tables": [{"TableName": "audit_log"}]}
      |  ],
      |  "SqlFilter": ["NoDMLDelete", "NoDDLDropTable"],
      |  "ChunkSize": 5000,
      |  "GroupMaxSize": 4096,
      |  "GroupTimeout": 250,
      |  "ParallelWorkers": 8,
      |  "BulkInsert1": 4, "BulkInsert2": 8, "BulkInsert3": 128,
      |  "Gtid": "uuid-1:1-100",
      |  "DropTableIfExists": true,
      |  "SrcConnectionConfig": {"Host": "db-src", "Port": 3307, "User": "repl"},
      |  "DestConnectionConfig": {"Host": "db-dst", "Port": 3306, "User": "writer"},
      |  "DestType": "mysql"
      |}""".stripMargin

  test("parses routing, renames, filters, and column maps") {
    val cfg = JobConfig.fromJson(jobJson)
    assert(cfg.repl.doDb.length == 2)
    val shop = cfg.repl.doDb.head
    assert(shop.schema == "shop" && shop.renameSchema.contains("shop_out"))
    val orders = shop.tables.head
    assert(orders.name == "orders" && orders.renameTable.contains("orders_v2"))
    assert(orders.where.contains("total > 100"))
    assert(orders.columnMapFrom == Seq("id", "total") && orders.columnMapTo == Seq("order_id", "amount"))
    val regexSpec = cfg.repl.doDb(1)
    assert(regexSpec.schemaRegex.contains("^src(\\d)$"))
    assert(regexSpec.tables.head.name == "^(.*)$")
    assert(cfg.repl.ignoreDb == Seq(IgnoreSpec("tmp"), IgnoreSpec("shop", Seq("audit_log"))))
  }

  test("SqlFilter maps to op skips like the reference parseSqlFilter") {
    val cfg = JobConfig.fromJson(jobJson)
    assert(cfg.repl.skipOps == Set(Op.Delete, Op.Ddl))
    val noDml = JobConfig.fromJson("""{"SqlFilter": ["NoDML"]}""")
    assert(noDml.repl.skipOps == Set(Op.Insert, Op.Update, Op.Delete))
  }

  test("tuning scalars parse; absent fields take reference defaults") {
    val cfg = JobConfig.fromJson(jobJson)
    assert(cfg.tuning.chunkSize == 5000L && cfg.tuning.groupMaxSize == 4096)
    assert(cfg.tuning.groupTimeoutMs == 250 && cfg.tuning.parallelWorkers == 8)
    assert(cfg.tuning.dropTableIfExists && cfg.tuning.bulkInsertTiers == Seq(128, 8, 4, 1))
    assert(cfg.gtidStart.contains("uuid-1:1-100"))
    assert(cfg.src.exists(c => c.host == "db-src" && c.port == 3307))
    val dflt = JobConfig.fromJson("{}")
    assert(dflt.tuning.chunkSize == 2000L && dflt.tuning.groupMaxSize == 1)
    assert(dflt.tuning.groupTimeoutMs == 100 && dflt.tuning.parallelWorkers == 1)
    assert(dflt.destType == "mysql" && dflt.repl.doDb.isEmpty)
  }

  test("KafkaConfig flips destType and carries the topic") {
    val cfg = JobConfig.fromJson(
      """{"KafkaConfig": {"Topic": "cdc.shop", "Brokers": ["k1:9092", "k2:9092"],
        |  "MessageGroupMaxSize": 4096, "MessageGroupTimeout": 250}}""".stripMargin)
    assert(cfg.destType == "kafka")
    assert(cfg.kafka.exists(k => k.topic == "cdc.shop" && k.brokers == Seq("k1:9092", "k2:9092")))
    // the group knobs live INSIDE KafkaConfig, not at the job root
    assert(cfg.kafka.exists(k => k.messageGroupMaxSize == 4096L && k.messageGroupTimeoutMs == 250L))
    val dflt = JobConfig.fromJson("""{"KafkaConfig": {"Topic": "t"}}""")
    assert(dflt.kafka.exists(k => k.messageGroupMaxSize == 1L && k.messageGroupTimeoutMs == 100L))
  }

  test("parsed spec drives discovery end-to-end (JSON -> plan list)") {
    val cfg = JobConfig.fromJson(jobJson)
    val catalog = Seq(
      ("shop", "orders"), ("shop", "customers"), ("shop", "audit_log"),
      ("src1", "users"), ("tmp", "x"), ("other", "y")
    ).toDF("db", "table")
    val got = graft.operators.Relational.discoverTables(catalog, cfg.repl)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("shop", "orders", "shop_out", "orders_v2"),
      ("shop", "customers", "shop_out", "customers"),
      ("src1", "users", "shard_1", "t_users")))
  }
}
