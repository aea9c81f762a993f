package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration. Used by
  * Verify / Bench / tests so behavior is identical everywhere.
  *
  *  - shuffle.partitions sized to cores (local[32]), not the 200 default;
  *  - AQE on: runtime coalescing + skew-join handling is part of the
  *    100 TB design (SURVEY.md §4);
  *  - ANSI off: the engine uses wrap-around 64-bit arithmetic in its
  *    sketch hashes (minhash permutations, simhash, rolling hash) —
  *    Java overflow semantics are intended and deterministic there, and
  *    the reference's MySQL surface is non-ANSI anyway;
  *  - nanosAsLong: the `events` fixture carries TIMESTAMP(NANOS), which
  *    Spark's parquet reader otherwise rejects; [[Tables.load]] converts
  *    the long back to a proper TimestampType column.
  */
object GraftSession {

  /** Conf deltas for the real multi-executor deployment at the 100 TB
    * design point. `build()` below configures local[32]; these are the
    * knobs that CHANGE when the same code ships to a 1000-executor
    * cluster — versioned with the engine so the deployment recipe can't
    * drift from the code it tunes. Apply on top of `build()`'s settings
    * (`scaleOutConf.foreach((spark.conf.set _).tupled)` at submit, or
    * as `--conf` flags).
    */
  val scaleOutConf: Map[String, String] = Map(
    // AQE coalesces DOWN from this; start high so no stage is starved
    // of parallelism before runtime stats arrive (rule of thumb: 2-4x
    // total executor cores)
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "8192",
    // scan-split size: 256 MB balances task-launch overhead against
    // stragglers; with ~100k row-groups at 100 TB the scan still fans
    // out to ~400k tasks
    "spark.sql.files.maxPartitionBytes" -> "268435456",
    // a "small" dimension at this scale is bigger than the 10 MB
    // default; broadcast joins beat shuffles up to executor-memory
    // comfort (executors are sized 32-64 GB here)
    "spark.sql.autoBroadcastJoinThreshold" -> "67108864",
    // split shuffle partitions whose size exceeds this at runtime —
    // the skew half of the salting story (Partitioning.saltedAggregate
    // is the planned half)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "268435456",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "134217728",
    // streaming state (CDC tx assembly, streaming dedup) outgrows the
    // in-memory store long before 100 TB; RocksDB spills to local disk
    // and checkpoints increments
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  )

  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // let the planner pick shuffled-hash over sort-merge when its
      // size conditions hold (guide: joins): the equi-joins here that
      // are NOT already hint-pinned join a large fact side to a
      // moderate per-partition side — hashing the small side skips two
      // full sorts. Size conditions stay stat-gated, so an unsortable-
      // build-side OOM shape falls back to sort-merge as before; the
      // same flag is the 100 TB recommendation (build sides are
      // per-partition, not per-table). Join STRATEGY never changes
      // results, only the physical operator.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // C9 charset stage: decode() must accept the full JVM charset set
      // (MySQL latin1 = windows-1252, gbk, …), not just Spark's builtin
      // six — reference charsetEncodingMap (mysqlconfig/encoding.go:20)
      .config("spark.sql.legacy.javaCharsets", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // InferFiltersFromGenerate duplicates the generator expression
      // into a pre-Generate filter (size(e)>0 && isnotnull(e)). Every
      // Generate in this engine explodes a freshly computed expensive
      // array (shingles, band hashes), so the inferred filter re-runs
      // the hot expression per row for no pruning benefit — Generate
      // with outer=false already skips null/empty arrays.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // generated-class cache (static conf, default 100 entries): an
      // analytics session cycling through dozens of multi-stage queries
      // holds far more than 100 distinct codegen units, so the default
      // thrashes and re-pays Janino compilation (~100-500 ms per unit)
      // on every revisit. The entries are class references — memory
      // cost is metaspace already paid at first compile.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // managed tables (bucketed layouts) go to /tmp, not the repo cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // CollationAwareUTF8String's static init builds ICU case-mapping
    // tries (~8 s), and the first non-ASCII lower()/upper() stage pays
    // it with all tasks serialized on the class-init monitor (observed:
    // 31/32 threads blocked). Force the init here, once per JVM, off the
    // query path. local mode shares the JVM; on a cluster each executor
    // pays it once at startup — noise against any real stage.
    Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")
    spark
  }
}
