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
  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
