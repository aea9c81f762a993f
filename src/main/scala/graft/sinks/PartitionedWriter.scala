package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned-layout writer for training-data output (SURVEY.md §8:
  * "partitioned Parquet/Iceberg layout" at 100 TB).
  *
  * Two failure modes at scale, both handled:
  *  - tiny files: a plain `write.partitionBy` emits one file per
  *    (task, partition-value) — 32 tasks × 1000 partitions = 32k
  *    shards. Repartitioning by the partition columns first routes
  *    each partition value to one task → one file per value.
  *  - giant files: a hot partition value still lands in one task;
  *    `maxRecordsPerFile` rolls its output into bounded files without
  *    an extra shuffle (the writer splits as it writes).
  */
object PartitionedWriter {

  def write(df: DataFrame, outDir: String, partitionCols: Seq[String],
            maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.repartition(partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(outDir)
  }
}
