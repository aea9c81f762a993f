package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by CPU-heavy operators.
  *
  * A small parquet file (≪ `files.maxPartitionBytes`) scans as ONE
  * partition, so a compute-bound per-row stage (shingling, hashing,
  * simhash folds) runs on one core no matter how many the cluster has —
  * measured 15s single-task vs sub-second parallel on the documents
  * fixture. At real scale inputs are already wide; the round-robin
  * repartition only fires when the scan is narrower than the cluster.
  */
object Partitioning {
  def ensureMinParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
