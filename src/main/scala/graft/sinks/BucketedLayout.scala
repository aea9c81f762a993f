package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for co-located joins (SURVEY.md §4, the 100 TB
  * design lever the parquet-dir fixtures can't show): write both sides
  * of a recurring join `bucketBy` the join key — every later join of
  * the two tables then runs with ZERO exchanges, because the on-disk
  * layout IS the hash partitioning. The shuffle is paid once at write
  * time instead of on every query; at 100 TB that converts the daily
  * fact-to-fact join from the cluster's largest exchange into a local
  * per-bucket merge ([[graft.BucketedJoinSpec]] pins the no-Exchange
  * plan).
  *
  * Sizing: pick `nBuckets` so each bucket lands at 100–500 MB of
  * parquet (a 10 TB table → ~40k buckets is too fine; 2–4× the read
  * cluster's total cores is the usual sweet spot). Both sides MUST use
  * the same bucket count and key, or Spark falls back to shuffling the
  * mismatched side.
  *
  * `sortBy` within buckets additionally removes the join's Sort nodes
  * when each bucket is a single file — keep writes single-task-per-
  * bucket (repartition by the bucket key first) if that matters.
  */
object BucketedLayout {

  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val base = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    val sorted =
      if (sortCols.isEmpty) base.sortBy(bucketCol)
      else base.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(table)
  }
}
