package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.dedup.Dedup

/** Eval-set contamination check for training pipelines (beyond-parity,
  * SURVEY.md §8): which training documents share enough word n-grams
  * with an eval/benchmark document that the benchmark is compromised.
  * The metric is asymmetric — `common / |eval shingles|` — because the
  * question is "how much of the EVAL doc leaks", not mutual Jaccard.
  *
  * Same scale shape as [[Dedup.ngramJaccardPairs]]: both corpora explode
  * to (side, doc_id, shingle-hash) rows, meet in hash-partitioned
  * shingle buckets (one shuffle, 8-byte keys), and only cross-side
  * pairs within a bucket are generated. `maxShingleDf` caps bucket
  * membership with a bounded-buffer collect (hot-key OOM guard), so a
  * stop-shingle shared by millions of training docs never materializes
  * a quadratic bucket — at 100 TB the train side dwarfs eval, and every
  * candidate pair still costs only one counted row per shared shingle.
  */
object Contamination {

  /** Pairs (eval_id, train_id) sharing shingles: `common` distinct
    * n-grams, `overlap_frac` = common / eval's distinct n-gram count,
    * kept when the (6-dp rounded) fraction reaches `minOverlap`.
    */
  def evalOverlap(train: DataFrame, eval: DataFrame,
                  idCol: String, textCol: String,
                  n: Int = 3, minOverlap: Double = 0.2,
                  maxShingleDf: Int = 1000): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      Partitioning.ensureMinParallelism(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .select(col("doc_id"), Dedup.shingles(col("text"), n).as("sh_arr"))
        .select(lit(tag).as("side"), col("doc_id"),
          size(col("sh_arr")).as("n_sh"), explode(col("sh_arr")).as("shingle"))
        .select(col("side"), col("doc_id"), col("n_sh"),
          xxhash64(col("shingle")).as("sh"))

    val buckets = side(train, 0).unionByName(side(eval, 1))
      .groupBy(col("sh"))
      .agg(graft.functions.BoundedCollectList.column(
        struct(col("side"), col("doc_id"), col("n_sh")), maxShingleDf).as("members"))
      .filter(size(col("members")).between(2, maxShingleDf))

    buckets
      .select(explode(col("members")).as("e"), col("members"))
      .filter(col("e.side") === 1)
      .select(col("e"), explode(col("members")).as("t"))
      .filter(col("t.side") === 0)
      .groupBy(col("e.doc_id").as("eval_id"), col("t.doc_id").as("train_id"),
        col("e.n_sh").as("n_eval"))
      .agg(count(lit(1)).as("common"))
      .withColumn("overlap_frac",
        round(col("common").cast("double") / col("n_eval").cast("double"), 6))
      .filter(col("overlap_frac") >= minOverlap)
      .select(col("eval_id"), col("train_id"), col("common"), col("overlap_frac"))
  }
}
