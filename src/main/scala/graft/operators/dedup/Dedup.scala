package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (beyond-parity,
  * SURVEY.md §8). All candidate generation is bucketed — never an
  * unbucketed O(n²) cross join — so each operator survives a 100×
  * scale-up: the only shuffles are hash-partitioned on content keys.
  */
object Dedup {

  /** Normalized text used by every textual dedup: lowercase, collapse
    * whitespace, then trim (collapse-first so trailing tabs/newlines
    * reduce to a trimmable space — `trim` alone only strips ' ').
    * Kept trivially SQL-expressible so DuckDB oracles reproduce it.
    */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Exact dedup: hash-groupBy on normalized content, keep the smallest
    * id per group. One shuffle on md5(text); map-side partial min keeps
    * the shuffle narrow. At 100 TB, group on the 128-bit digest (not the
    * text) so shuffle rows are fixed-width.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.Partitioning.ensureMinParallelism(docs)
      .select(col(idCol), md5(normText(col(textCol))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of the normalized text, distinct per doc.
    * Guard the short-text case explicitly: `sequence(1, 0)` would count
    * DOWN and hit index 0.
    */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(normText(textCol), " ")
    when(size(words) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(
          sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*)
        )
      )
    )
  }

  /** N-gram Jaccard near-dup pairs. Candidates = docs sharing at least
    * one shingle (explode + self-join on the shingle hash = one
    * hash-partitioned shuffle); Jaccard from per-pair common-shingle
    * counts vs per-doc totals. `maxShingleDf` drops stop-shingles that
    * occur in too many docs — the classic skew guard: without it a
    * shingle shared by 1% of a 100 TB corpus creates a quadratic bucket.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxShingleDf: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shingles are computed exactly ONCE (explode's child) — referencing
    // the array from several projections would re-inline the whole
    // shingling expression per reference (projection collapse); the
    // per-doc size and per-shingle df both come from windows over the
    // exploded rows instead. Strings are dropped for an 8-byte hash
    // before any shuffle (collision odds at 64 bits are negligible next
    // to the sketch's own error).
    val exploded = graft.operators.Partitioning
      .ensureMinParallelism(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), explode(shingles(col(textCol), n)).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val annotated = exploded
      .withColumn("n_shingles", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxShingleDf)
      .drop("df")
    val a = annotated.select(col("doc_id").as("id_a"), col("n_shingles").as("na"), col("sh"))
    val b = annotated.select(col("doc_id").as("id_b"), col("n_shingles").as("nb"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected-component style cluster assignment from a pair list:
    * each doc maps to the min id it is (transitively, one hop) paired
    * with. Full transitive closure needs iterative joins (GraphX-style
    * label propagation); one hop covers the dominant near-dup shape
    * (clusters of 2-3) and is a single shuffle.
    */
  def keepList(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = pairs.select(col("id_b").as("drop_id")).distinct()
    docs.join(drop, col(idCol) === col("drop_id"), "left_anti")
  }
}
