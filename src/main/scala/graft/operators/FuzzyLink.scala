package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution) over short strings
  * — the classic blocking-then-verify shape (Fellegi & Sunter lineage;
  * same candidate discipline as the dedup family): values canonicalize
  * to DISTINCT strings first (a hot value repeated millions of times
  * joins once, keeping the pair graph entity-sized, not row-sized),
  * candidates form only within a user-supplied blocking key, and the
  * verify step is the codegen'd `levenshtein` built-in. Blocks are
  * capped with [[graft.functions.BoundedCollectList]] exactly like the
  * LSH/shingle candidate generators — a degenerate block (every name
  * sharing one token at 100 TB) bounds its buffer and drops out
  * instead of going quadratic.
  *
  * Scale shape: one distinct-aggregate (map-side combine collapses
  * duplicate values before the shuffle), one capped block aggregate
  * carrying bare strings, within-block pair explosion, per-pair edit
  * distance. No row ids ever enter the candidate stream — mapping
  * matched VALUES back to rows is an equi-join on the value, which
  * Catalyst plans as an ordinary shuffle/broadcast join.
  */
object FuzzyLink {

  /** Near-duplicate value pairs within one table's column: distinct
    * values, blocked by `block(value)`, kept when edit distance is in
    * `[1, maxDist]`. Output: (name_a, name_b, dist) with
    * `name_a < name_b`.
    */
  def selfPairs(df: DataFrame, nameCol: String, block: Column => Column,
                maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    df.filter(col(nameCol).isNotNull)
      .select(col(nameCol).as("name")).distinct()
      .select(col("name"), block(col("name")).as("blk"))
      .groupBy(col("blk"))
      .agg(graft.functions.BoundedCollectList.column(col("name"), maxBlock).as("members"))
      .filter(size(col("members")).between(2, maxBlock))
      .select(explode(col("members")).as("name_a"), col("members"))
      .select(col("name_a"), explode(col("members")).as("name_b"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Cross-table linkage: each distinct dirty value matches its
    * best-scoring canonical value within the shared block (lowest edit
    * distance, ties to the lexicographically first canonical), kept
    * when the distance is ≤ `maxDist`. Exact matches (distance 0)
    * link too — the common "mostly clean feed" case. Output:
    * (dirty, canonical, dist).
    */
  def linkAgainst(dirty: DataFrame, canonical: DataFrame,
                  dirtyCol: String, canonCol: String, block: Column => Column,
                  maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    import org.apache.spark.sql.expressions.Window
    val d = dirty.filter(col(dirtyCol).isNotNull)
      .select(col(dirtyCol).as("dirty")).distinct()
      .select(col("dirty"), block(col("dirty")).as("blk"))
    val c = canonical.filter(col(canonCol).isNotNull)
      .select(col(canonCol).as("canonical")).distinct()
      .select(col("canonical"), block(col("canonical")).as("blk"))
      .groupBy(col("blk"))
      .agg(graft.functions.BoundedCollectList.column(col("canonical"), maxBlock).as("cands"))
      .filter(size(col("cands")) <= maxBlock)
    d.join(c.hint("shuffle_hash"), Seq("blk"))
      .select(col("dirty"), explode(col("cands")).as("canonical"))
      .withColumn("dist", levenshtein(col("dirty"), col("canonical")).cast("long"))
      .filter(col("dist") <= maxDist)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("dirty")).orderBy(col("dist"), col("canonical"))))
      .filter(col("rk") === 1)
      .select(col("dirty"), col("canonical"), col("dist"))
  }
}
