package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling for training-data pipelines (SURVEY.md
  * §8 quality surface): per-column row/null/distinct counts and
  * min/max, computed in ONE scan.
  *
  * All per-column aggregates land in a single `agg` (Spark plans the
  * multi-distinct via Expand — one pass over the data, map-side
  * partials for the non-distinct parts), then the single wide row is
  * unpivoted with `stack` into one row per column. The alternative —
  * one query per column — scans the table |cols| times.
  */
object TableStats {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")
      )
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackExpr = cols.map { c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.size}, $stackExpr) as (column_name, n_nonnull, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
