package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines
  * (beyond-parity, SURVEY.md §8). Everything keys off a content hash of
  * the row's id, never `rand()`: the assignment is (a) reproducible
  * across runs and engines, (b) stable under Spark task retries (a
  * retried partition re-derives identical buckets — `rand()`/
  * `monotonically_increasing_id` do not), and (c) shuffle-free — each
  * operator is a codegen'd per-row projection/filter that composes with
  * any scan at full speed.
  *
  * The hash is the first 60 bits of md5 (exact in 64-bit arithmetic, and
  * ANSI-SQL-expressible so DuckDB oracles reproduce every bucket
  * bit-for-bit) rather than xxhash64. md5 costs more per row than
  * xxhash64, but both are memory-bandwidth-dominated next to a parquet
  * scan; swap [[hashBucket]]'s hash in one place if profile says
  * otherwise.
  */
object Sampling {

  val Buckets = 10000

  /** Deterministic bucket in [0, mod) from the md5 of the key. A null
    * key hashes like the empty string — without the coalesce, null rows
    * would null through every comparison and silently vanish from
    * samples (or all fall into a split's last bucket).
    */
  def hashBucket(key: Column, salt: String = "", mod: Int = Buckets): Column =
    pmod(conv(substring(md5(concat(coalesce(key.cast("string"), lit("")), lit(salt))), 1, 15), 16, 10)
      .cast("long"), lit(mod.toLong))

  /** Assign each row to a named split by cumulative weight over the hash
    * bucket — e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
    * Weights are normalized; boundaries are exact integer bucket
    * thresholds so the assignment is reproducible from the spec alone.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) && splits.map(_._2).sum > 0,
      s"splits need nonnegative weights with a positive sum: $splits")
    val total = splits.map(_._2).sum
    val thresholds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w / total * Buckets)
    }.tail
    val b = hashBucket(col(keyCol), salt)
    // last split takes every remaining bucket (rounding slack included)
    val expr = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, hi), els) =>
        when(b < hi, lit(name)).otherwise(els)
      }
    df.withColumn("split", expr)
  }

  /** Keep a deterministic `fraction` of rows, uniformly by key hash. */
  def sampleFraction(df: DataFrame, keyCol: String, fraction: Double,
                     salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(col(keyCol), salt) < math.round(fraction * Buckets))
  }

  /** Mixture sampling: per-stratum keep fractions (stratum = value of
    * `stratumCol`, e.g. the source corpus), so a heterogeneous corpus is
    * downsampled to a target mixture in one shuffle-free pass. Strata
    * absent from `fractions` are dropped — the map IS the mixture spec.
    */
  def sampleMixture(df: DataFrame, keyCol: String, stratumCol: String,
                    fractions: Map[String, Double], salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "empty mixture spec")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions out of [0,1]: $fractions")
    // deterministic when-chain (sorted keys) -> one codegen'd projection
    val thr = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(0L): Column) { case ((s0, f), els) =>
        when(col(stratumCol) === s0, lit(math.round(f * Buckets))).otherwise(els)
      }
    df.filter(hashBucket(col(keyCol), salt) < thr)
  }

  /** Deterministic global shuffle for final training order: total-order
    * sort by key hash (then key, for tie-stability). One range-partition
    * shuffle — exactly the sort you want right before the partitioned
    * training-set write, and the same order on every run.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, salt: String = ""): DataFrame =
    df.orderBy(hashBucket(col(keyCol), salt), col(keyCol))
}
