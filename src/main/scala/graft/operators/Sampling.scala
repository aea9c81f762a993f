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

  /** The raw 60-bit md5 hash in [0, 2^60) — the uniform value every
    * sampler here derives from. Null keys hash like the empty string.
    */
  def hash60(key: Column, salt: String = ""): Column =
    call_function("graft_md5_60",
      concat(coalesce(key.cast("string"), lit("")), lit(salt)))

  /** Deterministic bucket in [0, mod) from the md5 of the key. A null
    * key hashes like the empty string — without the coalesce, null rows
    * would null through every comparison and silently vanish from
    * samples (or all fall into a split's last bucket).
    */
  def hashBucket(key: Column, salt: String = "", mod: Int = Buckets): Column =
    pmod(hash60(key, salt), lit(mod.toLong))

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

  /** Temperature-flattened mixture — the multilingual-training
    * standard: source i is sampled with probability q_i ∝ share_i^α,
    * so α < 1 up-weights small sources (α = 0.5 is the common choice)
    * and α = 1 keeps natural proportions. Given a target row budget T,
    * each source keeps fraction min(1, T·q_i / n_i) of its docs via the
    * usual deterministic hash buckets.
    *
    * Cross-engine exactness by construction: per-source weights
    * quantize to INTEGER micro-units (floor(share^α · 1e6)) and the
    * normalizer is their integer sum — so there is no order-dependent
    * floating-point summation anywhere, and every remaining double op
    * (one divide, one multiply, one divide, one floor) is a single
    * correctly-rounded IEEE step on identical inputs. α = 0.5 runs
    * through `sqrt` (correctly rounded everywhere); other α use `pow`,
    * whose last-ulp behavior is libm-specific — fine for training,
    * excluded from the hash-oracle contract.
    *
    * Driver holds one (stratum → count) map — #sources scalars, same
    * metadata-only budget as chunk boundaries and IVF centroids.
    */
  def temperatureMixture(df: DataFrame, keyCol: String, stratumCol: String,
                         alpha: Double, targetRows: Long, salt: String = ""): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val counts = df.groupBy(col(stratumCol)).count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    val total = counts.values.sum.toDouble
    def weight(n: Long): Long = {
      val share = n / total
      val w = if (alpha == 0.5) math.sqrt(share) else math.pow(share, alpha)
      math.floor(w * 1e6).toLong
    }
    val micro = counts.map { case (s, n) => s -> weight(n) }
    val z = micro.values.sum
    val thresholds = counts.map { case (s, n) =>
      val q = micro(s).toDouble / z
      val f = math.min(1.0, targetRows.toDouble * q / n)
      s -> math.floor(f * Buckets).toLong
    }
    val thr = thresholds.toSeq.sortBy(_._1)
      .foldRight(lit(0L): Column) { case ((s0, t0), els) =>
        when(col(stratumCol) === s0, lit(t0)).otherwise(els)
      }
    df.filter(hashBucket(col(keyCol), salt) < thr)
  }

  /** Token-budget mixture — the trainer's actual mixing contract ("2B
    * tokens of web, 500M of code"), not per-doc fractions: per source,
    * keep the deterministically-first docs whose RUNNING token total
    * stays within the source's budget. Priority is the same salted md5
    * as the rest of this module, so the selection reproduces across
    * runs and engines; semantics are the prefix rule — keep a doc iff
    * the cumulative token count through it, in priority order, is
    * <= the budget (cumulative is monotone, so after the first overflow
    * nothing later qualifies). Sources absent from `budgets` are
    * dropped — the map IS the mixture spec.
    *
    * Scale shape: the naive form is one cumulative-sum window per
    * source — a single task swallowing a whole source at 100 TB. Here
    * the work is two-tier over the SAME ordering (the coarse bucket is
    * the top 12 bits of the priority hash, so buckets are contiguous
    * ranges of the priority order):
    *   1. per-(source, bucket) token totals (≤ |budgets| × 4096 rows)
    *      prefix-sum in a trivial window to locate each source's
    *      boundary bucket + remaining budget, broadcast back;
    *   2. the per-doc cumulative window runs partitioned by
    *      (source, bucket) — thousands of small partitions, never one
    *      task per source. Buckets below the boundary keep everything,
    *      above it drop everything; only the boundary bucket (~1/4096
    *      of a source) consults its window result.
    * The result is identical to the naive global window.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, sourceCol: String,
                        tokenCol: String, budgets: Map[String, Long],
                        salt: String = ""): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      s"budgets need nonnegative token counts: $budgets")
    import org.apache.spark.sql.expressions.Window
    val prio = hash60(col(keyCol), salt) // 60-bit priority
    val budgetOf = element_at(typedlit(budgets), col(sourceCol))
    val base = df.filter(budgetOf.isNotNull)
      .withColumn("_prio", prio)
      .withColumn("_bkt", shiftright(col("_prio"), 48)) // 4096 priority ranges
    // tier 1: boundary bucket + remaining budget per source
    val wSrc = Window.partitionBy(col("_src")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = base.groupBy(col(sourceCol).as("_src"), col("_bkt").as("_b"))
      .agg(sum(col(tokenCol).cast("long")).as("_t"))
      .withColumn("_before", coalesce(sum(col("_t")).over(wSrc), lit(0L)))
      .withColumn("_budget", element_at(typedlit(budgets), col("_src")))
      .filter(col("_before") + col("_t") > col("_budget"))
      .groupBy(col("_src"))
      .agg(min(col("_b")).as("_bound"),
        min_by(col("_budget") - col("_before"), col("_b")).as("_remaining"))
    // tier 2: exact prefix inside (source, bucket) partitions
    val wDoc = Window.partitionBy(col(sourceCol), col("_bkt"))
      .orderBy(col("_prio"), col(keyCol))
    base.join(broadcast(bounds), col(sourceCol) === col("_src"), "left")
      .withColumn("_cum", sum(col(tokenCol).cast("long")).over(wDoc))
      .filter(col("_bound").isNull || col("_bkt") < col("_bound") ||
        (col("_bkt") === col("_bound") && col("_cum") <= col("_remaining")))
      .drop("_prio", "_bkt", "_src", "_bound", "_remaining", "_cum")
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis
    * 2006) in the same deterministic-hash discipline: each row draws
    * `u = (h+1)/2^60` from its salted md5 and wins by the largest
    * `u^(1/w)` — equivalently the SMALLEST `-ln(u)/w`, which is what
    * is materialized, as an exact integer: `priority = round(-ln(u) ·
    * 10^9) div w` (one transcendental rounding per row, then pure
    * BIGINT division — an ANSI engine reproduces every priority
    * bit-for-bit). The n winners are the n smallest (priority, key)
    * pairs — heavier rows draw systematically smaller priorities, so
    * inclusion probability is proportional to weight, without
    * replacement, reproducible across runs/engines/retries.
    *
    * Scale shape: the priority is a codegen'd per-row projection and
    * the cut is `TakeOrdered` (per-partition top-n, then a merge of
    * n-row heaps) — no global sort, no single-task window, no shuffle
    * of the losers. Rows with null or non-positive weight are excluded
    * (a weight of 0 can never win; ln-division by 0 would poison the
    * ordering).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val negLnU = round(log(lit(1152921504606846976.0) /
      (hash60(col(keyCol), salt) + lit(1L)).cast("double")) * lit(1e9)).cast("long")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_nlu", negLnU)
      .withColumn("priority", expr(s"_nlu div CAST(`$weightCol` AS BIGINT)"))
      .drop("_nlu")
      .orderBy(col("priority"), col(keyCol))
      .limit(n)
  }
}
