package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.text.TextAnalysis

/** Sequence packing for LLM training pipelines (beyond-parity, SURVEY.md
  * §8): greedily packs documents into fixed token-budget context windows
  * so a training run wastes no padding — the standard "sample packing"
  * preprocessing step.
  *
  * The greedy fold is inherently sequential, so the SHARD is the unit of
  * parallelism: rows are hash-partitioned by `shardCol`, sorted by id
  * within the partition (the classic secondary-sort pattern), and packed
  * in a single streaming pass per shard. At 100 TB the knob that matters
  * is shard cardinality/balance — use a bounded, well-distributed shard
  * key (source, date bucket, or `pmod(hash(id), nShards)`); one huge
  * shard = one straggler task, which this operator cannot split further
  * without changing the packing it produces.
  *
  * Determinism under task retries: the partitioner is a pure hash of the
  * shard key and the per-partition order is a total order on
  * (shard, id), so a recomputed partition packs identically — no
  * `monotonically_increasing_id`-style retry hazard.
  */
object SeqPacking {

  private[graft] case class DocTok(shard: String, id: Long, ntok: Int)

  /** One packed document: its shard, the (clamped) token count, and the
    * 0-based window index within the shard it was packed into.
    */
  case class PackedDoc(shard: String, doc_id: Long, n_tokens: Int, window_idx: Long)

  /** Pack `docs` into windows of at most `budget` tokens per shard,
    * visiting documents in ascending id order. Documents longer than the
    * budget are clamped to it (they occupy a window alone); empty docs
    * count 0 tokens and ride along in the current window.
    */
  def pack(docs: DataFrame, idCol: String, textCol: String,
           shardCol: String, budget: Int): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    val toks = docs.select(
      col(shardCol).cast("string").as("shard"),
      col(idCol).cast("long").as("id"),
      // null text -> 0 tokens (the typed encoder's Int field must never
      // see a SQL NULL)
      coalesce(least(TextAnalysis.tokenCount(col(textCol)), lit(budget)), lit(0))
        .cast("int").as("ntok"))
      .as[DocTok]
    toks.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions { it =>
        // One partition holds whole shards (hash-partitioned on shard);
        // reset the running state at each shard boundary.
        var cur: String = null
        var acc = 0L
        var win = 0L
        it.map { d =>
          if (d.shard != cur) { cur = d.shard; acc = 0L; win = 0L }
          if (acc + d.ntok > budget) { win += 1; acc = d.ntok.toLong }
          else acc += d.ntok
          PackedDoc(d.shard, d.id, d.ntok, win)
        }
      }
  }

  /** Per-window fill statistics over a [[pack]] result — the packing
    * efficiency surface (padding waste = 1 - fill_ratio).
    */
  def packStats(packed: DataFrame, budget: Int): DataFrame =
    packed.groupBy(col("shard"), col("window_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("window_tokens"))
      .withColumn("fill_ratio",
        round(col("window_tokens").cast("double") / budget, 6))
}
