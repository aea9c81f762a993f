package graft

import org.apache.spark.sql.functions._
import graft.operators.sim.HybridSearch

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: integer contributions match 10^6 div (60+rank) by hand") {
    val text = Seq((1L, 100L, 1), (1L, 101L, 2)).toDF("query_id", "corpus_id", "rank")
    val vec = Seq((1L, 100L, 2), (1L, 102L, 1)).toDF("query_id", "corpus_id", "rank")
    val got = HybridSearch.rrfFuse(text, vec, k = 10)
      .select("corpus_id", "rrf_micros", "r_text", "r_vec")
      .as[(Long, Long, Long, Long)].collect().toSet
    val both = 1000000L / 61 + 1000000L / 62  // item 100: text r1 + vec r2
    assert(got == Set(
      (100L, both, 1L, 2L),
      (101L, 1000000L / 62, 2L, 0L),   // text-only, sentinel vec rank 0
      (102L, 1000000L / 61, 0L, 1L)))  // vec-only, sentinel text rank 0
  }

  test("an item found by both modalities outranks single-modality items") {
    val text = Seq((1L, 100L, 3), (1L, 101L, 1)).toDF("query_id", "corpus_id", "rank")
    val vec = Seq((1L, 100L, 3), (1L, 102L, 1)).toDF("query_id", "corpus_id", "rank")
    val first = HybridSearch.rrfFuse(text, vec, k = 1)
      .select("corpus_id").as[Long].head()
    assert(first == 100L) // 2/(63) beats 1/(61) in micros: 31746 > 16393
  }

  test("fused rank tie-break is (rrf desc, corpus_id asc) and k cuts") {
    val text = Seq((1L, 5L, 1), (1L, 3L, 1)).toDF("query_id", "corpus_id", "rank")
    // both can't be rank 1 for one query in reality, but the fusion
    // must still order deterministically on equal scores
    val got = HybridSearch.rrfFuse(text, text.limit(0), k = 1)
      .select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("hybridTopK end-to-end on fixtures: self excluded, pools attributed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = HybridSearch.hybridTopK(docs, emb, 0L until 5L,
      "doc_id", "text", "vec_id", "embedding", k = 10, pool = 20).cache()
    assert(got.filter(col("query_id") === col("corpus_id")).count() == 0)
    assert(got.select("query_id").distinct().count() == 5)
    // every fused row came from at least one pool
    assert(got.filter(col("r_text") === 0 && col("r_vec") === 0).count() == 0)
    // both modalities contribute somewhere across the result
    assert(got.filter(col("r_text") > 0).count() > 0)
    assert(got.filter(col("r_vec") > 0).count() > 0)
    got.unpersist()
  }
}
