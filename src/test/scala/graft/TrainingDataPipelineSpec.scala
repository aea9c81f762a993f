package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainingDataPipeline

class TrainingDataPipelineSpec extends SparkSpec {

  test("curate: gates quality/language, drops exact and near dups, keeps representatives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and it is fine. " * 5), // en, keeper
      (2L, "The quick brown fox jumps over the lazy dog and it is fine. " * 5), // exact dup of 1
      (3L, "The quick brown fox jumps over the lazy dog and it is good. " * 5), // near dup of 1
      (4L, "zzz qqq xxx"),                                                      // und -> gated out
      (5L, "Der Hund ist nicht zu Hause und das ist auch gut so heute. " * 5)   // de, keeper
    ).toDF("doc_id", "text")
    val out = TrainingDataPipeline.curate(docs, "doc_id", "text",
        minQuality = 0.5, jaccardThreshold = 0.5)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 5L), out.toString)
    assert(out(1L) == "en" && out(5L) == "de")
  }
}
