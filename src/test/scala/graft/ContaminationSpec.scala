package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("verbatim leak scores overlap 1.0; disjoint docs are silent") {
    val train = corpus(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different content with no shared trigrams at all"))
    val eval = corpus(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "zeta eta theta iota kappa lambda"))
    val got = Contamination.evalOverlap(train, eval, "doc_id", "text", minOverlap = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((100L, 1L, 1.0)))
  }

  test("partial overlap: shared prefix fraction of EVAL shingles") {
    // eval doc: 6 words -> 4 trigrams; 3 of them appear in the train doc
    val train = corpus((1L, "alpha beta gamma delta epsilon unrelated tail words"))
    val eval = corpus((100L, "alpha beta gamma delta epsilon zzz"))
    val got = Contamination.evalOverlap(train, eval, "doc_id", "text", minOverlap = 0.1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 0.75)))
  }

  test("asymmetry: fraction is of the eval doc, not the train doc") {
    val longTrain = corpus((1L, ("alpha beta gamma " + (1 to 50).map(i => s"w$i").mkString(" "))))
    val eval = corpus((100L, "alpha beta gamma"))
    val got = Contamination.evalOverlap(longTrain, eval, "doc_id", "text", minOverlap = 0.1)
      .collect()
    assert(got.length == 1 && got.head.getDouble(3) == 1.0)
  }

  test("maxShingleDf drops saturated shingles") {
    // the same trigram in every train doc: with a cap below the bucket
    // size the candidate channel disappears
    val train = corpus((1 to 20).map(i => (i.toLong, "common leak phrase here")): _*)
    val eval = corpus((100L, "common leak phrase here"))
    val capped = Contamination.evalOverlap(train, eval, "doc_id", "text",
      minOverlap = 0.1, maxShingleDf = 10)
    assert(capped.isEmpty)
    val uncapped = Contamination.evalOverlap(train, eval, "doc_id", "text",
      minOverlap = 0.1, maxShingleDf = 100)
    assert(uncapped.count() == 20)
  }

  test("Bloom-prefiltered variant is bit-identical to evalOverlap on the fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val plain = key(Contamination.evalOverlap(train, eval, "doc_id", "text",
      n = 3, minOverlap = 0.1, maxShingleDf = 1000))
    val bloom = key(Contamination.evalOverlapBloom(train, eval, "doc_id", "text",
      n = 3, minOverlap = 0.1, maxShingleDf = 1000, expectedEvalShingles = 10000L))
    assert(plain.nonEmpty && bloom == plain)
    // the probe sits on the train side before the shuffle
    val plan = Contamination.evalOverlapBloom(train, eval, "doc_id", "text",
      expectedEvalShingles = 10000L).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
  }

  test("fixture run matches the rows-only contract: threshold respected") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Contamination.evalOverlap(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(10)) === 0),
      "doc_id", "text", minOverlap = 0.1)
    assert(got.filter(col("overlap_frac") < 0.1).isEmpty)
    assert(got.filter(col("overlap_frac") > 1.0).isEmpty)
  }
}
