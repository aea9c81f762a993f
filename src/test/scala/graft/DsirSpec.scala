package graft

import org.apache.spark.sql.functions._
import graft.operators.text.TextAnalysis

/** DSIR importance weights (TextAnalysis.dsirWeights): docs matching
  * the target domain's vocabulary must outrank off-domain docs, with
  * the exact-integer weight contract.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def weights(target: Seq[String], rows: (Int, String)*) = {
    val docs = rows.toDF("doc_id", "text")
    val tgt = docs.filter(col("doc_id").isin(target.map(_.toInt): _*))
    TextAnalysis.dsirWeights(docs, tgt, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
  }

  test("on-domain docs outrank off-domain docs") {
    val w = weights(Seq("1", "2"),
      1 -> "alpha beta gamma alpha", 2 -> "beta gamma alpha beta",
      3 -> "alpha beta gamma beta",  // on-domain, not in target
      4 -> "omega psi chi rho")      // off-domain
    assert(w(3) > w(4))
    assert(w(1) > w(4) && w(2) > w(4))
  }

  test("weight grows with target-vocab overlap at equal length") {
    val w = weights(Seq("1"),
      1 -> "alpha beta alpha beta",
      5 -> "alpha beta omega psi",   // half overlap
      6 -> "alpha omega psi chi",    // quarter overlap
      7 -> "omega psi chi rho")      // none
    assert(w(5) > w(6) && w(6) > w(7))
  }

  test("token-less and null docs are absent; all corpus words covered") {
    val docs = Seq((1, "alpha beta"), (2, "   "), (4, "omega alpha"))
      .toDF("doc_id", "text")
      .union(Seq((3, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = TextAnalysis.dsirWeights(docs,
        docs.filter(col("doc_id") === 1), "doc_id", "text")
      .select("doc_id").as[Int].collect().toSet
    assert(out == Set(1, 4))
  }

  test("stored model: parquet round-trip weighting == in-plan weights") {
    val d = Tables.load(spark, sf, "documents")
    val tgt = d.filter(col("source") === "src0")
    val (model, base) = TextAnalysis.trainDsir(d, tgt, "text")
    val dir = graft.TempDirs.scratch("graft-dsir")
    model.write.mode("overwrite").parquet(s"$dir/model")
    base.write.mode("overwrite").parquet(s"$dir/base")
    val viaDisk = TextAnalysis.dsirScoreAgainstModel(
        spark.read.parquet(s"$dir/model"), spark.read.parquet(s"$dir/base"),
        d, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val direct = TextAnalysis.dsirWeights(d, tgt, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(viaDisk == direct)
  }

  test("deterministic on the fixture; target slice ranks above corpus mean") {
    val d = Tables.load(spark, sf, "documents")
    val tgt = d.filter(col("source") === "src0")
    val a = TextAnalysis.dsirWeights(d, tgt, "doc_id", "text")
    val b = TextAnalysis.dsirWeights(d, tgt, "doc_id", "text")
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
    // per-token importance of the target slice itself must exceed the
    // corpus average (the selection signal exists even on filler text)
    val scored = a.join(d.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("per_tok", col("weight_micros").cast("double") / col("t_tokens"))
    val tgtMean = scored.filter(col("source") === "src0").agg(avg("per_tok")).head().getDouble(0)
    val allMean = scored.agg(avg("per_tok")).head().getDouble(0)
    assert(tgtMean > allMean, s"target $tgtMean !> corpus $allMean")
  }
}
