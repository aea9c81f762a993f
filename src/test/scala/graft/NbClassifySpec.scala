package graft

import org.apache.spark.sql.functions._
import graft.operators.text.TextAnalysis

/** Multinomial NB train-and-score (TextAnalysis.nbClassify). The
  * documents fixture's text is label-independent filler (accuracy there
  * sits near chance and only the hash-oracle matters); learning is
  * proven here on vocab-separable classes.
  */
class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Int, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("separable vocab: every held-out doc classified correctly") {
    // ids 1..40 train (id%5!=0 -> 32 train docs), id%5==0 held out
    val rows = (1 to 40).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma alpha", "even")
      else (i, "omega psi chi omega", "odd")
    }
    val out = TextAnalysis.nbClassify(docs(rows: _*), "doc_id", "text", "lang")
      .collect().map(r => (r.getInt(0), r.getString(2), r.getInt(4))).toList
    assert(out.nonEmpty && out.forall(_._3 == 1))
    assert(out.map(_._1).forall(_ % 5 == 0))
  }

  test("mixed-evidence doc goes to the class with more matching mass") {
    val rows = (1 to 40).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma delta", "even")
      else (i, "omega psi chi rho", "odd")
    } :+ (45, "alpha beta omega", "even") // 2 'even' words vs 1 'odd' word
    val out = TextAnalysis.nbClassify(docs(rows: _*), "doc_id", "text", "lang")
    val pred45 = out.filter(col("doc_id") === 45).select("pred").as[String].head()
    assert(pred45 == "even")
  }

  test("all-unseen doc with symmetric classes: tie breaks on class name") {
    val rows = Seq(
      (1, "xx yy", "bb"), (2, "pp qq", "aa"),
      (3, "xx yy", "bb"), (4, "pp qq", "aa"),
      (5, "zz ww", "bb")) // held out; zz/ww unseen -> equal scores
    val out = TextAnalysis.nbClassify(docs(rows: _*), "doc_id", "text", "lang")
      .select("pred").as[String].collect().toList
    assert(out == List("aa"))
  }

  test("prior matters for unseen-vocab docs: majority class wins") {
    val rows = Seq(
      (1, "xx", "big"), (2, "xx", "big"), (3, "xx", "big"),
      (4, "yy", "small"),
      (10, "zz", "small")) // held out, unseen word
    // N_big=3, N_small=1, V=2: lnden differs; prior ln3-ln4 vs ln1-ln4.
    // score_big = (ln3-ln4) - ln(3+2); score_small = (ln1-ln4) - ln(1+2)
    // = -0.288-1.609 = -1.897 vs -1.386-1.099 = -2.485 -> big
    val out = TextAnalysis.nbClassify(docs(rows: _*), "doc_id", "text", "lang")
    assert(out.select("pred").as[String].head() == "big")
    assert(out.select("correct").as[Int].head() == 0)
  }

  test("token-less and null docs are absent from the output") {
    val rows = Seq(
      (1, "xx yy", "a"), (2, "pp qq", "b"), (3, "xx", "a"), (4, "pp", "b"),
      (5, "   ", "a"), (10, "xx pp", "b"))
    val withNull = docs(rows: _*)
      .union(Seq((15, null.asInstanceOf[String], "a")).toDF("doc_id", "text", "lang"))
    val out = TextAnalysis.nbClassify(withNull, "doc_id", "text", "lang")
      .select("doc_id").as[Int].collect().toSet
    assert(out == Set(10))
  }

  test("stored model: parquet round-trip scoring == in-plan classify") {
    val d = Tables.load(spark, sf, "documents")
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val held = d.filter(col("doc_id") % 5 === 0)
    val (model, consts) = TextAnalysis.trainNb(train, "text", "lang")
    val dir = graft.TempDirs.scratch("graft-nbmodel")
    model.write.mode("overwrite").parquet(s"$dir/model")
    consts.write.mode("overwrite").parquet(s"$dir/consts")
    val viaDisk = TextAnalysis.nbScoreAgainstModel(
        spark.read.parquet(s"$dir/model"), spark.read.parquet(s"$dir/consts"),
        held, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val direct = TextAnalysis.nbClassify(d, "doc_id", "text", "lang")
      .select(col("doc_id"), col("pred"), col("score_micros"))
      .orderBy("doc_id").collect().toSeq
    assert(viaDisk == direct)
  }

  test("streaming scoring via foreachBatch == batch scoring") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (1 to 40).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma alpha", "even")
      else (i, "omega psi chi omega", "odd")
    }
    val train = rows.toDF("doc_id", "text", "lang")
    val (model, consts) = TextAnalysis.trainNb(train, "text", "lang")
    val m = model.cache(); val c = consts.cache()
    val got = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val input = MemoryStream[(Int, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= TextAnalysis.nbScoreAgainstModel(m, c, batch, "doc_id", "text")
            .select("doc_id", "pred").as[(Int, String)].collect()
        }
        ()
      }.start()
    try {
      input.addData((100, "alpha beta"), (101, "omega chi"))
      q.processAllAvailable()
      input.addData((102, "beta gamma alpha"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.sortBy(_._1).toList ==
      List(100 -> "even", 101 -> "odd", 102 -> "even"))
  }

  test("deterministic across runs on the fixture") {
    val d = Tables.load(spark, sf, "documents")
    val a = TextAnalysis.nbClassify(d, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.nbClassify(d, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == 100) // sf0.001: 500 docs, 1/5 held out
  }
}
