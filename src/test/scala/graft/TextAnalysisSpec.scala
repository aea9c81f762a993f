package graft

import org.apache.spark.sql.functions._
import graft.operators.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("t").select(c.as("r")).as[T].head()

  test("tokenCount: whitespace tokens, empty text is 0") {
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "a  b\tc\nd") == 4)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "   ") == 0)
  }

  test("duplicateNgramFraction: repetition signal, short docs are 0") {
    val d1 = TextAnalysis.duplicateNgramFraction(col("t"), 1)
    val d2 = TextAnalysis.duplicateNgramFraction(col("t"), 2)
    assert(math.abs(one[Double](d1, "a b a b a") - 0.6) < 1e-12)  // 2 distinct / 5 words
    assert(math.abs(one[Double](d2, "a b a b a") - 0.5) < 1e-12)  // 2 distinct / 4 bigrams
    assert(one[Double](d2, "x y z") == 0.0)                        // all distinct
    assert(one[Double](d1, "unique words only here") == 0.0)
    assert(one[Double](d2, "single") == 0.0)                       // too short: no bigrams
    assert(one[Double](d1, "") == 0.0)
  }

  test("redactPii: urls, emails, phones; email inside a url redacts as URL") {
    val r = TextAnalysis.redactPii(col("t"))
    assert(one[String](r, "mail me at bob.smith+x@corp.example.io today") ==
      "mail me at <EMAIL> today")
    assert(one[String](r, "see https://a.example/p?q=1&r=2 now") == "see <URL> now")
    assert(one[String](r, "call 555-0134 x2") == "call <PHONE> x2")
    assert(one[String](r, "ref https://x.test/u=admin@inner.example path") ==
      "ref <URL> path")
    assert(one[String](r, "clean text stays clean") == "clean text stays clean")
  }

  test("subwordCount: BPE-ish pre-tokenizer pieces") {
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "hello, world42!") == 5)
    // hello , world 42 !
  }

  test("langId picks the dominant stopword profile") {
    assert(one[String](TextAnalysis.langId(col("t")), "the cat and the dog is in the house") == "en")
    assert(one[String](TextAnalysis.langId(col("t")), "der hund und die katze ist nicht da") == "de")
    assert(one[String](TextAnalysis.langId(col("t")), "le chat est dans la maison et il dort") == "fr")
    assert(one[String](TextAnalysis.langId(col("t")), "el perro y la casa es una maravilla") == "es")
    assert(one[String](TextAnalysis.langId(col("t")), "xyzzy qwerty asdf") == "und")
  }

  test("quality score is bounded [0,1] and favors clean prose") {
    val clean = one[Double](TextAnalysis.qualityScore(col("t")),
      "a perfectly reasonable sentence with normal words repeated " * 10)
    val junk = one[Double](TextAnalysis.qualityScore(col("t")), "!!! ??? ... ;;; :::")
    assert(clean > junk)
    assert(clean <= 1.0 && junk >= 0.0)
  }

  test("fingerprint ignores whitespace/case; rollingHash is order-sensitive") {
    val fp1 = one[String](TextAnalysis.fingerprint(col("t")), "Hello   World")
    val fp2 = one[String](TextAnalysis.fingerprint(col("t")), "hello world")
    assert(fp1 == fp2)
    val rh1 = one[Long](TextAnalysis.rollingHash(col("t")), "a b c")
    val rh2 = one[Long](TextAnalysis.rollingHash(col("t")), "c b a")
    val rh1b = one[Long](TextAnalysis.rollingHash(col("t")), "a b c")
    assert(rh1 == rh1b && rh1 != rh2)
  }

  test("profile runs over the fixture corpus with sane ranges") {
    val p = TextAnalysis.profile(Tables.load(spark, sf, "documents"), "doc_id", "text")
    val rows = p.select("n_tokens", "punct_ratio", "quality").as[(Int, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, pr, q) => n > 0 && pr >= 0 && pr <= 1 && q >= 0 && q <= 1 })
  }

  test("chunkWindows: overlap across boundaries, short tail, no empty trailing window") {
    val docs = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, "doc_id", "text", width = 5, stride = 3)
      .orderBy("chunk_idx").as[(Long, Int, String, Int)].collect().toSeq
    // m=12, w=5, s=3 -> 1 + ceil(7/3) = 4 windows at offsets 0,3,6,9
    assert(out.map(_._3) === Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10 w11", "w10 w11 w12"))
    assert(out.map(_._4) === Seq(5, 5, 5, 3))
    // exact-fit edge: m == width -> exactly one window
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.chunkWindows(one, "doc_id", "text", 3, 2).count() == 1)
  }

  test("topNgrams: doc frequency of distinct-per-doc grams, deterministic cut") {
    val docs = Seq(
      (1L, "a b c a b c"), // distinct grams only: 'a b c' counts once here
      (2L, "a b c d"),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(docs, "text", n = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    // 'a b c' in docs 1+2; ties at freq 1 resolve lexicographically
    assert(top === Seq(("a b c", 2L), ("b c a", 1L)))
    val again = TextAnalysis.topNgrams(docs, "text", n = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(top === again)
  }

  test("tfIdfTopK: hand-computed scores, window df, rare terms outrank common") {
    val docs = Seq(
      (1L, Option("Apple banana  apple")), // normalization folds case/space
      (2L, Option("banana cherry")),
      (3L, Option("cherry banana banana")),
      (4L, Option.empty[String])           // null doc: excluded, not in N
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("score_micros").desc, col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // N=3; idf micros: ln(3/1)=1098612, ln(3/2)=405465, ln(3/3)=0
    assert(out.toSeq === Seq(
      (1L, "apple", 2L, 1L, 2197224L),
      (1L, "banana", 1L, 3L, 0L),
      (2L, "cherry", 1L, 2L, 405465L),
      (2L, "banana", 1L, 3L, 0L),
      (3L, "cherry", 1L, 2L, 405465L),
      (3L, "banana", 2L, 3L, 0L)))
  }

  test("lmCrossEntropy: hand-computed Laplace bigram scores, unseen history backs off to 1/V") {
    val ref = Seq((10L, "a b"), (11L, "a b"), (12L, "a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, Option("a b")),               // in-domain bigram
      (2L, Option("x y")),               // fully unseen: p = 1/V
      (3L, Option("a b a b")),           // mixed: 2×(a b) + 1×(b a)
      (4L, Option("solo")),              // one token: no bigrams, absent
      (5L, Option.empty[String])         // null: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(docs, ref, "doc_id", "text")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // V=3 (a,b,c); hist: a→3; big: (a b)→2, (a c)→1
    // (a b): ln((3+3)/(2+1)) = ln 2 → 693147
    // unseen w1 (x, b): ln((0+3)/(0+1)) = ln 3 → 1098612
    assert(out.toSeq === Seq(
      (1L, 1L, 693147L, 693147L),
      (2L, 1L, 1098612L, 1098612L),
      (3L, 3L, 2L * 693147L + 1098612L, (2L * 693147L + 1098612L) / 3L)))
  }

  test("bpePairStats: frequency-weighted adjacent char pairs over the vocab") {
    val docs = Seq(
      (1L, Option("low low lower")),
      (2L, Option("low newest")),
      (3L, Option("a")),                 // single char: no pairs
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, "text", k = 100)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "low"×3, "lower"×1, "newest"×1: lo = 3+1=4 sites? no — vocab sites:
    // lo appears in {low, lower} = 2 sites; total = 3·1 + 1·1 = 4
    assert(out("lo") == ((2L, 4L)))
    assert(out("ow") == ((2L, 4L)))
    assert(out("we") == ((2L, 2L)))      // lower, newest
    assert(out("es") == ((1L, 1L)))      // newest only
    assert(!out.contains("a"))           // 1-char word contributes nothing
    // argmax pair is the first BPE merge: lo/ow tie at 4, lo wins lexicographically
    val top = TextAnalysis.bpePairStats(docs, "text", k = 1)
      .collect().map(_.getString(0)).head
    assert(top == "lo")
  }

  test("zipfSlope: steeper for zipf-ish counts than uniform; degenerate groups null") {
    import spark.implicits._
    // zipf-ish: token k appears ~60/k times; uniform: every token 5 times
    val zipfDocs = (1 to 12).flatMap(k => Seq.fill(60 / k)(("z", s"tok$k")))
    val uniDocs = (1 to 12).flatMap(k => Seq.fill(5)(("u", s"tok$k")))
    val one = Seq(("one", "solo"))
    val d = (zipfDocs ++ uniDocs ++ one).toDF("source", "text")
    val out = TextAnalysis.zipfSlope(d, "source", "text", topK = 12)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out("one").isEmpty, "single-token group has no slope")
    assert(out("u").contains(0L), "uniform counts fit a flat line")
    assert(out("z").exists(_ < -800000L),
      s"zipf-ish counts must slope near -1: ${out("z")}")
  }

  test("vocabCoverage: exact OOV mass against a planted vocab cut") {
    import spark.implicits._
    // corpus top-2 = {the, cat}; src_a has 1 OOV occurrence of 5, src_b 3 of 4
    val d = Seq(
      ("a", "the cat the cat dog"), ("b", "the rare words here"),
      ("b", null.asInstanceOf[String])).toDF("source", "text")
    val out = TextAnalysis.vocabCoverage(d, "source", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == ((5L, 4L, 1L, 200000L)))
    assert(out("b") == ((4L, 1L, 3L, 750000L)))
  }
}
