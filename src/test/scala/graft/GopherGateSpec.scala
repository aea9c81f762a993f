package graft

import org.apache.spark.sql.Row
import graft.operators.text.TextAnalysis

/** Gopher rule gate (TextAnalysis.gopherGate / graft_gopher_stats).
  * The documents fixture has no newlines/bullets/symbols, so the
  * line- and symbol-rule paths are exercised here with crafted docs;
  * fixture-path agreement with the DuckDB oracle is Verify's job.
  */
class GopherGateSpec extends SparkSpec {
  import spark.implicits._

  private def gate(texts: (Int, String)*): Map[Int, Row] =
    TextAnalysis.gopherGate(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getInt(0) -> r).toMap

  private def f(r: Row, name: String): Long = {
    val i = r.fieldIndex(name)
    r.get(i) match { case l: Long => l; case n: Int => n.toLong }
  }

  // 60 plain words, mwl in range, stopwords present, all alpha
  private val good = (("the quick brown foxes jumped over the lazy dogs and " +
    "that was fine because they have been with friends near the river " +
    "where tall trees grow and birds sing songs every single morning ") * 2)
    .trim

  test("a healthy English doc passes every rule") {
    val r = gate(1 -> good)(1)
    assert(f(r, "n_words") == 66)
    assert(f(r, "passes") == 1)
    Seq("r_words", "r_mwl", "r_sym", "r_bullet", "r_ellipsis", "r_alpha", "r_stop")
      .foreach(rule => assert(f(r, rule) == 1, rule))
  }

  test("word-count bounds: short docs fail r_words only") {
    val r = gate(1 -> "the cat and the dog have fun with that ball")(1)
    assert(f(r, "n_words") == 10)
    assert(f(r, "r_words") == 0)
    assert(f(r, "r_mwl") == 1 && f(r, "r_stop") == 1 && f(r, "passes") == 0)
  }

  test("mean word length: single-char words fail r_mwl, micros exact") {
    val r = gate(1 -> Seq.fill(60)("a").mkString(" "))(1)
    assert(f(r, "mwl_micros") == 1000000L) // exactly 1.0
    assert(f(r, "r_mwl") == 0)
  }

  test("symbol ratio: '#' and ellipsis chars count against words") {
    // 10 words, 2 symbols -> ratio 0.2 >= 0.1 fails; '....' is ONE match
    val r = gate(1 -> "alpha # beta gamma.... delta epsilon zeta eta theta iota")(1)
    assert(f(r, "sym_micros") == 200000L)
    assert(f(r, "r_sym") == 0)
    val ok = gate(2 -> "alpha # beta gamma delta epsilon zeta eta theta iota kappa lambda")(2)
    assert(f(ok, "r_sym") == 1) // 1 symbol / 11 words < 0.1
  }

  test("bullet lines: >=90% bulleted fails; below passes") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val r = gate(1 -> bullets)(1)
    assert(f(r, "bullet_micros") == 1000000L)
    assert(f(r, "r_bullet") == 0)
    val mixed = ((1 to 8).map(i => s"* point $i") ++ Seq("prose line", "  • indented")).mkString("\n")
    val m = gate(2 -> mixed)(2)
    assert(f(m, "bullet_micros") == 900000L) // 9/10 exactly -> still fails (<90% required)
    assert(f(m, "r_bullet") == 0)
    val fine = ((1 to 8).map(i => s"plain $i") ++ Seq("- one", "- two")).mkString("\n")
    assert(f(gate(3 -> fine)(3), "r_bullet") == 1)
  }

  test("ellipsis lines: 30% ending in ... or … fails (strict <)") {
    val lines = Seq("keep going...", "weiter …  ", "more soon...") ++ (1 to 7).map(i => s"line $i")
    val r = gate(1 -> lines.mkString("\n"))(1)
    assert(f(r, "ellipsis_micros") == 300000L)
    assert(f(r, "r_ellipsis") == 0)
    val ok = gate(2 -> (Seq("trailing...") ++ (1 to 9).map(i => s"line $i")).mkString("\n"))(2)
    assert(f(ok, "r_ellipsis") == 1)
  }

  test("alpha-word fraction: zh text fails r_alpha; digits-only words count out") {
    val zh = gate(1 -> Seq.fill(60)("的 是 了").mkString(" "))(1)
    assert(f(zh, "alpha_micros") == 0L)
    assert(f(zh, "r_alpha") == 0)
    // 4 of 5 words alpha = 80% -> passes (>= 0.8)
    val edge = gate(2 -> "one two three four 12345")(2)
    assert(f(edge, "alpha_micros") == 800000L)
    assert(f(edge, "r_alpha") == 1)
  }

  test("required stopwords: distinct presence, repeats count once") {
    val r = gate(1 -> "the the the the the the")(1)
    assert(f(r, "n_req_stop") == 1)
    assert(f(r, "r_stop") == 0)
    assert(f(gate(2 -> "of and of and")(2), "n_req_stop") == 2)
    assert(f(gate(2 -> "of and of and")(2), "r_stop") == 1)
  }

  test("empty and whitespace-only text: zero counts, fails, no div-by-zero") {
    for ((id, t) <- Seq(1 -> "", 2 -> "   ")) {
      val r = gate(id -> t)(id)
      assert(f(r, "n_words") == 0)
      assert(f(r, "mwl_micros") == 0 && f(r, "alpha_micros") == 0)
      assert(f(r, "passes") == 0)
    }
  }

  test("property: native counts == independent Column forms on adversarial text") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val pieces = Array("the", "cat", "大家", "好", "- item", "* x", "• y",
      "wait...", "…", "#tag", "a#b", "12", "x7", "", " ", "  ", "\t", "\n",
      "", "word...", "...", "eé", "NAME", "MiXeD")
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(30)
      val sep = Array(" ", " ", "\n", "\t")
      val t = (0 until n).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(sep(rnd.nextInt(sep.length)))
      (i, t)
    }.toDF("doc_id", "text")
    val g = call_function("graft_gopher_stats", col("text"))
    val toks = graft.operators.text.TextAnalysis.tokens(col("text"))
    val diff = docs.select(col("doc_id"), col("text"), g.as("g"))
      .withColumn("e_nw",
        when(length(trim(col("text"))) === 0, lit(0L)).otherwise(size(toks).cast("long")))
      .withColumn("e_swl",
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(aggregate(toks, lit(0L), (a, t) => a + length(t))))
      .withColumn("e_sym",
        size(regexp_extract_all(col("text"), lit("#|\\.{3}|…"), lit(0))).cast("long"))
      .withColumn("e_nl", size(split(col("text"), "\n", -1)).cast("long"))
      .withColumn("e_nb", size(filter(split(col("text"), "\n", -1),
        l => regexp_like(ltrim(l), lit("^[-*•]")))).cast("long"))
      .withColumn("e_ne", size(filter(split(col("text"), "\n", -1),
        l => regexp_like(rtrim(l), lit("(\\.{3}|…)$")))).cast("long"))
      .withColumn("e_na",
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(size(filter(toks, t => regexp_like(t, lit("[a-z]")))).cast("long")))
      .filter("g.n_words <> e_nw OR g.sum_word_len <> e_swl OR g.n_sym <> e_sym " +
        "OR g.n_lines <> e_nl OR g.n_bullet <> e_nb OR g.n_ellipsis <> e_ne " +
        "OR g.n_alpha_words <> e_na")
    val bad = diff.collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("gopherRepetition: looping text lights up top-gram coverage; dup lines counted by chars") {
    val docs = Seq(
      (1, "a a a a a"),          // top bigram "a a" ×4, covered 12 of 9 norm chars
      (2, "a b c d e"),          // no repetition: top bigram ×1, covered 3 of 9
      (3, "x\ny\nx"),            // line 'x' duplicated: 2 chars of 5 raw
      (4, "")                    // empty: all zero, no div-by-zero
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(docs, "doc_id", "text")
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(1).getLong(1) == 1333333L) // round(12/9 * 1e6) half-up
    assert(r(2).getLong(1) == 333333L)  // round(3/9 * 1e6)
    assert(r(3).getLong(4) == 400000L)  // 2/5 raw chars on dup lines
    assert(r(1).getLong(4) == 0L && r(2).getLong(4) == 0L)
    (1 to 4).foreach(i => assert(r(4).getLong(i) == 0L))
  }

  test("gate agrees with the composable Column forms on the fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val g = TextAnalysis.gopherGate(docs, "doc_id", "text")
    // n_words must equal tokenCount; mwl micros must match meanWordLen
    val joined = docs.select(
        org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text")).as("tc"))
      .join(g, "doc_id")
    assert(joined.filter("tc <> n_words").count() == 0)
    assert(g.filter("n_words > 0 AND (mwl_micros < 1000000 OR mwl_micros > 20000000)").count() == 0)
  }
}
