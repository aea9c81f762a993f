package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.text.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // ten filler words nothing else repeats, to pad around shared spans
  private def filler(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")

  test("a span shared by two docs is found in both, merged and end-exclusive") {
    val shared = "a b c d e f g h i j k l" // 12 words -> three 10-windows each doc
    val docs = Seq(
      (1L, s"${filler("x")} $shared"),
      (2L, s"$shared ${filler("y")}")
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
      .orderBy("doc_id").collect()
    // doc 1: words 10..21 duplicated; doc 2: words 0..11
    assert(out.toSeq === Seq(Row(1L, 10, 22), Row(2L, 0, 12)))
  }

  test("within-doc repetition marks a span (repetition-removal semantic)") {
    val ten = "p q r s t u v w x y"
    val docs = Seq((7L, s"$ten ${filler("m")} $ten")).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
      .orderBy("span_start").collect()
    assert(out.toSeq === Seq(Row(7L, 0, 10), Row(7L, 20, 30)))
  }

  test("docs shorter than n words and null text yield no spans") {
    val docs = Seq((1L, Option("a b c")), (2L, Option("a b c")),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, "doc_id", "text", n = 10).count() === 0)
  }

  test("non-adjacent duplicated windows stay separate spans; gap <= n merges") {
    // doc pair shares two regions separated by > n unique words in each
    val r1 = "a b c d e f g h i j"
    val r2 = "k l m n o p q r s t"
    val docs = Seq(
      (1L, s"$r1 ${filler("u")} ${filler("v")} $r2"),
      (2L, s"$r1 ${filler("w")} ${filler("z")} $r2")
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
      .orderBy("doc_id", "span_start").collect()
    assert(out.toSeq === Seq(
      Row(1L, 0, 10), Row(1L, 30, 40),
      Row(2L, 0, 10), Row(2L, 30, 40)))
  }

  test("trim cuts every occurrence, keeps rows 1:1, normalizes pass-through docs") {
    val shared = "a b c d e f g h i j"
    val docs = Seq(
      (1L, s"KEEP Me  ok $shared"),   // mixed case + double space: normalized out
      (2L, s"$shared"),               // fully covered -> empty string, row kept
      (3L, "totally unique words only here never repeated at all")
    ).toDF("doc_id", "text")
    val out = SpanDedup.trimSpans(docs, "doc_id", "text", n = 10)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, "keep me ok"),
      Row(2L, ""),
      Row(3L, "totally unique words only here never repeated at all")))
  }

  test("graft_span_hashes is positional and full-windows-only") {
    val out = spark.sql(
      "SELECT graft_span_hashes('a b c d', 3) AS h, graft_span_hashes('a b', 3) AS s").head()
    assert(out.getSeq[Long](0).length === 2) // windows at pos 0 and 1
    assert(out.getSeq[Long](1).isEmpty)      // shorter than n
    // element i == xxhash64 of the window string starting at word i
    val probe = spark.sql(
      "SELECT graft_span_hashes('a b c d', 3)[1] = xxhash64('b c d') AS ok").head()
    assert(probe.getBoolean(0))
  }

  test("contaminatedSpans: planted verbatim span surfaces; clean eval docs do not") {
    import spark.implicits._
    val leak = "one two three four five six seven"
    val train = Seq(
      (1, s"train filler text then $leak and more trailing content"),
      (2, "другой unrelated training document entirely")).toDF("doc_id", "text")
    val eval = Seq(
      (10, s"eval begins here $leak eval ends here"),
      (11, "totally clean evaluation document nothing shared")).toDF("doc_id", "text")
    val out = graft.operators.text.SpanDedup
      .contaminatedSpans(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(out.map(_._1).toSet == Set(10))
    // "one two three four five six seven" sits at positions 3..9 in the
    // eval doc: windows 3,4,5 merge into one span [3, 10)
    assert(out.toSeq == Seq((10, 3, 10)))
  }

  test("stored span index: parquet round-trip probe == direct computation") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter(expr("doc_id % 10 <> 0"))
    val eval = docs.filter(expr("doc_id % 10 = 0"))
    val dir = graft.TempDirs.scratch("graft-spanidx")
    graft.operators.text.SpanDedup.buildSpanIndex(train, "text", n = 5)
      .write.mode("overwrite").parquet(dir)
    val viaIndex = graft.operators.text.SpanDedup
      .contaminatedSpansAgainstIndex(spark.read.parquet(dir), eval, "doc_id", "text", n = 5)
      .orderBy("doc_id", "span_start").collect().toSeq
    val direct = graft.operators.text.SpanDedup
      .contaminatedSpans(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(viaIndex == direct)
    assert(direct.nonEmpty) // the fixture's shared filler produces real leaks
  }

  test("contaminatedSpans: a million train copies still yield one eval span") {
    import spark.implicits._
    val leak = "alpha beta gamma delta epsilon"
    val train = (1 to 50).map(i => (i, s"copy $i says $leak every time"))
      .toDF("doc_id", "text")
    val eval = Seq((100, s"prefix $leak suffix")).toDF("doc_id", "text")
    val out = graft.operators.text.SpanDedup
      .contaminatedSpans(train, eval, "doc_id", "text", n = 5)
      .collect()
    assert(out.length == 1) // membership, not multiplicity
  }
}
