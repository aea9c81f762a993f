package graft

import org.apache.spark.sql.functions._
import graft.operators.text.BpeTrainer

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], merges: Int = 5) =
    BpeTrainer.train(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text", merges)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("merge sequence matches the hand-derived BPE run") {
    // vocab: ab x2, abc x1 -> (a,b) weight 3 wins, then (ab,c) weight 1
    val got = train(Seq("ab ab abc"))
    assert(got == Seq((1, "a", "b", "ab", 3L), (2, "ab", "c", "abc", 1L)))
  }

  test("overlapping runs merge greedily left-to-right") {
    // 'aaa' x2: pair (a,a) appears twice per word -> weight 4; after the
    // merge each word is 'aa a', so round 2 merges (aa,a) at weight 2
    val got = train(Seq("aaa aaa"))
    assert(got.take(2) == Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
  }

  test("back-to-back occurrences all merge in one round (reference greedy)") {
    // 'abab': one (a,b) application must yield [ab, ab] — the
    // single-space encoding consumed the shared boundary space and
    // under-merged to [ab, a, b] (review catch); after round 1 the only
    // remaining pair is (ab, ab)
    val got = train(Seq("abab"))
    assert(got == Seq((1, "a", "b", "ab", 2L), (2, "ab", "ab", "abab", 1L)))
    // 6-run: (a,a) merges three times in ONE round, then (aa,aa)
    val run = train(Seq("aaaaaa"))
    assert(run.take(2) == Seq((1, "a", "a", "aa", 5L), (2, "aa", "aa", "aaaa", 2L)))
  }

  test("U+2028 line separator is one symbol on both engines' dot") {
    // Java's bare '.' skips U+2028 while RE2's matches it — (?s) aligns
    // them; the char survives normText (neither engine's \s strips it)
    val got = train(Seq("a\u2028b a\u2028b"), merges = 1)
    assert(got == Seq((1, "a", "\u2028", "a\u2028", 2L)))
  }

  test("ties break on (count desc, lhs, rhs) deterministically") {
    // (a,b) and (b,a) both weight 2 inside 'abab'; (a,b) wins lexically
    val got = train(Seq("abab"), merges = 1)
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("surrogate pairs stay whole: emoji are single symbols") {
    val got = train(Seq("😀🚀 😀🚀"), merges = 1)
    assert(got == Seq((1, "😀", "🚀",
      "😀🚀", 2L)))
  }

  test("training stops early when no pairs remain; null text excluded") {
    val df = Seq((0L, "a b c"), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = BpeTrainer.train(df, "text", merges = 8).collect()
    assert(got.isEmpty) // all words are single symbols from round 1
  }

  private def trainLocal(texts: Seq[String], merges: Int = 5) =
    BpeTrainer.trainLocal(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), "text", merges)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("trainLocal == train on every fixture (the scale path is exact)") {
    val fixtures = Seq(
      Seq("ab ab abc"),
      Seq("aaa aaa"),
      Seq("abab abab cd"),
      Seq("the cat sat on the mat", "the dog sat"),
      Seq("x")) // degenerate: single-symbol vocab, early stop
    fixtures.foreach { f =>
      assert(trainLocal(f, 6) == train(f, 6), s"diverged on $f")
    }
  }

  test("trainLocal tie-break is code-point order, not UTF-16 (emoji trap)") {
    // two tied pairs: (😀, a) and (, b). Code-point order puts
    // U+F000 below U+1F600, so (, b) must win round 1 — Java's
    // String.compareTo would order the surrogate pair (D83D DE00)
    // BELOW  and pick the emoji pair instead. Spark's UTF8
    // ordering == code points, so the two paths only agree if the
    // driver loop compares code points.
    val docs = Seq("😀a b")
    val d = train(docs, 1)
    val l = trainLocal(docs, 1)
    assert(d == l)
    assert(l.head._2 == "") // the code-point-smaller left symbol
  }

  test("trainLocal: deep merge count costs O(1) Spark jobs (the scale contract)") {
    val docs = (0 until 200).map(i => s"w${i}abcdefgh w${i}abcd xyz$i")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val merged = BpeTrainer.trainLocal(docs, "text", merges = 1000).count()
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(merged > 100) // the loop genuinely ran deep
    // one count-collect + the result materialization — far under a
    // per-merge job budget (the distributed loop would add ~2000 jobs)
    assert(after - before <= 10, s"jobs=${after - before}")
  }

  test("encode applies the merge table in step order") {
    val docs = Seq((0L, "ab ab abc")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", 5)
      .orderBy("step").select("lhs", "rhs").as[(String, String)].collect().toSeq
    val enc = BpeTrainer.encode(docs, "doc_id", "text", merges)
      .orderBy("wpos").select("symbols").as[Seq[String]].collect().toSeq
    assert(enc == Seq(Seq("ab"), Seq("ab"), Seq("abc")))
  }
}
