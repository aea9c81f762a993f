package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(10000).toDF("id")

  test("assignSplit: proportions near weights, assignment deterministic") {
    val split = Sampling.assignSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000L) < 300, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 150, s"val ${counts("val")}")
    // same spec -> identical assignment
    val again = Sampling.assignSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("assignSplit: weights normalize (8/1/1 == 0.8/0.1/0.1)") {
    val a = Sampling.assignSplit(ids, "id", Seq("x" -> 8.0, "y" -> 1.0, "z" -> 1.0))
    val b = Sampling.assignSplit(ids, "id", Seq("x" -> 0.8, "y" -> 0.1, "z" -> 0.1))
    assert(a.exceptAll(b).isEmpty)
  }

  test("tokenBudgetSample: prefix-by-priority selection equals the naive rule") {
    // 3 sources × varying token sizes; budgets force partial selection
    val docs = (0L until 3000L).map(i =>
        (i, s"s${i % 3}", (i % 17 + 1).toInt))
      .toDF("id", "src", "toks")
    val budgets = Map("s0" -> 1000L, "s1" -> 3000L, "s2" -> 10000000L)
    val got = Sampling.tokenBudgetSample(docs, "id", "src", "toks", budgets)
      .select("id", "src", "toks").as[(Long, String, Int)].collect().toSet
    // naive reference: global per-source cumulative sum in md5 order
    def prio(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val expected = (0L until 3000L).map(i => (i, s"s${i % 3}", (i % 17 + 1).toInt))
      .groupBy(_._2).flatMap { case (s, rows) =>
        var cum = 0L
        rows.sortBy(r => (prio(r._1), r._1)).takeWhile { r =>
          cum += r._3; cum <= budgets(s)
        }
      }.toSet
    assert(got == expected)
    // per-source kept totals respect the budgets
    val totals = got.groupBy(_._2).view.mapValues(_.map(_._3.toLong).sum).toMap
    assert(totals.forall { case (s, t) => t <= budgets(s) })
    // the unconstrained source keeps every doc
    assert(got.count(_._2 == "s2") == 1000)
  }

  test("tokenBudgetSample: unlisted sources drop; result is deterministic") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}", 5)).toDF("id", "src", "toks")
    val a = Sampling.tokenBudgetSample(docs, "id", "src", "toks", Map("s0" -> 120L))
    assert(a.select("src").distinct().as[String].collect().toSeq == Seq("s0"))
    // 120 tokens / 5 per doc = exactly 24 docs
    assert(a.count() == 24)
    val b = Sampling.tokenBudgetSample(docs, "id", "src", "toks", Map("s0" -> 120L))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("salt decorrelates assignments") {
    val a = Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5))
    val b = Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "v2")
    val differing = a.withColumnRenamed("split", "s1")
      .join(b.withColumnRenamed("split", "s2"), "id")
      .filter(col("s1") =!= col("s2")).count()
    assert(differing > 2000, s"salted split too correlated: $differing")
  }

  test("sampleFraction keeps ~fraction, subset-stable under fraction growth") {
    val f25 = Sampling.sampleFraction(ids, "id", 0.25)
    val f50 = Sampling.sampleFraction(ids, "id", 0.50)
    assert(math.abs(f25.count() - 2500L) < 200)
    // bucket < 2500 implies bucket < 5000: smaller sample nests in larger
    assert(f25.exceptAll(f50).isEmpty)
  }

  test("sampleMixture: per-stratum fractions, unlisted strata dropped") {
    val strat = ids.withColumn("src", concat(lit("s"), pmod(col("id"), lit(4))))
    val kept = Sampling.sampleMixture(strat, "id", "src", Map("s0" -> 1.0, "s1" -> 0.5))
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("s0", "s1"), s"unlisted strata leaked: $counts")
    assert(counts("s0") == 2500L)
    assert(math.abs(counts("s1") - 1250L) < 150)
  }

  test("temperatureMixture: alpha<1 up-weights small sources; budget ~holds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // skewed corpus: 9000 web docs, 900 code, 100 math
    val docs = ((1 to 9000).map(i => (i.toLong, "web")) ++
        (1 to 900).map(i => (10000L + i, "code")) ++
        (1 to 100).map(i => (20000L + i, "math")))
      .toDF("doc_id", "source")
    val out = graft.operators.Sampling
      .temperatureMixture(docs, "doc_id", "source", alpha = 0.5, targetRows = 2000)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val keptFrac = Map(
      "web" -> out("web") / 9000.0,
      "code" -> out("code") / 900.0,
      "math" -> out("math") / 100.0)
    // flattening: the smaller the source, the LARGER its kept fraction
    assert(keptFrac("math") > keptFrac("code") && keptFrac("code") > keptFrac("web"), keptFrac.toString)
    // overall budget approximately holds (hash-bucket quantization noise)
    val totalKept = out.values.sum
    assert(totalKept > 1600 && totalKept < 2400, s"kept $totalKept of target 2000")
    // alpha=1 reduces to ~natural proportions: every source keeps ~T/N
    val nat = graft.operators.Sampling
      .temperatureMixture(docs, "doc_id", "source", alpha = 1.0, targetRows = 2000)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // compare the two big strata only — a 100-doc stratum's kept
    // fraction carries +-several points of hash-bucket noise
    val fr = Seq(nat("web") / 9000.0, nat("code") / 900.0)
    assert(fr.max - fr.min < 0.05, s"alpha=1 fractions should be ~equal: $fr")
    // deterministic: identical output on a second run
    val again = graft.operators.Sampling
      .temperatureMixture(docs, "doc_id", "source", alpha = 0.5, targetRows = 2000)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == out)
  }

  test("null keys neither vanish nor pile into the last split") {
    val withNulls = spark.range(100).toDF("id")
      .withColumn("key", when(col("id") < 10, lit(null)).otherwise(col("id").cast("string")))
    val split = Sampling.assignSplit(withNulls, "key", Seq("a" -> 0.5, "b" -> 0.5))
    assert(split.count() == 100, "rows lost on null keys")
    // all null keys get ONE deterministic bucket -> one split, chosen by
    // hash('') not by falling through the when-chain
    val nullSplits = split.filter(col("key").isNull).select("split").distinct().collect()
    assert(nullSplits.length == 1)
    val f = Sampling.sampleFraction(withNulls, "key", 1.0)
    assert(f.count() == 100, "fraction=1.0 must keep null-keyed rows")
  }

  test("deterministicShuffle: stable order, decorrelated from id order") {
    val s1 = Sampling.deterministicShuffle(ids, "id").collect().map(_.getLong(0))
    val s2 = Sampling.deterministicShuffle(ids, "id").collect().map(_.getLong(0))
    assert(s1.sameElements(s2), "shuffle not reproducible")
    assert(s1.toSet == (0L until 10000L).toSet, "rows lost")
    // Spearman-ish check: the shuffled position of ids 0..99 should not
    // be concentrated at the front
    val posOfFirst100 = s1.zipWithIndex.filter(_._1 < 100).map(_._2.toLong)
    assert(posOfFirst100.max > 5000, "order still correlated with id")
  }

  test("weightedSample: E-S priorities match a JVM replay; weight biases inclusion") {
    // ids 0..4999 weight 1, 5000..9999 weight 20
    val df = ids.withColumn("w", when(col("id") < 5000, 1L).otherwise(20L))
    val out = Sampling.weightedSample(df, "id", "w", n = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500)
    // exact replay of the priority arithmetic on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def prio(id: Long, w: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      Math.round(math.log(1152921504606846976.0 / (h + 1).toDouble) * 1e9) / w
    }
    out.foreach { case (id, w, p) => assert(p == prio(id, w), s"priority mismatch for id=$id") }
    // the winners are exactly the n smallest (priority, id) pairs
    val all = (0L until 10000L).map(id => (prio(id, if (id < 5000) 1L else 20L), id))
      .sorted.take(500).map(_._2).toSet
    assert(out.map(_._1).toSet == all)
    // 20× weight ⇒ heavy rows dominate the sample
    val heavy = out.count(_._1 >= 5000)
    assert(heavy > 400, s"expected heavy-weight dominance, got $heavy/500")
    // weight 0 / null rows are excluded, never sampled
    val withZero = df.withColumn("w", when(col("id") === 0, 0L).otherwise(col("w")))
    assert(!Sampling.weightedSample(withZero, "id", "w", n = 10000)
      .collect().map(_.getLong(0)).contains(0L))
  }
}
