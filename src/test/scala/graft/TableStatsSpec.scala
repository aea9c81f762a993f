package graft

import org.apache.spark.sql.functions._
import graft.operators.TableStats
import graft.sinks.PartitionedWriter

class TableStatsSpec extends SparkSpec {

  test("profile computes per-column stats in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some(10)), (2L, "b", None), (3L, "a", Some(30))
    ).toDF("id", "tag", "v")
    val p = TableStats.profile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((3L, 0L, 3L, "1", "3")))
    assert(p("tag") == ((3L, 0L, 2L, "a", "b")))
    assert(p("v") == ((3L, 1L, 2L, "10", "30")))
  }

  test("histogram: exact bins, open-ended edges, nothing dropped") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 3.0, 9.99, 10.0, 55.0, 100.0, 250.0).toDF("x")
    val h = TableStats.histogram(df, col("x"), 0.0, 100.0, 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(h(-1) == ((1L, Double.NegativeInfinity, 0.0)))   // -5
    assert(h(0) == ((3L, 0.0, 10.0)))                        // 0, 3, 9.99
    assert(h(1) == ((1L, 10.0, 20.0)))                       // 10.0
    assert(h(5) == ((1L, 50.0, 60.0)))                       // 55
    assert(h(10) == ((2L, 100.0, Double.PositiveInfinity)))  // 100, 250
    assert(h.values.map(_._1).sum == 8L)
  }

  test("profile plan has exactly one scan of the input") {
    val df = Tables.load(spark, sf, "orders")
    val plan = TableStats.profile(df, Seq("o_orderkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(500))
  }

  test("partitioned writer: one file per partition value, round-trips") {
    val out = graft.TempDirs.scratch("graft-part") + "/docs"
    val docs = Tables.load(spark, sf, "documents")
    PartitionedWriter.write(docs, out, Seq("lang"))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val dir = new java.io.File(s"$out/lang=$l")
      assert(dir.isDirectory, s"missing partition dir for $l")
      val files = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"expected 1 file for lang=$l, got $files")
    }
  }

  test("partitioned writer bounds file size on a hot partition") {
    import spark.implicits._
    val out = graft.TempDirs.scratch("graft-part2") + "/t"
    val hot = spark.range(10000).select(lit("x").as("k"), col("id")).repartition(8)
    PartitionedWriter.write(hot, out, Seq("k"), maxRecordsPerFile = 3000)
    val files = new java.io.File(s"$out/k=x").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 4, s"got $files files")
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("groupQuantiles: exact discrete ranks, lower-element medians, p100 = max") {
    import spark.implicits._
    // group a: sorted 10,20,30,40 -> p50 rank ceil(2)=2 -> 20; p100 -> 40
    // group b: single element -> every quantile is it
    val df = Seq(("a", 40L, 1L), ("a", 10L, 2L), ("a", 30L, 3L), ("a", 20L, 4L),
      ("b", 7L, 5L)).toDF("g", "v", "id")
    val q = TableStats.groupQuantiles(df, "g", "v", "id", Seq(0.5, 1.0))
      .orderBy("g").as[(String, Long, Long, Long)].collect()
    assert(q.toSeq === Seq(("a", 4L, 20L, 40L), ("b", 1L, 7L, 7L)))
  }

  test("groupQuantiles: null values are excluded, colliding labels rejected") {
    import spark.implicits._
    val df = Seq(("a", Option(10L), 1L), ("a", Option.empty[Long], 2L), ("a", Option(20L), 3L))
      .toDF("g", "v", "id")
    // n counts non-null only (2), median = lower element 10
    val q = TableStats.groupQuantiles(df, "g", "v", "id", Seq(0.5))
      .as[(String, Long, Long)].collect()
    assert(q.toSeq === Seq(("a", 2L, 10L)))
    intercept[IllegalArgumentException] {
      TableStats.groupQuantiles(df, "g", "v", "id", Seq(0.995, 1.0))
    }
  }

  test("distinctKmv: exact below k, estimate within tolerance above, duplicate-blind") {
    import spark.implicits._
    val small = (1 to 10).map(i => ("s", s"v$i"))    // 10 < k: exact
    val big = (1 to 5000).map(i => ("b", s"doc $i")) // 5000 >> k: sketch
    val df = (small ++ big).toDF("g", "key")
    val out = TableStats.distinctKmv(df, "g", "key", k = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("s") == ((10L, 10L)), "below k must report exactly")
    val (n, est) = out("b")
    assert(n == 5000L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.35,
      s"KMV estimate $est too far from 5000 (k=64 stderr ~1/sqrt(62) ≈ 13%)")
    // duplicates never move the sketch: triple every row
    val dup = df.union(df).union(df)
    val out2 = TableStats.distinctKmv(dup, "g", "key", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 == TableStats.distinctKmv(df, "g", "key", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("madOutliers: robust to the outliers it flags; mean/stddev would not be") {
    import spark.implicits._
    // 99 inliers around 50 plus one wild point; med=~50, MAD small,
    // the wild point flags; an id-distinct tie column keeps ranks total
    val rows = ((1 to 99).map(i => (i.toLong, "s", 45L + (i % 11))) :+ (100L, "s", 100000L))
      .toDF("id", "g", "v")
    val out = TableStats.madOutliers(rows, "g", "v", "id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSet == Set(100L), s"only the planted outlier: ${out.toSeq}")
    val (_, v, med, mad) = out.head
    assert(v == 100000L && med >= 45 && med <= 55 && mad <= 5)
    // degenerate group: all-equal values → MAD 0, any deviation flags
    val const = ((1 to 10).map(i => (i.toLong, "c", 7L)) :+ (11L, "c", 8L)).toDF("id", "g", "v")
    val flagged = TableStats.madOutliers(const, "g", "v", "id", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(11L))
  }

  test("octave sketch: bounds bracket exact quantiles, sketch merges, <= 64 bins") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", (i % 97).toLong)).toDF("g", "v")
    val sk = TableStats.histQuantileSketch(df, "g", "v")
    assert(sk.count() <= 64)
    val q = TableStats.histQuantilesFromSketch(sk, "g", Seq(0.5, 0.9, 0.99)).collect().head
    val exact = TableStats.groupQuantiles(df.withColumn("id", col("v")), "g", "v", "id",
      Seq(0.5, 0.9, 0.99)).collect().head
    for (i <- Seq(2, 3, 4)) {
      val bound = q.getLong(i); val truth = exact.getLong(i)
      assert(truth <= bound && truth * 2 + 2 > bound,
        s"col $i: exact $truth vs bound $bound outside the octave bracket")
    }
    // mergeability: sketch(A ++ B) == cell-wise sum
    val a = (1 to 300).map(i => ("g", i.toLong)).toDF("g", "v")
    val b = (1 to 700).map(i => ("g", (i * 3).toLong)).toDF("g", "v")
    val merged = TableStats.histQuantileSketch(a, "g", "v")
      .unionByName(TableStats.histQuantileSketch(b, "g", "v"))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val whole = TableStats.histQuantileSketch(a.unionByName(b), "g", "v")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(merged == whole)
  }

  test("psiDrift: zero on identical halves, positive on a shifted one, bucket-gap safe") {
    import spark.implicits._
    val base = (1 to 400).map(i => ("s", i % 10L))
    val same = TableStats.psiDrift(base.toDF("g", "v"), base.toDF("g", "v"),
        "g", col("v")).collect().head
    assert(same.getLong(4) == 0L, s"identical distributions must read PSI 0, got $same")
    // shifted: new half concentrates in buckets the old half barely has
    val shifted = (1 to 400).map(i => ("s", 8L + i % 2L))
    val drift = TableStats.psiDrift(base.toDF("g", "v"), shifted.toDF("g", "v"),
        "g", col("v")).collect().head
    assert(drift.getLong(4) > 200000L, s"shifted distribution must trip the 0.2 threshold: $drift")
    assert(drift.getLong(1) == 400L && drift.getLong(2) == 400L && drift.getLong(3) == 10L)
    // a bucket present on only one side must not null out the term
    val gap = TableStats.psiDrift(Seq(("g2", 1L)).toDF("g", "v"),
        Seq(("g2", 2L)).toDF("g", "v"), "g", col("v")).collect().head
    assert(!gap.isNullAt(4) && gap.getLong(3) == 2L)
  }

  test("count-min: est >= exact always, exact at generous width, cell-wise mergeable") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val hh = TableStats.cmHeavyHitters(docs, "text", depth = 4, width = 1024, k = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length == 30)
    assert(hh.forall { case (_, exact, est) => est >= exact },
      "count-min must never under-count")
    // sketch size is bounded by depth*width no matter the corpus
    val toks = docs.filter(col("text").isNotNull)
      .select(explode(graft.operators.text.TextAnalysis.tokens(col("text"))).as("k"))
      .filter(col("k") =!= "")
    val sk = TableStats.cmSketch(toks, "k", depth = 4, width = 64)
    assert(sk.count() <= 4 * 64)
    // mergeability: sketch(A ++ B) == cell-wise sum of the two sketches
    val a = toks.limit(500).localCheckpoint(true)
    val b = toks.limit(1700).localCheckpoint(true)
    val merged = TableStats.cmSketch(a, "k", 4, 64)
      .unionByName(TableStats.cmSketch(b, "k", 4, 64))
      .groupBy("cm_row", "cm_bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = TableStats.cmSketch(a.unionByName(b), "k", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
    // never-seen probes: empty cells count as ZERO in the min, so a
    // key absent from the sketched data estimates 0, not an inflated
    // min over whatever cells happen to exist
    val tiny = TableStats.cmSketch(Seq("only").toDF("k"), "k", 4, 1024)
    val est = TableStats.cmEstimate(tiny,
        Seq("never-seen-key-xyz").toDF("k"), "k", 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("never-seen-key-xyz") == 0L)
  }
}
