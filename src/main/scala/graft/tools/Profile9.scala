package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the round-9 perf pass on dedup_minhash /
  * dedup_ngram: times each pipeline stage in isolation so the
  * optimization targets the measured cost, not the guessed one.
  */
object Profile9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("32")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.cache().count()

    def time(label: String)(f: => Long): Unit = {
      val rounds = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROBE $label%-28s ${rounds.map(_._1).min}%7.3f s  rows=${rounds.head._2}")
    }

    import graft.operators.dedup.{Dedup, MinHashDedup}

    // minhash stages
    time("mh_shingle_explode") {
      graft.operators.Partitioning.ensureMinParallelism(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .count()
    }
    time("mh_md5_conv") {
      graft.operators.Partitioning.ensureMinParallelism(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .select(col("doc_id"),
          pmod(conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long"),
            lit(2147483647L)).as("hs"))
        .agg(sum("hs")).collect().head.getLong(0)
    }
    time("mh_signatures") {
      graft.operators.Partitioning.ensureMinParallelism(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
        .select(col("doc_id"),
          pmod(conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long"),
            lit(2147483647L)).as("hs"))
        .groupBy(col("doc_id"))
        .agg(graft.functions.MinHashSigAgg.column(col("hs"), 64, portable = true).as("sig"))
        .count()
    }
    time("mh_full") {
      MinHashDedup.portablePairs(docs, "doc_id", "text",
        n = 3, k = 64, numBands = 16, threshold = 0.5, maxBucket = 500).count()
    }

    // cumulative cuts of the portablePairs pipeline
    val sigDf = graft.operators.Partitioning.ensureMinParallelism(
        docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long"),
          lit(2147483647L)).as("hs"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSigAgg.column(col("hs"), 64, portable = true).as("sig"))
    val rpb = 4
    val bandedDf = sigDf.select(col("doc_id"),
      posexplode(array((0 until 16).map(b =>
        concat_ws(":", (0 until rpb).map(r => col("sig").getItem(b * rpb + r)): _*)): _*))
        .as(Seq("band", "bkey")))
    val bucketsDf = bandedDf.groupBy(col("band"), col("bkey"))
      .agg(graft.functions.BoundedCollectList.column(col("doc_id"), 500).as("members"))
      .filter(size(col("members")).between(2, 500))
    time("mh_cut_buckets") { bucketsDf.count() }
    val pairsDf = bucketsDf
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("mh_cut_pairs") { pairsDf.count() }

    // how many times does the sig subtree appear in the physical plan?
    val full = MinHashDedup.portablePairs(docs, "doc_id", "text",
      n = 3, k = 64, numBands = 16, threshold = 0.5, maxBucket = 500)
    full.count()
    val plan = full.queryExecution.executedPlan.toString
    println("PLAN reused=" + "Reused".r.findAllIn(plan).size +
      " minhash_aggs=" + "graft_minhash_sig".r.findAllIn(plan).size +
      " exchanges=" + "Exchange".r.findAllIn(plan).size)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/mh_plan.txt"), plan)

    // variant: carry signatures through the band explode / bucket
    // collect (528B/member) instead of re-joining them by id
    val carried = {
      val sig = sigDf
      val banded = sig.select(col("doc_id"), col("sig"),
        posexplode(array((0 until 16).map(b =>
          concat_ws(":", (0 until rpb).map(r => col("sig").getItem(b * rpb + r)): _*)): _*))
          .as(Seq("band", "bkey")))
      val buckets = banded.groupBy(col("band"), col("bkey"))
        .agg(graft.functions.BoundedCollectList.column(
          struct(col("doc_id"), col("sig")), 500).as("members"))
        .filter(size(col("members")).between(2, 500))
      val pairs = buckets
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.sig").as("sa"), col("b.sig").as("sb"))
        .dropDuplicates("id_a", "id_b")
      pairs
        .withColumn("sig_frac",
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b))
            .cast("double") / 64)
        .filter(col("sig_frac") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("sig_frac"), 6).as("sig_frac"))
    }
    time("mh_carried_sigs") { carried.count() }

    // variant: localCheckpoint the signatures, id-only buckets as today
    time("mh_ckpt_sigs") {
      val sig = sigDf.localCheckpoint(true)
      val banded = sig.select(col("doc_id"),
        posexplode(array((0 until 16).map(b =>
          concat_ws(":", (0 until rpb).map(r => col("sig").getItem(b * rpb + r)): _*)): _*))
          .as(Seq("band", "bkey")))
      val buckets = banded.groupBy(col("band"), col("bkey"))
        .agg(graft.functions.BoundedCollectList.column(col("doc_id"), 500).as("members"))
        .filter(size(col("members")).between(2, 500))
      val pairs = buckets
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("id_a"), col("b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val sa = sig.select(col("doc_id").as("id_a"), col("sig").as("sa"))
      val sb = sig.select(col("doc_id").as("id_b"), col("sig").as("sb"))
      val out = pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn("sig_frac",
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b))
            .cast("double") / 64)
        .filter(col("sig_frac") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("sig_frac"), 6).as("sig_frac"))
      out.count()
    }

    // downstream-only cost after an up-front materialize
    val sigM = graft.operators.Partitioning.materializeOnce(sigDf)
    time("mh_downstream_only") {
      val banded = sigM.select(col("doc_id"),
        posexplode(array((0 until 16).map(b =>
          concat_ws(":", (0 until rpb).map(r => col("sig").getItem(b * rpb + r)): _*)): _*))
          .as(Seq("band", "bkey")))
      val buckets = banded.groupBy(col("band"), col("bkey"))
        .agg(graft.functions.BoundedCollectList.column(col("doc_id"), 500).as("members"))
        .filter(size(col("members")).between(2, 500))
      val pairs = buckets
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("id_a"), col("b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val sa = sigM.select(col("doc_id").as("id_a"), col("sig").as("sa"))
      val sb = sigM.select(col("doc_id").as("id_b"), col("sig").as("sb"))
      pairs.join(sa.hint("shuffle_hash"), "id_a")
        .join(sb.hint("shuffle_hash"), "id_b")
        .withColumn("sig_frac",
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b))
            .cast("double") / 64)
        .filter(col("sig_frac") >= 0.5)
        .count()
    }

    // ngram stages
    time("ng_shingle_hashes") {
      graft.operators.Partitioning.ensureMinParallelism(
          docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh_arr"))
        .select(col("doc_id"), size(col("sh_arr")).as("n_shingles"),
          explode(col("sh_arr")).as("sh"))
        .count()
    }
    time("ng_full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxShingleDf = 50).count()
    }
    spark.stop()
  }
}

