package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A separate warm-up
  * run of a trivial action absorbs JVM/session startup so the measured
  * numbers reflect query execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    // headline set: scan-agg, shuffle join, window, CDC apply, dedup
    // sketches, ANN, text profiling — the engine's load-bearing paths.
    // The four r15 arms gate the crawl/CDX/retrieval/ANN-index
    // families that had only ad-hoc ScaleProbe coverage before: the
    // ranked crawl-loop turn, the LSM master-index build+append+lookup
    // loop, BM25 retrieval, and IVF-PQ search. The r16 arm
    // (pipeline_wayback) gates the replay family — two crawl commits,
    // as-of resolution, and the revisit double-ranged-fetch — a
    // regression in any of those surfaces now moves the committed
    // BENCH series.
    val headline = Seq(
      "q1_agg", "q2_join_enrich", "q3_window_topn", "k2_cdc_apply",
      "s2_tx_assembly", "a5_gtid_set", "dedup_exact", "dedup_minhash",
      "dedup_ngram", "sim_topk", "text_profile", "c_type_matrix",
      "pack_sequences", "contamination", "emb_quantize",
      "pipeline_crawl_loop_ranked", "cdx_lookup", "text_bm25_topk",
      "sim_ivf_pq_topk", "pipeline_wayback"
    )
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm FS/codec paths
    // warm the JVM's query-shaped one-time costs (codegen classloading,
    // shuffle init, window/agg/join operator classes, ICU string paths)
    // on 100 rows so measured numbers reflect steady-state execution
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val tiny = spark.range(100).select(col("id"), lower(concat(lit("Ä中"), col("id"))).as("s"))
      tiny.join(tiny.select(col("id").as("id2")), col("id") === col("id2"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("id") % 7).orderBy(col("id"))))
        .groupBy(col("rn")).agg(count(lit(1)), min(md5(regexp_replace(col("s"), "\\s+", " "))))
        .write.format("noop").mode("overwrite").save()
      // decimal hash-agg + range-partitioned sort operator classes
      spark.range(100)
        .groupBy(col("id") % 5)
        .agg(sum(col("id").cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("d"))
        .orderBy(col("d"))
        .write.format("noop").mode("overwrite").save()
    }
    // MEASUREMENT PROTOCOL (see BUILD_EVIDENCE.md): five full passes,
    // queries interleaved round-robin — back-to-back repeats share any
    // transient host-load spike, so a spike inflates BOTH samples of
    // one query while the rest of the suite is fine; interleaving
    // spreads each query's five samples across the whole run. Wall
    // time AND process-CPU time are recorded per sample: on a noisy
    // shared host wall time absorbs other tenants' load (the measured
    // ±30% round-to-round drift) while CPU time only counts this
    // JVM's cycles — CPU medians are the regression-gating series,
    // wall minimums remain the cross-round continuity series.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def procStat(): (Long, Long) = { // (steal ticks, total ticks)
      try {
        val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
        (if (cpu.length > 7) cpu(7) else 0L, cpu.sum)
      } catch { case _: Exception => (0L, 0L) }
    }
    def timeOnce(name: String): (Double, Double) = {
      val fn = SparkEntry.queries(name)
      val w0 = System.nanoTime()
      val c0 = osBean.getProcessCpuTime
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable =>
        try fn(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
      ((System.nanoTime() - w0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val loadStart = osBean.getSystemLoadAverage
    val (steal0, ticks0) = procStat()
    val passes = (1 to 5).map(_ => headline.map(n => n -> timeOnce(n)).toMap)
    val (steal1, ticks1) = procStat()
    val loadEnd = osBean.getSystemLoadAverage
    val stealPct =
      if (ticks1 > ticks0) 100.0 * (steal1 - steal0) / (ticks1 - ticks0) else 0.0
    val results = headline.map { name => name -> passes.map(_(name)) }
    def fmtMap(f: Seq[(Double, Double)] => Double): String = results
      .map { case (k, v) => "\"" + k + "\":" + f"${f(v)}%.3f" }.mkString("{", ",", "}")
    val qs = fmtMap(v => v.map(_._1).min)
    val wallMed = fmtMap(v => median(v.map(_._1)))
    val cpuMed = fmtMap(v => median(v.map(_._2)))
    val samples = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(x => f"${x._1}%.3f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2.map(_._1).min).sum
    val medianTotal = results.map { case (_, v) => median(v.map(_._1)) }.sum
    val cpuTotal = results.map { case (_, v) => median(v.map(_._2)) }.sum
    // Full dump FIRST (samples/medians — the cross-round evidence line,
    // unchanged format), then a COMPACT line LAST: the driver keeps only
    // the tail of stdout, and the ~4 KB full line arrived decapitated in
    // every round r01–r17 (BENCH_r*.json `parsed: null`), blinding the
    // per-query regression gate. The last stdout JSON line is now ≤1 KB
    // — same metric/value/unit/queries/sf contract, same numbers.
    println(f"""{"metric":"total_full","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""wall_median":$wallMed,"cpu_median":$cpuMed,"samples":$samples,""" +
      f""""median_total":$medianTotal%.3f,"cpu_total":$cpuTotal%.3f,""" +
      f""""load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,""" +
      f""""steal_pct":$stealPct%.2f,"passes":5,"sf":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""median_total":$medianTotal%.3f,"cpu_total":$cpuTotal%.3f,""" +
      f""""steal_pct":$stealPct%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
