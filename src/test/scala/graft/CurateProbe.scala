package graft

/** Measures the write-through curate claim (run with
  * `Test/runMain graft.CurateProbe [sfDir]`): `curate(...).write` pays
  * the gate+fingerprint corpus pass twice (the pin is released before
  * the final anti-join), `curateTo` keeps the pin through the write and
  * pays it once. Both paths produce byte-identical row sets (oracled by
  * pipeline_curate / pipeline_curate_to); this probe prices the
  * difference at bench scale.
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.build()
    import org.apache.spark.sql.functions._
    // k-fold scaled copies with disjoint ids and salted text (the
    // ScaleProbe corpus-scaling move): grows the gate+fingerprint scan
    // k× while keeping near-dup pairs from going quadratic across copies
    val base = Tables.load(spark, sfDir, "documents")
    val docs = if (k == 1) base else
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copysalt$i")).as("text"))
      }.reduce(_ unionAll _)
    val n = docs.count()

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (codegen, broadcast machinery)
    val warmDir = TempDirs.scratch("curate_probe_warm_")
    graft.operators.TrainingDataPipeline.curateTo(
      docs.limit(500), "doc_id", "text", s"$warmDir/w", maxShingleDf = 50)

    val outs = TempDirs.scratch("curate_probe_")
    val results = (1 to 3).map { i =>
      val lazyThenWrite = time {
        graft.operators.TrainingDataPipeline.curate(
            docs, "doc_id", "text", maxShingleDf = 50)
          .write.mode("overwrite").parquet(s"$outs/lazy_$i")
      }
      val writeThrough = time {
        graft.operators.TrainingDataPipeline.curateTo(
          docs, "doc_id", "text", s"$outs/through_$i", maxShingleDf = 50)
      }
      (lazyThenWrite, writeThrough)
    }
    val best = (results.map(_._1).min, results.map(_._2).min)
    println(f"""{"probe":"curate_write","docs":$n,""" +
      f""""curate_then_write_sec":${best._1}%.2f,"curate_to_sec":${best._2}%.2f,""" +
      f""""saved_pct":${100 * (best._1 - best._2) / best._1}%.0f}""")
    spark.stop()
  }
}
