package graft.operators.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011; the FAISS `PQ{m}` index) —
  * the memory end-game of the quantization family: the vector splits
  * into `m` sub-vectors, each encoded as the id of its nearest codeword
  * in a per-subspace trained codebook, so a 64-float vector compresses
  * to `m` small codes (here 8 bytes — 32× smaller than float32) and
  * search runs on codes alone via asymmetric distance computation
  * (ADC): the query stays exact, every corpus vector is represented by
  * its codewords.
  *
  * The portability trick that lets the WHOLE pipeline hash-oracle:
  * vectors quantize to integer micros up front (`floor(x·10^6)`, the
  * corpus-wide convention) and codebook centroids ROUND TO INTEGER
  * MICROS after each Lloyd mean (`floor(Σ/n + 0.5)` — one IEEE
  * division + floor, the established portable rounding), so every
  * assignment distance and every ADC distance is EXACT integer
  * arithmetic: Σ(a−b)² in DECIMAL(38,0) (HUGEINT on the oracle side —
  * the squares can exceed 2^63 at the adversarial edge of the
  * BIGINT-micros domain). No float accumulation exists anywhere in
  * train, encode, or search — order-free integer sums — which is a
  * strictly stronger determinism than the IVF path's sequential-fold
  * cosine parity. Distances surface as one final correctly-rounded
  * double cast (exact below 2^53 — every unit-scale corpus).
  *
  * Scale shape: training touches the corpus map-side only (argmin
  * against a broadcast codebook literal, then one (sub, cid, pos)
  * aggregation of m·ks·subDim cells); only the m×ks×subDim codebook
  * ever reaches the driver. Encoding is a shuffle-free projection.
  * ADC search broadcasts the (small by contract) query set against the
  * codes table — the codes are the only corpus-sized operand, 32×
  * fewer bytes than the raw vectors through every scan and cache.
  *
  */
object ProductQuantizer {

  /** codebooks(sub)(cid)(pos) — integer-micro centroids. */
  type Codebooks = Array[Array[Array[Long]]]

  def microVec(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(1e6)).cast("long"))

  private def cbLit3(cbs: Codebooks): Column =
    typedlit(cbs.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)

  /** Per-subspace nearest-codeword ids: array<int> of length m,
    * tie-break lowest codeword id. Runs as the native
    * [[graft.plans.PqAssign]] kernel (one fused JVM loop per row,
    * 128-bit exact accumulation — the interpreted decimal-HOF version
    * of the same math cost ~5× the probe wall-clock); the codebook
    * rides as one foldable literal bound at plan build.
    */
  def codesCol(vec: Column, cbs: Codebooks): Column =
    call_function("graft_pq_assign", vec, cbLit3(cbs))

  /** Train the per-subspace codebooks: deterministic seed (the `ks`
    * lowest-id vectors' sub-vectors) refined by `iters` Lloyd rounds
    * with integer-micro means; an emptied codeword keeps its previous
    * centroid. Only m·ks·subDim cells reach the driver per round.
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, ks: Int, iters: Int): Codebooks =
    trainCodebooksMany(corpus, idCol, vecCol, dim, Seq((m, ks)), iters).head

  /** Train SEVERAL codebook configurations over one corpus in ONE pass
    * per Lloyd round (guide §5 driver round-trips / §1.2): the IVF-PQ
    * composite trains a coarse (m=1) and a fine (m=8) quantizer back to
    * back over the SAME vectors — sequentially that is two seed
    * collects plus two full assignment passes per round. Here the seed
    * rows are collected once (each config reads its first `ks`) and
    * each round launches one combined job whose exploded rows carry a
    * `which` tag per config; `(which, sub, cid, pos)` cell sums are
    * exact integer arithmetic, order-free, so every config's cells —
    * and therefore its codebooks — are bit-identical to the sequential
    * [[trainCodebooks]] result (PqSpec pins it).
    */
  def trainCodebooksMany(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, specs: Seq[(Int, Int)], iters: Int): Seq[Codebooks] = {
    specs.foreach { case (m, _) =>
      require(dim % m == 0, s"trainCodebooks: dim=$dim not divisible by m=$m") }
    val maxKs = specs.map(_._2).max
    val c0 = corpus.select(col(idCol).as("cid_"), col(vecCol).as("v"),
      microVec(col(vecCol)).as("mv"))
    val seedRows = c0.orderBy(col("cid_")).limit(maxKs).select(col("mv")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(seedRows.length == maxKs, s"trainCodebooks: corpus smaller than ks=$maxKs")
    val cbss: Array[Codebooks] = specs.toArray.map { case (m, ks) =>
      val sd = dim / m
      Array.tabulate(m, ks) { (s, c) => seedRows(c).slice(s * sd, s * sd + sd) }
    }
    for (_ <- 1 to iters) {
      val assigned = c0.select(
        specs.indices.map(w => codesCol(col("v"), cbss(w)).as(s"codes$w")) :+
          posexplode(col("mv")).as(Seq("pos", "x")): _*)
      val tagged = assigned.select(explode(array(specs.zipWithIndex.map { case ((m, _), w) =>
        val sd = dim / m
        struct(lit(w).as("which"),
          (col("pos") / sd).cast("int").as("sub"),
          element_at(col(s"codes$w"), (col("pos") / sd).cast("int") + 1).as("cid"),
          col("pos").as("pos"), col("x").as("x"))
      }: _*)).as("r")).select(col("r.*"))
      // integer-micro mean per codebook cell: floor(Σ/n + 0.5) — one
      // IEEE division + floor, the portable rounding every oracle can
      // replay. Σ(m·ks·subDim) cells reach the driver, never the corpus.
      val cells = tagged.groupBy(col("which"), col("sub"), col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)),
          math.floor(r.getLong(4).toDouble / r.getLong(5) + 0.5).toLong))
        .toMap
      specs.zipWithIndex.foreach { case ((m, ks), w) =>
        val sd = dim / m
        cbss(w) = Array.tabulate(m, ks) { (s, c) =>
          // a cell present at one position is present at all sd of them
          if (cells.contains((w, s, c, s * sd)))
            Array.tabulate(sd)(p => cells((w, s, c, s * sd + p)))
          else cbss(w)(s)(c) // emptied codeword keeps its previous centroid
        }
      }
    }
    cbss.toSeq
  }

  /** Encode: (corpus_id, codes array<int>). Shuffle-free projection. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, cbs: Codebooks): DataFrame =
    corpus.select(col(idCol).as("corpus_id"), codesCol(col(vecCol), cbs).as("codes"))

  /** ADC distance of a raw query vector against a codes column under
    * `cbs` — exact DECIMAL(38,0) via the native [[graft.plans.PqAdc]]
    * kernel (128-bit long accumulation, one Decimal per row).
    */
  def adcD2(codes: Column, qvec: Column, cbs: Codebooks): Column =
    call_function("graft_pq_adc", codes, qvec, cbLit3(cbs))

  /** Exact micro-L2 between two raw vectors ([[graft.plans.MicroL2]]) —
    * the refine distance and the exact-search baseline.
    */
  def microL2(a: Column, b: Column): Column =
    call_function("graft_micro_l2", a, b)

  /** PQ-ADC top-k: train, encode, search in one call (the one-shot
    * oracled path). Output: (query_id, rank, corpus_id, adc_d2) with
    * adc_d2 in exact micro² units; rank tie-break (d2 ASC, id ASC).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, m: Int = 8, ks: Int = 16, iters: Int = 1): DataFrame = {
    val cbs = trainCodebooks(corpus, idCol, vecCol, dim, m, ks, iters)
    adcTopKFromIndex(encode(corpus, idCol, vecCol, cbs), cbs, queries, idCol, vecCol, k)
  }

  /** Search a prebuilt codes table (typically read back from parquet —
    * see [[buildIndex]]): the corpus-sized operand is codes-only.
    */
  def adcTopKFromIndex(codes: DataFrame, cbs: Codebooks, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = codes.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("adc_d2", adcD2(col("codes"), col("qv"), cbs))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("corpus_id"), col("adc_d2").cast("double").as("adc_d2"))
  }

  /** ADC-then-refine top-k (the FAISS `IndexRefineFlat` shape): ADC
    * ranks the whole corpus on codes alone, the top `rerank`
    * candidates re-join their exact vectors by id and re-rank under
    * exact integer micro-L2. This is how PQ is actually deployed — the
    * 32×-compressed scan prunes the corpus, the expensive exact
    * distance touches only `rerank·|queries|` rows. The vector
    * re-join is a pinned shuffle_hash on id (the vector table is the
    * big side by definition — never broadcast). Output: (query_id,
    * rank, corpus_id, d2) with d2 the EXACT micro² distance.
    */
  def adcTopKRefined(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, dim: Int, m: Int = 8, ks: Int = 16, iters: Int = 1,
                     rerank: Int = 50): DataFrame = {
    val cbs = trainCodebooks(corpus, idCol, vecCol, dim, m, ks, iters)
    val cands = adcTopKFromIndex(encode(corpus, idCol, vecCol, cbs), cbs,
      queries, idCol, vecCol, rerank)
      .select(col("query_id"), col("corpus_id"))
    val exact = cands
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
        .hint("shuffle_hash"), Seq("corpus_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .withColumn("d2", microL2(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("corpus_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("corpus_id"), col("d2").cast("double").as("d2"))
  }

  /** The query-side coarse probe: ids of the `nProbe` nearest coarse
    * centroids (exact decimal d2, ties on centroid id). Interpreted
    * HOF arithmetic is fine HERE — it runs on the handful of query
    * rows, never the corpus.
    */
  private def coarseProbe(qv: Column, coarse: Codebooks, nProbe: Int): Column = {
    val mv = microVec(qv)
    val scored = sort_array(transform(element_at(cbLit3(coarse), 1), (cw, i) =>
      struct(aggregate(zip_with(mv, cw, (x, y) => (x - y).cast("decimal(38,0)") * (x - y)),
        lit(0).cast("decimal(38,0)"), (a, e) => a + e), i)
        .cast("struct<d2:decimal(38,0),cid:int>")), asc = true)
    slice(transform(scored, s => s.getField("cid")), 1, nProbe)
  }

  /** IVF-PQ composite (the FAISS `IVF{nLists},PQ{m}` index with
    * `by_residual = false`): a coarse integer k-means — this module's
    * own train loop with m = 1, so the WHOLE coarse quantizer shares
    * the PQ arithmetic and its exactness — partitions the corpus into
    * inverted lists; within the `nProbe` probed lists, search runs on
    * PQ codes alone via the native ADC kernel. The two quantization
    * levels compose the two scale levers: lists bound how much of the
    * corpus a query touches, codes bound the bytes per touched row.
    * Every distance is exact integer arithmetic end to end, so the
    * composite hash-oracles like its parts.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, dim: Int, nLists: Int = 16, nProbe: Int = 4,
                m: Int = 8, ks: Int = 16, iters: Int = 1): DataFrame = {
    // coarse + fine trained in ONE pass per round (trainCodebooksMany):
    // one seed collect and one Lloyd job per round instead of two each
    val Seq(coarse, fine) = trainCodebooksMany(corpus, idCol, vecCol, dim,
      Seq((1, nLists), (m, ks)), iters)
    ivfPqSearch(ivfPqAssign(corpus, idCol, vecCol, coarse, fine),
      coarse, fine, queries, idCol, vecCol, k, nProbe)
  }

  /** The stored IVF-PQ row shape: (corpus_id, lid, codes). */
  private def ivfPqAssign(corpus: DataFrame, idCol: String, vecCol: String,
                          coarse: Codebooks, fine: Codebooks): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
      element_at(codesCol(col(vecCol), coarse), 1).as("lid"),
      codesCol(col(vecCol), fine).as("codes"))

  /** The shared probe tail: queries pick their `nProbe` lists, ADC
    * scores the probed codes, per-query window cuts the top-k. One
    * broadcast of the (tiny) probe table; the codes never move.
    */
  private def ivfPqSearch(indexed: DataFrame, coarse: Codebooks, fine: Codebooks,
                          queries: DataFrame, idCol: String, vecCol: String,
                          k: Int, nProbe: Int): DataFrame = {
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(coarseProbe(col(vecCol), coarse, nProbe)).as("lid"))
    val scored = indexed.join(broadcast(probes), Seq("lid"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("adc_d2", adcD2(col("codes"), col("qv"), fine))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("corpus_id"), col("adc_d2").cast("double").as("adc_d2"))
  }

  /** Corpus DOMAIN DISCOVERY: exact integer k-means (this module's
    * coarse-quantizer train loop at m = 1, so determinism and
    * exactness carry over) across the full vectors, reporting each
    * cluster's membership count, corpus share (half-open integer
    * micros), and inertia (Σ exact integer d2 to the assigned
    * centroid) — the statistics a mixture balancer (DoReMi-style
    * domain weighting, cluster-proportional sampling) consumes.
    * Scale shape: train moves k·dim cells per round; the stats pass is
    * one assignment projection + a k-row aggregate.
    */
  def kmeansClusterStats(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, k: Int, iters: Int = 1): DataFrame = {
    val cbs = trainCodebooks(corpus, idCol, vecCol, dim, 1, k, iters)
    val assigned = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("codes", codesCol(col("v"), cbs))
      .withColumn("cluster_id", element_at(col("codes"), 1))
      .withColumn("d2", adcD2(col("codes"), col("v"), cbs))
    val stats = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2")).as("inertia_raw"))
    stats.join(broadcast(stats.agg(sum(col("n_vecs")).as("total"))))
      .select(col("cluster_id").cast("int").as("cluster_id"), col("n_vecs"),
        expr("n_vecs * 1000000 div total").as("share_micros"),
        col("inertia_raw").cast("double").as("inertia"))
  }

  /** Persist the FULL IVF-PQ structure — the deployed ANN shape is
    * search-over-stored-index, not train-per-query. Codes land
    * PARTITIONED BY list id (the on-disk inverted file: one directory
    * per coarse list), coarse and fine codebooks as tiny parquet
    * tables beside them. At probe time the broadcast (query, lid)
    * table joins on the partition column, so Spark's dynamic partition
    * pruning reads ONLY the `nProbe · |queries|` probed list
    * directories — the 100 TB path never scans the other
    * `nLists − nProbe` lists at all.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
                      dim: Int, nLists: Int = 16, m: Int = 8, ks: Int = 16,
                      iters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val Seq(coarse, fine) = trainCodebooksMany(corpus, idCol, vecCol, dim,
      Seq((1, nLists), (m, ks)), iters)
    ivfPqAssign(corpus, idCol, vecCol, coarse, fine)
      .write.mode("overwrite").partitionBy("lid").parquet(s"$dir/codes")
    writeCodebooks(spark, coarse, s"$dir/coarse")
    writeCodebooks(spark, fine, s"$dir/fine")
  }

  /** Continual-ingest append (the FAISS `add()` contract): encode NEW
    * vectors with the STORED codebooks — no retrain — and append their
    * codes into the partitioned layout. Probes see old + new rows with
    * zero index rebuild; the append touches only the new batch (encode
    * is a per-row projection, the write lands in the lists the batch
    * hits). Re-training on codebook drift is a policy decision above
    * this call, exactly as in deployed FAISS indexes.
    */
  def appendToIvfPqIndex(newVecs: DataFrame, idCol: String, vecCol: String,
                         dir: String, dim: Int, nLists: Int = 16,
                         m: Int = 8, ks: Int = 16): Unit = {
    val spark = newVecs.sparkSession
    val coarse = readCodebooks(spark, s"$dir/coarse", 1, nLists, dim)
    val fine = readCodebooks(spark, s"$dir/fine", m, ks, dim / m)
    ivfPqAssign(newVecs, idCol, vecCol, coarse, fine)
      .write.mode("append").partitionBy("lid").parquet(s"$dir/codes")
  }

  /** Probe a PERSISTED [[buildIvfPqIndex]] layout read back from disk:
    * identical results to the one-shot [[ivfPqTopK]] (same codebooks,
    * same ADC kernel — parity pinned in PqSpec and the probe shares
    * the one-shot query's hash oracle).
    */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                         queries: DataFrame, idCol: String, vecCol: String,
                         k: Int, dim: Int, nLists: Int = 16, nProbe: Int = 4,
                         m: Int = 8, ks: Int = 16): DataFrame = {
    val indexed = spark.read.parquet(s"$dir/codes")
    val coarse = readCodebooks(spark, s"$dir/coarse", 1, nLists, dim)
    val fine = readCodebooks(spark, s"$dir/fine", m, ks, dim / m)
    ivfPqSearch(indexed, coarse, fine, queries, idCol, vecCol, k, nProbe)
  }

  private def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                             cbs: Codebooks, path: String): Unit = {
    import spark.implicits._
    cbs.indices.flatMap(s => cbs(s).indices.flatMap(c =>
      cbs(s)(c).indices.map(p => (s, c, p, cbs(s)(c)(p)))))
      .toDF("sub", "cid", "pos", "cm")
      .write.mode("overwrite").parquet(path)
  }

  private def readCodebooks(spark: org.apache.spark.sql.SparkSession, path: String,
                            m: Int, ks: Int, sd: Int): Codebooks = {
    val rows = spark.read.parquet(path)
      .select("sub", "cid", "pos", "cm").collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    Array.tabulate(m, ks, sd) { (s, c, p) => rows((s, c, p)) }
  }

  /** Persist the index: codes parquet under dir/codes, codebooks as
    * (sub, cid, pos, cm) rows under dir/codebook. Returns the codes
    * DataFrame.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
                 dim: Int, m: Int = 8, ks: Int = 16, iters: Int = 1): (DataFrame, Codebooks) = {
    val cbs = trainCodebooks(corpus, idCol, vecCol, dim, m, ks, iters)
    val codes = encode(corpus, idCol, vecCol, cbs)
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    writeCodebooks(corpus.sparkSession, cbs, s"$dir/codebook")
    (codes, cbs)
  }

  /** Read codebooks back from the [[buildIndex]] layout. */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession, dir: String,
                    m: Int, ks: Int, sd: Int): Codebooks =
    readCodebooks(spark, s"$dir/codebook", m, ks, sd)
}
