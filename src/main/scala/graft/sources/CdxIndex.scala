package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl's master URL index: CDX rows (from
  * [[WarcIo.writeWarcWithCdx]] sidecars via [[WarcIo.readCdxj]], or any
  * external CDX source) compacted into ONE globally range-sorted table
  * keyed by SURT — the web-archive layout (Common Crawl's
  * `cc-index`: sorted cdx-NNNNN shards + a `cluster.idx` that maps key
  * ranges to shards) re-expressed on parquet.
  *
  * Layout written by [[buildTable]] under `dir`:
  *   - `<dir>/cdx/` — the index rows, RANGE-partitioned by (surt, ts)
  *     and sorted within each shard, so one host's (and one domain's)
  *     captures are contiguous in ONE shard run;
  *   - `<dir>/cluster/` — the cluster.idx analog: per shard FILE its
  *     [first,last] SURT key and row count. Tiny (one row per shard),
  *     read whole.
  *
  * Scale shape: a lookup ([[lookupPrefix]] / [[lookupRange]]) reads the
  * cluster table (shard-count rows), picks the shard files whose key
  * range intersects, and scans ONLY those — at Common Crawl scale
  * (3×10⁹ captures, 300 shards) a host query touches 1–2 shards, and
  * inside each shard parquet row-group stats on the sorted `surt`
  * column prune further. Nothing index-sized is ever collected; the
  * only driver materialization is the shard-file list (≤ nShards
  * strings). Queries needing the reverse direction (url → archive
  * bytes) get (`filename`, `offset`, `length`) for a single ranged
  * read, which is the point of a CDX: fetch ONE page from a 100 TB
  * archive without scanning it.
  */
object CdxIndex {

  /** Write the sorted master index. `cdx` must carry at least
    * (surt, ts); all columns are kept. Range partitioning samples the
    * key distribution, so shard boundaries follow the data (a heavily
    * crawled domain spreads over several shards instead of hot-spotting
    * one writer).
    *
    * The whole table (shards + cluster) builds under `<dir>__staging`
    * and promotes by directory rename — a plain two-write overwrite
    * would leave a half-rebuilt table on disk (cdx shards live,
    * cluster missing or stale) for a crash OR for any reader starting
    * mid-write. The swap's contract is crash-safety (the previous
    * table parks at `<dir>__parked`, the CrawlFrontier.compactIndex
    * convention) and consistency for lookups STARTING after the swap;
    * a lookup in flight ACROSS a rebuild (cluster consulted before,
    * shards read after) fails loudly on the renamed-away files — same
    * single-writer/no-concurrent-probe discipline the frontier
    * documents, not silent wrong answers. The cluster stores shard
    * files by BASENAME, not absolute path, so the table survives the
    * promote rename (and any later relocation of the index dir).
    */
  def buildTable(cdx: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards > 0, "nShards must be positive")
    val spark = cdx.sparkSession
    val staging = s"${dir}__staging"
    val hconf = spark.sessionState.newHadoopConf()
    val livePath = new org.apache.hadoop.fs.Path(dir)
    val fs = livePath.getFileSystem(hconf)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    cdx.repartitionByRange(nShards, col("surt"), col("ts"))
      .sortWithinPartitions(col("surt"), col("ts"))
      .write.mode("overwrite").parquet(s"$staging/cdx")
    // cluster.idx analog: one column-pruned pass over the shards just
    // written (reads only `surt`), grouped by physical file basename
    spark.read.parquet(s"$staging/cdx")
      .groupBy(substring_index(input_file_name(), "/", -1).as("file"))
      .agg(min(col("surt")).as("lo"), max(col("surt")).as("hi"),
        count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/cluster")
    if (fs.exists(livePath))
      graft.operators.CrawlFrontier.swapDir(spark, staging, dir, s"${dir}__parked")
    else {
      val parent = livePath.getParent
      if (parent != null) fs.mkdirs(parent)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), livePath),
        s"CdxIndex: could not promote $staging to $dir")
    }
  }

  /** The shard files whose [lo,hi] key range intersects ANY of the
    * requested [from,to) ranges — the cluster.idx consultation, ONE
    * pass for however many ranges the caller needs ([[lookupDomain]]
    * probes three). Bounded: one row per shard file. Basenames resolve
    * against the CURRENT table dir.
    */
  private def shardFiles(spark: SparkSession, dir: String,
      ranges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/cluster")
      .filter(ranges.map { case (from, to) => col("hi") >= from && col("lo") < to }
        .reduce(_ || _))
      .select(col("file")).as[String].collect().toSeq.distinct.sorted
      // basename rows resolve against the CURRENT table dir; a row
      // carrying a full URI (a table written by an older build that
      // stored absolute input_file_name()s) passes through as-is
      .map(name => if (name.contains("/")) name else s"$dir/cdx/$name")
  }

  /** All index rows whose `surt` falls in any of the half-open
    * `ranges`, scanning only the shards the cluster table says can
    * hold them — ONE cluster read and ONE pruned scan regardless of
    * how many ranges are probed.
    */
  def lookupRanges(spark: SparkSession, dir: String,
      ranges: Seq[(String, String)]): DataFrame = {
    require(ranges.nonEmpty, "lookupRanges needs at least one range")
    val files = shardFiles(spark, dir, ranges)
    if (files.isEmpty)
      spark.read.parquet(s"$dir/cdx").limit(0)
    else
      spark.read.parquet(files: _*)
        .filter(ranges.map { case (from, to) => col("surt") >= from && col("surt") < to }
          .reduce(_ || _))
  }

  /** All index rows with `from <= surt < to`, scanning only the shards
    * the cluster table says can hold them.
    */
  def lookupRange(spark: SparkSession, dir: String, from: String, to: String): DataFrame =
    lookupRanges(spark, dir, Seq((from, to)))

  /** All captures under a raw SURT STRING prefix — `"com,example)"` is
    * exactly one host (the `)` terminator excludes `com,examplez`).
    * Implemented as [[lookupRange]] over [prefix, prefix+U+10FFFF).
    * For registrable-DOMAIN semantics use [[lookupDomain]]: a bare
    * `"com,example"` here is a string prefix and would also match the
    * sibling domains `examples.com`, `examplefoo.com`, ….
    */
  def lookupPrefix(spark: SparkSession, dir: String, prefix: String): DataFrame =
    lookupRange(spark, dir, prefix, prefix + new String(Character.toChars(0x10FFFF)))

  /** All captures of a registrable domain AND its subdomains —
    * `lookupDomain(_, _, "com,example")` matches `com,example)…`
    * (apex), `com,example:8080)…` (apex with port) and
    * `com,example,sub)…` (subdomains) but NOT `com,examples)…`: after
    * the domain's reversed labels only `)`/`:`/`,` can follow, so the
    * domain is the union of those three narrow key ranges (digits sort
    * between `,` and `:`, so one wide range would swallow
    * `example2.com`). The three ranges prune in ONE cluster pass and
    * scan ONE union of pruned files ([[lookupRanges]]) — not three
    * separate cluster reads and scans.
    */
  def lookupDomain(spark: SparkSession, dir: String, reversedDomain: String): DataFrame = {
    require(!reversedDomain.endsWith(")") && !reversedDomain.endsWith(","),
      s"lookupDomain takes the bare reversed domain (e.g. \"com,example\"), got '$reversedDomain'")
    val hi = new String(Character.toChars(0x10FFFF))
    lookupRanges(spark, dir,
      Seq(")", ":", ",").map(sep =>
        (reversedDomain + sep, reversedDomain + sep + hi)))
  }

  /** All captures of ONE URL — the convenience spelling of
    * [[lookupPrefix]] for callers who think in URLs, not SURT keys:
    * the url canonicalizes through the same [[graft.functions.UrlOps
    * .surtKey]] the index was built with, so any spelling variant
    * (case, default port, tracking params, param order, www) resolves
    * to the same capture run. Scheme-different fetches collide by
    * design (the CDX canonicalization contract).
    */
  def lookupUrl(spark: SparkSession, dir: String, url: String): DataFrame = {
    // EXACT key match, not a prefix — the key of /p/1 must not also
    // return /p/10: the half-open range [key, key+NUL) admits the key
    // alone — no key contains a NUL (0x00 never survives surtKey's
    // percent-encoding), so every strict extension sorts above the bound
    val key = graft.functions.UrlOps.surtKey(url)
    lookupRange(spark, dir, key, key + "\u0000")
  }

  /** Merge per-crawl indexes into one re-sorted master table — the
    * cross-crawl view (one index per crawl is the publication unit;
    * history queries span them). Plain union + [[buildTable]]: the
    * range partitioner re-samples the combined key distribution, so
    * shard boundaries follow the merged data.
    */
  def mergeTables(spark: SparkSession, dirs: Seq[String], out: String, nShards: Int): Unit = {
    require(dirs.nonEmpty, "mergeTables needs at least one source index")
    buildTable(dirs.map(d => spark.read.parquet(s"$d/cdx")).reduce(_ unionByName _),
      out, nShards)
  }

  /** Per-URL change statistics across captures — the adaptive-revisit
    * signal (Heritrix-style: pages observed to change re-crawl sooner).
    * For each SURT key: capture count, distinct content versions
    * (payload digests), first/last fetch time, and `change_rate` =
    * (versions-1)/(captures-1) — 0.0 for never-changed, 1.0 for
    * changed-every-visit, defined 0.0 at a single capture.
    *
    * Shape: TWO hash aggregations, both with map-side partial merge —
    * (surt, digest) collapses repeat captures of one version, then
    * (surt) counts the versions. Deliberately NOT `countDistinct` +
    * string min/max in one agg: a distinct over var-length buffers
    * plans as a single partial-less SortAggregate, shuffling every
    * index row unreduced (PlanQualitySpec pins the hash-agg form).
    * Fetch times aggregate as the ts14 NUMBER (fixed-width buffer)
    * and format back on output. No window, no collect — the output is
    * frontier-priority input at any crawl size. Callers wanting a
    * representative capture per key join the index back on `surt`.
    *
    * External-index hygiene (readCdxj ingests files OTHER tools
    * wrote): a capture with a NULL digest counts toward `n_captures`
    * but never toward `n_versions` (the `countDistinct` null rule —
    * an unknown content hash is not evidence of change, and counting
    * it would schedule needless re-crawls); a non-numeric `ts` fails
    * LOUDLY per row rather than silently nulling the fetch-time span.
    */
  def changeStats(cdx: DataFrame): DataFrame =
    cdx.select(col("surt"), col("digest"),
        when(col("ts").cast("long").isNotNull, col("ts").cast("long"))
          .otherwise(raise_error(concat(lit("changeStats: ts14 expected, got '"),
            coalesce(col("ts"), lit("NULL")), lit("'"))).cast("long")).as("tsl"))
      .groupBy(col("surt"), col("digest"))
      .agg(count(lit(1)).as("n"), min(col("tsl")).as("f"), max(col("tsl")).as("l"))
      .groupBy(col("surt"))
      .agg(sum(col("n")).as("n_captures"), count(col("digest")).as("n_versions"),
        min(col("f")).as("f"), max(col("l")).as("l"))
      .select(col("surt"), col("n_captures"), col("n_versions"),
        lpad(col("f").cast("string"), 14, "0").as("first_ts"),
        lpad(col("l").cast("string"), 14, "0").as("last_ts"),
        when(col("n_captures") > 1,
          greatest(col("n_versions") - 1, lit(0L)).cast("double") / (col("n_captures") - 1))
          .otherwise(lit(0.0)).as("change_rate"))

  /** The cc-index-table shape: CDX rows widened with the typed URL
    * columns a columnar query engine filters on (host, eTLD+1 via the
    * embedded PSL, TLD, path) — so "all .org captures from domain X
    * with status 200" is a parquet predicate-pushdown scan, no SURT
    * string games. Column names follow the public cc-index-table
    * convention (`url_surtkey`, `url_host_name`, …) so queries written
    * against Common Crawl's index port over.
    */
  def toColumnar(cdx: DataFrame): DataFrame = {
    val host = call_function("graft_url_host", col("url"))
    cdx.select(
      col("surt").as("url_surtkey"),
      col("url"),
      host.as("url_host_name"),
      element_at(split(host, "\\."), -1).as("url_host_tld"),
      call_function("graft_url_domain", host).as("url_host_registered_domain"),
      // (?i): external CDX rows keep the original URL spelling —
      // 'HTTP://host/path' must still yield its path
      regexp_extract(col("url"), "(?i)^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1).as("url_path"),
      col("ts").as("fetch_time"),
      col("status").as("fetch_status"),
      col("mime").as("content_mime_type"),
      col("digest").as("content_digest"),
      col("filename").as("warc_filename"),
      col("offset").as("warc_record_offset"),
      col("length").as("warc_record_length"))
  }
}
