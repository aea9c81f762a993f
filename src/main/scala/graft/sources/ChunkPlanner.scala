package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3/S4 — keyset-pagination chunk planning (reference
  * `driver/mysql/dumper.go:106-156` buildQueryOnUniqueKey): the snapshot
  * scan walks a (possibly composite) unique key in order, each chunk
  * bounded by `(A>a) OR (A=a AND B>b) …` from the previous chunk's max.
  *
  * In Spark the same plan becomes the `predicates` array of
  * `spark.read.jdbc(url, table, predicates)` — one keyset-range predicate
  * per partition, so a 1000-executor cluster scans a source table with N
  * parallel, non-overlapping, index-friendly range queries instead of
  * OFFSET scans. Boundary discovery runs distributed (ntile over the key
  * order); only the O(numChunks) boundary rows come back to the driver,
  * never the data.
  */
object ChunkPlanner {

  /** Composite-key row bound: `(a,b) > (x,y)` expanded to
    * `a > x OR (a = x AND b > y)` — exactly the reference's recursive
    * range expansion (`dumper.go:116-143`), as ANSI SQL usable both as a
    * JDBC pushdown predicate and a Catalyst filter.
    */
  def greaterThan(keyCols: Seq[String], bound: Seq[Any]): String = {
    require(keyCols.length == bound.length)
    val terms = keyCols.indices.map { i =>
      val eqs = (0 until i).map(j => s"${keyCols(j)} = ${lit_(bound(j))}")
      val gt  = s"${keyCols(i)} > ${lit_(bound(i))}"
      (eqs :+ gt).mkString("(", " AND ", ")")
    }
    terms.mkString("(", " OR ", ")")
  }

  def lessOrEqual(keyCols: Seq[String], bound: Seq[Any]): String =
    s"NOT ${greaterThan(keyCols, bound)}"

  private def lit_(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case other     => String.valueOf(other)
  }

  /** Discover `numChunks - 1` keyset boundaries for a composite unique
    * key, by deterministic hash sampling — the RangePartitioner pattern:
    * only ~`sampleTarget` sampled key tuples reach the driver, quantiles
    * become the boundaries. (The tempting alternative — `ntile` over a
    * global `Window.orderBy` — funnels EVERY row through one partition: a
    * straggler at any real scale.) Boundary placement only affects chunk
    * balance, never coverage: any increasing boundary sequence yields a
    * loss-free, dup-free partition of the key space (the contract
    * `s3_keyset_chunks` verifies).
    *
    * The sample is sorted BY THE ENGINE (`orderBy` on the key columns),
    * not driver-side `Comparable`, so the boundary sequence is monotone
    * under exactly the comparison semantics the generated predicates are
    * later evaluated with — driver-side UTF-16 code-unit order can
    * disagree with the engine's ordering for strings and would make chunk
    * ranges overlap. Null keys never become boundaries (a `> NULL` range
    * predicate is vacuous); rows with null key columns are swept into the
    * first chunk by [[chunkPredicates]]'s explicit IS NULL arm.
    */
  def boundaries(df: DataFrame, keyCols: Seq[String], numChunks: Int,
                 sampleTarget: Int = 100000): Seq[Seq[Any]] = {
    val keys = df.select(keyCols.map(col): _*)
      .filter(keyCols.map(c => col(c).isNotNull).reduce(_ && _))
    val n = keys.count()
    if (n == 0 || numChunks <= 1) return Nil
    val m = math.max(1L, n / sampleTarget)
    val sorted = keys
      .filter(pmod(xxhash64(keyCols.map(col): _*), lit(m)) === 0)
      .orderBy(keyCols.map(c => col(c).asc): _*)
      .collect()
      .map(r => keyCols.indices.map(r.get))
    if (sorted.isEmpty) return Nil
    (1 until numChunks)
      .map(i => sorted(((i.toLong * sorted.length) / numChunks).toInt.min(sorted.length - 1)))
      .distinct
  }

  /** Full predicate set: N non-overlapping keyset ranges covering the
    * table exactly once (the contract verified by `s3_keyset_chunks`).
    * Use as `spark.read.jdbc(url, table, predicates = chunkPredicates(...)
    * .toArray, props)`.
    */
  def chunkPredicates(df: DataFrame, keyCols: Seq[String], numChunks: Int): Seq[String] = {
    val bs = boundaries(df, keyCols, numChunks)
    if (bs.isEmpty) return Seq("1 = 1")
    // rows with a null key column fail every range predicate under
    // three-valued logic — sweep them into the first chunk explicitly so
    // the chunk set stays a partition even on a nullable unique key
    val nullArm = keyCols.map(c => s"$c IS NULL").mkString(" OR ")
    val first = s"(${lessOrEqual(keyCols, bs.head)}) OR $nullArm"
    val mids = bs.sliding(2).collect { case Seq(lo, hi) =>
      s"${greaterThan(keyCols, lo)} AND ${lessOrEqual(keyCols, hi)}"
    }.toSeq
    // final open range above the last boundary (also catches late inserts)
    val last = greaterThan(keyCols, bs.last)
    (first +: mids) :+ last
  }

  /** S4 — explicit fallback offset scan for tables with NO usable unique
    * key (reference `driver/mysql/dumper.go:95-104`): `LIMIT chunk OFFSET
    * i*chunk` pages, emitted as full chunk queries. This is the honest
    * degradation — on the database side each page re-scans from the top,
    * so it is O(n²/chunk) server work and documented as such; keyset
    * pagination ([[chunkPredicates]]) is always preferred when a key
    * exists. The page set still partitions the table exactly (assuming a
    * stable snapshot scan order, which the reference guarantees by
    * running inside the consistent-snapshot tx — S5).
    */
  def offsetFallbackQueries(table: String, where: Option[String], total: Long,
                            chunkRows: Long): Seq[String] = {
    require(chunkRows > 0, "chunkRows must be positive")
    val w = where.map(x => s" WHERE $x").getOrElse("")
    val nChunks = math.max(1L, (total + chunkRows - 1) / chunkRows)
    (0L until nChunks).map { i =>
      s"SELECT * FROM $table$w LIMIT $chunkRows OFFSET ${i * chunkRows}"
    }
  }

  /** Re-read a table as the union of its chunk scans — the local-test
    * stand-in for the JDBC parallel read (each predicate = one JDBC
    * partition on a real cluster). Verifies the chunk set is a partition
    * of the table (no loss, no dup).
    */
  def chunkedRead(spark: SparkSession, df: DataFrame, keyCols: Seq[String], numChunks: Int): DataFrame = {
    val preds = chunkPredicates(df, keyCols, numChunks)
    preds.map(p => df.filter(expr(p))).reduce(_ union _)
  }
}
