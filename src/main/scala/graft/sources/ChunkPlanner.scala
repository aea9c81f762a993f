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
    * only ~`sampleTarget` sampled key tuples reach the driver, sorted
    * there, quantiles become the boundaries. (The tempting alternative —
    * `ntile` over a global `Window.orderBy` — funnels EVERY row through
    * one partition: a straggler at any real scale.) Boundary placement
    * only affects chunk balance, never coverage: any increasing boundary
    * sequence yields a loss-free, dup-free partition of the key space
    * (the contract `s3_keyset_chunks` verifies).
    */
  def boundaries(df: DataFrame, keyCols: Seq[String], numChunks: Int,
                 sampleTarget: Int = 100000): Seq[Seq[Any]] = {
    val keys = df.select(keyCols.map(col): _*)
    val n = keys.count()
    if (n == 0 || numChunks <= 1) return Nil
    val m = math.max(1L, n / sampleTarget)
    val sampled = keys
      .filter(pmod(xxhash64(keyCols.map(col): _*), lit(m)) === 0)
      .collect()
      .map(r => keyCols.indices.map(r.get))
    val ord = new Ordering[Seq[Any]] {
      def compare(a: Seq[Any], b: Seq[Any]): Int = {
        a.zip(b).foreach { case (x, y) =>
          val c = x.asInstanceOf[Comparable[Any]].compareTo(y)
          if (c != 0) return c
        }
        0
      }
    }
    val sorted = sampled.sorted(ord)
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
    val first = lessOrEqual(keyCols, bs.head)
    val mids = bs.sliding(2).collect { case Seq(lo, hi) =>
      s"${greaterThan(keyCols, lo)} AND ${lessOrEqual(keyCols, hi)}"
    }.toSeq
    // final open range above the last boundary (also catches late inserts)
    val last = greaterThan(keyCols, bs.last)
    (first +: mids) :+ last
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
