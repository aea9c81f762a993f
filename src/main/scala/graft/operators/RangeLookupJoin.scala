package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval lookup join — enrich each left row with the right
  * interval(s) `[lo, hi)` containing its value (price bands, IP→geo
  * ranges, SCN→redo-log segment, time-slice calendars). Beyond-parity
  * §2.4, same family as [[AsOfJoin]].
  *
  * Catalyst compiles a raw `l.v >= r.lo AND l.v < r.hi` join with no
  * equi-key as BroadcastNestedLoopJoin — fine for a 25-row dimension,
  * quadratic death once the interval table stops fitting in a
  * broadcast. The scale shape here chunks every interval into
  * fixed-width buckets (`explode(sequence(...))`), joins on the bucket
  * as an ordinary equi-key — hash-partitioned, AQE-skewable, broadcast
  * when small — then applies the exact containment predicate. Each
  * (point, interval) pair meets in exactly one bucket (the point's), so
  * no post-join dedup is needed. Work is linear in points plus total
  * interval chunks; pick `width` near the median interval length so a
  * typical interval explodes into O(1) rows.
  */
object RangeLookupJoin {

  /** Inner point-in-interval join; output = left columns ++ right
    * columns (names must not collide). Empty intervals (`lo >= hi`)
    * match nothing, null bounds/values drop (as in the SQL predicate).
    * An interval spanning more than `maxChunksPerInterval` buckets
    * fails the job with a clear error instead of materializing an
    * arbitrarily large chunk array — a single catch-all row
    * (`hi = ∞`, a 0.0.0.0/0 IP range) would otherwise OOM the very
    * join this shape exists to protect; widen `width` or split such
    * rows upstream.
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      valueCol: String, loCol: String, hiCol: String,
                      width: Double, maxChunksPerInterval: Long = 65536L): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(maxChunksPerInterval > 0, "chunk cap must be positive")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val reserved = (left.columns ++ right.columns).filter(_ == "_bucket")
    require(reserved.isEmpty, "input columns collide with the internal _bucket column")

    val w = lit(width)
    // interval [lo, hi) spans buckets floor(lo/w) .. ceil(hi/w)-1
    // (ceil-1, not floor: an exclusive bound landing exactly on a
    // bucket edge must not claim the next bucket)
    val firstB = floor(col(loCol) / w).cast("long")
    val lastRaw = (ceil(col(hiCol) / w) - 1).cast("long")
    val lastB = when(lastRaw - firstB >= maxChunksPerInterval,
        raise_error(concat(lit(s"interval spans more than $maxChunksPerInterval buckets of width $width: ["),
          col(loCol), lit(", "), col(hiCol), lit(") — widen `width` or split the interval")))
          .cast("long"))
      .otherwise(lastRaw)
    val chunked = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) < col(hiCol))
      .withColumn("_bucket", explode(sequence(firstB, lastB)))
    val points = left.filter(col(valueCol).isNotNull)
      .withColumn("_bucket", floor(col(valueCol) / w).cast("long"))
    points.join(chunked, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }

  /** Interval × interval OVERLAP join: pairs whose half-open intervals
    * `[loL, hiL) × [loR, hiR)` intersect (temporal joins: session ×
    * maintenance window, order window × activity burst). Same
    * bucket-chunking idea as [[pointInInterval]], applied to BOTH
    * sides: a pair's intervals co-occupy every bucket of their overlap
    * region, so the raw equi-join on `(bucket, equiKeys)` would emit
    * the pair once per shared bucket — instead of a dedup shuffle, the
    * join keeps a pair only in its CANONICAL bucket, the one holding
    * `max(loL, loR)` (the overlap's left edge, which exists iff the
    * overlap does). Exactly-once by construction, no distinct.
    *
    * `equiKeys` are ordinary join keys present on both sides (e.g. the
    * user id for same-user temporal joins) — they ride the same hash
    * exchange as the bucket, so adding them costs nothing and slashes
    * bucket collisions. All remaining column names must be disjoint.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loL: String, hiL: String, loR: String, hiR: String,
                      width: Double, equiKeys: Seq[String] = Nil,
                      maxChunksPerInterval: Long = 65536L): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val collide = left.columns.toSeq.intersect(right.columns.toSeq).diff(equiKeys)
    require(collide.isEmpty, s"column collision between sides: $collide")
    require(!(left.columns ++ right.columns).contains("_bucket"),
      "input columns collide with the internal _bucket column")

    val w = lit(width)
    def chunk(df: DataFrame, lo: String, hi: String): DataFrame = {
      val firstB = floor(col(lo) / w).cast("long")
      val lastRaw = (ceil(col(hi) / w) - 1).cast("long")
      val lastB = when(lastRaw - firstB >= maxChunksPerInterval,
          raise_error(concat(
            lit(s"interval spans more than $maxChunksPerInterval buckets of width $width: ["),
            col(lo), lit(", "), col(hi), lit(") — widen `width` or split the interval")))
            .cast("long"))
        .otherwise(lastRaw)
      df.filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) < col(hi))
        .withColumn("_bucket", explode(sequence(firstB, lastB)))
    }
    chunk(left, loL, hiL).join(chunk(right, loR, hiR), "_bucket" +: equiKeys)
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL))
      .filter(col("_bucket") === floor(greatest(col(loL), col(loR)) / w).cast("long"))
      .drop("_bucket")
  }
}
