package graft

/** Contract smoke: entry returns rows; every declared query executes at
  * sf0.001; every oracle key has a query.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // must not throw
    }
  }

  test("funnel is strictly sequential: out-of-order steps do not convert") {
    import org.apache.spark.sql.functions._
    // fixture-independent check of the q10 shape: a user whose click
    // PRECEDES their first view must not count as click-converted
    val out = SparkEntry.queries("q10_funnel")(spark, sf)
      .filter(col("t_click").isNotNull)
      .select("t_view", "t_click").collect()
    assert(out.forall(r => r.getLong(1) > r.getLong(0)),
      "every converted click must be strictly after the first view")
    val p = SparkEntry.queries("q10_funnel")(spark, sf)
      .filter(col("t_purchase").isNotNull)
      .select("t_click", "t_purchase").collect()
    assert(p.forall(r => r.getLong(1) > r.getLong(0)))
  }

  test("json props extraction: malformed/missing/null all yield null k (oracle parity)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    // the oracle's CAST(props::JSON ->> 'k' AS BIGINT) nulls on every
    // non-conforming row; from_json must agree case-for-case
    val rows = Seq((1L, """{"k": 42}"""), (2L, """{"other": 1}"""),
      (3L, "not json"), (4L, null.asInstanceOf[String]), (5L, """{"k": null}"""))
      .toDF("id", "props")
    val kSchema = StructType(Seq(StructField("k", IntegerType)))
    val got = rows.withColumn("k", from_json(col("props"), kSchema).getField("k"))
      .select("id", "k").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1L -> Some(42), 2L -> None, 3L -> None, 4L -> None, 5L -> None))
  }

  test("pipeline_replicate: handoff state == straight replay; F10 overlap exercised") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("pipeline_replicate")(spark, sf).cache()
    // the snapshot ∪ incremental upsert must lose nothing and duplicate
    // nothing vs applying the whole filtered history in one pass
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type") =!= "click")
      .withColumn("op",
        when(col("event_type") === "error", "d")
          .when(col("event_type") === "signup", "i").otherwise("u"))
    val replay = graft.operators.CdcBatch
      .applyChangeLog(ev, "user_id", "event_id", "op")
      .select(col("user_id").as("uid"), col("event_id").as("last_seq"),
        col("event_type").as("last_type"), col("value").as("val"))
    val got = out.select("uid", "last_seq", "last_type", "val")
    assert(got.exceptAll(replay).isEmpty && replay.exceptAll(got).isEmpty)
    // the restart overlap must be non-empty (otherwise the idempotence
    // stage was never tested) and every live row's ledger must only
    // contain post-cutoff ids
    val cutoff = Tables.load(spark, sf, "events")
      .agg(max(col("event_id"))).head().getLong(0) / 2
    assert(out.agg(sum(col("n_replayed"))).head().getLong(0) > 0)
    val sets = out.select("applied_set").collect().map(_.getString(0)).filter(_.nonEmpty)
    assert(sets.nonEmpty)
    sets.foreach { s =>
      val los = s.split(':').map(_.split('-')(0).toLong)
      assert(los.forall(_ > cutoff), s"pre-cutoff id leaked into ledger: $s")
    }
    out.unpersist()
  }
}
