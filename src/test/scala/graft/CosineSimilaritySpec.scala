package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Native Catalyst expression vs composed higher-order functions: must
  * be bit-identical (both are sequential double accumulation), usable
  * from SQL, and correct against a Scala-computed value.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("native == HOF bitwise over the embeddings corpus") {
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val both = a.join(b, col("ia") < col("ib")).limit(2000)
      .select(
        VectorFunctions.cosine(col("va"), col("vb")).as("hof"),
        VectorFunctions.cosineNative(col("va"), col("vb")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(both.count() == 0)
  }

  test("registered in SQL as graft_cosine") {
    val r = spark.sql("SELECT graft_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("matches a hand-computed value on doubles") {
    val r = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").as[Double].head()
    assert(r == 0.0)
    val r2 = spark.sql("SELECT graft_cosine(array(float(1.0), float(2.0)), array(float(2.0), float(4.0))) AS c")
      .as[Double].head()
    assert(math.abs(r2 - 1.0) < 1e-12)
  }

  test("cosine(0, x) = 0 in both the native and declarative forms (never NaN)") {
    import spark.implicits._
    // Spark compares NaN as GREATER than everything, so a NaN cosine
    // would pass every threshold and take rank 1 of every top-k — the
    // zero vector must read as similarity 0 instead
    val rows = Seq(
      (1L, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
      (2L, Seq(1f, 2f, 3f), Seq(0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 0f), Seq(0f, 0f, 0f))
    ).toDF("id", "a", "b")
    val out = rows.select(col("id"),
        VectorFunctions.cosineNative(col("a"), col("b")).as("cn"),
        VectorFunctions.cosine(col("a"), col("b")).as("cd"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.forall { case (_, cn, cd) => cn == 0.0 && cd == 0.0 }, out.toSeq.toString)
  }

  test("codegen path evaluates (no interpreted fallback errors) at scale") {
    // force a plan that runs the expression across the whole corpus
    val s = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(3))
      .select(VectorFunctions.cosineNative(col("embedding"), col("e2")).as("c"))
      .agg(sum("c")).head().getDouble(0)
    assert(!s.isNaN)
  }
}
