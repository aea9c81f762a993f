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

  test("codegen path evaluates (no interpreted fallback errors) at scale") {
    // force a plan that runs the expression across the whole corpus
    val s = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(3))
      .select(VectorFunctions.cosineNative(col("embedding"), col("e2")).as("c"))
      .agg(sum("c")).head().getDouble(0)
    assert(!s.isNaN)
  }
}
