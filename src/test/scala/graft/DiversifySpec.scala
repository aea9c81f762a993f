package graft

import org.apache.spark.sql.functions._
import graft.operators.sim.Diversify

class DiversifySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = {
    val base = xs.map(_.toFloat)
    base ++ Seq.fill(64 - base.length)(0.0f)
  }

  test("mmr swaps a redundant near-dup for a diverse candidate") {
    // query 0 at origin; 1 and 2 are near-identical close points;
    // 3 is slightly farther but in a different direction
    val emb = Seq(
      (0L, vec(0.0)),
      (1L, vec(1.0, 0.0)),
      (2L, vec(1.01, 0.0)),
      (3L, vec(0.0, 1.2)),
      (4L, vec(9.0, 9.0))).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    val plain = Seq(1L, 2L) // nearest two by L2
    val got = Diversify.mmrTopK(emb, q, "vec_id", "embedding", k = 2, pool = 4)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got.head == 1L, "rank 1 must be the plain nearest")
    assert(got(1) == 3L, s"rank 2 must diversify away from the near-dup, got $got (plain would be $plain)")
  }

  test("rank order is the greedy selection order; ids unique; subset of pool") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = Diversify.mmrTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, pool = 20).cache()
    val perQ = got.groupBy("query_id").agg(count(lit(1)).as("n"),
      countDistinct(col("corpus_id")).as("nd")).collect()
    assert(perQ.forall(r => r.getLong(1) == 5 && r.getLong(2) == 5))
    assert(got.filter(col("query_id") === col("corpus_id")).count() == 0)
    // deterministic
    val again = Diversify.mmrTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, pool = 20)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    got.unpersist()
  }
}
