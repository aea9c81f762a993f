package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(3.0f, 4.0f)),
    (2L, Array(-1.0f, 2.0f, -2.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f)),
    (4L, Array(0.1f, -0.00003f, 42.0f, 7.5f))
  ).toDF("vec_id", "embedding")

  test("l2Normalize produces unit vectors; zero vector stays zeros") {
    val out = vecs.select(col("vec_id"),
        VectorFunctions.l2Normalize(col("embedding")).as("nv"))
      .select(col("vec_id"),
        sqrt(aggregate(col("nv"), lit(0.0), (a, x) => a + x * x)).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(out(3L) == 0.0)
    assert(math.abs(out(4L) - 1.0) < 1e-12)
  }

  test("l2Normalize values match the HOF formulation") {
    val native = vecs.select(col("vec_id"), VectorFunctions.l2Normalize(col("embedding")).as("nv"))
    val expected = Map(
      1L -> Seq(0.6, 0.8),
      2L -> Seq(-1.0 / 3, 2.0 / 3, -2.0 / 3))
    native.collect().foreach { r =>
      val id = r.getLong(0)
      expected.get(id).foreach { exp =>
        val got = r.getSeq[Double](1)
        assert(got.zip(exp).forall { case (g, e) => math.abs(g - e) < 1e-9 }, s"vec $id: $got")
      }
    }
  }

  test("quantizeInt8: scale formula, round-trip error bound, zero vector") {
    val rows = vecs.select(col("vec_id"),
        VectorFunctions.quantizeInt8(col("embedding")).as("qs"),
        col("embedding"))
      .collect()
    rows.foreach { r =>
      val qs = r.getStruct(1)
      val scale = qs.getDouble(0)
      val q = qs.getSeq[Byte](1)
      val v = r.getSeq[Float](2)
      if (v.forall(_ == 0f)) assert(scale == 0.0 && q.forall(_ == 0))
      else {
        val maxAbs = v.map(x => math.abs(x.toDouble)).max
        assert(math.abs(scale - 127.0 / maxAbs) < 1e-12)
        assert(q.exists(b => math.abs(b.toInt) == 127), "max element should hit ±127")
        // dequantized error within half a quantization step
        v.zip(q).foreach { case (x, b) =>
          assert(math.abs(b / scale - x.toDouble) <= 0.5 / scale + 1e-12)
        }
      }
    }
  }

  test("quantizeInt8 rounds half away from zero (not Math.round)") {
    // max|x| = 127 -> scale = 1: components map to round(x)
    val d = Seq((1L, Array(127.0f, 2.5f, -2.5f, 0.5f, -0.5f))).toDF("vec_id", "embedding")
    val q = d.select(VectorFunctions.quantizeInt8(col("embedding")).as("qs"))
      .select(col("qs.q")).as[Seq[Byte]].head()
    assert(q == Seq[Byte](127, 3, -3, 1, -1), s"got $q")
  }

  test("expressions survive interpreted (non-codegen) evaluation too") {
    // force the interpreted path: eval() through a filter on a literal-
    // free projection collected via RDD (no WSCG over local relations
    // is not guaranteed, so call the expression directly)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val lit0 = Literal.create(Array(3.0f, 4.0f), ArrayType(FloatType))
    val n = graft.plans.L2Normalize(lit0).eval(null).asInstanceOf[ArrayData]
    assert(math.abs(n.getDouble(0) - 0.6) < 1e-12 && math.abs(n.getDouble(1) - 0.8) < 1e-12)
    val qrow = graft.plans.QuantizeInt8(lit0).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(math.abs(qrow.getDouble(0) - 127.0 / 4.0) < 1e-12)
    val qarr = qrow.getArray(1)
    assert(qarr.getByte(0) == 95 && qarr.getByte(1) == 127) // round(3*31.75)=95.25->95
  }
}
