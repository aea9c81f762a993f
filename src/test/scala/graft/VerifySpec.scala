package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The driver-contract dump: success writes parquet; a throwing query
  * leaves an `_ERROR` marker (VERDICT r5 minor 2 — a thrown query must
  * be distinguishable from a never-declared one in the driver's
  * artifact).
  */
class VerifySpec extends SparkSpec {

  test("runOne dumps a good query and marks a broken one with _ERROR") {
    val out = graft.TempDirs.scratch("graft-verify")
    val ok = Verify.runOne(spark, sf, out, "good",
      (s, dir) => Tables.load(s, dir, "nation").select(col("n_nationkey")))
    assert(ok)
    assert(spark.read.parquet(s"$out/good").count() == 25)
    assert(!Files.exists(Paths.get(out, "good", "_ERROR")))

    val bad = Verify.runOne(spark, sf, out, "broken",
      (_, _) => throw new IllegalStateException("forced failure"))
    assert(!bad)
    val marker = Paths.get(out, "broken", "_ERROR")
    assert(Files.exists(marker))
    val txt = Files.readString(marker)
    assert(txt.contains("IllegalStateException") && txt.contains("forced failure"))
  }

  test("a regression wipes the previous run's parquet — no stale pass") {
    val out = graft.TempDirs.scratch("graft-verify")
    assert(Verify.runOne(spark, sf, out, "q",
      (s, dir) => Tables.load(s, dir, "region").select(col("r_regionkey"))))
    assert(spark.read.parquet(s"$out/q").count() == 5)
    // same name now throws: the old part files must NOT survive beside
    // _ERROR, or the gate would grade run 1's results and pass
    assert(!Verify.runOne(spark, sf, out, "q",
      (_, _) => throw new RuntimeException("regressed")))
    val dir = new java.io.File(s"$out/q")
    assert(dir.listFiles().map(_.getName).toSet == Set("_ERROR"))
  }
}
