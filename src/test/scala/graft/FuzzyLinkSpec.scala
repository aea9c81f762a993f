package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyLink

class FuzzyLinkSpec extends SparkSpec {
  import spark.implicits._

  private val firstToken: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    n => substring_index(n, " ", 1)

  test("selfPairs: within-block near pairs only, duplicates collapse, nulls drop") {
    val df = Seq(
      "red bolt", "red bolts", "red widget", // bolt~bolts dist 1, widget far
      "red bolt",                            // duplicate value: no self-pair
      "blue bolt",                           // other block: never pairs with red
      null.asInstanceOf[String]
    ).toDF("name")
    val out = FuzzyLink.selfPairs(df, "name", firstToken, maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("red bolt", "red bolts", 1L)))
  }

  test("selfPairs: a block past the cap drops out instead of going quadratic") {
    val hot = (1 to 50).map(i => s"hot name$i").toDF("name")
    assert(FuzzyLink.selfPairs(hot, "name", firstToken, maxDist = 10, maxBlock = 10).isEmpty)
    // under the cap the same block pairs normally
    assert(!FuzzyLink.selfPairs(hot, "name", firstToken, maxDist = 10, maxBlock = 100).isEmpty)
  }

  test("linkAgainst: best match wins, distance then lexicographic tie-break, exact match at 0") {
    val canon = Seq("red bolt", "red bolts", "red widget").toDF("cname")
    val dirty = Seq("red bolt", "red boltz", "red wídget", "green bolt").toDF("dname")
    val out = FuzzyLink.linkAgainst(dirty, canon, "dname", "cname", firstToken, maxDist = 1)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("red bolt", "red bolt", 0L),    // exact
      ("red boltz", "red bolt", 1L),   // dist 1 to both bolt forms? bolt=1, bolts=1 → lexicographic
      ("red wídget", "red widget", 1L)
      // green bolt: no block match → absent
    ))
  }
}
