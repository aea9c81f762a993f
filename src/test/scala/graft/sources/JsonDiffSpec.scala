package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import JsonBinary.{VArr, VObj, VRaw, VStr}

/** JSON diff application semantics (sql/json_diff.cc contract):
  * REPLACE/REMOVE demand existing paths, INSERT adds members at the
  * MySQL (length, bytes) key position or splices array elements, and
  * every miss fails loudly.
  */
class JsonDiffSpec extends AnyFunSuite {

  private val doc = VObj(Vector(
    "a" -> VRaw("1"),
    "b" -> VStr("x"),
    "cc" -> VArr(Vector(VRaw("1"), VRaw("2"), VRaw("3")))))

  test("path parsing: members, quoted members, indexes, nesting") {
    assert(JsonDiff.parsePath("$") == Nil)
    assert(JsonDiff.parsePath("$.a") == List(Left("a")))
    assert(JsonDiff.parsePath("$.a.b[2]") == List(Left("a"), Left("b"), Right(2)))
    assert(JsonDiff.parsePath("""$."odd key"[0].x""") ==
      List(Left("odd key"), Right(0), Left("x")))
    intercept[IllegalArgumentException](JsonDiff.parsePath("a.b"))
    intercept[IllegalArgumentException](JsonDiff.parsePath("$..a"))
  }

  test("replace / insert / remove compose in order") {
    val out = JsonDiff.applyDiffs(doc, Seq(
      JsonDiff.Diff(JsonDiff.Replace, "$.b", Some(VRaw("42"))),
      JsonDiff.Diff(JsonDiff.Remove, "$.cc[1]", None),
      JsonDiff.Diff(JsonDiff.Insert, "$.ab", Some(VStr("new")))))
    assert(JsonBinary.render(out) == """{"a":1,"b":42,"ab":"new","cc":[1,3]}""")
  }

  test("inserted members land at the MySQL (length, bytes) key position") {
    val out = JsonDiff.applyDiffs(VObj(Vector("bb" -> VRaw("1"))), Seq(
      JsonDiff.Diff(JsonDiff.Insert, "$.z", Some(VRaw("2"))),
      JsonDiff.Diff(JsonDiff.Insert, "$.aaa", Some(VRaw("3")))))
    assert(JsonBinary.render(out) == """{"z":2,"bb":1,"aaa":3}""")
  }

  test("array inserts splice; past-end appends; root replace allowed") {
    val arr = VArr(Vector(VRaw("1"), VRaw("2")))
    val spliced = JsonDiff.applyDiffs(arr,
      Seq(JsonDiff.Diff(JsonDiff.Insert, "$[1]", Some(VRaw("9")))))
    assert(JsonBinary.render(spliced) == "[1,9,2]")
    val appended = JsonDiff.applyDiffs(arr,
      Seq(JsonDiff.Diff(JsonDiff.Insert, "$[99]", Some(VRaw("9")))))
    assert(JsonBinary.render(appended) == "[1,2,9]")
    val root = JsonDiff.applyDiffs(arr,
      Seq(JsonDiff.Diff(JsonDiff.Replace, "$", Some(VRaw("null")))))
    assert(JsonBinary.render(root) == "null")
  }

  test("quoted members decode the full JSON escape set") {
    assert(JsonDiff.parsePath("""$."a\nb"""") == List(Left("a\nb")))
    assert(JsonDiff.parsePath("""$."t\tx"[1]""") == List(Left("t\tx"), Right(1)))
    assert(JsonDiff.parsePath("$.\"u\\u0041z\"") == List(Left("uAz")))
    assert(JsonDiff.parsePath("""$."q\"w\\e"""") == List(Left("q\"w\\e")))
    val doc = VObj(Vector("a\nb" -> VRaw("1")))
    val out = JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Replace, "$.\"a\\nb\"", Some(VRaw("2")))))
    assert(JsonBinary.render(out) == "{\"a\\nb\":2}")
  }

  test("path misses and shape mismatches fail loudly") {
    intercept[IllegalArgumentException](JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Replace, "$.nope", Some(VRaw("1"))))))
    intercept[IllegalArgumentException](JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Insert, "$.a", Some(VRaw("1"))))))  // exists
    intercept[IllegalArgumentException](JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Remove, "$.cc[9]", None))))
    intercept[IllegalArgumentException](JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Remove, "$.a[0]", None))))  // scalar leg
    intercept[IllegalArgumentException](JsonDiff.applyDiffs(doc,
      Seq(JsonDiff.Diff(JsonDiff.Insert, "$", Some(VRaw("1"))))))  // root insert
  }

  test("binary round-trip: readDiffs parses the wire layout") {
    def lenenc(w: scala.collection.mutable.ArrayBuffer[Byte], n: Int): Unit = {
      require(n < 0xfb); w += n.toByte
    }
    val w = scala.collection.mutable.ArrayBuffer.empty[Byte]
    // REPLACE $.b = int16 42
    val v42 = JsonbBytes.doc(JsonbBytes.JI16(42))
    w += JsonDiff.Replace.toByte; lenenc(w, 3); w ++= "$.b".getBytes
    lenenc(w, v42.length); w ++= v42
    // REMOVE $.cc[1]
    w += JsonDiff.Remove.toByte; lenenc(w, 7); w ++= "$.cc[1]".getBytes
    val diffs = JsonDiff.readDiffs(w.toArray)
    assert(diffs.length == 2)
    assert(diffs(0) == JsonDiff.Diff(JsonDiff.Replace, "$.b", Some(VRaw("42"))))
    assert(diffs(1) == JsonDiff.Diff(JsonDiff.Remove, "$.cc[1]", None))
    assert(JsonDiff.readDiffs(Array.empty).isEmpty, "empty payload = unchanged marker")
  }
}
