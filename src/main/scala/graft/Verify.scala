package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run ONE query and dump it to `outDir/<name>/`. A query that throws
    * leaves `<name>/_ERROR` holding the exception text, so the driver
    * can tell builder-side breakage (query threw) from orchestration
    * breakage (query never declared). Returns true on success.
    */
  def runOne(spark: SparkSession, sfDir: String, outDir: String,
             name: String, fn: (SparkSession, String) => DataFrame): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val d = Paths.get(outDir, name)
      // wipe any prior run's artifacts first: stale part-*.parquet next
      // to _ERROR would make the gate compare OLD results and pass a
      // now-broken query — the exact failure mode the marker exposes
      if (Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.filterNot(_ == d).foreach(Files.delete)
      }
      Files.createDirectories(d)
      Files.writeString(d.resolve("_ERROR"),
        s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}\n")
      false
    }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional query-name filter (local iteration)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) => runOne(spark, sfDir, outDir, name, fn) }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
