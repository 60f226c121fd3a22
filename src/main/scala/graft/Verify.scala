package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** One query attempt: clears any stale `<name>._FAILED` marker, writes
    * the result parquet, and on ANY throw writes a fresh marker and returns
    * the failure message. Factored out of [[main]] so the marker contract
    * is unit-testable (VerifySpec). */
  def runOne(spark: SparkSession, sfDir: String, outDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] = {
    // a marker from a PREVIOUS run into the same outDir must not survive
    // a now-green query — delete before the attempt, rewrite on failure
    Files.deleteIfExists(Paths.get(s"$outDir/$name._FAILED"))
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      Files.writeString(Paths.get(s"$outDir/$name._FAILED"), msg)
      Some(msg)
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: run only these query names (local iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failed query must be IMPOSSIBLE to mistake for an unregistered one:
    // each failure leaves a per-query `<name>._FAILED` marker and lands in
    // errors.json (written even when empty) next to oracle_sql.json, so a
    // gate that reads "all green" provably ran every registered query.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        runOne(spark, sfDir, outDir, name, fn).foreach { msg =>
          System.err.println(s"[verify] $name FAILED: $msg")
          failures(name) = msg.take(2000)
        }
      }
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
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // loud, but exit 0: the driver must still consume the green results +
    // oracle_sql.json — the markers/errors.json are the tamper-proof record.
    // Printed on BOTH streams: the driver's tail capture reads stdout.
    val tally = s"[verify] ${failures.size} of " +
      s"${SparkEntry.queries.count { case (n, _) => only.isEmpty || only(n) }}" +
      s" queries failed" +
      (if (failures.nonEmpty) ": " + failures.keys.mkString(", ") else "")
    println(tally)
    if (failures.nonEmpty) System.err.println(tally)
    spark.stop()
  }
}
