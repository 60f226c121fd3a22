package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run named `SparkEntry.queries` entries against a small SF
  * directory and print rows + the registered oracle SQL — the quick local
  * loop before the driver's full Verify/DuckDB pass.
  *
  * {{{ sbt "runMain graft.QuerySmoke ice_stats_agg q01_pricing_summary" }}}
  */
object QuerySmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-query-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    args.foreach { name =>
      println(s"=== $name ===")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.show(20, truncate = false)
        SparkEntry.oracleSql.get(name).foreach(sql => println(s"--- oracle ---\n$sql"))
        // SMOKE_DUMP=<dir>: write result parquet + oracle SQL for a
        // targeted DuckDB replay without a full Verify pass
        sys.env.get("SMOKE_DUMP").foreach { out =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
          SparkEntry.oracleSql.get(name).foreach(sql =>
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$out/$name.sql"), sql))
        }
      } catch {
        case e: Throwable =>
          failed = true
          println(s"FAILED: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
