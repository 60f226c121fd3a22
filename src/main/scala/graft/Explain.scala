package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the given queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    val bodies = SparkEntry.queries ++ SparkEntry.benchOnly
    names.foreach { n =>
      println(s"\n========== $n ==========")
      bodies.get(n) match {
        case Some(q) =>
          // bench-only entries (ice_cdc_read etc.) read tables their
          // untimed setup hook builds — run it so the plan is printable
          SparkEntry.benchSetup.get(n).foreach(f => f(spark, sfDir))
          try q(spark, sfDir).explain("formatted")
          finally SparkEntry.benchTeardown.get(n).foreach { f =>
            try f(spark, sfDir) catch { case _: Throwable => () }
          }
        case None => println(s"(unknown query $n)")
      }
    }
    spark.stop()
  }
}
