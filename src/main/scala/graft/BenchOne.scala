package graft
import org.apache.spark.sql.SparkSession
/** Dev profiling main (not part of the driver contract): time individual
  * registered queries, several runs each, and optionally dump the
  * formatted physical plan.
  *
  * Usage: runMain graft.BenchOne <sfDir> <nRuns> [--explain] q37_ann_lsh ...
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val explain = args.contains("--explain")
    val names = args.drop(2).filterNot(_ == "--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // let AQE right-size shuffles that feed a persist(): iterative
      // operators (connectedComponents) otherwise pay full-width
      // scheduling per round on tiny cached frames
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // the graft rules (SQL row-level writes, vectorized-read upgrade)
      // ride the BUILDER hook so they run inside the optimizer's own
      // fixed point - filters push below the MOR anti-join etc.; the
      // in-query register() calls stay as the live-session fallback
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"==== $name plan ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // queries that persist() would otherwise serve later runs (and
        // later queries) from cache — each run must stand alone
        spark.catalog.clearCache()
        dt
      }
      println(f"$name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
