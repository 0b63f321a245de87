package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev profiling main (not part of the driver contract): run one
  * registered query (or the `--commits` append-loop microbench) with a
  * job listener attached and dump per-Spark-job wall time, task counts
  * and call sites — the "where do a fixture-heavy query's seconds
  * actually go" view the SQL UI would give if the bench ran with a UI.
  *
  * Usage: runMain graft.JobProfile <sfDir> <qname> [<qname>...]
  *        runMain graft.JobProfile <sfDir> --commits
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, desc: String, site: String, start: Long,
        var end: Long = -1L, var tasks: Int = 0, var stages: Int = 0,
        var names: List[String] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val desc = Option(e.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        val site = Option(e.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId, desc, site, System.nanoTime()) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = System.nanoTime()) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          jobs.values.find(_.end < 0).foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
            j.names ::= s"${e.stageInfo.name.take(70)}[${e.stageInfo.numTasks}]"
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm the JVM like Bench does
    spark.range(1000000).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    graft.queries.LakeQueries.fixtureLake(spark, sfDir)

    def profile(tag: String)(body: => Unit): Unit = {
      body // warm (fixture memos, JIT)
      spark.catalog.clearCache()
      jobs.synchronized(jobs.clear())
      collecting = true
      val t0 = System.nanoTime()
      body
      val total = (System.nanoTime() - t0) / 1e9
      collecting = false
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener drain
      val snap = jobs.synchronized(jobs.values.toSeq)
      val jsum = snap.filter(_.end > 0).map(j => (j.end - j.start) / 1e9).sum
      println(f"==== $tag total=$total%.3f s, ${snap.size} jobs, job-sum=$jsum%.3f s ====")
      snap.foreach { j =>
        val dt = if (j.end > 0) (j.end - j.start) / 1e9 else -1.0
        println(f"  job ${j.id}%4d ${dt}%8.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.names.reverse.mkString(" | ")}")
      }
    }

    names.foreach {
      case "--commits" =>
        val wd = new java.io.File(sys.props("user.dir"),
          "target/profile_ctl_lake").getAbsolutePath
        val fsp = new org.apache.hadoop.fs.Path(wd)
        val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def loop(tag: String): Unit = {
          val lake = s"$wd/$tag"
          spark.range(100)
            .selectExpr("id AS event_id", "CAST(id % 4 AS STRING) AS site",
              "CAST(id AS DOUBLE) AS v")
            .coalesce(1).write.partitionBy("site").parquet(lake)
          graft.lake.Versioned.init(spark, lake)
          val row = spark.range(1)
            .selectExpr("9000000 AS event_id", "'a' AS site", "0.5 AS v")
          (1 to 20).foreach { i =>
            graft.lake.Versioned.append(spark, lake,
              row.withColumn("event_id", org.apache.spark.sql.functions
                .lit(9000000L + i)), Seq("site"))
          }
        }
        fs.delete(fsp, true)
        var run = 0
        // profile() runs its body twice (warm + measured); distinct lake
        // dirs keep each run a fresh 20-commit loop
        profile("commits20") { run += 1; loop(s"run$run") }
        fs.delete(fsp, true)
      case name =>
        val fn = SparkEntry.queries(name)
        profile(name)(fn(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
