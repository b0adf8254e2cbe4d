package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** r17 measurement tool (guide §1): for each named query, write
  * `<outDir>/<name>_<tag>.txt` holding the final frame's
  * `.explain("formatted")` PLUS the measured Spark job / stage counts
  * of one full execution. For the iterative operators the job/stage
  * census IS the plan evidence — their cost is per-round scheduling,
  * which a single explain of the (often LogicalRDD-leaf) result frame
  * cannot show. Not part of the driver contract; bench methodology is
  * untouched.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val queries = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    queries.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        spark.catalog.clearCache()
        System.gc()
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val j0 = jobs.get(); val s0 = stages.get()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val cnt = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat to drain
        Thread.sleep(500)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val body =
          s"== $name ($tag) ==\n" +
          f"rows=$cnt%d  wall=$secs%.3f s  sparkJobs=${jobs.get - j0}%d  " +
          f"stagesSubmitted=${stages.get - s0}%d\n\n" + plan
        Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] $name: jobs=${jobs.get - j0} " +
          s"stages=${stages.get - s0} wall=" + f"$secs%.2f")
      }
    }
    spark.stop()
  }
}
