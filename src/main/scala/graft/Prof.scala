package graft

import org.apache.spark.sql.SparkSession

// temporary profiling harness — not committed
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    Similarity.e3IvfTopK(spark, sfDir).count() // warmup
    for (aqe <- Seq("true", "false"); i <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val c = Similarity.e3IvfTopK(spark, sfDir).count()
      println(f"PROF aqe=$aqe run=$i rows=$c t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
