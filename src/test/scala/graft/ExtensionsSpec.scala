package graft

class ExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL once installed") {
    GraftExtensions.install(spark)
    val out = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(out - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 5.0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(ortho) < 1e-12)
  }
}
