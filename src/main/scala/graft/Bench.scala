package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, codegen compiler, shuffle machinery — so the
    // first timed query isn't charged for JVM/Spark startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
      .count().collect()
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "300").toLong
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: evaluates every output column and ordering without
      // writing — count() would let Catalyst prune projection work and
      // under-measure expression-heavy queries. Watchdog thread + job
      // group so one hung query can't stall the whole bench.
      val worker = new Thread(() => {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => () }
      }, s"bench-$name")
      // daemon: a query that ignores cancellation must not block JVM exit
      worker.setDaemon(true)
      worker.start()
      worker.join(timeoutSec * 1000)
      if (worker.isAlive) { spark.sparkContext.cancelJobGroup(name); worker.join(30000) }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
