package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries and
  * time N noop-sink executions — `runMain graft.tools.Explain <sfDir>
  * <query> [<query>…]`. Knobs via env: SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_CONF ("k=v;k=v" session confs, e.g. the stage memo),
  * SPARK_GRAFT_EXPLAIN_RUNS (timed executions per query, default 2),
  * SPARK_GRAFT_EXPLAIN_PLAN=0 to skip the plan dump (timing only).
  * Used by scale probes to adjudicate plan-shape questions a bench
  * record can't answer (which join strategy actually ran, whether a
  * stage memo hit changed the shape run-over-run).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [<query>…]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.stage.memo", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val runs = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_RUNS", "2").toInt
    val showPlan = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_PLAN", "1") != "0"
    args.drop(1).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, args(0))
      if (showPlan) {
        println(s"==== PLAN $q ====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, args(0))
          .write.mode("overwrite").format("noop").save()
        println(f"TIME $q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
