package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `sbt "runMain graft.Explain <query> [<query>…]"` prints
  * each query's formatted physical plan at sf0.01 — the feedback loop for
  * the scale checklist (broadcasts chosen? filters pushed? codegen spans
  * wide? no stray shuffles?).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===== $name =====")
          println(fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"\n===== $name: NO SUCH QUERY =====")
      }
    }
    spark.stop()
  }
}
