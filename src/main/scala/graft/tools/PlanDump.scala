package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of named SparkEntry queries to
  * /tmp/plan_<name>.txt — the `.explain("formatted")` audit loop without a
  * REPL. Usage: runMain graft.tools.PlanDump <name> [<name>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$name.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] /tmp/plan_$name.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
