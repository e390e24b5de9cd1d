package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces graft.Bench's exact call pattern for a few queries to
  * attribute per-rep cost (cache hit vs recompute) — scratch tool.
  */
object ProfileBenchCtx {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q32_neardup_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    run(graft.SparkEntry.queries("q01_pricing_summary"))
    names.foreach { name =>
      (1 to 4).foreach { rep =>
        val t0 = System.nanoTime()
        run(graft.SparkEntry.queries(name))
        println(f"[profile] $name rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
