package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Tables.t

/** Scratch profiler for the LSH near-dup pipeline (q32/q67): times each
  * stage of lshNearDupPairs separately so a regression can be attributed
  * to a stage instead of guessed at. Not part of any driver contract.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.register(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = t(spark, dir, "documents")
    // warmup: parquet footers + codegen
    docs.count()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      val sh = time("hashedShingles persist") {
        val x = Dedup.hashedShingles(docs, "doc_id", "text", 6).persist()
        x.count(); x
      }
      val sigs = time("minhash signatures") {
        val s = Dedup.minhashFromHashed(sh, 16)
        s.write.format("noop").mode("overwrite").save(); s
      }
      val bandsDf = time("bands persist") {
        val r = 4
        def bandHash(j: Int) =
          (0 until r).foldLeft(lit(0L)) { (acc, i) =>
            (acc * 131 + col(s"m${j * r + i}")) % Dedup.P
          }
        val bs = array((0 until 4).map { j =>
          struct(lit(j).as("bidx"), bandHash(j).as("bval"))
        }: _*)
        val b = sigs.select(col("id"), explode(bs).as("band"))
          .select(col("id"), col("band.bidx").as("bidx"), col("band.bval").as("bval"))
          .persist()
        b.count(); b
      }
      val cand = time("candidates") {
        val c = bandsDf.as("x").join(bandsDf.as("y"),
            col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval")
              && col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct().persist()
        println(s"[profile]   n_cand = ${c.count()}")
        c
      }
      time("verify join") {
        val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
        val shared = cand
          .join(sh.select(col("id").as("id_a"), col("h")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("h").as("h_b")), Seq("id_b"))
          .where(col("h") === col("h_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("shared"))
        shared
          .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          .withColumn("jaccard", col("shared") / (col("n_a") + col("n_b") - col("shared")))
          .where(col("jaccard") >= 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      time("full lshNearDupPairs") {
        Dedup.lshNearDupPairs(docs, "doc_id", "text",
          k = 6, numHashes = 16, bands = 4, threshold = 0.5)
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
