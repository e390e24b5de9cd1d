package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Contention-robust work measurement for named SparkEntry queries: wall
  * clock is hostage to ambient load on a shared sandbox, so optimization
  * deltas are judged on DETERMINISTIC work counters instead — jobs,
  * stages, tasks, executor CPU time, shuffle bytes (read+written), input
  * bytes/records. A structural win (fewer exchanges, no duplicate
  * subtree) moves these counters identically on an idle or a thrashing
  * host. Usage: runMain graft.tools.QMetrics <name> [<name>...]
  */
object QMetrics {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new LongAdder; val cpuNs = new LongAdder
    val runMs = new LongAdder
    val shRead = new LongAdder; val shWrite = new LongAdder
    val inBytes = new LongAdder; val inRecs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.increment()
        val m = t.taskMetrics
        if (m != null) {
          cpuNs.add(m.executorCpuTime); runMs.add(m.executorRunTime)
          shRead.add(m.shuffleReadMetrics.totalBytesRead)
          shWrite.add(m.shuffleWriteMetrics.bytesWritten)
          inBytes.add(m.inputMetrics.bytesRead); inRecs.add(m.inputMetrics.recordsRead)
        }
      }
    })
    def snap(): Seq[Long] = Seq(jobs.get, stages.get, tasks.sum, cpuNs.sum,
      runMs.sum, shRead.sum, shWrite.sum, inBytes.sum, inRecs.sum)
    // warmup so JIT/codegen cost doesn't land in the first query's CPU
    graft.SparkEntry.queries("q62_version_call")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // rep1 warm-up for this query's codegen; rep2 is the measured one
      (1 to 2).foreach { rep =>
        val before = snap()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener is async — drain it deterministically (ADVICE r21 #3: a
        // fixed sleep undercounts the measured rep under load, bleeding
        // task metrics into the next query's baseline). The bus has no
        // public waitUntilEmpty, so poll until two consecutive snapshots
        // agree (all jobs are complete here — the counters can only still
        // move from queued listener events).
        var prev = snap()
        var settled = false
        var polls = 0
        while (!settled && polls < 100) {
          Thread.sleep(50)
          val cur = snap()
          settled = cur == prev
          prev = cur
          polls += 1
        }
        val d2 = snap().zip(before).map { case (a, b) => a - b }
        if (rep == 2) println(f"[qmetrics] $name jobs=${d2(0)} stages=${d2(1)} " +
          f"tasks=${d2(2)} cpu_s=${d2(3) / 1e9}%.2f run_s=${d2(4) / 1e3}%.2f " +
          f"shuffle_mb=${(d2(5) + d2(6)) / 1e6}%.1f input_mb=${d2(7) / 1e6}%.1f " +
          f"input_recs=${d2(8)} wall_s=$wall%.2f")
      }
    }
    spark.stop()
  }
}
