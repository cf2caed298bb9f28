package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import graft._

/** Empirical per-query execution profile without the UI (guide §1/§7):
  * run each named query through the noop sink with a SparkListener and
  * print jobs / stages / tasks / summed task time / GC time / shuffle
  * bytes — the stage-overhead vs compute split that tells whether a
  * multi-second bench line is data work or plan machinery.
  * {{{ runMain graft.tools.JobStats <q1,q2,...> [dataDir] [iters] }}}
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
    val root = Sessions.local()
    root.sparkContext.setLogLevel("WARN")
    // 4th arg "noaqe": time in a child session with AQE disabled, to
    // split AQE's sequential stage-materialization overhead from task
    // work (the plan itself is unchanged)
    val spark = if (args.length > 3 && args(3) == "noaqe") {
      val s = root.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s
    } else if (args.length > 3 && args(3).startsWith("conf:")) {
      val s = root.newSession()
      args(3).stripPrefix("conf:").split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); s.conf.set(k, v)
      }
      s
    } else root

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo.taskMetrics
        if (i != null) {
          shufRead.addAndGet(i.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(i.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    }
    root.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      (1 to iters).foreach { i =>
        System.gc()
        Seq(jobs, stages, tasks).foreach(_.set(0))
        Seq(taskMs, gcMs, shufRead, shufWrite).foreach(_.set(0L))
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        println(f"[jobstats] $n iter$i wall=$wall%.2fs jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} " +
          f"taskTime=${taskMs.get / 1e3}%.1fs gc=${gcMs.get / 1e3}%.1fs " +
          f"shufR=${shufRead.get / 1e6}%.1fMB shufW=${shufWrite.get / 1e6}%.1fMB")
      }
    }
    spark.stop()
  }
}
