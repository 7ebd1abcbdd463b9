package graft.tools

import graft.core.SimpleAnalyzer
import graft.index._
import graft.webtext.{PageGen, WebIndex}
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-stage wall times of the full index build at a given core
  * count. Usage: runMain graft.tools.ScalingProbe <cores> <nDocs>. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val parts = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // listener: per-phase sum of task wall time + executor CPU time → achieved
    // parallelism (taskTime/wall) and CPU fraction (cpuTime/taskTime)
    val taskWall = new java.util.concurrent.atomic.AtomicLong
    val taskCpu = new java.util.concurrent.atomic.AtomicLong
    val taskGc = new java.util.concurrent.atomic.AtomicLong
    val taskN = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          taskWall.addAndGet(m.executorRunTime)
          taskCpu.addAndGet(m.executorCpuTime / 1000000)
          taskGc.addAndGet(m.jvmGCTime)
          taskN.incrementAndGet()
        }
      }
    })

    def timed[T](name: String)(f: => T): T = {
      taskWall.set(0); taskCpu.set(0); taskGc.set(0); taskN.set(0)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"PROBE $name $wall%.1f s | tasks=${taskN.get} " +
        f"par=${taskWall.get / 1e3 / wall}%.1f cpuFrac=${taskCpu.get.toDouble / math.max(taskWall.get, 1)}%.2f " +
        f"gcFrac=${taskGc.get.toDouble / math.max(taskWall.get, 1)}%.2f")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-$cores-").toString
    val p = PageGen.Params()

    val pages = PageGen.synthesize(spark, nDocs, parts, p)
    timed("synthesize-count")(pages.count())
    val withIds = timed("assign-ids")({
      val w = WebIndex.assignDocIds(pages, parts).cache()
      w.count(); w
    })
    val input = withIds.select($"docId", $"text").as[InputDoc]
    val idx = timed("segment-build")(
      IndexBuilder.build(input, dir, IndexConfig(SimpleAnalyzer, withPositions = true)))
    timed("postings-rows")(println("rows=" + idx.postings.count()))
    timed("merge")(SegmentMerger.merge(idx, s"$dir-merged", computeMetrics = false))
    spark.stop()
  }
}
