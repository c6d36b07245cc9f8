package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: per-JOB wall decomposition of one gated entry — a
  * SparkListener timeline (job id, seconds, first line of the call
  * site) over a warmed run, plus the driver-side gaps between jobs.
  * Guide §1/§7: find whether an entry's wall time is task work or
  * scheduling/driver fixed cost before optimizing either.
  * Usage: runMain graft.tools.JobProf <entry> [sfDir]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY, "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    graft.SparkEntry.queries(name)(spark, dir).count()
    spark.catalog.clearCache()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties.getProperty("callSite.short")).getOrElse("")
        starts.put(e.jobId, (e.time, site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, site) =>
          rows.add((e.jobId, t0, e.time, site)); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    System.gc()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(l)
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val js = rows.asScala.toSeq.sortBy(_._2)
    var prevEnd = 0L
    var jobSum = 0.0
    js.foreach { case (id, s, e, site) =>
      val gap = if (prevEnd == 0) 0.0 else math.max(0, s - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, e)
      jobSum += (e - s) / 1e3
      println(f"[job] #$id%3d ${(e - s) / 1e3}%6.3f s  gap=$gap%6.3f s  $site")
    }
    println(f"[job] TOTAL wall=$wall%.2f s, jobs=${js.size}, in-job=$jobSum%.2f s, driver-gaps=${wall - jobSum}%.2f s")
    spark.stop()
  }
}
