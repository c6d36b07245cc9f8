package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only excursion reproducer for the r7 bench `spread` outliers
  * (d14 8.51, s10 8.38, p15 4.26 on healthy mins): loops the flagged
  * entries N times, optionally under synthetic CPU contention
  * (CONTEND=<threads> env spawns that many spin threads), printing
  * every sample — the controlled version of the driver-host ambient
  * load hypothesis. Backs the SURVEY §5 r8 spread addendum.
  *
  * Usage: runMain graft.tools.ProfileSpread [sfDir] [ids,csv] [iters]
  */
object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ids = args.lift(1).map(_.split(',').toSeq).getOrElse(
      Seq("d14_prefix_join", "s10_pq_codebook", "p15_leakproof_split"))
    val iters = args.lift(2).map(_.toInt).getOrElse(6)
    val contend = sys.env.get("CONTEND").map(_.toInt).getOrElse(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val spinners = (0 until contend).map { i =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x % (1L << 26) == 0) Thread.`yield`() }
      }, s"spin-$i")
      t.setDaemon(true); t.start(); t
    }
    if (contend > 0) println(s"[spread] contention: $contend spin threads")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ids.foreach { id => // warmup, as Bench
      try graft.SparkEntry.queries(id)(spark, dir).count()
      catch { case e: Throwable => println(s"[spread] warmup $id: $e") }
      spark.catalog.clearCache()
    }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to iters).foreach { run =>
      ids.foreach { id =>
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(id)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        samples(id) = samples(id) :+ dt
        println(f"[spread] run$run $id: $dt%.2f s")
        spark.catalog.clearCache()
      }
    }
    ids.foreach { id =>
      val s = samples(id)
      println(f"[spread] $id min=${s.min}%.2f max=${s.max}%.2f " +
        f"median=${s.sorted.apply(s.size / 2)}%.2f n=${s.size}")
    }
    stop.set(true); spinners.foreach(_.join(100))
    spark.stop()
  }
}
