package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness for the sub-second window rewrite. */
object ProfileSubsec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Q.ctx(spark, sfDir)

    val sql =
      """SELECT window.start AS ws, count(*) AS cnt,
        |       min(value) AS mn, max(value) AS mx
        |FROM events WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |GROUP BY window(ts, '1 second', '500 milliseconds') ORDER BY 1""".stripMargin
    // the actual contract query's range
    val q = graft.queries.WheelQueries.defs.toMap.apply("uw_window_subsec")
    for (i <- 1 to 8) {
      val main = Thread.currentThread()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var stop = false
      val sampler = new Thread(() => {
        while (!stop) {
          val st = main.getStackTrace
          // first frame inside graft or catalyst
          val f = st.find(e => e.getClassName.startsWith("graft") ||
            e.getClassName.contains("catalyst.optimizer") ||
            e.getClassName.contains("catalyst.rules")).map(e =>
            e.getClassName + "." + e.getMethodName).getOrElse(
            st.headOption.map(e => e.getClassName + "." + e.getMethodName).getOrElse("?"))
          hist.merge(f, 1, (a, b) => a + b)
          Thread.sleep(1)
        }
      })
      if (i == 8) sampler.start()
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      stop = true
      val n = df.collect().length
      val t2 = System.nanoTime()
      println(f"run $i: plan ${(t1-t0)/1e6}%.1f ms exec ${(t2-t1)/1e6}%.1f ms rows $n")
      if (i == 8) {
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
          println(f"  $v%5d  $k")
        }
      }
    }
    // direct wheel read timing: fetch the ms wheel and run the bucket loop shape
    import graft.index.WheelRegistry
    val t = WheelRegistry.lookup(s"$sfDir/events.parquet")
    t.foreach { ti =>
      ti.msWheel(Some("value")).foreach { iw =>
        val hw = iw.wheel
        println(s"ms wheel: numSlots=${hw.numSecs} start=${hw.startSec} end=${hw.endSec}")
        val lo = hw.startSec
        val hi = hw.endSec
        for (rep <- 1 to 3) {
          val t0 = System.nanoTime()
          val res = hw.bucketize(lo, hi, 500, Math.floorMod(lo, 500), 1000)
          val t1 = System.nanoTime()
          println(f"bucketize rep $rep: ${res.length} non-empty buckets in ${(t1-t0)/1e6}%.2f ms")
        }
      }
    }
    spark.stop()
  }
}
