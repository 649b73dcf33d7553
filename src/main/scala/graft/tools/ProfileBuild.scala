package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: sample executor-thread stacks during the fused sketch build. */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.queries.Q.buildLineitem(spark, sfDir)
    System.gc(); Thread.sleep(300)

    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !t.getName.contains("sampler")) {
            val grp = if (t.getName.startsWith("Executor task launch")) "EXEC" else t.getName
            // deepest interesting frame
            val f = st.find(e =>
              e.getClassName.startsWith("graft")).map(e =>
              e.getClassName.split('.').last + "." + e.getMethodName).getOrElse(
              st.take(3).map(e => e.getClassName.split('.').last + "." + e.getMethodName)
                .mkString("<"))
            hist.merge(grp + " | " + f, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(2)
      }
    })
    sampler.start()
    val t0 = System.nanoTime()
    graft.queries.Q.buildLineitem(spark, sfDir)
    stop = true
    println(f"lineitem: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"  $v%6d  $k")
    }
    spark.stop()
  }
}
