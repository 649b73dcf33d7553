package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.queries.Q

/** Optimization-round instrumentation (guide §1): runs named SparkEntry
  * queries and attributes their wall-clock to Spark jobs/stages via a
  * listener — the "which stage is slow" question the UI answers, in a form
  * a headless round can capture. Also dumps `.explain("formatted")` to a
  * file per query when SPARK_GRAFT_PLAN_DIR is set.
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery q1 q2 ..."
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS (cores),
  *      SPARK_GRAFT_PLAN_DIR (optional explain dump dir),
  *      SPARK_GRAFT_REPS (timed reps after warm-up, default 2).
  *
  * Diagnostic only: never run by the driver, writes nothing the bench or
  * oracle reads.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage accounting: name -> (count, total ms, total tasks)
    val stages = mutable.LinkedHashMap.empty[String, (Int, Long, Int)]
    // per-stage detail: (stageId, ms, tasks, rddChainHead) — the job-level
    // view the aggregated names hide (every broadcast-future stage shares
    // one callsite name)
    val stageList = mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(0L)
        val key = si.name.split("\n").head.take(120)
        val (c, t, k) = stages.getOrElse(key, (0, 0L, 0))
        stages(key) = (c + 1, t + ms, k + si.numTasks)
        val detail = si.details.split("\n").drop(1)
          .find(l => l.contains("graft") && !l.contains("ProfileQuery"))
          .getOrElse("").trim.take(90)
        stageList += ((si.stageId, ms, si.numTasks, detail))
      }
    }

    Q.ctx(spark, sfDir) // index build outside the profile
    val fns = SparkEntry.queries
    args.foreach { name =>
      fns.get(name) match {
        case None => System.err.println(s"[profile] no such query: $name")
        case Some(fn) =>
          // warm-up (codegen, page cache) — not counted
          fn(spark, sfDir).collect()
          planDir.foreach { d =>
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(d, s"$name.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
          }
          stages.clear(); stageList.clear(); jobs = 0
          spark.sparkContext.addSparkListener(listener)
          System.gc(); Thread.sleep(200)
          val t0 = System.nanoTime()
          var i = 0
          while (i < reps) { fn(spark, sfDir).collect(); i += 1 }
          val wall = (System.nanoTime() - t0) / 1e9 / reps
          Thread.sleep(300) // let the listener bus drain
          spark.sparkContext.removeSparkListener(listener)
          println(f"== $name%s wall=${wall}%.3f s/rep jobs=${jobs / reps}%d stages/rep:")
          stages.toSeq.sortBy(-_._2._2).foreach { case (k, (c, ms, tk)) =>
            println(f"   ${ms / reps}%6d ms  x${c / reps}%-3d tasks=${tk / reps}%-5d $k%s")
          }
          if (sys.env.contains("SPARK_GRAFT_STAGE_DETAIL"))
            stageList.sortBy(-_._2).take(12).foreach { case (id, ms, tk, d) =>
              println(f"     s$id%-5d ${ms}%6d ms tasks=$tk%-4d $d%s")
            }
      }
    }
    spark.stop()
  }
}
