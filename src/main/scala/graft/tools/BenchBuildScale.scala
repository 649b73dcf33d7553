package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{UWheelBuilder, UWheelIndex, WheelRegistry}
import graft.queries.Q

/** Index-build scale curve (round-14 verdict task 3): the ONE 100 TB-
  * relevant cost with no measured growth record — `BENCH_pcts_scale` shows
  * query latencies flat at 3000× but the build that served them was
  * untimed. For each factor in `SPARK_GRAFT_BUILD_XFS` (default 1,10,100)
  * this derives the events corpus at that scale (same replication as
  * [[BenchPcts]] — identical time span, so the active-slot domain is
  * constant while rows grow) and records, per scale point:
  *
  *  - `build_sec_x{N}` — wall time of the FULL fused events build (every
  *    wheel family, the same build `Q.ctx` runs);
  *  - `index_mib_x{N}` + `index_mib_x{N}_<family>` — registered index
  *    memory, total and per family ([[graft.index.TableIndex
  *    .indexUsageBytesByFamily]]) — must stay FLAT across row scale (wheel
  *    memory is slot-domain-bound);
  *  - `build_payload_mib_x{N}` — serialized bytes of the ONE merged
  *    accumulator the `treeAggregate` hands the driver
  *    ([[UWheelIndex.lastBuildPayloadBytes]], measured through the same
  *    serializer that shipped it). The build's driver receive is this one
  *    accumulator by construction (depth-2 executor-side pre-merge); the
  *    record asserts its SIZE tracks active slots, not row count — the
  *    property that makes the build viable on a 1000-executor cluster.
  *
  * `SPARK_GRAFT_BUILD_COUNT_XF` (default 0 = off) additionally times a
  * count-wheel-only build at that factor — the 3000× point, where the full
  * family set would take too long for a per-round record but the count
  * wheel (the rewrite rule's backbone) must still build in minutes.
  *
  * Output: one JSON line to BENCH_build_scale_r{N}.json (args(0)
  * overrides; round from SPARK_GRAFT_ROUND, else inferred — see
  * [[BenchDedupScale]] on the required run order). Run it ALONE: builds
  * are timing runs and a concurrent Spark job contaminates them.
  */
object BenchBuildScale {

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = args.headOption.getOrElse(new java.io.File(
      BenchRound.repoRoot, s"BENCH_build_scale_r${BenchRound.current}.json").getPath)
    val xfs = sys.env.getOrElse("SPARK_GRAFT_BUILD_XFS", "1,10,100")
      .split(',').map(_.trim.toInt).filter(_ >= 1)
    val countXf = sys.env.getOrElse("SPARK_GRAFT_BUILD_COUNT_XF", "0").trim.toInt
    // the scale point where the per-family ablation pairs run (0 = off)
    val ablateXf = sys.env.getOrElse("SPARK_GRAFT_BUILD_ABLATE_XF", "10").trim.toInt
    require(xfs.nonEmpty, "SPARK_GRAFT_BUILD_XFS must name at least one factor >= 1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.build.measurePayload", "true")

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def mib(b: Long): Double = b / 1048576.0
    // payload keys carry the failed-probe sentinel, not a believable
    // "-0.000" (round-15 advice); the slot resets before every timed build
    // so a skipped measurement can't silently report the previous build's
    def payloadMib: String = {
      val b = UWheelIndex.lastBuildPayloadBytes
      if (b < 0) "-1" else num(mib(b))
    }

    def withScaled(xf: Int)(body: String => Unit): Unit = {
      val dir = if (xf == 1) baseDir else BenchPcts.deriveScaled(spark, baseDir, xf)
      try body(dir)
      finally if (dir != baseDir) {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(dir)
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
            catch { case _: Throwable => () })
      }
    }

    // a verdict-task measurement must not just vanish from the record: if
    // the ablation point is not among the scale factors, say so loudly and
    // leave a sentinel where the cost keys would have been (review finding)
    if (ablateXf > 0 && !xfs.contains(ablateXf)) {
      out(s"index_build_ablate_skipped_x$ablateXf") = "-1"
      System.err.println(s"[graft] ablation point x$ablateXf is not in " +
        s"SPARK_GRAFT_BUILD_XFS=${xfs.mkString(",")} — per-family x$ablateXf costs will be absent")
    }

    xfs.foreach { xf =>
      withScaled(xf) { dir =>
        out(s"x${xf}_rows") =
          spark.read.parquet(s"$dir/events.parquet").count().toString
        // settle, then ONE cold-ish timed full build (the per-round bench
        // already carries repeated-build medians at 1×; this record is the
        // GROWTH CURVE, where the signal is orders of scale, not ±10%)
        System.gc(); Thread.sleep(300)
        UWheelIndex.lastBuildPayloadBytes = -1L
        val t0 = System.nanoTime()
        Q.buildEvents(spark, dir)
        out(s"build_sec_x$xf") = num((System.nanoTime() - t0) / 1e9)
        out(s"build_payload_mib_x$xf") = payloadMib
        WheelRegistry.lookup(s"$dir/events.parquet").foreach { t =>
          val fams = t.indexUsageBytesByFamily
          out(s"index_mib_x$xf") = num(mib(fams.values.sum))
          fams.toSeq.sortBy(_._1).foreach { case (f, b) =>
            out(s"index_mib_x${xf}_$f") = num(mib(b))
          }
        }

        // Per-family build prices at the scale where they resolve (round-15
        // verdict task 3): at 1× the freq/hdr/topk/millis diffs sit below
        // the ±0.4–0.8 s measurement noise band, so the per-round record
        // carries cost 0 with a negdiff adjudication — honest but
        // uninformative for capacity planning. At 10× rows the signal
        // clears the band. Two alternated rotations per variant, per-name
        // MIN (every build does identical full work, so min is the
        // interference-robust estimator), diffs floored at 0 with the
        // negdiff magnitude + rotation band published for adjudication —
        // the graft.Bench diffProbe discipline at one extra scale point.
        if (xf == ablateXf) {
          val reps = scala.collection.mutable.Map.empty[String, List[Double]]
          val builds: Seq[(String, () => Unit)] = Seq(
            "numeric_nomillis" ->
              (() => Q.buildEvents(spark, dir, withDistinct = false, withMillis = false)),
            "numeric" -> (() => Q.buildEvents(spark, dir, withDistinct = false)),
            "nofreq" -> (() => Q.buildEvents(spark, dir, withFreq = false)),
            "nohdr" -> (() => Q.buildEvents(spark, dir, withQuantiles = false)),
            "notopk" -> (() => Q.buildEvents(spark, dir, withTopK = false)),
            "full" -> (() => Q.buildEvents(spark, dir)))
          (0 until 2).foreach { _ =>
            builds.foreach { case (nm, b) =>
              System.gc(); Thread.sleep(300)
              val t = System.nanoTime()
              b()
              reps(nm) = ((System.nanoTime() - t) / 1e9) :: reps.getOrElse(nm, Nil)
            }
          }
          def est(nm: String): Double = reps(nm).min
          def band(a: String, b: String): Double =
            (reps(a).max - reps(a).min).max(reps(b).max - reps(b).min)
          builds.foreach { case (nm, _) => out(s"build_${nm}_x$xf") = num(est(nm)) }
          def diff(fam: String, full: String, without: String): Unit = {
            val d = est(full) - est(without)
            out(s"index_build_cost_${fam}_x$xf") = num(math.max(0.0, d))
            if (d < 0) out(s"index_build_cost_${fam}_x${xf}_negdiff") = num(-d)
            out(s"index_build_cost_${fam}_x${xf}_band") = num(band(full, without))
          }
          diff("millis", "numeric", "numeric_nomillis")
          diff("freq", "full", "nofreq")
          diff("hdr", "full", "nohdr")
          diff("topk", "full", "notopk")
        }
        WheelRegistry.deregister(s"$dir/events.parquet")
      }
    }

    if (countXf > 1) {
      withScaled(countXf) { dir =>
        out(s"xcount${countXf}_rows") =
          spark.read.parquet(s"$dir/events.parquet").count().toString
        System.gc(); Thread.sleep(300)
        UWheelIndex.lastBuildPayloadBytes = -1L
        val t0 = System.nanoTime()
        UWheelBuilder("ts").build(spark, s"$dir/events.parquet")
        out(s"build_count_sec_x$countXf") = num((System.nanoTime() - t0) / 1e9)
        out(s"build_count_payload_mib_x$countXf") = payloadMib
        WheelRegistry.lookup(s"$dir/events.parquet").foreach { t =>
          out(s"index_mib_count_x$countXf") = num(mib(t.indexUsageBytes))
        }
        WheelRegistry.deregister(s"$dir/events.parquet")
      }
    }

    val json = out.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"sf":"$baseDir",""", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes)
    println(json)
    spark.stop()
  }
}
