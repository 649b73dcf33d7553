package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-build floor experiment (round-13 task 2): `fusedexec_events` —
  * first-execution whole-stage codegen compile + first parquet read of the
  * ~40-aggregate fused build scan — dominates the cold `index_build`
  * headline. This probe times ONE cold events build in a fresh JVM under a
  * configurable codegen mode so the options the verdict names can be
  * measured instead of argued:
  *
  *  - `SPARK_GRAFT_BUILD_CODEGEN=on`   — status quo (whole-stage codegen)
  *  - `SPARK_GRAFT_BUILD_CODEGEN=off`  — `spark.sql.codegen.wholeStage=false`
  *    for the whole session: the build scan executes once, so a 10-s janino
  *    compile may cost more than interpreted execution saves
  *  - `SPARK_GRAFT_BUILD_CODEGEN=nofactory` — additionally forces
  *    `spark.sql.codegen.factoryMode=NO_CODEGEN` (expression-level
  *    interpretation too)
  *
  * Run with `sbt "runMain graft.tools.BuildFloorProbe"` (run/fork gives a
  * fresh JVM per invocation — required: a warm CodeGenerator cache would
  * hide exactly the cost under test). Prints one JSON line with the total
  * and the BuildPhases split.
  *
  * Measured on this harness (local[32], cold JVM each point, buildEvents):
  * 2 MB corpus 9.76 s codegen vs 8.11 s interpreted; 60 MB 48.4 vs 33.4;
  * 277 MB 59.0 vs 55.7 — which set the 256 MiB small-build gate in
  * [[graft.index.UWheelIndex.build]]. NOTE the gate now routes small
  * path-based builds interpreted by default, so `mode=on` measures the
  * production path (gate engaged below 256 MiB); pass
  * `-Dgraft.build.smallScanBytes=0` to force the codegen path for
  * comparison. */
object BuildFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_BUILD_CODEGEN", "on")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (mode == "off" || mode == "nofactory")
      b.config("spark.sql.codegen.wholeStage", "false")
    if (mode == "nofactory")
      b.config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.index.BuildPhases.clear()
    val t0 = System.nanoTime()
    graft.queries.Q.buildEvents(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    val phases = graft.index.BuildPhases.snapshot().toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":${"%.3f".formatLocal(java.util.Locale.ROOT, v)}""" }
      .mkString(",")
    println(s"""{"metric":"build_floor","mode":"$mode","value":${
      "%.3f".formatLocal(java.util.Locale.ROOT, sec)},"unit":"sec","phases":{$phases}}""")
    spark.stop()
  }
}
