package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, Q, SimilarityQueries, TextQueries}

/** Scale-growth record for the dedup/LSH pipeline (round-12 task 5) — the
  * documents-side counterpart of [[BenchPcts]]'s events replication: derive
  * the corpus at `xf`× (default 1, 10, 100), run the capped shingle-Jaccard
  * dedup, the MinHash banded candidate stage, and duplicate clustering at
  * each scale, and record wall-time AND shuffle bytes so the growth CURVE
  * is in the record, not argued. The capped/banded designs predict ~linear
  * growth; a super-linear jump in either metric is a scale regression.
  *
  * Replication preserves duplicate STRUCTURE instead of multiplying it:
  * every copy `k ≥ 1` rewrites each word with a per-copy suffix, so copies
  * share no shingles with other copies — the original near-dup pairs
  * replicate exactly xf×, and pair count grows linearly like a real corpus,
  * not quadratically like naive duplication. EXCEPT a pinned 1% of
  * documents, which replicate VERBATIM: at 100× those become 100-member
  * identical-text groups whose LSH buckets genuinely exceed the probe cap —
  * real hot buckets exercising the [[SimilarityQueries.bandedCandidates]]
  * guard (round-12 task 1) at the scale it exists for, recorded as
  * `hot_buckets_dropped`.
  *
  * Writes one JSON object to BENCH_dedup_scale_r13.json (args(0)
  * overrides) and prints it.
  */
object BenchDedupScale {

  /** Per-task shuffle byte totals, accumulated across every job. Listener
    * delivery is async; [[snapshotAfterQuiesce]] sleeps briefly so the
    * deltas are attributable to the just-finished query (a growth record,
    * not an audit). */
  private final class ShuffleBytes extends org.apache.spark.scheduler.SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def snapshotAfterQuiesce(): (Long, Long) = {
      Thread.sleep(300)
      (written.get, read.get)
    }
  }

  /** Derives a documents corpus at `xf`× with structure-preserving
    * perturbation; the other corpus tables symlink through so Q.ctx
    * registers the full view set. */
  private def deriveScaledDocs(spark: SparkSession, sfDir: String, xf: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-docsx$xf").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // copy stride ABOVE the corpus's own id range (a fixed stride would
    // silently collide copies on corpora with doc_id >= stride, merging
    // unrelated documents in the published record; review finding), and a
    // multiple of 100 so the remapped id keeps the original's residue for
    // the verbatim-1% trick below
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val stride = math.max(1000000L, (maxId / 100L + 1L) * 100L)
    docs
      .withColumn("copy", explode(sequence(lit(0), lit(xf - 1))))
      .withColumn("doc_id", col("doc_id") + col("copy") * lit(stride))
      .withColumn("text",
        // copy 0 verbatim; ~1% of ORIGINAL ids verbatim in EVERY copy
        when(col("copy") === 0 || col("doc_id") % 100 === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), w => concat(w, lit("_"), col("copy"))),
            " ")))
      .drop("copy")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val src = java.nio.file.Paths.get(sfDir)
    // Using.resource: Files.list returns a Stream backed by a directory
    // handle that must be closed (one leak per derived scale point)
    scala.util.Using.resource(java.nio.file.Files.list(src)) { s =>
      s.forEach { p =>
        val name = p.getFileName.toString
        if (name != "documents.parquet")
          java.nio.file.Files.createSymbolicLink(
            java.nio.file.Paths.get(dir, name), p.toAbsolutePath)
      }
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // round-aware default output — SPARK_GRAFT_ROUND, else inferred; see
    // [[BenchRound]] for the required run order behind the inference
    val outPath = args.headOption.getOrElse(new java.io.File(
      BenchRound.repoRoot, s"BENCH_dedup_scale_r${BenchRound.current}.json").getPath)
    val xfs = sys.env.getOrElse("SPARK_GRAFT_DEDUP_XFS", "1,10,100")
      .split(',').map(_.trim.toInt).filter(_ >= 1)
    require(xfs.nonEmpty,
      s"SPARK_GRAFT_DEDUP_XFS must name at least one factor >= 1 " +
        "(an empty run would emit a record with no scale points)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = new ShuffleBytes
    spark.sparkContext.addSparkListener(sh)

    /** probe cap for the hot-bucket stats: small enough that the 1%
      * verbatim groups exceed it at 100× (group size = xf), far above any
      * healthy bucket in this corpus. */
    val probeCap = 64

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    xfs.foreach { xf =>
      val sfDir = if (xf == 1) baseDir else deriveScaledDocs(spark, baseDir, xf)
      // views only: this tool measures document-side operators exclusively,
      // so the wheel builds Q.ctx would run per derived corpus are pure
      // setup waste (review finding)
      Q.ctxViewsOnly(spark, sfDir)
      val nDocs = spark.table("documents").count()
      out(s"x${xf}_docs") = nDocs.toString

      def timed(name: String)(body: => Long): Unit = {
        body // warm-up: page cache, codegen
        System.gc(); Thread.sleep(200)
        val (w0, r0) = sh.snapshotAfterQuiesce()
        val t0 = System.nanoTime()
        val rows = body
        val secs = (System.nanoTime() - t0) / 1e9
        val (w1, r1) = sh.snapshotAfterQuiesce()
        out(s"x${xf}_${name}_sec") = num(secs)
        out(s"x${xf}_${name}_rows") = rows.toString
        out(s"x${xf}_${name}_shuffle_mib") = num((w1 - w0) / 1048576.0)
        out(s"x${xf}_${name}_shuffle_read_mib") = num((r1 - r0) / 1048576.0)
      }

      // the capped shingle-Jaccard dedup (the at-scale default)
      timed("shingle_capped") {
        spark.sql(TextQueries.shingleJaccardSparkSql(capDf = Some(32))).count()
      }
      // the MinHash banded CANDIDATE stage (default 4096 cap)
      timed("minhash_cand") {
        SimilarityQueries.minhashCandidates(spark, sfDir).count()
      }
      // duplicate clustering (log-round star contraction over capped pairs)
      timed("cluster") {
        PipelineQueries.ddCluster(spark, sfDir).count()
      }
      // decontamination, exact join vs Bloom broadcast (round 14): the
      // exact form shuffles the corpus gram stream on gram; the bloom form
      // collapses the eval side to one broadcast blob and probes map-side,
      // so its shuffle bytes must stay ~FLAT relative to corpus growth —
      // the curve, not the argument, goes in the record
      timed("decon_exact") {
        spark.sql(PipelineQueries.sqlFor("txt_decontaminate")).count()
      }
      timed("decon_bloom") {
        spark.sql(PipelineQueries.sqlFor("ds_bloom_decon")).count()
      }

      // FORCED CROSSOVER (round-14 verdict task 1): at contract scale the
      // eval gram set stays under the broadcast threshold, so the exact
      // join broadcasts and its recorded shuffle reads misleadingly small
      // — the condition the bloom tier exists for (an eval suite too big
      // to broadcast) never triggers, and r14's record even showed exact
      // "winning" shuffle at x100. Disabling broadcast for this probe pair
      // measures the at-scale shapes directly: the exact join must shuffle
      // the FULL corpus gram stream (growing ~linearly with xf) while the
      // bloom path stays flat — it has NO join node to degrade; its only
      // shuffles are the eval-side distinct and the flagged-doc partial
      // aggregation.
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        timed("decon_exact_noborc") {
          spark.sql(PipelineQueries.sqlFor("txt_decontaminate")).count()
        }
        timed("decon_bloom_noborc") {
          spark.sql(PipelineQueries.sqlFor("ds_bloom_decon")).count()
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

      // auto-sized blob (round-14 task 1, sizing half): counts the eval
      // side's distinct grams, BloomBlob.sizeFor turns (count, the 1e-4
      // per-gram default) into (numBits, k), and the same plan runs sized.
      // The sizing pass runs INSIDE the timed body — it is the auto path's
      // entire distinguishing cost, and excluding it would publish an
      // apples-to-oranges curve vs decon_bloom (review finding). The
      // record carries the chosen parameters so their growth with the
      // eval slice is visible next to the fixed 2^20 default's.
      var autoBits = 0
      var autoK = 0
      var autoGrams = 0L
      timed("decon_bloom_auto") {
        val (autoDf, b, k, ng) = PipelineQueries.bloomDeconAuto(spark, sfDir)
        autoBits = b; autoK = k; autoGrams = ng
        autoDf.count()
      }
      out(s"x${xf}_bloom_auto_bits") = autoBits.toString
      out(s"x${xf}_bloom_auto_k") = autoK.toString
      out(s"x${xf}_bloom_auto_eval_grams") = autoGrams.toString
      // over-flag BUDGET next to the measured delta (round-15 verdict task
      // 5): without the expectation in the record, the auto tier's
      // flagged-minus-exact gap reads ambiguously — budgeted false
      // positives and a real regression look the same. expected = Σ over
      // exactly-clean docs of 1−(1−p)^grams at the sized blob's realized
      // per-gram p; measured = auto rows − exact rows (every exact hit is
      // a true positive on both paths — never-miss is pinned by
      // ds_bloom_decon_check). BloomSqlSpec asserts measured ≤ ~2×expected.
      out(s"x${xf}_bloom_auto_expected_over") = num(
        PipelineQueries.bloomDeconExpectedOverFlag(spark, sfDir, autoBits, autoK, autoGrams))
      out(s"x${xf}_bloom_auto_measured_over") =
        (out(s"x${xf}_decon_bloom_auto_rows").toLong -
          out(s"x${xf}_decon_exact_rows").toLong).toString

      // hot-bucket guard evidence at the probe cap: bucket-size stats from
      // the same band keys, and the candidate stage re-run with the probe
      // cap — dropped = buckets the count-bounded collect discards before
      // materialization (the 1% verbatim groups at xf >= 100)
      val bands = graft.streaming.StreamingNearDup.bandKeys(
        spark.table("documents"), "doc_id", "text")
      val sizes = bands.groupBy("band", "bk").agg(count(lit(1)).as("n"))
      val stats = sizes.agg(
        max(col("n")).as("mx"),
        sum(when(col("n") > probeCap, 1L).otherwise(0L)).as("hot")).collect()(0)
      out(s"x${xf}_max_bucket") = stats.getLong(0).toString
      out(s"x${xf}_hot_buckets_dropped") = stats.getLong(1).toString
      timed(s"minhash_cand_cap$probeCap") {
        SimilarityQueries.bandedCandidates(bands, "id", maxBucket = probeCap).count()
      }

      spark.catalog.clearCache()
      if (sfDir != baseDir) {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(sfDir)
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
            catch { case _: Throwable => () })
      }
    }

    val json = out.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"sf":"$baseDir","probe_cap":$probeCap,""", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes)
    println(json)
    spark.stop()
  }
}
