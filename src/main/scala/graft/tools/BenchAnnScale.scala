package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}

import graft.functions.{PqAdc, PqEncode, PqLut}
import graft.queries.SimilarityQueries

/** 1M-vector ANN scale record (round-16 verdict tasks 1 + 2): the numbers
  * `PqScaleSpec` asserts, published as machine-adjudicable JSON keys so
  * round-over-round drift is caught by diffing records instead of reading
  * ScalaTest info lines — plus the recall-vs-nprobe CURVE for the residual
  * tier, the dial [[SimilarityQueries.nprobeFor]] auto-sets (the curve
  * shows what each probe fraction buys on this clustered corpus, and where
  * the auto value lands on it).
  *
  * Shares every pipeline with the spec through [[AnnScaleHarness]].
  * Writes one JSON object to BENCH_ann_scale_r{N}.json (args(0) overrides)
  * and prints it.
  */
object BenchAnnScale {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse(
      new java.io.File(BenchRound.repoRoot,
        s"BENCH_ann_scale_r${BenchRound.current}.json").getPath)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = mutable.LinkedHashMap[String, String]()
    // Locale.ROOT like graft.Bench: a comma-decimal default locale would
    // otherwise make the machine-parsed record invalid JSON (review finding)
    def num(d: Double): String =
      if (d.isNaN || d.isInfinite) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    import AnnScaleHarness._
    val e = corpus(spark).persist()
    val n = e.count()
    out("n") = n.toString
    out("dups") = Dups.toString

    // ---- plain-PQ tier (the contract 8×32 geometry) ----
    val M = SimilarityQueries.PqM
    val Ks = SimilarityQueries.PqKs
    val (cents, ks) = SimilarityQueries.pqCodebook(e, n, M, Ks)
    val codes = e.select(col("vec_id").as("xi"),
      cc(PqEncode(ce(col("v")), cents, M, ks)).as("codes"),
      col("nrm").as("nx")).persist()
    codes.count()
    val rawBytes = e.agg(sum(size(col("v")) * 4L)).collect()(0).getLong(0)
    val codeBytes = codes.agg(sum(length(col("codes")))).collect()(0).getLong(0)
    out("raw_mib") = num(rawBytes / 1048576.0)
    out("pq_code_mib") = num(codeBytes / 1048576.0)
    out("pq_code_ratio") = num(rawBytes.toDouble / codeBytes)

    val queries = e.where(col("vec_id") >= N).select(col("vec_id").as("qi"),
      cc(PqLut(ce(col("v")), cents, M, ks)).as("lut"),
      col("v").as("vq"), col("nrm").as("nq")).persist()
    queries.count()

    def adcShortlist(): Long = {
      val scanned = codes
        .join(broadcast(queries.select(col("qi"), col("lut"), col("nq"))),
          col("qi") =!= col("xi"))
        .withColumn("asim",
          cc(PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
        .select(col("qi"), col("xi"), col("asim"))
      topkOf(scanned, "asim", SimilarityQueries.PqShortlist).count()
    }
    def adcTopK(): Array[(Long, Long, Int)] = {
      val scanned = codes
        .join(broadcast(queries.select(col("qi"), col("lut"), col("nq"))),
          col("qi") =!= col("xi"))
        .withColumn("asim",
          cc(PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
        .select(col("qi"), col("xi"), col("asim"))
      val shortlist = topkOf(scanned, "asim", SimilarityQueries.PqShortlist)
        .select(col("qi"), col("xi"))
      val reranked = shortlist
        .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")), "xi")
        .join(broadcast(queries.select(col("qi"), col("vq"), col("nq"))), "qi")
        .withColumn("sim", expr("vec_dot(vq, vx)") / (col("nq") * col("nx")))
        .select(col("qi"), col("xi"), col("sim"))
      topkOf(reranked, "sim", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    }
    def bruteTopK(): Array[(Long, Long)] = {
      val scored = broadcast(queries.select(col("qi"), col("vq"), col("nq")))
        .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")),
          col("qi") =!= col("xi"))
        .withColumn("sim", expr("vec_dot(vq, vx)") / (col("nq") * col("nx")))
        .select(col("qi"), col("xi"), col("sim"))
      topkOf(scored, "sim", 5)
        .select(col("qi"), col("xi"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    adcShortlist(); bruteTopK(); adcTopK() // warm-ups (codegen, broadcasts)
    var t0 = System.nanoTime()
    adcShortlist()
    out("adc_scan_sec") = num((System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    val brute = bruteTopK()
    out("brute_sec") = num((System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    val adc = adcTopK()
    out("adc_full_sec") = num((System.nanoTime() - t0) / 1e9)

    val brutePairs = brute.toSet
    val adcPairs = adc.map(t => (t._1, t._2)).toSet
    out("pq_recall_at5") = num(adcPairs.intersect(brutePairs).size.toDouble / brutePairs.size)
    val top1 = adc.filter(_._3 == 1).map(t => (t._1, t._2)).toMap
    out("pq_recovered") =
      (0 until Dups).count(i => top1.get(N + i).contains(baseOf(i))).toString

    // ---- residual tier + the recall-vs-nprobe curve ----
    val p = residualArtifacts(e, n)
    val rpqCodeBytes = p.art.codes.agg(sum(length(col("codes")))).collect()(0).getLong(0)
    out("rpq_code_mib") = num(rpqCodeBytes / 1048576.0)
    out("rpq_code_ratio") = num(rawBytes.toDouble / rpqCodeBytes)
    val fineCount = p.art.fines.count()
    out("fine_centroids") = fineCount.toString
    val bucketSizes = p.assigned.groupBy("cid").agg(count(lit(1)).as("bn")).persist()
    bucketSizes.count()

    val autoNprobe = SimilarityQueries.nprobeFor(n)
    out("nprobe_auto") = autoNprobe.toString
    val points = (Seq(1, 5, 10, 20, 50, 100) :+ autoNprobe).distinct.sorted
    points.foreach { np =>
      val t = System.nanoTime()
      val (top, ceiling) = residualSearch(spark, e, p, np)
      val wall = (System.nanoTime() - t) / 1e9
      val pairs = top.map(x => (x._1, x._2)).toSet
      val recall = pairs.intersect(brutePairs).size.toDouble / brutePairs.size
      val t1m = top.filter(_._3 == 1).map(x => (x._1, x._2)).toMap
      val rec = (0 until Dups).count(i => t1m.get(N + i).contains(baseOf(i)))
      // measured scanned fraction: avg probed-bucket mass per query / n
      val probed = e.where(col("vec_id") >= N).join(broadcast(p.art.fines), lit(true))
        .withColumn("csim", expr("vec_dot(v, vc)") / (col("nrm") * col("nc")))
        .withColumn("crn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))))
        .where(col("crn") <= np)
        .select(col("vec_id").as("qi"), col("cid"))
      val scannedRows = probed.join(bucketSizes, "cid")
        .groupBy("qi").agg(sum("bn").as("rs"))
        .agg(avg(col("rs"))).collect()(0).getDouble(0)
      out(s"rpq_recall_np$np") = num(recall)
      out(s"rpq_recovered_np$np") = rec.toString
      out(s"rpq_ceiling_np$np") = ceiling.toString
      out(s"rpq_frac_np$np") = num(scannedRows / n)
      out(s"rpq_search_sec_np$np") = num(wall)
      println(s"[graft] rpq nprobe=$np recall=${num(recall)} recovered=$rec/" +
        s"$Dups ceiling=$ceiling frac=${num(scannedRows / n)} wall=${num(wall)}s")
    }
    bucketSizes.unpersist(); p.release()
    e.unpersist(); codes.unpersist(); queries.unpersist()

    val json = out.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath), json.getBytes)
    println(json)
    spark.stop()
  }
}
