package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}

import graft.functions.{PqAdc, PqEncode, PqLut}
import graft.queries.SimilarityQueries

/** ONE implementation of the 1M-vector ANN probe shared by `PqScaleSpec`
  * (which ASSERTS the scale properties) and [[BenchAnnScale]] (which
  * RECORDS them as JSON keys, round-16 verdict task 2) — the same
  * corpus, the same pipelines, so the spec's assertions and the record's
  * numbers can never drift apart.
  *
  * The corpus is the dedup shape PQ serves: N/[[PerCluster]] hash-derived
  * cluster centers × [[PerCluster]] members (noise 10× under the
  * inter-center spread), plus [[Dups]] planted near-copies of spread base
  * members (displacement 10× under the noise) appended with ids ≥ N — the
  * recall queries. Deterministic end to end (hash-derived, no RNG). */
object AnnScaleHarness {

  val N = 1000000L
  val Dups = 40
  val PerCluster = 50
  val BidStride = 25013L

  /** Planted query `N + i` is a near-copy of base member `i * BidStride`. */
  def baseOf(i: Int): Long = i.toLong * BidStride

  /** The deterministic clustered corpus (vec_id, v: array<float>, nrm). */
  def corpus(spark: SparkSession): DataFrame = {
    graft.Graft.enable(spark) // vec_dot registration
    val member =
      s"CAST(pmod(hash(CAST(%ID% div $PerCluster AS BIGINT) * 64 + j), 1000000) AS DOUBLE) / 1e6" +
        " + (CAST(pmod(hash(%ID% * 64 + j + 7), 1000000) AS DOUBLE) / 1e6 - 0.5D) * 0.02D"
    val base = spark.range(0, N).toDF("vec_id")
      .withColumn("v", expr(
        s"transform(sequence(0, 63), j -> CAST(${member.replace("%ID%", "vec_id")} AS FLOAT))"))
    val dups = spark.range(0, Dups).toDF("i")
      .withColumn("vec_id", col("i") + N)
      .withColumn("bid", col("i") * BidStride)
      .withColumn("v", expr(
        s"transform(sequence(0, 63), j -> CAST(${member.replace("%ID%", "bid")}" +
          " + (CAST(pmod(hash(i * 64 + j + 13), 1000000) AS DOUBLE) / 1e6 - 0.5D) * 0.002D AS FLOAT))"))
      .select("vec_id", "v")
    base.select("vec_id", "v").union(dups)
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
  }

  /** Top-k per query through the production bounded-heap aggregate,
    * with the 1-based rank. */
  def topkOf(scored: DataFrame, score: String, k: Int): DataFrame =
    scored.groupBy("qi")
      .agg(expr(s"topk_pairs($score, xi, $k)").as("tk"))
      .select(col("qi"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("qi"), col("p").getField("i").as("xi"), (col("pos") + 1).as("rn"))

  /** The residual tier's REUSABLE artifacts over a probe corpus —
    * separated from [[residualSearch]] so the recall-vs-nprobe curve
    * builds the hierarchy + codebook + codes ONCE and re-probes per
    * point. Frames come back persisted and materialized; the caller
    * unpersists. */
  final case class ResidualProbe(
      fines: DataFrame, assigned: DataFrame, scanR: DataFrame,
      cents: Array[Double], ks: Int)

  def residualArtifacts(e: DataFrame, n: Long): ResidualProbe = {
    val (fines, assigned0) = SimilarityQueries.ivfIndex(e, n)
    val assigned = assigned0.persist()
    val assignedR = assigned
      .join(fines.select(col("cid"), col("vc")), "cid")
      .withColumn("r", expr("zip_with(vx, vc, (a, b) -> a - b)"))
    val (centsR, ksR) = SimilarityQueries.pqCodebook(
      assignedR.select(col("xi").as("vec_id"), col("r").as("v")), n,
      SimilarityQueries.RpqM, SimilarityQueries.RpqKs)
    val scanR = assignedR.select(col("xi"), col("cid"), col("nx"),
      cc(PqEncode(ce(col("r")), centsR, SimilarityQueries.RpqM, ksR)).as("codes")).persist()
    scanR.count()
    ResidualProbe(fines, assigned, scanR, centsR, ksR)
  }

  /** Full residual search over built artifacts at an explicit `nprobe`:
    * returns (top-5 rows (qi, xi, rn), planted-base probe-ceiling count —
    * how many planted queries' base vectors live in a probed bucket, the
    * recall ceiling probe selection imposes at this nprobe). */
  def residualSearch(spark: SparkSession, e: DataFrame, p: ResidualProbe,
      nprobe: Int): (Array[(Long, Long, Int)], Long) = {
    val qlutsR = e.where(col("vec_id") >= N).select(col("vec_id").as("qi"),
      cc(PqLut(ce(col("v")), p.cents, SimilarityQueries.RpqM, p.ks)).as("lut"),
      col("nrm").as("nq"))
    val probesR = e.where(col("vec_id") >= N).join(broadcast(p.fines), lit(true))
      .withColumn("qdotc", expr("vec_dot(v, vc)"))
      .withColumn("csim", col("qdotc") / (col("nrm") * col("nc")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))))
      .where(col("crn") <= nprobe)
      .select(col("vec_id").as("qi"), col("cid"), col("qdotc"))
      .join(broadcast(qlutsR), "qi")
    val scannedR = probesR.join(p.scanR, Seq("cid"))
      .where(col("qi") =!= col("xi"))
      .withColumn("asim",
        (col("qdotc") + cc(PqAdc(ce(col("lut")), ce(col("codes")))))
          / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("asim"))
    val shortR = topkOf(scannedR, "asim", SimilarityQueries.PqShortlist)
      .select(col("qi"), col("xi"))
    val queriesV = e.where(col("vec_id") >= N)
      .select(col("vec_id").as("qi"), col("v").as("vq"), col("nrm").as("nq"))
    val rpq = shortR
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")), "xi")
      .join(broadcast(queriesV), "qi")
      .withColumn("sim", expr("vec_dot(vq, vx)") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    val top = topkOf(rpq, "sim", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val bases = spark.range(0, Dups).toDF("i")
      .select((col("i") + N).as("qi"), (col("i") * BidStride).as("bid"))
    val ceiling = bases
      .join(p.assigned.select(col("xi").as("bid"), col("cid").as("bcid")), "bid")
      .join(probesR.select(col("qi"), col("cid")), Seq("qi"))
      .where(col("cid") === col("bcid"))
      .select("qi").distinct().count()
    (top, ceiling)
  }

  /** One-call residual pipeline at an nprobe (build + search + release) —
    * what `PqScaleSpec` uses for its single asserted point. */
  def residualPipeline(spark: SparkSession, e: DataFrame, n: Long,
      nprobe: Int): (Array[(Long, Long, Int)], Long) = {
    val p = residualArtifacts(e, n)
    try residualSearch(spark, e, p, nprobe)
    finally { p.assigned.unpersist(); p.scanR.unpersist() }
  }
}
