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
    * point. Returns the PRODUCTION artifact bundle (so the search half is
    * the production pipeline, not a copy — review finding) plus the
    * assignment frame the probe-ceiling calculation reads. Frames come
    * back persisted and materialized; the caller unpersists via
    * [[release]]. */
  final case class ResidualProbe(
      art: SimilarityQueries.RpqArtifacts, assigned: DataFrame) {
    def release(): Unit = { assigned.unpersist(); art.codes.unpersist() }
  }

  def residualArtifacts(e: DataFrame, n: Long): ResidualProbe = {
    val (fines, coarse, assigned0) = SimilarityQueries.ivfIndexFull(e, n)
    val assigned = assigned0.persist()
    val assignedR = assigned
      .join(fines.select(col("cid"), col("vc")), "cid")
      .withColumn("r", expr("zip_with(vx, vc, (a, b) -> a - b)"))
    val (centsR, ksR) = SimilarityQueries.pqCodebook(
      assignedR.select(col("xi").as("vec_id"), col("r").as("v")), n,
      SimilarityQueries.RpqM, SimilarityQueries.RpqKs)
    val scanR = SimilarityQueries.withPcell(
      assignedR.select(col("xi"), col("cid"), col("nx"),
        cc(PqEncode(ce(col("r")), centsR, SimilarityQueries.RpqM, ksR)).as("codes"))).persist()
    scanR.count()
    ResidualProbe(
      SimilarityQueries.RpqArtifacts(fines, coarse, scanR, centsR, ksR, n), assigned)
  }

  /** Full residual search at an explicit `nprobe` — THE production
    * pipeline ([[SimilarityQueries.rpqSearchRanked]]) over the planted
    * queries (vec_id ≥ N). Returns (top-5 rows (qi, xi, rn), planted-base
    * probe-ceiling count — how many planted queries' base vectors live in
    * a probed bucket, the recall ceiling probe selection imposes at this
    * nprobe). */
  def residualSearch(spark: SparkSession, e: DataFrame, p: ResidualProbe,
      nprobe: Int): (Array[(Long, Long, Int)], Long) = {
    val queries = e.where(col("vec_id") >= N)
    val top = SimilarityQueries.rpqSearchRanked(p.art, e, queries, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val probed = queries.join(broadcast(p.art.fines), lit(true))
      .withColumn("csim", expr("vec_dot(v, vc)") / (col("nrm") * col("nc")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))))
      .where(col("crn") <= nprobe)
      .select(col("vec_id").as("qi"), col("cid"))
    val bases = spark.range(0, Dups).toDF("i")
      .select((col("i") + N).as("qi"), (col("i") * BidStride).as("bid"))
    val ceiling = bases
      .join(p.assigned.select(col("xi").as("bid"), col("cid").as("bcid")), "bid")
      .join(probed, Seq("qi"))
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
    finally p.release()
  }
}
