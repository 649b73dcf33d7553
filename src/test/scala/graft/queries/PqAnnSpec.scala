package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Pq, PqAdc, PqEncode, PqLut}

/** Product-quantization ANN tier ([[SimilarityQueries.annPq]] and the
  * [[graft.functions.Pq]] expressions). The contract entries pin the
  * corpus pipeline value-for-value against the full DuckDB oracle; this
  * spec pins the properties the oracle can't see:
  *
  *  - DETERMINISM: codes are byte-identical under any partitioning (the
  *    encode is a fixed-order fold with first-wins ties);
  *  - the CLUSTERED-corpus recall story: random synthetic embeddings are
  *    the worst case for PQ (rank-5 and rank-50 separate by float dust),
  *    while planted near-duplicates — the dedup/retrieval use case — sit
  *    far above the quantization error and recover at rank 1;
  *  - arithmetic identities of the ADC decomposition;
  *  - the compression claim: m bytes per code.
  */
class PqAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val M = 8
  private val Ks = 32
  private val Dim = 64

  /** Seeded clustered corpus: `nClusters` centers, `perCluster` noisy
    * members each — vec_id is the row index in generation order. */
  private def clustered(nClusters: Int, perCluster: Int, noise: Double,
      seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = Seq.fill(nClusters)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    centers.zipWithIndex.flatMap { case (cv, ci) =>
      (0 until perCluster).map { k =>
        val v = cv.map(x => (x + noise * rnd.nextGaussian()).toFloat)
        ((ci.toLong * perCluster + k), v)
      }
    }
  }

  private def toDf(rows: Seq[(Long, Array[Float])], parts: Int): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("vec_id", "v").repartition(parts)
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
  }

  test("codes are byte-identical under any partitioning") {
    graft.Graft.registerFunctions(spark)
    val rows = clustered(10, 20, 0.3, seed = 0xC0DEBEEFL)
    val base = toDf(rows, 1)
    val (cents, ks) = SimilarityQueries.pqCodebook(base, rows.size.toLong, M, Ks)
    def codesOf(parts: Int): Map[Long, Seq[Byte]] =
      toDf(rows, parts)
        .select(col("vec_id"), cc(PqEncode(ce(col("v")), cents, M, ks)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val one = codesOf(1)
    assert(one.values.forall(_.length == M), s"codes must be exactly $M bytes")
    assert(codesOf(7) === one)
    assert(codesOf(3) === one)
  }

  test("planted near-duplicates recover at rank 1 through the ADC shortlist") {
    graft.Graft.registerFunctions(spark)
    // corpus: 20 clusters x 10 members; queries: near-copies of 10 distinct
    // members (tiny noise, cosine >> anything else in the corpus)
    val corpus = clustered(20, 10, 0.25, seed = 0x5EEDL)
    val rnd = new scala.util.Random(0xF00DL)
    val planted = (0 until 10).map { i =>
      val (srcId, srcV) = corpus(i * 19 + 3)
      val q = srcV.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
      (1000L + i, q, srcId)
    }
    val e = toDf(corpus, 4)
    val (cents, ks) = SimilarityQueries.pqCodebook(e, corpus.size.toLong, M, Ks)
    val codes = e.select(col("vec_id").as("xi"),
      cc(PqEncode(ce(col("v")), cents, M, ks)).as("codes"), col("nrm").as("nx"))
    val q = toDf(planted.map(p => (p._1, p._2)), 1)
      .select(col("vec_id").as("qi"),
        cc(PqLut(ce(col("v")), cents, M, ks)).as("lut"),
        col("v").as("vq"), col("nrm").as("nq"))
    // the annPq shape: ADC shortlist (here R=20) then exact re-rank, top-1
    val shortlist = codes.join(broadcast(q), lit(true))
      .withColumn("asim",
        cc(PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
      .withColumn("arn", row_number().over(
        Window.partitionBy("qi").orderBy(col("asim").desc, col("xi"))))
      .where(col("arn") <= 20)
      .select(col("qi"), col("xi"), col("vq"), col("nq"), col("nx"))
    val top1 = shortlist
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx")), "xi")
      .withColumn("sim", expr("vec_dot(vq, vx)") / (col("nq") * col("nx")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qi").orderBy(col("sim").desc, col("xi"))))
      .where(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("qi") -> r.getAs[Long]("xi")).toMap
    planted.foreach { case (qid, _, srcId) =>
      assert(top1.get(qid).contains(srcId),
        s"planted query $qid must recover its source $srcId at rank 1, got ${top1.get(qid)}")
    }
  }

  test("IVF x PQ composition: ADC inside probed buckets still recovers planted dups") {
    graft.Graft.registerFunctions(spark)
    // the 100 TB shape: IVF bounds WHICH rows are scanned (nprobe/sqrt(n)
    // of the corpus), PQ bounds WHAT each scanned row costs (8 lookups on
    // an 8-byte code) — this composes them end to end on the clustered
    // corpus and asserts planted near-dups survive BOTH approximations
    val corpus = clustered(20, 10, 0.25, seed = 0x5EEDL)
    val rnd = new scala.util.Random(0xF00DL)
    val planted = (0 until 10).map { i =>
      val (srcId, srcV) = corpus(i * 19 + 3)
      (1000L + i, srcV.map(x => (x + 0.01 * rnd.nextGaussian()).toFloat), srcId)
    }
    val e = toDf(corpus, 4)
    val n = corpus.size.toLong
    val (fines, assigned) = SimilarityQueries.ivfIndex(e, n)
    val (cents, ks) = SimilarityQueries.pqCodebook(e, n, M, Ks)
    // bucket-restricted candidates via the assignment-aligned prober,
    // scored by ADC (codes attached to the assignment), then exact rerank
    val q = toDf(planted.map(p => (p._1, p._2)), 1)
    val probes = SimilarityQueries.adaptiveProbes(fines, q, ncoarse = 2, nfinePerCoarse = 2)
      .join(q.select(col("vec_id").as("qi"),
        cc(PqLut(ce(col("v")), cents, M, ks)).as("lut")), "qi")
    val codesDf = e.select(col("vec_id").as("xi2"),
      cc(PqEncode(ce(col("v")), cents, M, ks)).as("codes"))
    val assignedCodes = assigned.join(codesDf, assigned("xi") === codesDf("xi2"))
      .select(assigned("xi"), assigned("cid"), assigned("nx"), codesDf("codes"))
    val scanned = probes.join(assignedCodes, "cid")
      .withColumn("asim",
        cc(PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
    // scanned fraction: candidates per query bounded by the probed buckets
    val perQuery = scanned.groupBy("qi").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ <= n / 2),
      s"bucket restriction must scan a fraction of the corpus, saw max ${perQuery.max} of $n")
    val shortlist = scanned
      .withColumn("arn", row_number().over(
        Window.partitionBy("qi").orderBy(col("asim").desc, col("xi"))))
      .where(col("arn") <= 20)
      .select(col("qi"), col("xi"), col("vq"), col("nq"), col("nx"))
    val top1 = shortlist
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx")), "xi")
      .withColumn("sim", expr("vec_dot(vq, vx)") / (col("nq") * col("nx")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qi").orderBy(col("sim").desc, col("xi"))))
      .where(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("qi") -> r.getAs[Long]("xi")).toMap
    planted.foreach { case (qid, _, srcId) =>
      assert(top1.get(qid).contains(srcId),
        s"IVFxPQ: planted query $qid must recover source $srcId at rank 1, got ${top1.get(qid)}")
    }
  }

  test("adc equals the mi-ordered sum of code-indexed lut entries") {
    val rnd = new scala.util.Random(7L)
    val cents = Array.fill(M * Ks * (Dim / M))(rnd.nextGaussian())
    val v = Array.fill(Dim)(rnd.nextGaussian().toFloat)
    val qv = Array.fill(Dim)(rnd.nextGaussian().toFloat)
    def ad(a: Array[Float]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a.map(_.toDouble))
    val codes = Pq.encode(ad(v), isFloat = false, cents, M, Ks)
    val lut = Pq.lut(ad(qv), isFloat = false, cents, M, Ks)
    val sub = Dim / M
    // manual mi-ordered fold over the same doubles
    var expect = 0.0
    for (mi <- 0 until M) {
      val j = codes(mi) & 0xff
      var d = 0.0
      for (t <- 0 until sub) d += qv(mi * sub + t).toDouble * cents((mi * Ks + j) * sub + t)
      assert(d === lut(mi * Ks + j))
      expect += d
    }
    val got = Pq.adc(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(lut), codes)
    assert(got === expect)
    // every code indexes the L2-nearest centroid of its subspace
    for (mi <- 0 until M) {
      val dists = (0 until Ks).map { j =>
        var d = 0.0
        for (t <- 0 until sub) {
          val diff = v(mi * sub + t).toDouble - cents((mi * Ks + j) * sub + t)
          d += diff * diff
        }
        d
      }
      assert(dists((codes(mi) & 0xff)) === dists.min)
    }
  }

  test("ann_ivf_rpq_check clears its pinned recall floor on the contract corpus") {
    graft.Graft.registerFunctions(spark)
    val n = SimilarityQueries.annIvfRpqCheck(spark, "/root/testdata/sf0.001")
      .collect()(0).getLong(0)
    assert(n === 50L,
      s"ann_ivf_rpq_check poisoned (got $n): recall@5 fell below ${SimilarityQueries.IvfRpqRecallFloor}")
  }

  test("ann_ivf_pq_check clears its pinned recall floor on the contract corpus") {
    // the CONTRACT composition (round-15 verdict task 1): the check entry
    // returns the exact pair count only when IVF×PQ recall@5 clears
    // IvfPqRecallFloor server-side — a -1 here means the floor broke
    graft.Graft.registerFunctions(spark)
    val n = SimilarityQueries.annIvfPqCheck(spark, "/root/testdata/sf0.001")
      .collect()(0).getLong(0)
    assert(n === 50L,
      s"ann_ivf_pq_check poisoned (got $n): recall@5 fell below ${SimilarityQueries.IvfPqRecallFloor}")
  }

  test("wrong input types fail analysis; null vector yields null code") {
    graft.Graft.registerFunctions(spark)
    val session = spark
    import session.implicits._
    val cents = Array.fill(M * Ks * (Dim / M))(0.5)
    val e = intercept[Exception] {
      Seq("nope").toDF("v")
        .select(cc(PqEncode(ce(col("v")), cents, M, Ks)))
        .collect()
    }
    assert(e.getMessage != null)
    val nullRow = Seq(Tuple1(null.asInstanceOf[Array[Float]])).toDF("v")
      .select(cc(PqEncode(ce(col("v")), cents, M, Ks)).as("c")).head()
    assert(nullRow.isNullAt(0))
  }
}
