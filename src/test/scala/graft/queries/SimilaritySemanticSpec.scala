package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the approximate operators against their exact counterparts —
  * the validation the DuckDB oracle can't do (their outputs depend on
  * Spark's hash functions, so the driver only rows-only-checks them).
  *
  * On this corpus the planted near-duplicates all have shingle-Jaccard
  * ≥ 0.9, where 16-band × 4-row LSH has collision probability
  * 1 − (1 − 0.9⁴)¹⁶ ≈ 0.999, so LSH-then-verify must recover the exact
  * Jaccard pair set. IVF probing nprobe of ≤32 fixed centroids is lossy by
  * design; assert recall@5 against the brute-force neighbors instead.
  */
class SimilaritySemanticSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("MinHash+LSH recovers the exact shingle-Jaccard pair set") {
    val exact = TextQueries.defs.toMap.apply("dd_shingle_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus has no planted near-duplicates?")
    assert(lsh === exact)
  }

  test("SimHash puts near-duplicate pairs within small Hamming distance") {
    val sim = SimilarityQueries.simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nearDups = TextQueries.defs.toMap.apply("dd_shingle_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val hams = nearDups.map { case (i, j) =>
      java.lang.Long.bitCount(sim(i) ^ sim(j))
    }
    // planted dups are ≥0.9 Jaccard; word-weighted SimHash should place
    // them well below the conventional ≤3-of-64 near-dup band… allow 12.
    assert(hams.forall(_ <= 12), s"hamming distances: ${hams.toList}")
    // sanity: unrelated pairs are NOT all close
    val unrelated = Seq((0L, 1L), (2L, 5L), (7L, 9L))
      .filterNot(p => nearDups.contains(p))
      .map { case (i, j) => java.lang.Long.bitCount(sim(i) ^ sim(j)) }
    assert(unrelated.exists(_ > 12), s"unrelated hamming: $unrelated")
  }

  test("SRP LSH near-dup: precision 1 vs exact pairs; bounded-recall at corpus threshold") {
    val exact = SimilarityQueries.embedDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.embedLshDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // exact verification ⇒ every emitted pair is a true near-dup
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    info(s"SRP recall at corpus threshold 0.45 = $recall (pairs sit at cos 0.45–0.48, " +
      "the boundary regime where banding recall degrades by construction)")
    // 64 bands (512 bits): theory ≈ 0.87 at this corpus's 0.45–0.48 pairs
    assert(recall >= 0.7, s"recall = $recall")
  }

  test("SRP LSH recovers the exact pair set in the high-cosine regime it is built for") {
    import spark.implicits._
    graft.Graft.enable(spark)
    // deterministic synthetic corpus: 150 background vectors + 25 planted
    // near-duplicates at cosine ≈ 0.95
    val rnd = new scala.util.Random(42)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 32
    val base = Array.fill(150)(unit(dim))
    val planted = (0 until 25).map { i =>
      val b = base(i)
      val noise = unit(dim)
      val mixed = b.indices.map(d => b(d) + 0.25 * noise(d)).toArray
      val n = math.sqrt(mixed.map(x => x * x).sum)
      mixed.map(_ / n)
    }
    val all = base ++ planted
    val df = all.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "v")
      .withColumn("nrm", org.apache.spark.sql.functions.expr("sqrt(vec_dot(v, v))"))
    val threshold = 0.8
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      i <- all.indices; j <- all.indices if i < j && cos(all(i), all(j)) > threshold
    } yield (i.toLong, j.toLong)).toSet
    assert(expected.size >= 25, s"planted dups missing: ${expected.size}")
    val got = SimilarityQueries.srpNearDupPairs(df, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("SRP LSH recall ≥ 0.9 at cosine ≥ 0.6 (planted-pair sweep, 64 bands)") {
    // round-9 verdict task 8: the second band rotation (256→512 bits) must
    // lift mid-regime recall. Plant pairs across a cosine sweep centered
    // on 0.6-0.75 and measure recall of the ≥0.6 slice against brute force.
    import spark.implicits._
    graft.Graft.enable(spark)
    val rnd = new scala.util.Random(1234)
    def unit(dim: Int): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val dim = 32
    val base = Array.fill(200)(unit(dim))
    // plant at graded noise levels → cosines spread over ~[0.55, 0.95]
    val planted = (0 until 60).map { i =>
      val b = base(i)
      val noise = unit(dim)
      val eps = 0.35 + 0.55 * (i % 10) / 10.0
      val mixed = b.indices.map(d => b(d) + eps * noise(d)).toArray
      val n = math.sqrt(mixed.map(x => x * x).sum)
      mixed.map(_ / n)
    }
    val all = base ++ planted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact06 = (for {
      i <- all.indices; j <- all.indices if i < j && cos(all(i), all(j)) >= 0.6
    } yield (i.toLong, j.toLong)).toSet
    assert(exact06.size >= 30, s"sweep planted too few ≥0.6 pairs: ${exact06.size}")
    val df = all.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "v")
      .withColumn("nrm", org.apache.spark.sql.functions.expr("sqrt(vec_dot(v, v))"))
    // run at threshold 0.55 so a candidate at cos 0.6 isn't dropped by the
    // verification filter's strict inequality; slice the ≥0.6 pairs after
    val got = SimilarityQueries.srpNearDupPairs(df, 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = (exact06 intersect got).size.toDouble / exact06.size
    info(s"recall at cos ≥ 0.6 = $recalled (${exact06.size} true pairs)")
    assert(recalled >= 0.9, s"recall $recalled < 0.9 at cos ≥ 0.6")
  }

  test("banded SimHash pairs ≡ exact 64-bit Hamming all-pairs (pigeonhole)") {
    val sigRows = SimilarityQueries.simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def brute(maxHam: Int): Set[(Long, Long)] = (for {
      (i, si) <- sigRows; (j, sj) <- sigRows
      if i < j && java.lang.Long.bitCount(si ^ sj) <= maxHam
    } yield (i, j)).toSet
    val minHam = (for { (i, si) <- sigRows; (j, sj) <- sigRows if i < j }
      yield java.lang.Long.bitCount(si ^ sj)).min
    info(s"closest corpus pair at hamming $minHam")
    val sigDf = SimilarityQueries.simhash(spark, sf)
    for ((bands, maxHam) <- Seq((4, 3), (8, 7))) {
      val got = SimilarityQueries.simhashBandedPairs(sigDf, bands, maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute(maxHam), s"bands=$bands maxHam=$maxHam")
    }
  }

  test("SimHash auto config widens bands with the corpus, keeping pigeonhole") {
    import SimilarityQueries.{simhashAutoConfig, SimHashConfig}
    // test-scale corpora stay on the classic 64-bit / 4×16 layout (so the
    // contract query is unchanged), and each widening step keeps
    // bands = maxHam + 1 with a key space ≥ corpus/1024
    assert(simhashAutoConfig(500L) === SimHashConfig(1, 4))
    assert(simhashAutoConfig(50L * 1000 * 1000) === SimHashConfig(1, 4))
    assert(simhashAutoConfig(1000L * 1000 * 1000) === SimHashConfig(2, 4))
    assert(simhashAutoConfig(1L << 41) === SimHashConfig(2, 4))
    assert(simhashAutoConfig(1L << 50) === SimHashConfig(4, 4))
    for (n <- Seq(500L, 1L << 30, 1L << 50); cfg = simhashAutoConfig(n)) {
      assert(cfg.bands === 4) // maxHam 3 + 1: exactness precondition
      assert(cfg.sigWords * 64 % cfg.bands === 0)
    }
    // non-default maxHam: bands must still tile words — few bands widen to
    // fill one word (never sigWords = 0), many bands multiply words
    assert(simhashAutoConfig(500L, maxHam = 1) === SimHashConfig(1, 2)) // 2×32-bit
    assert(simhashAutoConfig(500L, maxHam = 7) === SimHashConfig(2, 8)) // 8×16-bit
    assert(simhashAutoConfig(1L << 30, maxHam = 1) === SimHashConfig(1, 2))
    for (mh <- Seq(1, 3, 7, 15); cfg = simhashAutoConfig(1L << 30, mh)) {
      val width = cfg.sigWords * 64 / cfg.bands
      assert(cfg.bands === mh + 1 && width >= 16 && 64 % math.min(width, 64) === 0)
    }
    assertThrows[IllegalArgumentException](simhashAutoConfig(500L, maxHam = 2))
  }

  test("wide SimHash banding (128-bit, 4×32) ≡ all-pairs Hamming (pigeonhole)") {
    val sig = SimilarityQueries.simhashSig(spark, sigWords = 2)
    val rows = sig.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (i, a0, a1) <- rows; (j, b0, b1) <- rows
      if i < j &&
        java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1) <= 3
    } yield (i, j)).toSet
    assert(brute.nonEmpty, "no 128-bit near-dup pairs in corpus?")
    // word 0 must be the public 64-bit signature (same votes, same bits)
    val pub = SimilarityQueries.simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.forall { case (id, s0, _) => pub(id) == s0 })
    val got = SimilarityQueries.simhashBandedPairsN(sig, sigWords = 2, bands = 4, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("banded SimHash pairs find planted low-Hamming signatures exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = rnd.nextLong()
    def flip(x: Long, bits: Int): Long = {
      var v = x
      rnd.shuffle((0 until 64).toList).take(bits).foreach(b => v ^= (1L << b))
      v
    }
    val sigs = Seq(
      (0L, base), (1L, flip(base, 1)), (2L, flip(base, 3)), (3L, flip(base, 4))) ++
      (4L until 200L).map(i => (i, rnd.nextLong()))
    val expected = (for {
      (i, si) <- sigs; (j, sj) <- sigs
      if i < j && java.lang.Long.bitCount(si ^ sj) <= 3
    } yield (i, j)).toSet
    assert(expected.contains((0L, 1L)) && expected.contains((0L, 2L)))
    assert(!expected.contains((0L, 3L))) // ham 4 excluded by the verify step
    val got = SimilarityQueries.simhashBandedPairs(
        sigs.toDF("doc_id", "simhash"), bands = 4, maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("hot LSH buckets are excluded from pair-gen; healthy buckets are kept") {
    import spark.implicits._
    // one pathological bucket with 2,000 members, plus healthy buckets that
    // pair some of the same ids — the cap must bound work without losing
    // pairs that collide anywhere healthy
    val hot = (0L until 2000L).map(id => (id, 0, 77L))
    val healthy = Seq((0L, 1, 5L), (1L, 1, 5L), (42L, 2, 9L), (43L, 2, 9L))
    val bands = (hot ++ healthy).toDF("doc_id", "band", "bk")
    val cand = SimilarityQueries.bandedCandidates(bands, "doc_id", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot-bucket-only pairs are gone (2M pairs otherwise); band-1/2 pairs kept
    assert(cand === Set((0L, 1L), (42L, 43L)))
  }

  test("IVF ANN achieves useful recall against brute force") {
    val exact = SimilarityQueries.annTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.annIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(exact.size === 50)
    // the round-2 k∝n policy (every 37th id, nprobe 3) measured 0.56 here;
    // the fixed-k policy must not trade its bounded broadcast for recall
    assert(recall >= 0.56, s"recall@5 = $recall")
  }
}
