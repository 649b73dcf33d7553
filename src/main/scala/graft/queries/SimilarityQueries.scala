package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-dedup and similarity-search operators: MinHash+LSH and SimHash
  * over `documents`, cosine near-dup and (exact + IVF-bucketed) nearest-
  * neighbor search over `embeddings`.
  *
  * Scale design: every operator is shuffle-bounded — shingle explosion and
  * signature building are map-side; candidate generation joins on (band,
  * band-hash) buckets so the all-pairs O(n²) comparison only happens inside
  * colliding buckets; verification joins are restricted to the candidate
  * set, with NO broadcast hint — the candidate pair count is proportional to
  * the number of near-duplicate pairs in the corpus, which is unbounded in
  * absolute terms (a heavily-duplicated 1B-doc corpus yields 10⁸⁺ candidate
  * rows), so the strategy is left to AQE, which broadcasts only when the
  * runtime size statistics say it fits. The brute-force ANN and cosine
  * near-dup are the small-n baselines; the LSH/IVF variants are the 100 TB
  * paths.
  */
object SimilarityQueries {

  private val NumPerm = 64
  private val Bands = 16
  private val RowsPerBand = NumPerm / Bands

  /** Hot-bucket guard for banded candidate generation. In-bucket pair-gen is
    * quadratic in bucket size, so one degenerate bucket (a boilerplate
    * band-hash shared by 1M rows) dominates the stage; buckets above this
    * cap are excluded. With many independent bands, a true near-dup pair
    * that collides in a pathological bucket almost surely also collides in
    * a healthy one, so the recall cost is marginal — the same argument as
    * the stop-shingle cap in TextQueries. Far above any bucket in the test
    * corpora, so contract outputs are unaffected. */
  private val MaxBucket = 4096

  /** (band, bk)-bucketed candidate pairs over `(id, band, bk)` rows, with
    * the hot-bucket guard applied. ONE shuffle to the (band, bk) buckets
    * (groupBy + a buffer-bounded collect) and a native `array_pairs`
    * explode over each sorted bucket, then the cross-band distinct —
    * replacing the earlier window-count + self-join form, which shuffled
    * the band rows twice and sorted them once (r11 bench: the extra
    * stages, not the signature math, dominated `dd_embed_lsh` after the
    * second rotation doubled the band rows).
    *
    * The hot-bucket guard engages BEFORE materialization:
    * `collect_capped_long` ([[graft.functions.CollectCappedLong]]) stops
    * appending at `maxBucket + 1` elements, so a degenerate bucket (a
    * boilerplate band hash shared by 10⁸ rows at 100 TB) holds at most
    * `maxBucket + 1` longs in its aggregation buffer instead of the full
    * id list a plain `collect_list` would build and then discard — the
    * round-12 executor-OOM finding. The filter decision is provably
    * unchanged: the capped array's size is `min(n, maxBucket + 1)`, so
    * `size BETWEEN 2 AND maxBucket` keeps/drops exactly the buckets the
    * uncapped form did, and kept buckets are collected COMPLETELY (the cap
    * only truncates buckets the filter then drops). Each band row is one
    * distinct id per bucket in every caller, so `size(ids)` equals the
    * bucket's row count, and `array_pairs` over the sorted list is exactly
    * the `a.id < b.id` self-join's pair set. Buckets of one produce no
    * pairs and are dropped by the BETWEEN. */
  private[graft] def bandedCandidates(
      bands: DataFrame, idCol: String, maxBucket: Int = MaxBucket,
      fanW: Int = 0): DataFrame =
    // r18: pin the in-bucket pair-gen stage's width (Q.pinWidth — AQE's
    // byte-proxy coalescing under-parallelizes the quadratic explode); the
    // keyed repartition replaces the aggregation's own exchange 1:1, and
    // fanW = 0 at scale keeps the plan untouched
    Q.pinWidth(bands, fanW, Seq("band", "bk")).groupBy("band", "bk")
      .agg(expr(s"collect_capped_long($idCol, $maxBucket)").as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      .select(explode(expr("array_pairs(ids)")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .where(col("i") < col("j"))
      .distinct()

  /** doc_id → distinct 3-word shingles, as in TextQueries.dd_shingle_jaccard.
    * The scan is fanned out ([[Q.fanOut]]): the n-gram explosion plus the 64
    * MinHash probes per gram amplify each input byte by orders of magnitude,
    * so a single-split scan serializes the stage on one core; at production
    * scale the gate is a no-op (guide §2.5). */
  private def shingles(spark: SparkSession): DataFrame =
    Q.fanOut(spark.table("documents"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("word_ngrams(w, 3)")).as("s"))

  /** The banded CANDIDATE stage of [[minhashLsh]] alone (signatures → band
    * keys → bucketed pairs, no verification) — the scale record
    * ([[graft.tools.BenchDedupScale]]) times it separately because at
    * 100 TB the candidate stage is the shuffle-bound half while
    * verification cost tracks the (much smaller) candidate count. */
  private[graft] def minhashCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val sh = shingles(spark)
    val minCols = (0 until NumPerm).map(i => min(xxhash64(lit(i), col("s"))).as(s"m$i"))
    val sigs = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      val cols = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"m$i"))
      struct(lit(b).as("band"), hash(cols: _*).as("bh"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bk"))
    bandedCandidates(bands, "doc_id", fanW = Q.fanWidth(spark, "documents"))
  }

  /** MinHash signatures + banded LSH candidates + exact-Jaccard verification.
    * Output = pairs with true shingle-Jaccard >= 0.5 among LSH candidates.
    * (16 bands × 4 rows: P[candidate | J=0.9] ≈ 1 - (1 - 0.9⁴)¹⁶ ≈ 0.999.) */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val cand = minhashCandidates(spark, sfDir)
    // r18 verification restructure (guide §2.3/§2.4): candidates join the
    // per-doc DISTINCT-GRAM ARRAYS and the intersection count is a
    // map-side size(array_intersect(...)) — the exploded gram stream is
    // never shuffled (the old form shuffled ~|grams| rows twice — into the
    // x/y verification joins and again into the (i, j) count aggregate)
    // and the Jaccard denominators are size(gs) projections of the same
    // arrays. Exact by the word_ngrams distinctness identity (the r17
    // verdict's recorded no-op finding): |array_intersect(gi, gj)| equals
    // the gram-equijoin count over distinct gram sets, and the integer
    // Jaccard arithmetic is value-identical. The tiny gram-array side
    // auto-broadcasts (scan-estimated well under the 10 MB threshold);
    // the unbounded candidate side streams — same strategy rationale as
    // before (never force-broadcast |cand|).
    val g = Q.fanOut(spark.table("documents"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), expr("word_ngrams(w, 3)").as("gs"))
    val gi = g.select(col("doc_id").as("i"), col("gs").as("gi"), size(col("gs")).as("ni"))
    val gj = g.select(col("doc_id").as("j"), col("gs").as("gj"), size(col("gs")).as("nj"))
    cand.join(gi, "i").join(gj, "j")
      .withColumn("c", size(array_intersect(col("gi"), col("gj"))))
      .where(col("c").cast("double") / (col("ni") + col("nj") - col("c")) >= 0.5)
      .select(col("i"), col("j"))
      .orderBy("i", "j")
  }

  /** Multi-word SimHash signature: `sigWords`×64 bits per document from
    * word-frequency-weighted bit votes, as columns `s0..s{sigWords-1}`.
    * Word k draws its bits from `xxhash64(k, term)`; word 0 uses the
    * unseeded hash so the 1-word signature is bit-identical to the public
    * 64-bit [[simhash]]. One groupBy with 64·sigWords map-side-combined
    * vote sums — still a single shuffle of per-doc partials at any width. */
  private[queries] def simhashSig(spark: SparkSession, sigWords: Int): DataFrame = {
    // r19 (guide §2.3/§2.4): the former (doc_id, w) count aggregation is
    // GONE — frequency-weighted votes regroup exactly, sum over distinct
    // words of cnt·sign(bit) ≡ sum over raw occurrences of sign(bit)
    // (integer addition reassociated, bit-identical), so the votes fold
    // directly over the exploded occurrence stream. That deletes one full
    // shuffle of the word stream AND moves the CPU-dense 64·sigWords-column
    // vote evaluation onto the fanned scan's map side: the old shape ran it
    // in the stage after the (doc_id, w) exchange, which AQE coalesced to
    // ONE task (tiny bytes, heavy CPU — the r18-measured ~400 ms serial
    // stage; the r18 pinWidth attempt to widen that stage backfired by
    // forfeiting map-side combine). The one remaining exchange carries
    // ≤ |docs| per-doc partial vote rows per map task.
    val words = Q.fanOut(spark.table("documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val withH = (0 until sigWords).foldLeft(words) { (df, k) =>
      df.withColumn(s"h$k", if (k == 0) xxhash64(col("w")) else xxhash64(lit(k), col("w")))
    }
    val voteCols = for { k <- 0 until sigWords; i <- 0 until 64 } yield
      sum(when(expr(s"(shiftright(h$k, $i) & 1) = 1"), 1).otherwise(-1))
        .as(s"v${k}_$i")
    val votes = withH.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val sigCols = (0 until sigWords).map { k =>
      (0 until 64)
        .map(i => when(col(s"v${k}_$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce(_ + _).as(s"s$k")
    }
    votes.select(col("doc_id") +: sigCols: _*)
  }

  /** 64-bit SimHash per document from word-frequency-weighted bit votes. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    simhashSig(spark, sigWords = 1)
      .select(col("doc_id"), col("s0").as("simhash")).orderBy("doc_id")
  }

  /** SimHash banding geometry: `sigWords`×64 signature bits in
    * `bands` bands of `widthBits` each. */
  private[queries] final case class SimHashConfig(sigWords: Int, bands: Int) {
    def widthBits: Int = 64 * sigWords / bands
  }

  /** Soft ceiling on the EXPECTED band-bucket size (n / 2^width) the auto
    * config aims for. In-bucket pair-gen is quadratic in bucket size, so the
    * key space must outgrow the corpus; 1024 keeps per-bucket work ~10⁶
    * pairs worst-expected-case while staying far from the next width step. */
  private val SimHashTargetBucket = 1024L

  /** Derive the banding geometry from a corpus-size hint: the fewest bands
    * that keep the pigeonhole guarantee (`maxHam + 1`), and the narrowest
    * band width in {16, 32, 64} whose 2^width key space holds the expected
    * bucket size under [[SimHashTargetBucket]] — n ≤ 2²⁶ stays at the
    * classic 64-bit/4×16 layout, up to 2⁴² widens to 128-bit/4×32, beyond
    * that 256-bit/4×64. Widening the signature together with the bands
    * preserves exactness (the pigeonhole argument is width-independent);
    * only the bucket-key space grows.
    *
    * `maxHam + 1` must be a power of two ≤ 64 so bands tile 64-bit words
    * evenly (bands never straddle a word); a sub-minimum geometry rounds
    * the band width UP to fill one word — wider keys than requested, never
    * narrower. */
  private[queries] def simhashAutoConfig(corpusSize: Long, maxHam: Int = 3): SimHashConfig = {
    val bands = maxHam + 1
    require(maxHam >= 1 && bands <= 64 && (bands & (bands - 1)) == 0,
      s"maxHam + 1 must be a power of two <= 64 (band/word tiling), got maxHam=$maxHam")
    val width = Seq(16, 32)
      .find(w => corpusSize <= (SimHashTargetBucket << w))
      .getOrElse(64)
    // fewer than 64/width bands would leave sigWords = 0: widen the bands to
    // share one word instead (bands and width both powers of two, so
    // 64*sigWords/bands is always a divisor-of-64 width >= requested)
    val sigWords = math.max(1, bands * width / 64)
    SimHashConfig(sigWords = sigWords, bands = bands)
  }

  /** SimHash near-duplicate pairs: Hamming-banded candidate join + exact
    * Hamming verification at ≤ 3 differing bits — the conventional near-dup
    * band. The banding geometry auto-widens with the corpus
    * ([[simhashAutoConfig]]): at test scale this is the classic 64-bit
    * signature in 4×16-bit bands; at 10⁹⁺ documents the signature and bands
    * widen together so the bucket space outgrows n and no bucket goes hot —
    * without giving up the pigeonhole exactness guarantee.
    *
    * Note the semantics are corpus-size-scoped: "Hamming ≤ 3" over a wider
    * signature is a finer (strictly stricter) near-dup test, so a pair's
    * status can change when the corpus crosses a width step (2²⁶ / 2⁴²
    * documents). Each result is exact for its own geometry; pipelines that
    * need corpus-size-INDEPENDENT semantics across runs should pin a
    * geometry explicitly via [[simhashSig]] + [[simhashBandedPairsN]]. */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val cfg = simhashAutoConfig(cachedCount(spark, sfDir, "documents"))
    simhashBandedPairsN(simhashSig(spark, cfg.sigWords), cfg.sigWords, cfg.bands, maxHam = 3)
  }

  /** 1-word convenience form of [[simhashBandedPairsN]] over a
    * `(doc_id, simhash)` frame. */
  private[queries] def simhashBandedPairs(sig: DataFrame, bands: Int, maxHam: Int): DataFrame =
    simhashBandedPairsN(sig.withColumnRenamed("simhash", "s0"), 1, bands, maxHam)

  /** Banded Hamming pair-gen over a `(doc_id, s0..s{sigWords-1})` signature
    * frame. With `b` bands, a pair within Hamming distance ≤ b−1 must agree
    * EXACTLY on at least one band (pigeonhole), so unlike MinHash/SRP
    * banding this candidate join loses nothing: banded + verify ≡ all-pairs
    * Hamming join, at ANY signature width. Two map-side-cheap shuffles
    * (band explode + bucket join), no n². Hot buckets are handled by
    * widening, not by the [[bandedCandidates]] hot-bucket cap, which would
    * trade away the exactness this operator guarantees. */
  private[queries] def simhashBandedPairsN(
      sig: DataFrame, sigWords: Int, bands: Int, maxHam: Int): DataFrame = {
    require(maxHam < bands, s"pigeonhole exactness needs maxHam < bands, got $maxHam/$bands")
    val totalBits = 64 * sigWords
    require(totalBits % bands == 0, s"bands must divide $totalBits, got $bands")
    val width = totalBits / bands
    require(width <= 64 && 64 % width == 0,
      s"band width must be a divisor of 64 so bands never straddle words, got $width")
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      val word = b * width / 64
      val shift = b * width % 64
      struct(lit(b).as("band"), expr(s"shiftright(s$word, $shift) & $mask").as("bk"))
    }
    val sigCols = (0 until sigWords).map(k => col(s"s$k"))
    val bd = sig
      .select(col("doc_id") +: sigCols :+ explode(array(bandCols: _*)).as("bb"): _*)
      .select(col("doc_id") +: sigCols :+ col("bb.band").as("band") :+ col("bb.bk").as("bk"): _*)
    val pairSigCols = (0 until sigWords).flatMap(k =>
      Seq(col(s"a.s$k").as(s"si$k"), col(s"b.s$k").as(s"sj$k")))
    val ham = (0 until sigWords).map(k => s"bit_count(si$k ^ sj$k)").mkString(" + ")
    bd.as("a").join(bd.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i") +: col("b.doc_id").as("j") +: pairSigCols: _*)
      .distinct()
      .where(expr(s"($ham) <= $maxHam"))
      .select(col("i"), col("j"))
      .orderBy("i", "j")
  }

  /** embeddings + L2 norm via the native codegen'd dot product
    * ([[graft.functions.VecDot]]) — same sequential double fold as the
    * `aggregate(zip_with(...))` form, minus the per-element lambda dispatch. */
  private def vecs(spark: SparkSession): DataFrame =
    vecsOf(Q.fanOut(spark.table("embeddings"), "embeddings"))

  /** [[vecs]] WITHOUT the scan fan-out — for the BOUNDED driver collects
    * (query rows, codebook donors, stride-picked centroids), which read a
    * handful of rows: the fan-out's round-robin repartition is a full
    * corpus shuffle barrier that costs more than the collect it feeds
    * (r18 measured: ann_topk's 10-row query collect over the fanned frame
    * was 2 stages + a corpus shuffle; over the plain scan it is one narrow
    * single-stage job). Values are identical by construction — the same
    * rows with the same per-row deterministic norm, partitioning-free. */
  private def vecsLite(spark: SparkSession): DataFrame =
    vecsOf(spark.table("embeddings"))

  private def dot(a: String, b: String): Column = expr(s"vec_dot($a, $b)")

  /** Vector-count ceiling for the brute-force cosine baseline: above it the
    * O(n²) cartesian is refused instead of silently launching a job that
    * cannot finish. The test corpora are far below it (≤ 5,000 vectors). */
  private[queries] val EmbedDupMaxVectors = 200000L

  /** Embedding-cosine near-duplicate pairs — ORACLE TIER, not a production
    * path. This is the exact brute-force twin of [[embedLshDup]]: a cartesian
    * `i < j` self-join, O(n²) by construction, kept because the contract
    * oracle and `SimilaritySemanticSpec`'s recall measurement need the exact
    * pair set as ground truth. It is guarded by [[EmbedDupMaxVectors]]
    * (refuses above ~200k vectors, ~2·10¹⁰ pairs) so it can never be
    * mistaken for, or promoted into, the scale path. At 100 TB use
    * [[embedLshDup]] — SRP-banded candidates + exact verification. */
  def embedDup(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val n = cachedCount(spark, sfDir, "embeddings")
    require(n <= EmbedDupMaxVectors,
      s"embedDup is the O(n²) oracle-tier baseline (n=$n > $EmbedDupMaxVectors); " +
        "use embedLshDup (dd_embed_lsh) for large corpora")
    val e = vecs(spark)
    val a = e.select(col("vec_id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("i") < col("j"))
      .where(dot("va", "vb") / (col("na") * col("nb")) > 0.45)
      .select(col("i"), col("j"))
      .orderBy("i", "j")
  }

  // ---- Random-hyperplane (SRP) LSH for embedding near-dup ----

  /** 512 signature bits in 64 bands of 8 — the 256-bit geometry of rounds
    * 8-9 plus a second band rotation (OR-amplification, round-9 verdict
    * task 8: planes 256-511 are fresh deterministic hyperplanes, so the
    * extra 32 bands are an independent chance to collide). Recall
    * 1 − (1 − (1−θ/π)⁸)⁶⁴: ≈ 0.98 at cos 0.6, ≈ 0.87 at the 0.45
    * boundary (was 0.87/0.71 with 32 bands). Bits-per-band sets the bucket
    * key space: at corpus scale choose it ≳ log2(n) so expected bucket
    * size stays O(collision-rate · n / 2^bits) and in-bucket pair-gen is
    * subquadratic; 8 bits ≈ 256 buckets/band fits the test corpora
    * (n ≤ 5000). */
  private[graft] val SrpBits = 512
  private[graft] val SrpRowsPerBand = 8
  private val SrpBands = SrpBits / SrpRowsPerBand

  /** SRP-banded near-duplicate pairs with exact-cosine verification over an
    * `(vec_id, v, nrm)` frame — the 100 TB replacement for the all-pairs
    * cartesian in [[embedDup]]: signatures and band keys are ONE map-side
    * codegen'd expression ([[graft.functions.SrpBandKeys]] — a single
    * Catalyst node where the equivalent `vec_dot`-per-plane projection is a
    * ~16k-literal tree), candidates come from a (band, key) bucket join,
    * and only candidates are exactly verified.
    *
    * P[bit agrees] = 1 − θ/π, so a band of 8 bits collides with prob
    * (1 − θ/π)⁸ and 64 bands give recall 1 − (1 − (1−θ/π)⁸)⁶⁴ — ≈ 1.0 at
    * cosine ≥ 0.8 and ≥ 0.9 at cosine ≥ 0.6 (spec-measured on planted
    * pairs), the regimes LSH near-dup detection is built for. Near the
    * decision boundary recall degrades smoothly (this corpus's 0.45–0.48
    * pairs — measured in `SimilaritySemanticSpec`; no banding scheme
    * separates θ ≈ 63° from a θ ≈ 90° background without quadratic
    * candidates). Verification is exact, so precision w.r.t. the
    * brute-force pair set is always 1. */
  private[queries] def srpNearDupPairs(e: DataFrame, threshold: Double): DataFrame = {
    val bands = e
      .select(col("vec_id"),
        posexplode(expr(s"srp_band_keys(v, $SrpBits, $SrpRowsPerBand)")).as(Seq("band", "bk")))
    val cand = bandedCandidates(bands, "vec_id",
      fanW = Q.fanWidth(e.sparkSession, "embeddings"))
    val x = e.select(col("vec_id").as("xi"), col("v").as("xv"), col("nrm").as("xn"))
    val y = e.select(col("vec_id").as("yi"), col("v").as("yv"), col("nrm").as("yn"))
    cand
      .join(x, col("xi") === col("i"))
      .join(y, col("yi") === col("j"))
      .where(dot("xv", "yv") / (col("xn") * col("yn")) > threshold)
      .select(col("i"), col("j"))
      .orderBy("i", "j")
  }

  /** Embedding near-dup via SRP LSH at the corpus threshold. Rows-only at
    * the gate (plane constants aren't reasonably expressible in the SQL
    * oracle); `SimilaritySemanticSpec` checks precision/recall against the
    * exact [[embedDup]] pair set. */
  def embedLshDup(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    srpNearDupPairs(vecs(spark), 0.45)
  }

  /** Top-k-per-query via the bounded-heap aggregate
    * ([[graft.functions.TopKPairsAgg]]) — the sort-free replacement for
    * `row_number() OVER (... ORDER BY score DESC, id) <= k`, with the
    * IDENTICAL (score desc, id asc) total order. The rank-limit window
    * (even with Spark's WindowGroupLimit pushdown) requires its input
    * locally SORTED, so a 10⁸-candidate scored stream pays a full
    * per-partition sort before one row drops; this shape is a hash
    * aggregate with map-side combine — one O(log k) heap offer per row,
    * one ≤ k-pair buffer per query through the shuffle (PqScaleSpec's 1M
    * probe measured the window form costing ~10× the scoring scan). */
  /** Global (qi, xi) row order over a BOUNDED ≤ queries×k top-k frame
    * without a range exchange (r19, guide §2.4): `ORDER BY` plans a
    * rangepartitioning Exchange plus its separate sampling job — two
    * scheduled jobs to sort ≤ 50 rows. A single-partition sort is the
    * identical total order ((qi, xi) pairs are distinct, so the sort key
    * is unique) with no exchange at all. ONLY for outputs bounded by the
    * query-count contract — pair streams and per-document frames are
    * corpus-sized and keep their distributed ORDER BY. */
  private def orderedBounded(df: DataFrame, cols: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols.map(col): _*)

  private def topKPerQuery(scored: DataFrame, score: String, k: Int): DataFrame =
    scored.groupBy("qi")
      .agg(expr(s"topk_pairs($score, xi, $k)").as("tk"))
      .select(col("qi"), explode(col("tk")).as("p"))
      .select(col("qi"), col("p").getField("i").as("xi"))

  /** Brute-force cosine top-5 neighbors for the first 10 vectors. r18: the
    * 10-row query side is collected and re-enters as a broadcast
    * LocalRelation — the broadcast build no longer schedules its own
    * corpus-scan job per run. */
  def annTopK(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val e = vecs(spark)
    val qRows = collectCentroids(
      vecsLite(spark).where(col("vec_id") < 10), Seq("vec_id", "v", "nrm"), withCcid = false)
    val qf = centFrame(spark, qRows, e.schema("v").dataType,
      Seq("qi", "vq", "nq"), withCcid = false)
    val x = e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx"))
    val scored = broadcast(qf).join(x, col("qi") =!= col("xi"))
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    orderedBounded(topKPerQuery(scored, "sim", 5), "qi", "xi")
  }

  private[graft] val IvfNprobe = 10

  /** Target scanned fraction for IVF probing — nprobe/k, the fraction of
    * the ~√n fine centroids (equivalently of the corpus) a query scans.
    * Round-16 verdict task 1: a FIXED nprobe makes that fraction shrink
    * with √n, so recall on a random corpus sags as it grows (measured
    * 0.60/0.62/0.44 for the composed tier across sf0.001/0.01/0.1 at
    * nprobe = 10) — the same failure mode the fixed 2²⁰-bit bloom blob had
    * before `sizeFor`. The FAISS rule of thumb holds the fraction
    * constant: nprobe ∝ √n. 0.45 is calibrated to the contract corpora —
    * at n = 500 (k = 22) it reproduces the long-standing nprobe = 10
    * EXACTLY (ceil(0.45·22) = 10), so every sf0.001/sf0.01 contract hash
    * is unchanged by construction, and at n = 2000 (k = 44) it doubles the
    * probe set to 20, recovering the sf0.1 sag (re-measured in the floor
    * scaladocs below). Random corpora are the worst case — recall there
    * COSTS scanned fraction, since neighbors separate by float dust and
    * spread uniformly over buckets; clustered corpora (the dedup/retrieval
    * use case) hold near-dups at rank 1 at tiny fractions — measured in
    * `BENCH_ann_scale_r17.json`'s recall-vs-nprobe curve at 1M: the
    * residual tier saturates at recall 1.0 by nprobe 100 (17.6 % scanned),
    * recall equals the probe ceiling at EVERY point, and the auto value
    * (450 there) slightly overshoots (0.99 — extra candidates displace the
    * fixed shortlist). The dial a clustered deployment turns DOWN. */
  private[queries] val IvfProbeFrac = 0.45

  /** Corpus-size-aware probe count: the fewest probes that scan
    * [[IvfProbeFrac]] of the fine centroids, floored at the legacy
    * [[IvfNprobe]] so small corpora never probe fewer buckets than the
    * pinned contract behavior. Both engines evaluate the identical double
    * expression (0.45·floor(√n), ceil'd), so the DuckDB oracles reproduce
    * the probe set value-for-value at any n. */
  private[graft] def nprobeFor(n: Long): Int = {
    val k = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    math.max(IvfNprobe, math.ceil(IvfProbeFrac * k.toDouble).toInt)
  }

  /** Query-sample size and recall tolerance for build-time nprobe
    * calibration ([[calibrateNprobe]]). 32 sampled queries × top-5 = 160
    * ground-truth pairs, so ε = 0.005 (< 1/160) accepts an earlier ladder
    * point only when its measured recall TIES the ladder maximum — on
    * random corpora (where recall keeps buying scanned fraction all the
    * way up, see [[IvfProbeFrac]]) the ceiling wins and the calibrated
    * value reproduces [[nprobeFor]]; on clustered corpora the curve
    * saturates early and the calibration captures it. */
  private[graft] val AnnCalQueries = 32
  private[graft] val AnnCalEps = 0.005

  /** Geometric nprobe ladder from the legacy [[IvfNprobe]] floor to the
    * [[nprobeFor]] ceiling, factor ~1.4 — fine enough that the chosen
    * saturation point sits within ~1.4× of the true one (the round-17
    * verdict's "within ~1.5× of measured saturation" gate). */
  private[graft] def nprobeLadder(n: Long): Seq[Int] = {
    val ceiling = nprobeFor(n)
    val b = Seq.newBuilder[Int]
    var c = IvfNprobe
    while (c < ceiling) { b += c; c = math.max(c + 1, math.ceil(c * 1.4).toInt) }
    b += ceiling
    b.result()
  }

  /** Build-time nprobe calibration (round-17 verdict task 1): the
    * constant-fraction [[nprobeFor]] rule is sized for worst-case RANDOM
    * corpora, and on clustered (i.e. real) data it overshoots — at 1M
    * vectors the auto value scanned 59 % of the corpus for recall 0.99
    * where the measured curve saturates at 17.6 % with recall 1.0
    * (`BENCH_ann_scale_r17.json`). So instead of deriving the knob from n
    * alone, measure the recall curve ON THIS CORPUS at build time and pick
    * the saturation point: run the PRODUCTION search ([[rpqSearchRanked]])
    * at each [[nprobeLadder]] point over a deterministic query sample (the
    * [[AnnCalQueries]] smallest vec_ids), score recall@5 against the exact
    * brute-force top-5 of the same sample, and choose the SMALLEST point
    * within [[AnnCalEps]] of the ladder's maximum recall. The choice is
    * stored in [[AnnIndexIO.AnnMeta]] next to the codebook — the operating
    * point is part of the trained index, the per-deployment tuning the
    * reference performs on its one index knob (`index/mod.rs:168-181`).
    * Returns the chosen nprobe plus the measured (nprobe, recall) ladder
    * for the record/logs; a single-point ladder (floor == ceiling, the
    * contract-small corpora) short-circuits without measuring. */
  private[graft] def calibrateNprobe(
      art: RpqArtifacts, e: DataFrame): (Int, Seq[(Int, Double)]) = {
    val ladder = nprobeLadder(art.n)
    if (ladder.size == 1) return (ladder.head, Nil)
    // r18: the sample is collected ONCE and re-enters every ladder search
    // and the exact side as a LocalRelation — the old per-ladder-point
    // sample scan and broadcast builds each scheduled their own jobs,
    // ~8 extra jobs per ladder point at save time
    val sampleRows = collectCentroids(
      e.orderBy("vec_id").limit(AnnCalQueries).select(col("vec_id"), col("v"), col("nrm")),
      Seq("vec_id", "v", "nrm"), withCcid = false)
    val vecType = e.schema("v").dataType
    val sample = centFrame(e.sparkSession, sampleRows, vecType,
      Seq("vec_id", "v", "nrm"), withCcid = false)
    val q = centFrame(e.sparkSession, sampleRows, vecType,
      Seq("qi", "vq", "nq"), withCcid = false)
    val scored = broadcast(q)
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")),
        col("qi") =!= col("xi"))
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    val exact = topKPerQuery(scored, "sim", 5)
      .select("qi", "xi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.isEmpty) return (ladder.last, Nil)
    val recalls = ladder.map { np =>
      val got = rpqSearchRanked(art, e, sample, np)
        .select("qi", "xi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> got.intersect(exact).size.toDouble / exact.size
    }
    val maxR = recalls.map(_._2).max
    (recalls.collectFirst { case (np, r) if r >= maxR - AnnCalEps => np }.get,
      recalls)
  }

  /** IVF-bucketed ANN — the 100 TB path: vectors are assigned to their
    * nearest centroid once (an O(n·k) map-side pass); a query probes only
    * the `nprobe` closest centroids' buckets instead of the full corpus.
    * Centroid "training" is a deterministic fixed-k pick: ids divisible by
    * `stride = ceil(n / K)`, so k ≤ K for dense ids regardless of corpus
    * size, and the choice is reproducible by the SQL oracle (no RNG). */
  /** Corpus row count per (session, sfDir) with the file listing it was
    * counted under — the one scalar IVF "training" needs. Cached so
    * repeated queries don't re-scan for it (a service would read it from
    * table stats / the index catalog); a changed listing recounts AND
    * REPLACES the entry, so centroid selection can't drift from the data
    * and the map stays one entry per live (session, sfDir) rather than
    * accreting superseded listings. Keyed on the (path, length,
    * modificationTime) listing fingerprint, so in-place rewrites that keep
    * identical file names invalidate too (same upgrade as [[md5SigMemo]]). */
  private val corpusN = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Cached row count of a registered table (see [[corpusN]] doc above). */
  private def cachedCount(spark: SparkSession, sfDir: String, table: String): Long = {
    val files = graft.index.UWheelIndex.fingerprintOfDf(spark.table(table))
    corpusN.compute(
      s"${org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)}#$sfDir#$table",
      (_, old) =>
        if (old != null && old._1 == files) old
        else (files, spark.table(table).count()))._2
  }

  /** Deterministic argmax over a broadcast candidate set WITHOUT a window:
    * `max(struct(sim, -candId, payload…))` hash-aggregates with MAP-SIDE
    * combine, so the shuffle carries one row per vector instead of the
    * full vector × candidate cross product (the window formulation
    * shuffles n·k rows — the difference between feasible and not at
    * 10⁸⁺ vectors). Ties are impossible in the struct order: -candId is
    * unique, so the payload fields after it never affect the comparison. */
  private def argmaxJoin(
      left: DataFrame, leftId: String, cands: DataFrame,
      sim: Column, candId: String, payload: Seq[String]): DataFrame = {
    val fields = Seq(sim.as("_s"), (-col(candId)).as("_n0"), col(candId).as(candId)) ++
      payload.map(c => col(c).as(c))
    left.join(broadcast(cands), lit(true))
      .groupBy(col(leftId))
      .agg(max(struct(fields: _*)).as("_a"))
      .select(col(leftId) +: (candId +: payload).map(c => col(s"_a.$c").as(c)): _*)
  }

  /** Two-level IVF index: ~√n FINE centroids (stride-picked, deterministic
    * so the SQL oracle reproduces them) hierarchically grouped under ~∜n
    * COARSE centroids. Vectors assign coarse-first (O(√k + k/k1) ≈ O(2·⁴√n)
    * comparisons each instead of O(k) flat), every step a broadcast join +
    * map-side argmax — no shuffle wider than one row per vector. At 10⁸
    * vectors: k = 10⁴ fine centroids (a ~3 MB broadcast at dim 64), each
    * query scans nprobe/k = 0.1 % of the corpus, where the round-6 flat
    * k ≤ 32 scheme scanned nprobe/32 ≈ 1/3 of EVERYTHING at any size.
    * Hierarchical assignment may differ from exact-nearest-fine (standard
    * IVF trade); the oracle mirrors the same hierarchy, so contract
    * results stay exactly checkable.
    *
    * Returns (fine centroids (cid, vc, nc, ccid) — ccid is the coarse cell
    * the fine belongs to, consumed by [[ivfSearchAdaptive]]'s
    * assignment-aligned probing — and assignment (xi, vx, nx, cid)). */
  private[graft] def ivfIndex(e: DataFrame, n: Long,
      collectFrom: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val (fines, _, assigned) = ivfIndexFull(e, n, collectFrom)
    (fines, assigned)
  }

  /** [[ivfIndex]] plus the COARSE centroid set (ccid, vcc, ncc) as a third
    * frame — [[graft.queries.AnnIndexIO]] persists it so a refresh can
    * assign APPENDED vectors through the identical coarse-first procedure
    * against the frozen hierarchy ([[assignToFrozen]]); reconstructing the
    * coarse set from the fines' in-use ccid values (the [[adaptiveProbes]]
    * shortcut) would silently drop a coarse cell that no fine mapped to. */
  /** A centroid row held on the driver: the id, the ORIGINAL-typed vector
    * (for rebuilding frames without a type round-trip), its exact
    * double-widened copy (for arithmetic), the stored norm, and — for fine
    * centroids — the owning coarse cell. */
  private[graft] final case class LocalCent(
      id: Long, orig: Seq[Any], vec: Array[Double], nrm: Double, ccid: Long)

  /** Collects a centroid frame — bounded O(√n·d) BY CONSTRUCTION, the same
    * payload every consumer already ships to each executor as
    * `broadcast(fines)` — into driver arrays sorted by id. Float vectors
    * widen exactly (the identical per-element cast [[VecDot]] performs). */
  private def collectCentroids(
      df: DataFrame, cols: Seq[String], withCcid: Boolean): Array[LocalCent] = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val isFloat = df.schema(cols(1)).dataType
      .asInstanceOf[ArrayType].elementType == FloatType
    df.select(cols.map(col): _*).collect().map { r =>
      val orig = r.getSeq[Any](1)
      val vec =
        if (isFloat) orig.iterator.map(_.asInstanceOf[Float].toDouble).toArray
        else orig.iterator.map(_.asInstanceOf[Double]).toArray
      LocalCent(r.getLong(0), orig, vec, r.getDouble(2),
        if (withCcid) r.getLong(3) else -1L)
    }.sortBy(_.id)
  }

  /** Persisted-artifact fines → (LocalRelation frame, driver rows): ONE
    * bounded O(√n·d) collect of the saved fine centroids at LOAD time
    * (r19, verdict item 3), so (a) every later search ranks probes from
    * the driver-resident rows with zero scheduled jobs and (b) downstream
    * consumers of the frame (frozen-assignment joins, re-encode) see a
    * plan-constant LocalRelation instead of a parquet scan lineage —
    * exactly the shape the in-memory build path already produces. Values
    * are byte-identical to the parquet rows (same [[collectCentroids]]
    * widening, same original-typed vector back into the frame). */
  private[queries] def localizeFines(fines: DataFrame): (DataFrame, Array[LocalCent]) = {
    val rows = collectCentroids(fines, Seq("cid", "vc", "nc", "ccid"), withCcid = true)
    (centFrame(fines.sparkSession, rows, fines.schema("vc").dataType,
      Seq("cid", "vc", "nc", "ccid"), withCcid = true), rows)
  }

  /** [[graft.functions.CentroidAssign.Hier]] from driver-local centroid
    * rows: coarse cells in ccid order, each cell's fines in cid order —
    * result-order-free (the kernel's explicit smaller-id tie-break makes
    * the argmax independent of iteration order). A fine whose ccid names
    * no coarse cell is unreachable in the join form too (probe ccids come
    * from the coarse set) and is dropped identically. */
  private def hierOf(
      fines: Array[LocalCent], coarse: Array[LocalCent]): graft.functions.CentroidAssign.Hier = {
    val d = if (coarse.nonEmpty) coarse(0).vec.length
            else if (fines.nonEmpty) fines(0).vec.length else 0
    val byCell = fines.groupBy(_.ccid)
    val cellOff = new Array[Int](coarse.length + 1)
    val ordFines = Array.newBuilder[LocalCent]
    var off = 0
    coarse.zipWithIndex.foreach { case (c, j) =>
      cellOff(j) = off
      val cell = byCell.getOrElse(c.id, Array.empty[LocalCent])
      ordFines ++= cell
      off += cell.length
    }
    cellOff(coarse.length) = off
    val of = ordFines.result()
    graft.functions.CentroidAssign.Hier(
      d,
      coarse.map(_.id), coarse.flatMap(_.vec), coarse.map(_.nrm),
      cellOff,
      of.map(_.id), of.flatMap(_.vec), of.map(_.nrm))
  }

  /** ONE-map corpus assignment against a driver-held hierarchy — see
    * [[graft.functions.CentroidAssign]] for the exactness contract vs the
    * join/aggregate form this replaces (r18, guide §2.4: zero shuffles
    * where the old form shuffled one row per corpus vector twice). */
  private def assignWithHier(
      e: DataFrame, hier: graft.functions.CentroidAssign.Hier): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx"),
        cc(graft.functions.CentroidAssignExpr(ce(col("v")), ce(col("nrm")), hier)).as("cid"))
      .where(col("cid").isNotNull)
  }

  /** Local rows → a LocalRelation frame with the given column names (the
    * hierarchy frames are plan CONSTANTS downstream — no corpus lineage,
    * no Exchange, broadcast builds are trivial). */
  private def centFrame(spark: SparkSession, rows: Array[LocalCent],
      vecType: org.apache.spark.sql.types.DataType, names: Seq[String],
      withCcid: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val base = Seq(
      StructField(names(0), LongType, nullable = false),
      StructField(names(1), vecType, nullable = true),
      StructField(names(2), DoubleType, nullable = false))
    val schema = StructType(
      if (withCcid) base :+ StructField(names(3), LongType, nullable = false) else base)
    val data = rows.map { r =>
      if (withCcid) Row(r.id, r.orig, r.nrm, r.ccid) else Row(r.id, r.orig, r.nrm)
    }.toSeq.asJava
    spark.createDataFrame(data, schema)
  }

  /** Per-query probe selection on the DRIVER (r18 optimization, guide
    * §1.2/§2.4): ranking ≤ √n fine centroids per query is O(q·√n·d) scalar
    * arithmetic over data BOTH sides already hold bounded copies of (the
    * fines are collected/broadcast everywhere, the query set is ≤ O(√n) by
    * contract — 10 rows for the contract entries, 32 for calibration), yet
    * the join form ran it as a broadcast-nested-loop join plus a
    * row_number window: one Exchange, one sort, and 2-3 scheduled jobs PER
    * ENTRY for ~2k rows of work. Measured: the ann family spent its time
    * in 10-21 sequential sub-second jobs per run, ~100 ms scheduling
    * overhead each, dwarfing the actual scan work. Exactness contract (the
    * [[graft.functions.CentroidAssign]] discipline): `qdotc` is the same
    * index-ordered double fold as [[graft.functions.VecDot]] over the same
    * [[collectCentroids]]-widened values, `csim` the same division, and
    * the (csim desc, cid asc) order replicates the replaced window's total
    * order via `java.lang.Double.compare` (NaN greatest, like Spark's
    * double ordering; csim can never be -0.0 — the fold starts at +0.0).
    * Returns (query, fine, qdotc) triples in (query, probe-rank) order. */
  private def rankProbes(qs: Array[LocalCent], fines: Array[LocalCent],
      nprobe: Int): Array[(LocalCent, LocalCent, Double)] =
    qs.flatMap { q =>
      val scored = fines.map { f =>
        var s = 0.0
        var i = 0
        val m = math.min(q.vec.length, f.vec.length)
        while (i < m) { s += q.vec(i) * f.vec(i); i += 1 }
        (f, s, s / (q.nrm * f.nrm))
      }
      scored.sortWith { (a, b) =>
        val c = java.lang.Double.compare(b._3, a._3) // csim desc
        if (c != 0) c < 0 else a._1.id < b._1.id // cid asc
      }.iterator.take(nprobe).map(t => (q, t._1, t._2)).toArray[(LocalCent, LocalCent, Double)]
    }

  /** Probe triples → a (qi, cid, qdotc, pcell) LocalRelation — the probe
    * side of the residual search as a plan constant: broadcasting it needs
    * no job, and its literal pcell set prunes the persisted codes scan at
    * PLAN time ([[rpqSearchRanked]]). */
  private def rpqProbeFrame(
      spark: SparkSession, probes: Array[(LocalCent, LocalCent, Double)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("qi", LongType, nullable = false),
      StructField("cid", LongType, nullable = false),
      StructField("qdotc", DoubleType, nullable = false),
      StructField("pcell", IntegerType, nullable = false)))
    spark.createDataFrame(
      probes.map { case (q, f, d) =>
        Row(q.id, f.id, d, java.lang.Math.floorMod(f.id, AnnPcells.toLong).toInt)
      }.toSeq.asJava, schema)
  }

  /** Probe triples → a (qi, cid) LocalRelation (the raw-IVF probe side). */
  private def ivfProbeFrame(
      spark: SparkSession, probes: Array[(LocalCent, LocalCent, Double)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("qi", LongType, nullable = false),
      StructField("cid", LongType, nullable = false)))
    spark.createDataFrame(
      probes.map { case (q, f, _) => Row(q.id, f.id) }.toSeq.asJava, schema)
  }

  /** Driver-computed ADC tables → a (qi, lut, nq) LocalRelation: the SAME
    * [[graft.functions.Pq.lut]] kernel the PqLut expression runs, fed the
    * original-typed vector, so the tables are bit-identical to the join
    * form's — built once per query on ≤ O(√n) rows, zero jobs. */
  private def qlutFrame(spark: SparkSession, qs: Array[LocalCent],
      cents: Array[Double], m: Int, ks: Int, isFloat: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("qi", LongType, nullable = false),
      StructField("lut", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("nq", DoubleType, nullable = false)))
    spark.createDataFrame(
      qs.map { q =>
        val lut = graft.functions.Pq.lut(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(q.orig.toArray),
          isFloat, cents, m, ks)
        Row(q.id, lut.toSeq, q.nrm)
      }.toSeq.asJava, schema)
  }

  /** Whether a corpus/query frame's vector column is float-typed (the
    * [[graft.functions.PqLut]] input-type flag). */
  private def isFloatVec(df: DataFrame, c: String): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    df.schema(c).dataType.asInstanceOf[ArrayType].elementType == FloatType
  }

  private[graft] def ivfIndexFull(
      e: DataFrame, n: Long,
      collectFrom: Option[DataFrame] = None): (DataFrame, DataFrame, DataFrame) = {
    val spark = e.sparkSession
    val vecType = e.schema("v").dataType
    val k = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    val stride = math.max(1L, math.ceil(n.toDouble / k).toLong)
    // the stride-picked fine rows are a BOUNDED collect — read them from
    // `collectFrom` (the un-fanned scan) when the caller provides one, so
    // the ≤ √n-row fetch skips the corpus-wide fan-out shuffle; same rows,
    // same values (r18, see [[vecsLite]])
    val finesBase = collectFrom.getOrElse(e).where(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("v").as("vc"), col("nrm").as("nc"))
    // r18 optimization (guide §2.4/§1.2): ONE bounded collect of the fine
    // rows (O(√n·d) — the exact payload every consumer already ships as
    // broadcast(fines)) replaces (a) the former count() job, (b) the
    // single-partition row_number window that rode the fines lineage into
    // every downstream materialization, and (c) the k×k1 fine→coarse
    // argmax join — all now driver arithmetic over ≤ √n rows. The
    // hierarchy frames become LocalRelations, and corpus assignment
    // becomes ONE map expression where the join/aggregate form shuffled
    // one row per corpus vector twice. Selection identity: row_number
    // ordered by the (distinct) cid equals the sorted index, so the old
    // `(r-1) % stride2 == 0` coarse pick is exactly the sorted ids at
    // positions 0, stride2, 2·stride2, …; the fine→coarse argmax runs the
    // identical widened-double arithmetic and (sim, -id) tie order.
    val fineRows = collectCentroids(finesBase, Seq("cid", "vc", "nc"), withCcid = false)
    val kf = fineRows.length.toLong
    val k1 = math.max(1L, math.floor(math.sqrt(kf.toDouble)).toLong)
    val stride2 = math.max(1L, math.ceil(kf.toDouble / k1).toLong)
    val coarseRows = fineRows.zipWithIndex.collect {
      case (r, i) if i % stride2 == 0 => r
    }
    // fine → nearest coarse (k × k1 driver dots, the join form's argmax)
    val f2cRows = fineRows.map { f =>
      var bi = -1
      var bs = 0.0
      var j = 0
      while (j < coarseRows.length) {
        val c = coarseRows(j)
        var s = 0.0
        var i = 0
        val m = math.min(f.vec.length, c.vec.length)
        while (i < m) { s += f.vec(i) * c.vec(i); i += 1 }
        s = s / (f.nrm * c.nrm)
        if (bi < 0 || java.lang.Double.compare(s, bs) > 0 ||
            (java.lang.Double.compare(s, bs) == 0 && c.id < coarseRows(bi).id)) {
          bi = j; bs = s
        }
        j += 1
      }
      f.copy(ccid = coarseRows(bi).id)
    }
    val finesC = centFrame(spark, f2cRows, vecType,
      Seq("cid", "vc", "nc", "ccid"), withCcid = true)
    val coarse = centFrame(spark, coarseRows, vecType,
      Seq("ccid", "vcc", "ncc"), withCcid = false)
    val assigned = assignWithHier(e, hierOf(f2cRows, coarseRows))
    (finesC, coarse, assigned)
  }

  /** Coarse-first assignment of `(vec_id, v, nrm)` vectors against an
    * EXISTING hierarchy — factored out so [[AnnIndexIO.refresh]] assigns
    * appended vectors through the identical procedure against FROZEN
    * centroids (standard FAISS append practice: the index never re-trains
    * on refresh, so refresh ≡ rebuild-with-frozen-codebook by
    * construction). `fines` is (cid, vc, nc, ccid), `coarse` is
    * (ccid, vcc, ncc). Returns (xi, vx, nx, cid). r18: the two-level
    * argmax runs as the ONE-map [[graft.functions.CentroidAssignExpr]]
    * against the collected (bounded) hierarchy instead of two corpus-wide
    * groupBy-argmax shuffles — see [[graft.functions.CentroidAssign]] for
    * the exactness contract. */
  private[queries] def assignToFrozen(
      fines: DataFrame, coarse: DataFrame, e: DataFrame): DataFrame = {
    val fineRows = collectCentroids(fines, Seq("cid", "vc", "nc", "ccid"), withCcid = true)
    val coarseRows = collectCentroids(coarse, Seq("ccid", "vcc", "ncc"), withCcid = false)
    if (fineRows.isEmpty || coarseRows.isEmpty)
      // the join form yields zero rows when either centroid set is empty
      // (inner joins against an empty side) — replicate that shape exactly
      return e.select(col("vec_id").as("xi"), col("v").as("vx"),
        col("nrm").as("nx"), lit(null).cast("long").as("cid")).limit(0)
    assignWithHier(e, hierOf(fineRows, coarseRows))
  }

  /** Probe + scan: each query ranks ALL fine centroids (√n comparisons per
    * query — per-query work, not per-corpus-row), scans its `nprobe`
    * buckets, and keeps the top `topK` by cosine. r18: probe selection runs
    * on the driver ([[rankProbes]] — same arithmetic, same total order);
    * the probe set and the query vectors reach the corpus scan as
    * broadcast LocalRelations, so the whole search is ONE map-side join
    * chain into the bounded-heap top-k instead of a window + three
    * scheduled broadcast builds. */
  private[graft] def ivfSearch(fines: DataFrame, assigned: DataFrame,
      queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val spark = queries.sparkSession
    val vecType = queries.schema("v").dataType
    val fineRows = collectCentroids(fines, Seq("cid", "vc", "nc"), withCcid = false)
    val qRows = collectCentroids(queries, Seq("vec_id", "v", "nrm"), withCcid = false)
    val probes = ivfProbeFrame(spark, rankProbes(qRows, fineRows, nprobe))
    val qf = centFrame(spark, qRows, vecType, Seq("qi", "vq", "nq"), withCcid = false)
    val scored = assigned
      .join(broadcast(probes), probes("cid") === assigned("cid") && col("qi") =!= col("xi"))
      .join(broadcast(qf), "qi")
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    orderedBounded(topKPerQuery(scored, "sim", topK), "qi", "xi")
  }

  /** Assignment-ALIGNED adaptive probing — the recall knob for clustered
    * (non-uniform) corpora (round-7 verdict task 6). [[ivfSearch]]'s global
    * fine ranking can sag on clustered data: a big cluster holds many
    * near-equal fine centroids split across several coarse cells, and the
    * corpus vector's ASSIGNED fine — best within its coarse cell only — can
    * rank below `nprobe` in the query's global fine order, so its bucket is
    * never scanned. The fix is to probe in the same order vectors assign:
    * rank COARSE cells per query, take the `ncoarse` best, and within each
    * probed cell take its `nfinePerCoarse` best fines. A vector's bucket is
    * BY CONSTRUCTION the rank-1 fine within its rank-1 coarse, so a
    * near-duplicate query recovers it at any knob setting ≥ 1 — ncoarse/
    * nfinePerCoarse only need to absorb argmax flips from the query/corpus
    * displacement, not the cluster's centroid density. Scan cost stays
    * ncoarse × nfinePerCoarse buckets ≈ (ncoarse · nfinePerCoarse)/√n of
    * the corpus; `IvfScaleSpec` measures both halves on a clustered 1M
    * probe (recall ≥ 0.95, scanned fraction ≪ 10 %) next to the global
    * ranking's sag. */
  private[queries] def adaptiveProbes(finesC: DataFrame, queries: DataFrame,
      ncoarse: Int, nfinePerCoarse: Int): DataFrame = {
    // the coarse cells in use: distinct ccid values, each of which is
    // itself a fine row (coarse centroids are stride-picked from the fines)
    val coarse = finesC.select(col("ccid").as("pcc")).distinct()
      .join(finesC.select(col("cid").as("pcc"), col("vc").as("vcc"), col("nc").as("ncc")),
        "pcc")
    val probesC = queries.join(broadcast(coarse), lit(true))
      .withColumn("ccs", dot("v", "vcc") / (col("nrm") * col("ncc")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccs").desc, col("pcc"))))
      .where(col("crn") <= ncoarse)
      .select(col("vec_id"), col("v"), col("nrm"), col("pcc"))
    probesC.join(broadcast(finesC), col("pcc") === col("ccid"))
      .withColumn("fs", dot("v", "vc") / (col("nrm") * col("nc")))
      .withColumn("frn", row_number().over(
        Window.partitionBy("vec_id", "pcc").orderBy(col("fs").desc, col("cid"))))
      .where(col("frn") <= nfinePerCoarse)
      .select(col("vec_id").as("qi"), col("v").as("vq"), col("nrm").as("nq"), col("cid"))
  }

  private[graft] def ivfSearchAdaptive(finesC: DataFrame, assigned: DataFrame,
      queries: DataFrame, ncoarse: Int, nfinePerCoarse: Int, topK: Int): DataFrame = {
    val probesF = adaptiveProbes(finesC, queries, ncoarse, nfinePerCoarse)
    val scored = probesF.join(assigned,
        probesF("cid") === assigned("cid") && col("qi") =!= col("xi"))
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    orderedBounded(topKPerQuery(scored, "sim", topK), "qi", "xi")
  }

  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val e = vecs(spark)
    val eq = vecsLite(spark)
    val n: Long = cachedCount(spark, sfDir, "embeddings")
    val (fines, assigned) = ivfIndex(e, n, collectFrom = Some(eq))
    ivfSearch(fines, assigned, eq.where(col("vec_id") < 10), nprobeFor(n), 5)
  }

  /** PQ geometry: 8 subspaces × 32 centroids → 8-byte codes for the dim-64
    * corpus (32× below the raw float column) with 5-bit sub-quantizer
    * indices stored one per byte for oracle portability. */
  private[graft] val PqM = 8
  private[graft] val PqKs = 32

  /** Deterministic PQ codebook: `ks` stride-picked donor vectors (the same
    * stride discipline as the IVF centroids, so the DuckDB oracle
    * reproduces the pick), sliced per subspace into the flat
    * [[graft.functions.Pq]] layout. The collect is BOUNDED BY CONSTRUCTION
    * at `ks` = 32 rows (32 small arrays — the same bounded-gate discipline as
    * the union-find localness decision); everything downstream consumes
    * the ≤ 8 KB array as a plan constant, never a join side. Returns
    * (codebook, effective ks) — a corpus smaller than the stride count
    * yields fewer donors. */
  private[graft] def pqCodebook(
      e: DataFrame, n: Long, m: Int, ks: Int): (Array[Double], Int) = {
    val stride = math.max(1L, math.ceil(n.toDouble / ks).toLong)
    val donors = e.where(col("vec_id") % stride === 0)
      .orderBy("vec_id").limit(ks)
      .select("v").collect().map(_.getSeq[Float](0).toArray)
    require(donors.nonEmpty, "pq codebook needs at least one donor vector")
    val d = donors.head.length
    require(donors.forall(_.length == d), "pq codebook donors must share one dim")
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = d / m
    val ksEff = donors.length
    val cents = new Array[Double](m * ksEff * sub)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < ksEff) {
        var t = 0
        while (t < sub) {
          cents((mi * ksEff + j) * sub + t) = donors(j)(mi * sub + t).toDouble
          t += 1
        }
        j += 1
      }
      mi += 1
    }
    (cents, ksEff)
  }

  /** ADC shortlist size: the d-wide exact dot product only ever touches
    * `PqShortlist` candidates per query — the standard PQ deployment shape
    * (cheap code scan → exact re-rank of a bounded shortlist). */
  private[graft] val PqShortlist = 100

  /** Target shortlist fraction for the RAW-vector PQ tiers (ann_pq,
    * ann_ivf_pq) — shortlist/n held constant, the same constant-fraction
    * rule as [[IvfProbeFrac]] and for the same reason: a FIXED shortlist
    * over a growing corpus is a shrinking fraction, and under the raw
    * tier's coarse 8×32 quantizer the number of competitors whose ADC
    * score lands within quantization noise of the true top-5 grows
    * LINEARLY with n, so rank displacement pushes true neighbors past any
    * fixed cutoff (measured: ann_pq recall@5 0.80/0.86/0.60 across
    * sf0.001/0.01/0.1 at the fixed 100). 0.2 is calibrated to the contract
    * corpora — at n = 500 it reproduces the long-standing shortlist = 100
    * EXACTLY (ceil(0.2·500) = 100), so sf0.001/sf0.01 hashes are unchanged
    * by construction. This dial is the honest price of a coarse quantizer
    * on a random corpus; it is NOT the 100 TB path — there you change the
    * quantizer, not the shortlist: the RESIDUAL tier (ann_ivf_rpq) keeps
    * the fixed 100-row shortlist and holds recall at the IVF probe ceiling
    * (0.84 at 1M vectors, `PqScaleSpec`/`BENCH_ann_scale`), because its
    * sub-quantizer noise sits below the neighbor gaps the shortlist must
    * resolve. */
  private[graft] val PqShortlistFrac = 0.2

  /** Corpus-size-aware ADC shortlist for the raw-quantizer tiers: the
    * smallest shortlist holding [[PqShortlistFrac]] of the corpus, floored
    * at the legacy [[PqShortlist]]. Identical double arithmetic in the
    * DuckDB oracles. */
  private[queries] def shortlistFor(n: Long): Int =
    math.max(PqShortlist, math.ceil(PqShortlistFrac * n.toDouble).toInt)

  /** ANN over PQ codes — the memory tier below [[annIvf]] for 100 TB
    * corpora, in the shape real systems deploy PQ: the SCAN side carries
    * 8-byte codes + one stored norm instead of 256-byte float vectors
    * (32× less scan-tier memory), each query builds ONE m·ks dot-product
    * table ([[graft.functions.PqLut]]), every corpus row scores in m
    * table lookups inside whole-stage codegen ([[graft.functions.PqAdc]]),
    * and only the top-[[PqShortlist]] ADC candidates are re-ranked with
    * the exact d-wide dot product — so the expensive similarity touches
    * queries × 100 rows, never the corpus. Approximate by construction
    * (the quantizer can drop a true neighbor from the shortlist);
    * `ann_pq_check` pins shortlist recall against the exact top-k
    * server-side, and the DuckDB oracle reproduces the WHOLE pipeline —
    * codebook pick, codes, ADC tables, shortlist, re-rank —
    * value-for-value, the ann_ivf precedent. Composes with [[annIvf]]
    * (probe buckets, ADC-score inside them) when corpus size demands
    * both. */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    Q.ctx(spark, sfDir)
    val e = vecs(spark)
    val eq = vecsLite(spark)
    val n: Long = cachedCount(spark, sfDir, "embeddings")
    val (cents, ks) = pqCodebook(eq, n, PqM, PqKs)
    val codes = e.select(col("vec_id").as("xi"),
      cc(graft.functions.PqEncode(ce(col("v")), cents, PqM, ks)).as("codes"),
      col("nrm").as("nx"))
    // r18 (guide §1.2/§2.4): the ≤10-row query side — ADC tables and raw
    // vectors — is collected once and re-enters the plan as broadcast
    // LocalRelations ([[qlutFrame]]: same Pq.lut kernel, bit-identical
    // tables), replacing two scheduled broadcast builds per run
    val qRows = collectCentroids(
      eq.where(col("vec_id") < 10), Seq("vec_id", "v", "nrm"), withCcid = false)
    val qluts = qlutFrame(spark, qRows, cents, PqM, ks, isFloatVec(e, "v"))
    val qf = centFrame(spark, qRows, e.schema("v").dataType,
      Seq("qi", "vq", "nq"), withCcid = false)
    // the corpus-wide top-k consumes ONLY (qi, xi, asim) through the
    // bounded-heap aggregate — no sort, no wide lut/vector columns riding
    // the shortlist selection; the shortlist re-joins the vectors
    val scanned = codes
      .join(broadcast(qluts), col("qi") =!= col("xi"))
      .withColumn("asim",
        cc(graft.functions.PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("asim"))
    val shortlist = topKPerQuery(scanned, "asim", shortlistFor(n))
    // exact re-rank of the bounded shortlist: the ONLY d-wide dot products.
    // The shortlist is ≤ queries × shortlistFor(n) rows by construction —
    // broadcast it so the corpus side is never shuffled by xi (guide §3.1)
    val reranked = broadcast(shortlist)
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")), "xi")
      .join(broadcast(qf), "qi")
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    orderedBounded(topKPerQuery(reranked, "sim", 5), "qi", "xi")
  }

  /** Recall companion for the PQ tier (the dd_embed_lsh_check pattern):
    * joins the PQ shortlist-reranked top-k against the exact top-k,
    * asserts recall@5 clears the spec-pinned floor server-side (poisoned
    * to −1 on violation), and returns the exact pair count — which the
    * DuckDB oracle computes independently by brute force. */
  def annPqCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val pq = annPq(spark, sfDir).withColumn("hit", lit(1))
    val exact = annTopK(spark, sfDir)
    val joined = exact.join(pq, Seq("qi", "xi"), "left")
    joined.agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("hit"), lit(0))).as("h"))
      .select(when(col("h") >= col("n") * lit(PqRecallFloor), col("n"))
        .otherwise(lit(-1L)).cast("long").as("n_exact"))
  }

  /** Recall@5 floor for ann_pq_check — measured 0.80 / 0.86 / 0.90 at
    * sf0.001/0.01/0.1 (auto shortlist [[shortlistFor]], ks 32; the fixed
    * 100-row shortlist measured 0.60 at sf0.1 before round 17's
    * constant-fraction sizing), pinned at 0.6 with margin. Random
    * synthetic embeddings are a WORST case for PQ — rank-5 and rank-50
    * neighbors separate by float dust the quantizer's displacement can
    * reorder — where real clustered embeddings hold their near-dups far
    * above the quantization error, the property `PqAnnSpec` pins with
    * planted duplicates recovering at rank 1. */
  private[queries] val PqRecallFloor = 0.6

  /** IVF × PQ — THE deployable 100 TB ANN shape (round-15 verdict task 1):
    * IVF bounds WHICH rows a query scans (the `nprobe` best buckets of the
    * ~√n fine centroids) while PQ bounds WHAT each scanned row costs
    * ([[graft.functions.PqAdc]]: m byte-indexed table lookups on an m-byte
    * code + one stored norm — never the raw float vector). The scan tier
    * carries (cid, codes, nx): at 10⁸ vectors × dim 64 that is ~1.6 GB of
    * codes against 25.6 GB of floats, and each query reads ~nprobe/√n of
    * it; the exact d-wide dot product touches only the top-[[PqShortlist]]
    * ADC candidates per query. Deterministic end to end — stride-picked
    * hierarchy and codebook, fixed tie-breaks — so the DuckDB oracle
    * reproduces probe selection, ADC scores inside the probed buckets, the
    * bounded shortlist, and the exact re-rank value-for-value (the ann_ivf
    * and ann_pq oracle disciplines composed). Recall vs the exact top-k is
    * pinned by [[annIvfPqCheck]]; `PqAnnSpec` holds the clustered-corpus
    * property (planted near-dups survive BOTH approximations at rank 1). */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    Q.ctx(spark, sfDir)
    val e = vecs(spark)
    val eq = vecsLite(spark)
    val n: Long = cachedCount(spark, sfDir, "embeddings")
    val (fines, assigned) = ivfIndex(e, n, collectFrom = Some(eq))
    val (cents, ks) = pqCodebook(eq, n, PqM, PqKs)
    // scan tier: one row per vector with its bucket, code, and norm — the
    // ONLY per-corpus-row state the composed search reads. r18 (guide
    // §2.4): the code is encoded ON the assignment projection (vx IS the
    // corpus vector by construction) — the old separate codes scan +
    // xi = xi2 self-join re-read and re-shuffled the corpus to attach a
    // column the same scan already had in hand
    val assignedC = assigned.select(col("xi"), col("cid"), col("nx"),
      cc(graft.functions.PqEncode(ce(col("vx")), cents, PqM, ks)).as("codes"))
    // per-query probe set and ADC tables on the DRIVER (rankProbes /
    // qlutFrame — same arithmetic, same kernels, zero extra jobs); both
    // re-enter the plan as broadcast LocalRelations
    val fineRows = collectCentroids(fines, Seq("cid", "vc", "nc"), withCcid = false)
    val qRows = collectCentroids(
      eq.where(col("vec_id") < 10), Seq("vec_id", "v", "nrm"), withCcid = false)
    val probes = ivfProbeFrame(spark, rankProbes(qRows, fineRows, nprobeFor(n)))
    val qluts = qlutFrame(spark, qRows, cents, PqM, ks, isFloatVec(e, "v"))
    // ADC inside the probed buckets only; the bucket-restricted top-k
    // consumes ONLY (qi, xi, asim) through the bounded-heap aggregate —
    // the annPq discipline — and the bounded shortlist re-joins vectors
    val scanned = assignedC.join(broadcast(probes), Seq("cid"))
      .where(col("qi") =!= col("xi"))
      .join(broadcast(qluts), "qi")
      .withColumn("asim",
        cc(graft.functions.PqAdc(ce(col("lut")), ce(col("codes")))) / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("asim"))
    val shortlist = topKPerQuery(scanned, "asim", shortlistFor(n))
    val qf = centFrame(spark, qRows, e.schema("v").dataType,
      Seq("qi", "vq", "nq"), withCcid = false)
    val reranked = broadcast(shortlist)
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")), "xi")
      .join(broadcast(qf), "qi")
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    orderedBounded(topKPerQuery(reranked, "sim", 5), "qi", "xi")
  }

  /** Recall companion for the composed tier (the ann_pq_check pattern):
    * exact top-k pair count returned only when IVF×PQ recall@5 clears the
    * spec-pinned floor server-side, −1 (oracle-poisoning) otherwise. */
  def annIvfPqCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val ivfpq = annIvfPq(spark, sfDir).withColumn("hit", lit(1))
    val exact = annTopK(spark, sfDir)
    val joined = exact.join(ivfpq, Seq("qi", "xi"), "left")
    joined.agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("hit"), lit(0))).as("h"))
      .select(when(col("h") >= col("n") * lit(IvfPqRecallFloor), col("n"))
        .otherwise(lit(-1L)).cast("long").as("n_exact"))
  }

  /** IVF-RESIDUAL PQ — the recall-recovering refinement real systems
    * (FAISS IVFPQ) deploy: instead of quantizing raw vectors, each vector
    * encodes its RESIDUAL r = v − c(bucket) against its assigned fine
    * centroid, and the codebook is built from residuals. Why it matters:
    * a ks-entry codebook resolves ~ks modes of whatever space it
    * quantizes — raw corpora have far more modes than ks at scale (the
    * plain-PQ recall collapse `PqScaleSpec` measures at 20k modes), while
    * RESIDUALS concentrate around zero with the within-bucket spread, so
    * the same ks-entry codebook distinguishes bucket MEMBERS from each
    * other. The exact dot decomposes as dot(q, x) = dot(q, c) + dot(q, r):
    * the first term is one per-(query, probed-bucket) constant the probe
    * selection already computes, the second is the standard ADC over the
    * residual codes — so the scan-tier row stays (cid, codes, nx) and the
    * per-row cost stays m table lookups. Deterministic end to end (same
    * stride disciplines over the residual stream, float residual
    * subtraction identical in both engines), full-pipeline DuckDB oracle,
    * recall pinned by [[annIvfRpqCheck]] and measured at 1M in
    * `PqScaleSpec`. */
  /** Residual-tier geometry: FINER than the raw tier's 8×32 on purpose.
    * The sub-quantizer's relative error scales ~(1/ks)^(1/sub): at the raw
    * tier's sub=8/ks=32 it is ~0.65 — acceptable for separating coarse
    * modes, but comparable to the WITHIN-bucket differences residual
    * ranking must resolve, so in-bucket ordering washes out
    * (`PqScaleSpec`'s recovering-regime probe measured 2/40 recovery at a
    * 40/40 probe ceiling under 8×32). sub=4/ks=256 brings it to ~0.25 —
    * byte codes, 16-byte rows, still 16× under the raw float column. */
  private[graft] val RpqM = 16
  private[graft] val RpqKs = 256

  /** The residual tier's frozen artifacts — exactly what [[AnnIndexIO]]
    * persists: the IVF hierarchy (`fines` (cid, vc, nc, ccid), `coarse`
    * (ccid, vcc, ncc)), the residual codebook (`cents`, effective `ks`),
    * and the scan tier `codes` (xi, cid, nx, codes) — one 16-byte code +
    * stored norm per corpus row, the ONLY per-corpus-row state a search
    * reads. `n` is the corpus row count the artifacts were trained under
    * (it sizes [[nprobeFor]] at serve time). Everything here is a
    * deterministic function of the corpus, so save/load/serve is
    * bit-reproducible. */
  private[graft] final case class RpqArtifacts(
      fines: DataFrame, coarse: DataFrame, codes: DataFrame,
      cents: Array[Double], ks: Int, n: Long,
      nprobeCal: Option[Int] = None,
      // r19 serve-path optimization (verdict item 3): the ≤ √n fine-centroid
      // rows collected ONCE when the artifacts are built or loaded, so every
      // search over them ranks probes from driver-resident state instead of
      // re-collecting the fines frame per query (on loaded artifacts that
      // was a scheduled parquet-scan job per serve). None only for
      // hand-assembled artifacts; [[rpqSearchRanked]] falls back to the
      // bounded collect.
      fineRowsCache: Option[Array[LocalCent]] = None)

  /** The probe count a search over these artifacts runs at: the build-time
    * CALIBRATED operating point when the index carries one
    * ([[calibrateNprobe]], persisted in [[AnnIndexIO.AnnMeta]]), else the
    * un-calibrated [[nprobeFor]] floor — the round-17 verdict's fix for
    * the constant-fraction rule's linear serve cost (at 1M clustered
    * vectors `nprobeFor` = 450 scans 59 % of the corpus for recall 0.99
    * where the measured curve saturates at nprobe = 100, recall 1.0 at
    * 17.6 % scanned — `BENCH_ann_scale_r17.json`). */
  private[graft] def servedNprobe(art: RpqArtifacts): Int =
    art.nprobeCal.getOrElse(nprobeFor(art.n))

  /** Partition-cell count for the persisted codes scan tier: `pcell =
    * pmod(cid, AnnPcells)` rides every codes row and [[AnnIndexIO.save]]
    * writes `partitionBy("pcell")`, so a served query's probe set — which
    * carries the same derived pcell — lets dynamic partition pruning skip
    * whole parquet partitions instead of scanning the full code tier and
    * filtering at the join. 64 cells ≈ the probe fraction's granularity:
    * with nprobe ~0.45·√n probed buckets hashed over 64 cells, a query
    * touches the cells its buckets land in and provably skips the rest
    * once nprobe < 64 stays selective (at 10⁸ vectors: 1.6 GB of codes in
    * 64 ~25 MB partitions; a 450-bucket probe set still maps to ≤ 64
    * cells, but bucket-level row-group pruning inside a cell comes free
    * from the parquet min/max on cid once writes sort by cid). Derived
    * deterministically from cid, so in-memory and persisted artifacts
    * carry identical values and result hashes are unchanged. */
  private[graft] val AnnPcells = 64

  /** The ONE derivation of the codes partition cell — every producer of a
    * (…, cid, …) codes/probe frame goes through this so the join keys and
    * the persisted layout can never drift. */
  private[graft] def withPcell(df: DataFrame): DataFrame =
    df.withColumn("pcell", pmod(col("cid"), lit(AnnPcells)).cast("int"))

  /** Builds the residual tier's artifacts over an `(vec_id, v, nrm)`
    * corpus frame — the BUILD half of [[annIvfRpq]], factored out so
    * [[AnnIndexIO.save]] persists the same frames the inline query
    * computes. Residuals are FLOAT subtraction against the assigned fine
    * centroid, so the DuckDB oracle's REAL arithmetic reproduces each
    * component bit-for-bit. */
  private[graft] def rpqArtifactsOf(e: DataFrame, n: Long,
      collectFrom: Option[DataFrame] = None): RpqArtifacts = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    val (fines, coarse, assigned) = ivfIndexFull(e, n, collectFrom)
    val assignedR = assigned
      .join(fines.select(col("cid"), col("vc")), "cid")
      .withColumn("r", expr("zip_with(vx, vc, (a, b) -> a - b)"))
    val (centsR, ks) = pqCodebook(
      assignedR.select(col("xi").as("vec_id"), col("r").as("v")), n, RpqM, RpqKs)
    // scan tier: one (cid, codes, nx) row per vector — residual codes —
    // plus the derived partition cell the persisted layout prunes by
    val scanR = withPcell(assignedR.select(col("xi"), col("cid"), col("nx"),
      cc(graft.functions.PqEncode(ce(col("r")), centsR, RpqM, ks)).as("codes")))
    // fines is a LocalRelation here, so this collect is driver-side row
    // conversion, never a job — cached so searches skip even that
    RpqArtifacts(fines, coarse, scanR, centsR, ks, n,
      fineRowsCache = Some(collectCentroids(fines, Seq("cid", "vc", "nc"), withCcid = false)))
  }

  /** Residual-code encoding of an `(vec_id, v, nrm)` frame against FROZEN
    * artifacts — assignment through the frozen hierarchy, residual against
    * the frozen fine centroid, codes from the frozen codebook. This is the
    * refresh path's encode step AND, run over the full corpus, the
    * "rebuild-modulo-frozen-codebook" reference `AnnIndexIOSpec` compares
    * a refresh against. */
  private[graft] def rpqEncodeFrozen(art: RpqArtifacts, e: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    assignToFrozen(art.fines, art.coarse, e)
      .join(art.fines.select(col("cid"), col("vc")), "cid")
      .withColumn("r", expr("zip_with(vx, vc, (a, b) -> a - b)"))
      .select(col("xi"), col("cid"), col("nx"),
        cc(graft.functions.PqEncode(ce(col("r")), art.cents, RpqM, art.ks)).as("codes"))
      .transform(withPcell)
  }

  /** The SEARCH half of [[annIvfRpq]] over (possibly loaded) artifacts:
    * probe the nprobe best fine buckets per query, ADC-score the residual
    * codes inside them (dot(q, x) = dot(q, c) + dot(q, r)), re-rank the
    * bounded shortlist exactly against the corpus frame `e` — which is the
    * SOURCE table, not index state: the persisted index carries only codes
    * and norms, and the d-wide re-rank reads raw vectors back from the
    * corpus by id, the standard deployment split. */
  private[graft] def rpqSearch(art: RpqArtifacts, e: DataFrame,
      queriesFrom: Option[DataFrame] = None): DataFrame =
    rpqSearchRanked(art, e,
      queriesFrom.getOrElse(e).where(col("vec_id") < 10), servedNprobe(art))
      .select("qi", "xi").transform(df => orderedBounded(df, "qi", "xi"))

  /** [[rpqSearch]] parameterized over the query frame and `nprobe`, with
    * the 1-based result rank — the ONE pipeline the contract entries, the
    * 1M scale spec, and the JSON record tool all execute
    * ([[graft.tools.AnnScaleHarness]] calls this; a separate copy there
    * would let the asserted pipeline drift from the production one —
    * review finding). `queries` must be a (vec_id, v, nrm) subset of the
    * corpus frame. */
  private[graft] def rpqSearchRanked(art: RpqArtifacts, e: DataFrame,
      queries: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => cc, expression => ce}
    val spark = e.sparkSession
    // r18 (guide §1.2/§2.4): probe selection — the global fine ranking per
    // query, keeping the RAW dot(q, c) bucket constant of the
    // decomposition — and the per-query ADC tables run on the DRIVER over
    // the ≤ √n fines and the ≤ O(√n) query sample ([[rankProbes]] /
    // [[qlutFrame]]: same index-ordered double fold, same Pq.lut kernel,
    // same (csim desc, cid asc) total order). The old join + window form
    // cost 8-10 scheduled jobs per run on ~2k rows of arithmetic.
    // r19 (verdict item 3): on built/loaded artifacts the fine rows are
    // already driver-resident (collected once at build/load); only
    // hand-assembled artifacts pay the bounded ≤ √n collect here
    val fineRows = art.fineRowsCache.getOrElse(
      collectCentroids(art.fines, Seq("cid", "vc", "nc"), withCcid = false))
    val qRows = collectCentroids(queries, Seq("vec_id", "v", "nrm"), withCcid = false)
    val probeRows = rankProbes(qRows, fineRows, nprobe)
    val probes = rpqProbeFrame(spark, probeRows)
    val qluts = qlutFrame(spark, qRows, art.cents, RpqM, art.ks, isFloatVec(e, "v"))
    // probe-bounded scan at the STORAGE level: the probe set is a plan
    // CONSTANT now, so the probed pcell set prunes the persisted codes
    // parquet's partitions at PLAN time (PartitionFilters: pcell IN (…) —
    // stronger than the dynamic pruning the old broadcast probe side
    // handed the scan, and asserted by AnnIndexIOSpec); the (pcell, cid)
    // join keys are unchanged, and on the in-memory path the filter is a
    // no-op map-side predicate
    val cells = probeRows.map(t => java.lang.Math.floorMod(t._2.id, AnnPcells.toLong).toInt)
      .distinct.sorted
    val codes = if (cells.isEmpty) art.codes
      else art.codes.where(col("pcell").isin(cells.map(Int.box): _*))
    val scanned = codes.join(broadcast(probes), Seq("pcell", "cid"))
      .where(col("qi") =!= col("xi"))
      .join(broadcast(qluts), "qi")
      .withColumn("asim",
        (col("qdotc") + cc(graft.functions.PqAdc(ce(col("lut")), ce(col("codes")))))
          / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("asim"))
    val shortlist = topKPerQuery(scanned, "asim", PqShortlist)
    // the ≤ queries × PqShortlist shortlist is broadcast so the corpus
    // re-rank side is never shuffled by xi (guide §3.1)
    val qf = centFrame(spark, qRows, e.schema("v").dataType,
      Seq("qi", "vq", "nq"), withCcid = false)
    val reranked = broadcast(shortlist)
      .join(e.select(col("vec_id").as("xi"), col("v").as("vx"), col("nrm").as("nx")), "xi")
      .join(broadcast(qf), "qi")
      .withColumn("sim", dot("vq", "vx") / (col("nq") * col("nx")))
      .select(col("qi"), col("xi"), col("sim"))
    topKPerQueryRanked(reranked, "sim", 5)
  }

  /** [[topKPerQuery]] with the 1-based rank kept (the scale harness reads
    * top-1 recovery off it); same bounded-heap aggregate, same total
    * order. */
  private def topKPerQueryRanked(scored: DataFrame, score: String, k: Int): DataFrame =
    scored.groupBy("qi")
      .agg(expr(s"topk_pairs($score, xi, $k)").as("tk"))
      .select(col("qi"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("qi"), col("p").getField("i").as("xi"), (col("pos") + 1).as("rn"))

  /** The corpus frame [[annIvfRpq]] and the persistence layer share:
    * (vec_id, v, nrm) with the norm from the same codegen'd dot. */
  private[graft] def vecsOf(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))

  def annIvfRpq(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val e = vecs(spark)
    val eq = vecsLite(spark)
    val n: Long = cachedCount(spark, sfDir, "embeddings")
    rpqSearch(rpqArtifactsOf(e, n, collectFrom = Some(eq)), e, queriesFrom = Some(eq))
  }

  /** `ann_ivf_rpq` SERVED FROM THE PERSISTED INDEX (round-16 verdict task
    * 3): build-or-load the [[AnnIndexIO]] artifacts for this corpus under
    * the session-scoped index root, serve the identical search from them.
    * Fresh load ≡ rebuild bit-for-bit (the artifacts are deterministic and
    * parquet round-trips floats/doubles exactly), so this entry shares
    * `ann_ivf_rpq`'s full-pipeline DuckDB oracle — the strongest available
    * proof that a RESTARTED service answers exactly what the builder
    * answered. Staleness is inert-never-wrong: a changed corpus listing
    * fails the fingerprint gate and the entry rebuilds + re-saves. */
  def annIvfRpqServed(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val art = AnnIndexIO.loadFreshOrRebuild(
      spark, AnnIndexIO.defaultDir(spark, sfDir), s"$sfDir/embeddings.parquet")
    lastServedNprobe.set(Some(servedNprobe(art)))
    // r19: the served search touches the corpus ONLY as the broadcast
    // shortlist re-rank's probe-bounded read — the fan-out's corpus-wide
    // repartition (built for the compute-amplified ENCODE consumers) is a
    // full shuffle the ≤ queries×shortlist-row re-rank never amortizes.
    // Row-identical: the fan is a repartition, the re-rank an equi-join.
    rpqSearch(art, vecsLite(spark), queriesFrom = Some(vecsLite(spark)))
  }

  /** The nprobe the most recent [[annIvfRpqServed]] run actually served at
    * — how the served entry's ORACLE "learns the calibrated value the same
    * way it learned nprobeFor" (round-17 verdict task 1): `Verify` runs
    * every query BEFORE dumping [[oracleSql]], so by oracle-generation
    * time the calibrated operating point of the index the entry answered
    * from is known in-process and [[withServedOracle]] mirrors it as a
    * literal; with no served run in this JVM the oracle falls back to the
    * [[nprobeFor]] formula (≡ the legacy shared-oracle behavior). The knob
    * VALUE is declared index state, like the codebook — the oracle still
    * recomputes the entire search pipeline at that operating point, and
    * `ann_ivf_rpq_served_check` separately gates the point's recall. */
  private val lastServedNprobe =
    new java.util.concurrent.atomic.AtomicReference[Option[Int]](None)

  /** Recall companion for the SERVED entry at its calibrated operating
    * point (the annIvfRpqCheck pattern): calibration accepts an earlier
    * ladder point only within [[AnnCalEps]] of the ceiling's recall on the
    * calibration sample, and this check proves the served answers clear
    * the same measured floor on the contract queries. */
  def annIvfRpqServedCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val served = annIvfRpqServed(spark, sfDir).withColumn("hit", lit(1))
    val exact = annTopK(spark, sfDir)
    exact.join(served, Seq("qi", "xi"), "left")
      .agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("hit"), lit(0))).as("h"))
      .select(when(col("h") >= col("n") * lit(IvfRpqRecallFloor), col("n"))
        .otherwise(lit(-1L)).cast("long").as("n_exact"))
  }

  /** Recall companion for the residual tier (the ann_pq_check pattern). */
  def annIvfRpqCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val rpq = annIvfRpq(spark, sfDir).withColumn("hit", lit(1))
    val exact = annTopK(spark, sfDir)
    val joined = exact.join(rpq, Seq("qi", "xi"), "left")
    joined.agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("hit"), lit(0))).as("h"))
      .select(when(col("h") >= col("n") * lit(IvfRpqRecallFloor), col("n"))
        .otherwise(lit(-1L)).cast("long").as("n_exact"))
  }

  /** Recall@5 floor for ann_ivf_rpq_check — measured before pinning (the
    * PqRecallFloor discipline): 0.64 / 0.70 / 0.72 at sf0.001/0.01/0.1
    * under the auto [[nprobeFor]] (0.52 at sf0.1 under the old fixed
    * nprobe = 10) — at the IVF probe ceiling (= ann_ivf's own recall) at
    * EVERY scale with the FIXED 100-row shortlist: the residual
    * quantizer's noise sits below the neighbor gaps, so the shortlist
    * never needs to grow. Pinned at 0.5 with margin; `PqAnnSpec` asserts
    * the contract corpus clears it. */
  private[queries] val IvfRpqRecallFloor = 0.5

  /** Recall@5 floor for ann_ivf_pq_check: the composition stacks the IVF
    * probe miss (a true neighbor in an unprobed bucket) on the PQ
    * shortlist miss, so its floor sits below [[PqRecallFloor]]. Measured
    * before pinning (the PqRecallFloor discipline): 0.60 / 0.62 / 0.72 at
    * sf0.001/0.01/0.1 under the round-17 auto knobs ([[nprobeFor]] +
    * [[shortlistFor]]; the fixed nprobe = 10 / shortlist = 100 measured
    * 0.44 at sf0.1 — the round-16 sag both constant-fraction rules exist
    * to remove). At sf0.1 the composed tier now sits AT its IVF probe
    * ceiling (ann_ivf's own 0.72). Clustered corpora — the dedup/retrieval
    * use case — hold their near-dups at rank 1 through BOTH approximations
    * (`PqAnnSpec`). Pinned at 0.5 with margin under the contract corpus. */
  private[queries] val IvfPqRecallFloor = 0.5

  /** Per-label embedding centroids via FIXED-POINT accumulation: each
    * component floor-quantizes to a µ-unit integer (floor over an exact
    * float→double widening is bit-deterministic), so the per-class sums are
    * order-independent BIGINTs — the deterministic-accumulation trick
    * distributed training uses to make reductions reproducible regardless
    * of partitioning. One posexplode + one hash-agg on (label, idx):
    * map-side combined, output |labels|×dim rows. */
  private val embCentroidSpark =
    """SELECT label, pos + 1 AS idx, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_q,
      |       CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
      |         / 1000000.0 / count(*) AS centroid
      |FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, val
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Recall-gated pair-set check: full-outer joins the LSH pair set
    * against the exact pair set and returns count(exact) only when
    * (a) the LSH emits NO pair outside the exact set (precision 1 — its
    * verification step applies the identical exact predicate, so any
    * extra pair is a bug, not sketch noise) and (b) recall ≥
    * `recallBound`. −1 otherwise, poisoning the oracle hash-compare.
    * Turns the hash-constant-dependent LSH entries into oracle-exact
    * companions: DuckDB checks the exact count, the bound check runs
    * server-side. */
  private def pairRecallCheck(exact: DataFrame, lsh: DataFrame,
      recallBound: Double): DataFrame = {
    val e = exact.select(col("i"), col("j")).withColumn("in_e", lit(1))
    val l = lsh.select(col("i"), col("j")).withColumn("in_l", lit(1))
    e.join(l, Seq("i", "j"), "full_outer")
      .agg(
        // coalesce AFTER the sums: a global aggregate over zero rows (both
        // pair sets empty) yields NULL sums, which would poison the CASE
        // to −1 even though 0 pairs recalled of 0 is trivially correct
        coalesce(sum(coalesce(col("in_e"), lit(0))), lit(0L)).as("total"),
        coalesce(sum(when(col("in_e").isNotNull && col("in_l").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("recalled"),
        coalesce(sum(when(col("in_e").isNull, 1L).otherwise(0L)), lit(0L)).as("lsh_only"))
      .select(when(col("lsh_only") === 0L &&
          col("recalled").cast("double") >= col("total").cast("double") * recallBound,
        col("total")).otherwise(lit(-1L)).cast("bigint").as("n_pairs"))
  }

  /** MinHash+LSH vs the exact Jaccard pair set. Per-pair miss probability
    * at J ≥ 0.9 is ~10⁻³ (16 bands × 4 rows), so 0.95 is a conservative
    * deterministic gate for this corpus's dozens of planted pairs. */
  def minhashCheck(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    pairRecallCheck(
      spark.sql(TextQueries.shingleJaccardSparkSql(
        capDf = None, fanW = Q.fanWidth(spark, "documents"))),
      minhashLsh(spark, sfDir), recallBound = 0.95)
  }

  /** SRP-LSH vs the exact cosine pair set. This corpus's pairs sit at the
    * 0.45–0.48 decision boundary — the hardest regime for any banding
    * scheme: P[8-bit band collides] = (1−θ/π)⁸ ≈ 0.031 there, so 64 bands
    * give expected recall 1−(1−0.031)⁶⁴ ≈ 0.87 (measured: 0.889 at sf0.1,
    * 1.0 at sf0.01). The gate is 0.8 — the theory floor with margin; the
    * ≥ 0.9 mid-regime claim (cos ≥ 0.6) is pinned separately by
    * `SimilaritySemanticSpec`'s planted-pair sweep, where band collision
    * probability is double and recall measures 1.0. */
  def embedLshCheck(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    pairRecallCheck(embedDup(spark, sfDir), embedLshDup(spark, sfDir),
      recallBound = 0.8)
  }

  /** Oracle-exact companion for `dd_simhash` (round-12 task 3). SimHash
    * signatures are xxhash64-dependent, so DuckDB cannot recompute them —
    * what IS oracle-checkable is that the signature is a well-defined
    * function of the document (partition-order-independent, formulation-
    * independent). Server-side, every document's signature is recomputed
    * through an INDEPENDENT single-level aggregation — votes summed
    * directly over word OCCURRENCES (`Σ ±1` per occurrence) instead of
    * [[simhashSig]]'s two-level word-count form (`Σ cnt·±1` per distinct
    * word); the two only agree if both folds are exact under any
    * partitioning. Returns the corpus document count (the DuckDB-exact
    * value) when every signature matches, −1 otherwise. */
  def simhashCheck(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val sigA = simhashSig(spark, sigWords = 1)
      .select(col("doc_id"), col("s0").as("sa"))
    // independent formulation: one explode, votes straight off occurrences
    val occ = spark.table("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val voteCols = (0 until 64).map(i =>
      sum(when(expr(s"(shiftright(h, $i) & 1) = 1"), 1L).otherwise(-1L)).as(s"v$i"))
    val sigB = occ.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("sb"))
    // n comes from the CORPUS count, not the joined signature rows: a
    // NULL-text document produces no signature on either side, so the join
    // row count would undercount and read as a mismatch (−1) on a corpus
    // that is actually fine — the oracle side is count(*) FROM documents.
    val docCnt = spark.table("documents").agg(count(lit(1)).as("n_total"))
    sigA.join(sigB, Seq("doc_id"), "full_outer")
      .agg(
        coalesce(sum(when(col("sa") === col("sb"), 0L).otherwise(1L)), lit(0L))
          .as("mismatches"))
      .crossJoin(docCnt)
      .select(when(col("mismatches") === 0L, col("n_total"))
        .otherwise(lit(-1L)).cast("bigint").as("n_docs"))
  }

  /** Oracle-exact companion for `dd_simhash_pairs` (round-12 task 3), the
    * `dd_minhash_check` shape adapted to the pigeonhole guarantee: banded
    * pair-gen must EQUAL the brute-force all-pairs Hamming ≤ 3 join over
    * the same signatures — full-outer join with zero rows unmatched on
    * EITHER side (unlike MinHash this is exact set equality, not a recall
    * bound). Returns the corpus document count (the DuckDB-exact value)
    * when the sets coincide, −1 otherwise. The brute side is O(n²) by
    * construction (it IS the ground truth), bounded by the same guard as
    * [[embedDup]]. */
  def simhashPairsCheck(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val n = cachedCount(spark, sfDir, "documents")
    require(n <= EmbedDupMaxVectors,
      s"simhashPairsCheck's brute-force side is the O(n²) oracle tier (n=$n)")
    val cfg = simhashAutoConfig(n)
    val sig = simhashSig(spark, cfg.sigWords)
    val banded = simhashBandedPairsN(sig, cfg.sigWords, cfg.bands, maxHam = 3)
    val ks = 0 until cfg.sigWords
    // fan the cartesian's STREAM side (r18, guide §2.5): the O(n²)
    // bit_count verification otherwise runs in the one or two tasks AQE
    // leaves after the signature aggregation; the extra exchange moves n
    // signature rows to parallelize n²/2 comparisons — trivially amortized
    // at any n this oracle-tier check admits, and a no-op at scale (w = 0)
    val ai0 = sig.select(col("doc_id").as("i") +: ks.map(k => col(s"s$k").as(s"si$k")): _*)
    val fw = Q.fanWidth(spark, "documents")
    val ai = if (fw > 0) ai0.repartition(fw) else ai0
    val bj = sig.select(col("doc_id").as("j") +: ks.map(k => col(s"s$k").as(s"sj$k")): _*)
    val ham = ks.map(k => s"bit_count(si$k ^ sj$k)").mkString(" + ")
    val brute = ai.join(bj, col("i") < col("j"))
      .where(expr(s"($ham) <= 3")).select(col("i"), col("j"))
    val docCnt = spark.table("documents").agg(count(lit(1)).as("n_total"))
    brute.withColumn("in_b", lit(1))
      .join(banded.withColumn("in_l", lit(1)), Seq("i", "j"), "full_outer")
      .agg(
        coalesce(sum(when(col("in_b").isNull, 1L).otherwise(0L)), lit(0L)).as("banded_only"),
        coalesce(sum(when(col("in_l").isNull, 1L).otherwise(0L)), lit(0L)).as("brute_only"))
      .crossJoin(docCnt)
      .select(when(col("banded_only") === 0L && col("brute_only") === 0L,
          col("n_total")).otherwise(lit(-1L)).cast("bigint").as("n_docs"))
  }

  // ---- md5-portable SimHash: the FULL-VALUE-oracle variant --------------
  // The production entries (dd_simhash*) draw bits from xxhash64 — the
  // right engine-native choice, but one DuckDB cannot evaluate, so their
  // checks verify properties rather than values. This variant draws its 60
  // signature bits from md5 (identical in every engine: both sides turn
  // the first 15 hex chars into the same BIGINT), so the ENTIRE simhash
  // computation — word counts → ±cnt bit votes → sign bits — is
  // value-compared against DuckDB row for row, and the banded pair-gen is
  // compared against DuckDB's brute-force all-pairs Hamming join: the
  // pigeonhole equality (banded ≡ all-pairs at Hamming ≤ bands−1) checked
  // ACROSS ENGINES, the strongest oracle the algorithm admits.

  private val Md5Bits = 60 // 15 hex chars -> fits a signed BIGINT exactly
  private val Md5Bands = 4 // Hamming <= 3 needs >= 4 bands (pigeonhole)
  private val Md5BandWidth = Md5Bits / Md5Bands
  private val Md5BandMask = (1L << Md5BandWidth) - 1

  /** Spark-side 60-bit md5 SimHash signatures as a CTE body. */
  private def md5SigSparkCte: String = {
    val votes = (0 until Md5Bits).map(i =>
      s"sum(cnt * IF((shiftright(h, $i) & 1) = 1, 1, -1)) AS v$i").mkString(",\n      ")
    val bits = (0 until Md5Bits).map(i =>
      s"IF(v$i > 0, CAST(${1L << i} AS BIGINT), CAST(0 AS BIGINT))").mkString(" + ")
    s"""words AS (
       |  SELECT doc_id, w, count(*) AS cnt FROM (
       |    SELECT doc_id, explode(split(text, ' ')) AS w FROM documents)
       |  GROUP BY doc_id, w),
       |hashed AS (
       |  SELECT doc_id, cnt,
       |         CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) AS h
       |  FROM words),
       |votes AS (
       |  SELECT doc_id,
       |      $votes
       |  FROM hashed GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS s FROM votes)""".stripMargin
  }

  /** DuckDB-side twin of [[md5SigSparkCte]] — same arithmetic, DuckDB
    * dialect (`>>`/`&` on BIGINT, hex-string cast). */
  private def md5SigDuckCte: String = {
    val votes = (0 until Md5Bits).map(i =>
      s"sum(cnt * (CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END)) AS v$i")
      .mkString(",\n      ")
    val bits = (0 until Md5Bits).map(i =>
      s"(CASE WHEN v$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""words AS (
       |  SELECT doc_id, w, count(*) AS cnt FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY doc_id, w),
       |hashed AS (
       |  SELECT doc_id, cnt, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
       |  FROM words),
       |votes AS (
       |  SELECT doc_id,
       |      $votes
       |  FROM hashed GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS s FROM votes)""".stripMargin
  }

  private val md5SimhashSparkSql =
    s"WITH ${md5SigSparkCte}\nSELECT doc_id, s AS simhash FROM sig ORDER BY doc_id"

  private val md5SimhashDuckSql =
    s"WITH ${md5SigDuckCte}\nSELECT doc_id, s AS simhash FROM sig ORDER BY doc_id"

  private val md5SimhashPairsDuckSql =
    s"""WITH ${md5SigDuckCte}
       |SELECT a.doc_id AS i, b.doc_id AS j
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= 3
       |ORDER BY i, j""".stripMargin

  /** `dd_simhash_md5_pairs` with the signature frame materialized ONCE
    * (round-13 task 3): as plain SQL Catalyst inlines the sig CTE into
    * both sides of the banded self-join and pays the 60-vote aggregation
    * twice — the suite's most expensive entry. The frame is `persist()`ed
    * and eagerly materialized (see [[md5SigMemo]]) so both join sides
    * read the cached InMemoryRelation; the result stays hash-exact vs the
    * brute-force DuckDB oracle ([[md5SimhashPairsDuckSql]]). Same banded
    * plan as the SQL form: 4 × 15-bit band keys, one shuffled candidate
    * join, exact Hamming verification. */
  /** ONE cached signature frame: (session#sfDir key, listing fingerprint,
    * persisted frame). Memoized so the bench's ~7 reps of an entry reuse
    * one materialization instead of stacking copies — but SINGLE-slot with
    * unpersist-on-replace, so a long-lived JVM holds at most one frame
    * instead of accreting one per (session, corpus), and keyed on the
    * table's (path, length, modificationTime) listing fingerprint
    * ([[graft.index.UWheelIndex.fingerprintOfDf]]) so an in-session corpus
    * rewrite — even one that keeps part-file names — rebuilds instead of
    * serving stale signatures (both review findings). `persist` rather than `localCheckpoint`: the cached
    * InMemoryRelation dedups the banded self-join's two reads the same
    * way, and is cleanly releasable. */
  private val md5SigMemo = new java.util.concurrent.atomic.AtomicReference[
    (String, Long, DataFrame)]()

  def md5SimhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val memoKey =
      org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark) + "#" + sfDir
    // staleness key = the SAME (path, length, modificationTime) listing
    // fingerprint the wheel index uses — an in-place corpus rewrite that
    // keeps identical part-file names still rebuilds (a paths-only Int
    // hash served stale persisted signatures; review finding)
    val files = graft.index.UWheelIndex.fingerprintOfDf(spark.table("documents"))
    // synchronized, not a CAS-retry updateAndGet: the build has side
    // effects (persist + materialize) that must run at most once
    val sig = md5SigMemo.synchronized {
      val old = md5SigMemo.get()
      if (old != null && old._1 == memoKey && old._2 == files) old._3
      else {
        if (old != null)
          try old._3.unpersist(blocking = false) catch { case _: Throwable => () }
        val df = spark.sql(s"WITH ${md5SigSparkCte}\nSELECT doc_id, s FROM sig")
          .persist()
        df.count() // materialize eagerly so both join sides read the cache
        md5SigMemo.set((memoKey, files, df))
        df
      }
    }
    // one posexplode per side instead of a Md5Bands-way unionAll: the
    // union form self-joined to 2×Md5Bands cached-scan leaves and planning
    // alone cost 2× the execution (review follow-up); the generator shape
    // reads the cached frame once per side
    val bands = sig.select(col("doc_id"), col("s"),
      posexplode(expr(s"transform(sequence(0, ${Md5Bands - 1}), " +
        s"b -> shiftright(s, b * $Md5BandWidth) & $Md5BandMask)")))
      .toDF("doc_id", "s", "band", "bk")
    val left = bands.select(col("band"), col("bk"), col("doc_id").as("i"), col("s").as("si"))
    val right = bands.select(col("band"), col("bk"), col("doc_id").as("j"), col("s").as("sj"))
    left.join(right, Seq("band", "bk")).where(col("i") < col("j"))
      .select(col("i"), col("si"), col("j"), col("sj")).distinct()
      .where(expr("bit_count(si ^ sj) <= 3"))
      .select(col("i"), col("j"))
      .orderBy("i", "j")
  }


  /** Symmetric int8 embedding quantization — the 4× storage cut every
    * embedding store at 100 TB takes before ANN indexing: per vector,
    * scale = 127 / max|component| and q_i = floor(x_i · scale) ∈
    * [−128, 127] — int8-safe; the −128 edge occurs when
    * fl(m · fl(127/m)) rounds above 127 so the negative extreme floors
    * one below −127, and both engines floor it identically.
    * floor over identical IEEE double arithmetic is
    * bit-deterministic across engines (round() is not: HALF_UP vs
    * half-away tie rules), so the quantized values carry a full DuckDB
    * oracle. Output is the exploded scalar form (vec_id, idx, q, scale) —
    * `scale` rides along because dequantization needs it. One map-side
    * pass, no shuffle at all until the ORDER BY. */
  private val embQuantSpark =
    """SELECT vec_id, pos + 1 AS idx,
      |       CAST(floor(CAST(val AS DOUBLE) * (127.0D / m)) AS BIGINT) AS q,
      |       CAST(127.0D / m AS DOUBLE) AS scale
      |FROM (SELECT vec_id, embedding,
      |             array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
      |      FROM embeddings) LATERAL VIEW posexplode(embedding) t AS pos, val
      |WHERE m > 0
      |ORDER BY vec_id, idx""".stripMargin

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dd_minhash_lsh" -> (minhashLsh _),
    "dd_minhash_check" -> (minhashCheck _),
    "dd_simhash" -> (simhash _),
    "dd_simhash_check" -> (simhashCheck _),
    "dd_simhash_pairs" -> (simhashPairs _),
    "dd_simhash_pairs_check" -> (simhashPairsCheck _),
    "dd_simhash_md5" -> Q.sql(md5SimhashSparkSql),
    "dd_simhash_md5_pairs" -> (md5SimhashPairs _),
    "dd_embed_dup" -> (embedDup _),
    "dd_embed_lsh" -> (embedLshDup _),
    "dd_embed_lsh_check" -> (embedLshCheck _),
    "ann_topk" -> (annTopK _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_pq_check" -> (annPqCheck _),
    "ann_ivf_pq" -> (annIvfPq _),
    "ann_ivf_pq_check" -> (annIvfPqCheck _),
    "ann_ivf_rpq" -> (annIvfRpq _),
    "ann_ivf_rpq_check" -> (annIvfRpqCheck _),
    "ann_ivf_rpq_served" -> (annIvfRpqServed _),
    "ann_ivf_rpq_served_check" -> (annIvfRpqServedCheck _),
    "emb_centroid" -> Q.sql(embCentroidSpark),
    "emb_quant" -> Q.sql(embQuantSpark),
  )


  /** Shared DuckDB CTE block: the deterministic two-level IVF hierarchy
    * (stride-picked fines, ~√k coarse, coarse-first assignment) plus the
    * first-10-queries probe set — consumed verbatim by the `ann_ivf` and
    * `ann_ivf_pq` oracles so the two can never drift apart. */
  /** The [[nprobeFor]] formula as oracle SQL — the default probe bound of
    * [[ivfOracleCtesAt]]; [[withServedOracle]] swaps in the calibrated
    * literal for the served entry. */
  private val ivfNprobeFormulaSql: String =
    s"SELECT greatest($IvfNprobe, CAST(ceil($IvfProbeFrac * k) AS BIGINT)) FROM p2"

  private def ivfOracleCtesAt(nprobeSql: String): String =
    s"""p1 AS (
      |  SELECT count(*) AS n,
      |         greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS k
      |  FROM embeddings),
      |p2 AS (SELECT n, k, greatest(1, CAST(ceil(n * 1.0 / k) AS BIGINT)) AS stride FROM p1),
      |fines AS (
      |  SELECT vec_id AS cid, embedding AS vc,
      |         row_number() OVER (ORDER BY vec_id) AS r
      |  FROM embeddings, p2 WHERE vec_id % stride = 0),
      |p3 AS (
      |  SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS k1,
      |         greatest(1, CAST(ceil(count(*) * 1.0 /
      |           greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT))) AS BIGINT)) AS stride2
      |  FROM fines),
      |coarse AS (
      |  SELECT cid AS ccid, vc AS vcc FROM fines, p3 WHERE (r - 1) % stride2 = 0),
      |f2c AS (
      |  SELECT cid, vc, ccid FROM (
      |    SELECT f.cid, f.vc, c.ccid,
      |           row_number() OVER (PARTITION BY f.cid
      |                              ORDER BY list_cosine_similarity(f.vc, c.vcc) DESC, c.ccid) AS rn
      |    FROM fines f CROSS JOIN coarse c) t WHERE rn = 1),
      |vass1 AS (
      |  SELECT vec_id, embedding, ccid FROM (
      |    SELECT e.vec_id, e.embedding, c.ccid,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY list_cosine_similarity(e.embedding, c.vcc) DESC, c.ccid) AS rn
      |    FROM embeddings e CROSS JOIN coarse c) t WHERE rn = 1),
      |assign AS (
      |  SELECT vec_id AS xi, embedding AS vx, cid FROM (
      |    SELECT a.vec_id, a.embedding, f.cid,
      |           row_number() OVER (PARTITION BY a.vec_id
      |                              ORDER BY list_cosine_similarity(a.embedding, f.vc) DESC, f.cid) AS rn
      |    FROM vass1 a JOIN f2c f ON f.ccid = a.ccid) t WHERE rn = 1),
      |probes AS (
      |  -- nprobe mirrors nprobeFor(n): max(10, ceil(0.45 * floor(sqrt(n)))),
      |  -- the constant-scanned-fraction rule; scalar subquery, not a third
      |  -- join leg (the DuckDB 1.0.0 cross-join-chain workaround)
      |  SELECT vec_id AS qi, embedding AS vq, cid FROM (
      |    SELECT e.vec_id, e.embedding, f.cid,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY list_cosine_similarity(e.embedding, f.vc) DESC, f.cid) AS rn
      |    FROM embeddings e CROSS JOIN fines f
      |    WHERE e.vec_id < 10) t
      |  WHERE rn <= ($nprobeSql))""".stripMargin

  private val ivfOracleCtes: String = ivfOracleCtesAt(ivfNprobeFormulaSql)

  /** The full residual-PQ oracle pipeline over a given IVF CTE block —
    * shared by the `ann_ivf_rpq` entry (the [[nprobeFor]] formula bound)
    * and [[withServedOracle]] (the calibrated-literal bound), so the two
    * can never drift apart. */
  private def rpqOracleSqlAt(ctes: String): String =
    "WITH " + ctes + s""",
        |res AS (
        |  SELECT a.xi, a.cid,
        |         list_transform(range(1, len(a.vx) + 1),
        |           t -> CAST(a.vx[t] - f.vc[t] AS REAL)) AS r
        |  FROM assign a JOIN fines f ON f.cid = a.cid),
        |pR AS (SELECT count(*) AS n FROM res),
        |psR AS (SELECT greatest(1, CAST(ceil(n * 1.0 / $RpqKs) AS BIGINT)) AS stride FROM pR),
        |wR AS (SELECT CAST(len(r) / $RpqM AS BIGINT) AS sub FROM res LIMIT 1),
        |donR AS (
        |  SELECT r, row_number() OVER (ORDER BY xi) - 1 AS j
        |  FROM res, psR WHERE xi % stride = 0
        |  ORDER BY xi LIMIT $RpqKs),
        |miR AS (SELECT unnest(range(0, $RpqM)) AS mi),
        |-- the width rides as a SCALAR subquery, not a third cross join:
        |-- DuckDB 1.0.0 silently yields ZERO rows for derived-CTE x dim x
        |-- dim chains of this shape (count(*) says 8000, any projection
        |-- says 0 — reproduced and worked around, not guessed)
        |centsR AS (
        |  SELECT miR.mi, d.j,
        |         list_slice(d.r, miR.mi * (SELECT sub FROM wR) + 1,
        |                    miR.mi * (SELECT sub FROM wR) + (SELECT sub FROM wR)) AS c
        |  FROM donR d CROSS JOIN miR),
        |slicesR AS (
        |  SELECT res.xi, miR.mi,
        |         list_slice(res.r, miR.mi * (SELECT sub FROM wR) + 1,
        |                    miR.mi * (SELECT sub FROM wR) + (SELECT sub FROM wR)) AS s
        |  FROM res CROSS JOIN miR),
        |encR AS (
        |  SELECT xi, mi, j AS code FROM (
        |    SELECT s.xi, s.mi, c.j,
        |           row_number() OVER (PARTITION BY s.xi, s.mi ORDER BY
        |             list_sum(list_transform(range(1, len(s.s) + 1),
        |               t -> (CAST(s.s[t] AS DOUBLE) - CAST(c.c[t] AS DOUBLE))
        |                  * (CAST(s.s[t] AS DOUBLE) - CAST(c.c[t] AS DOUBLE)))) ASC,
        |             c.j ASC) AS rn
        |    FROM slicesR s JOIN centsR c ON s.mi = c.mi) t
        |  WHERE rn = 1),
        |qslicesR AS (
        |  SELECT e.vec_id AS qi, miR.mi,
        |         list_slice(e.embedding, miR.mi * (SELECT sub FROM wR) + 1,
        |                    miR.mi * (SELECT sub FROM wR) + (SELECT sub FROM wR)) AS s
        |  FROM embeddings e CROSS JOIN miR
        |  WHERE e.vec_id < 10),
        |lutsR AS (
        |  SELECT q.qi, c.mi, c.j,
        |         list_sum(list_transform(range(1, len(q.s) + 1),
        |           t -> CAST(q.s[t] AS DOUBLE) * CAST(c.c[t] AS DOUBLE))) AS d
        |  FROM qslicesR q JOIN centsR c ON q.mi = c.mi),
        |normsR AS (
        |  SELECT vec_id, sqrt(list_sum(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |qdc AS (
        |  SELECT p.qi, p.cid,
        |         list_sum(list_transform(range(1, len(p.vq) + 1),
        |           t -> CAST(p.vq[t] AS DOUBLE) * CAST(f.vc[t] AS DOUBLE))) AS qc
        |  FROM probes p JOIN fines f ON f.cid = p.cid),
        |scannedR AS (
        |  SELECT p.qi, rs.xi, qd.qc + list_sum(list(l.d ORDER BY l.mi)) AS adot
        |  FROM probes p
        |  JOIN res rs ON rs.cid = p.cid AND p.qi <> rs.xi
        |  JOIN qdc qd ON qd.qi = p.qi AND qd.cid = p.cid
        |  JOIN encR en ON en.xi = rs.xi
        |  JOIN lutsR l ON l.qi = p.qi AND l.mi = en.mi AND l.j = en.code
        |  GROUP BY p.qi, rs.xi, qd.qc),
        |slstR AS (
        |  SELECT qi, xi FROM (
        |    SELECT s.qi, s.xi,
        |           row_number() OVER (PARTITION BY s.qi
        |             ORDER BY s.adot / (nq.nrm * nx.nrm) DESC, s.xi ASC) AS arn
        |    FROM scannedR s JOIN normsR nq ON nq.vec_id = s.qi
        |                    JOIN normsR nx ON nx.vec_id = s.xi) t
        |  WHERE arn <= $PqShortlist),
        |rrR AS (
        |  SELECT s.qi, s.xi,
        |         list_cosine_similarity(q.embedding, x.embedding) AS sim
        |  FROM slstR s JOIN embeddings q ON q.vec_id = s.qi
        |               JOIN embeddings x ON x.vec_id = s.xi)
        |SELECT qi, xi FROM (
        |  SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi ASC) AS rn
        |  FROM rrR) t
        |WHERE rn <= 5 ORDER BY qi, xi""".stripMargin


  /** Shared DuckDB CTE block: the full PQ pipeline up to the per-query ADC
    * tables — stride-picked codebook donors, per-subspace slices (width
    * derived from the embedding length), exact per-second norms, every
    * L2-argmin code, and the (query, mi, j) dot tables — consumed verbatim
    * by the `ann_pq` and `ann_ivf_pq` oracles. Sums that feed ORDERING are
    * built in controlled fold order on both engines (list_sum folds
    * left-to-right; the ADC sum aggregates an mi-ORDERED list) so the
    * double arithmetic is bit-identical, the float-parity discipline
    * emb_quant and ann_ivf already rely on. Squares are written x*x, not
    * pow, to match the Spark-side multiplication. */
  private val pqOracleCtes: String =
    s"""p AS (SELECT count(*) AS n FROM embeddings),
      |ps AS (SELECT greatest(1, CAST(ceil(n * 1.0 / $PqKs) AS BIGINT)) AS stride FROM p),
      |w AS (SELECT CAST(len(embedding) / $PqM AS BIGINT) AS sub FROM embeddings LIMIT 1),
      |donors AS (
      |  SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS j
      |  FROM embeddings, ps WHERE vec_id % stride = 0
      |  ORDER BY vec_id LIMIT $PqKs),
      |mi AS (SELECT unnest(range(0, $PqM)) AS mi),
      |cents AS (
      |  SELECT mi.mi, d.j,
      |         list_slice(d.embedding, mi.mi * w.sub + 1, mi.mi * w.sub + w.sub) AS c
      |  FROM donors d CROSS JOIN mi CROSS JOIN w),
      |slices AS (
      |  SELECT e.vec_id, mi.mi,
      |         list_slice(e.embedding, mi.mi * w.sub + 1, mi.mi * w.sub + w.sub) AS s
      |  FROM embeddings e CROSS JOIN mi CROSS JOIN w),
      |norms AS (
      |  SELECT vec_id, sqrt(list_sum(list_transform(embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |enc AS (
      |  SELECT vec_id, mi, j AS code FROM (
      |    SELECT s.vec_id, s.mi, c.j,
      |           row_number() OVER (PARTITION BY s.vec_id, s.mi ORDER BY
      |             list_sum(list_transform(range(1, len(s.s) + 1),
      |               t -> (CAST(s.s[t] AS DOUBLE) - CAST(c.c[t] AS DOUBLE))
      |                  * (CAST(s.s[t] AS DOUBLE) - CAST(c.c[t] AS DOUBLE)))) ASC,
      |             c.j ASC) AS rn
      |    FROM slices s JOIN cents c ON s.mi = c.mi) t
      |  WHERE rn = 1),
      |luts AS (
      |  SELECT s.vec_id AS qi, c.mi, c.j,
      |         list_sum(list_transform(range(1, len(s.s) + 1),
      |           t -> CAST(s.s[t] AS DOUBLE) * CAST(c.c[t] AS DOUBLE))) AS d
      |  FROM slices s JOIN cents c ON s.mi = c.mi
      |  WHERE s.vec_id < 10)""".stripMargin

  /** dd_minhash_lsh / dd_simhash / dd_simhash_pairs (Spark xxhash64/Murmur3-
    * dependent) and dd_embed_lsh (256×dim plane constants) intentionally
    * have no oracle — the driver records a rows-only check, and
    * `SimilaritySemanticSpec` validates each against its exact counterpart
    * instead. Everything else is exactly checkable — including IVF, whose
    * centroid choice, assignment, and probing are deterministic with
    * explicit tie-breaks. */
  // a DEF, not a val: [[withServedOracle]] must see the nprobe the served
  // entry actually ran at, and Verify reads oracleSql AFTER running the
  // queries — an eagerly-initialized map would freeze the formula fallback
  def oracles: Map[String, String] = withServedOracle(Map(
    // LSH recall-gated companions: the Spark side returns the exact pair
    // COUNT only when precision is 1 and recall clears the spec-pinned
    // bound, so the plain exact count is the oracle
    "dd_minhash_check" ->
      s"SELECT count(*) AS n_pairs FROM (${TextQueries.shingleJaccardDuckSql(capDf = None)})",
    // SimHash companions: the hash-dependent properties (signature
    // formulation-independence; banded ≡ brute-force all-pairs Hamming,
    // the pigeonhole guarantee) are verified server-side; the returned
    // value is the corpus doc count, which DuckDB computes directly and
    // any failed property poisons to −1
    "dd_simhash_check" ->
      "SELECT count(*) AS n_docs FROM documents",
    "dd_simhash_pairs_check" ->
      "SELECT count(*) AS n_docs FROM documents",
    // the md5-portable variant is FULLY value-oracled: DuckDB recomputes
    // every signature, and the pairs oracle is the brute-force all-pairs
    // Hamming join the Spark side's BANDED join must equal (pigeonhole)
    "dd_simhash_md5" -> md5SimhashDuckSql,
    "dd_simhash_md5_pairs" -> md5SimhashPairsDuckSql,
    "dd_embed_lsh_check" ->
      """SELECT count(*) AS n_pairs
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.45""".stripMargin,
    // mirrors the TWO-LEVEL hierarchy of ivfIndex/ivfSearch exactly:
    // ~√n stride-picked fine centroids, ~√k of them coarse, vectors
    // assigned coarse-first, queries probing the 10 nearest fines
    "ann_ivf" ->
      ("WITH " + ivfOracleCtes + """,
        |scored AS (
        |  SELECT p.qi, a.xi, list_cosine_similarity(p.vq, a.vx) AS sim
        |  FROM probes p JOIN assign a ON p.cid = a.cid AND p.qi <> a.xi)
        |SELECT qi, xi FROM (
        |  SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi) AS rn FROM scored) t
        |WHERE rn <= 5 ORDER BY qi, xi""".stripMargin),
    // FULL-pipeline PQ oracle (the ann_ivf precedent): DuckDB reproduces
    // the codebook pick (stride donors), every per-subspace L2-argmin
    // code, the per-query ADC dot tables, the top-100 ADC shortlist, and
    // the exact re-rank — value-for-value. Sums that feed ORDERING are
    // built in controlled fold order on both engines (list_sum folds
    // left-to-right; the ADC sum aggregates an mi-ORDERED list) so the
    // double arithmetic is bit-identical, the same float-parity
    // discipline emb_quant and ann_ivf already rely on. Squares are
    // written x*x, not pow, to match the Spark-side multiplication.
    "ann_pq" ->
      ("WITH " + pqOracleCtes + s""",
        |approx AS (
        |  SELECT l.qi, e.vec_id AS xi, list_sum(list(l.d ORDER BY l.mi)) AS adot
        |  FROM enc e JOIN luts l ON e.mi = l.mi AND e.code = l.j
        |  WHERE l.qi <> e.vec_id
        |  GROUP BY l.qi, e.vec_id),
        |shortlist AS (
        |  SELECT qi, xi FROM (
        |    SELECT a.qi, a.xi,
        |           row_number() OVER (PARTITION BY a.qi
        |             ORDER BY a.adot / (nq.nrm * nx.nrm) DESC, a.xi ASC) AS arn
        |    FROM approx a JOIN norms nq ON nq.vec_id = a.qi
        |                  JOIN norms nx ON nx.vec_id = a.xi) t
        |  -- shortlist mirrors shortlistFor(n): max(100, ceil(0.2 * n))
        |  WHERE arn <= (SELECT greatest($PqShortlist,
        |    CAST(ceil($PqShortlistFrac * n) AS BIGINT)) FROM p)),
        |rerank AS (
        |  SELECT s.qi, s.xi,
        |         list_cosine_similarity(q.embedding, x.embedding) AS sim
        |  FROM shortlist s JOIN embeddings q ON q.vec_id = s.qi
        |                   JOIN embeddings x ON x.vec_id = s.xi)
        |SELECT qi, xi FROM (
        |  SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi ASC) AS rn
        |  FROM rerank) t
        |WHERE rn <= 5 ORDER BY qi, xi""".stripMargin),
    // IVF × PQ composition (round-15 verdict task 1): the IVF CTE block
    // supplies probe selection + bucket assignment, the PQ block supplies
    // codes + per-query ADC tables; ADC scores only inside the probed
    // buckets, the top-$PqShortlist shortlist re-ranks exactly — the same
    // value-for-value discipline as the two parent oracles, composed
    "ann_ivf_pq" ->
      ("WITH " + ivfOracleCtes + ",\n" + pqOracleCtes + s""",
        |scanned AS (
        |  SELECT p.qi, a.xi, list_sum(list(l.d ORDER BY l.mi)) AS adot
        |  FROM probes p
        |  JOIN assign a ON p.cid = a.cid AND p.qi <> a.xi
        |  JOIN enc en ON en.vec_id = a.xi
        |  JOIN luts l ON l.qi = p.qi AND l.mi = en.mi AND l.j = en.code
        |  GROUP BY p.qi, a.xi),
        |slst AS (
        |  SELECT qi, xi FROM (
        |    SELECT s.qi, s.xi,
        |           row_number() OVER (PARTITION BY s.qi
        |             ORDER BY s.adot / (nq.nrm * nx.nrm) DESC, s.xi ASC) AS arn
        |    FROM scanned s JOIN norms nq ON nq.vec_id = s.qi
        |                   JOIN norms nx ON nx.vec_id = s.xi) t
        |  -- shortlist mirrors shortlistFor(n): max(100, ceil(0.2 * n))
        |  WHERE arn <= (SELECT greatest($PqShortlist,
        |    CAST(ceil($PqShortlistFrac * n) AS BIGINT)) FROM p)),
        |rr AS (
        |  SELECT s.qi, s.xi,
        |         list_cosine_similarity(q.embedding, x.embedding) AS sim
        |  FROM slst s JOIN embeddings q ON q.vec_id = s.qi
        |              JOIN embeddings x ON x.vec_id = s.xi)
        |SELECT qi, xi FROM (
        |  SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi ASC) AS rn
        |  FROM rr) t
        |WHERE rn <= 5 ORDER BY qi, xi""".stripMargin),
    // IVF-RESIDUAL PQ (round 16): the FAISS-IVFPQ shape — residuals
    // against the assigned fine centroid (REAL subtraction: a float op
    // computed exactly in double and rounded once to REAL is bit-equal to
    // Spark's float minus), residual codebook at the finer RpqM×RpqKs
    // geometry, ADC = per-(query, bucket) dot(q, c) constant + mi-ordered
    // residual table sum — value-for-value like the parent oracles
    "ann_ivf_rpq" -> rpqOracleSqlAt(ivfOracleCtes),
    "ann_ivf_rpq_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact FROM (
        |  WITH s AS (
        |    SELECT q.vec_id AS qi, x.vec_id AS xi,
        |           list_cosine_similarity(q.embedding, x.embedding) AS sim
        |    FROM embeddings q JOIN embeddings x
        |      ON q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |  r AS (SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi) AS rn FROM s)
        |  SELECT qi, xi FROM r WHERE rn <= 5) t""".stripMargin,
    // recall companion for the composed tier: exact top-k count, gated
    // server-side on the pinned IVF×PQ recall floor
    "ann_ivf_pq_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact FROM (
        |  WITH s AS (
        |    SELECT q.vec_id AS qi, x.vec_id AS xi,
        |           list_cosine_similarity(q.embedding, x.embedding) AS sim
        |    FROM embeddings q JOIN embeddings x
        |      ON q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |  r AS (SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi) AS rn FROM s)
        |  SELECT qi, xi FROM r WHERE rn <= 5) t""".stripMargin,
    // recall companion: the Spark side returns the exact top-k pair count
    // only when shortlist-reranked recall@5 clears the pinned floor
    // (poisoned to -1 otherwise); the plain exact count is the oracle
    "ann_pq_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact FROM (
        |  WITH s AS (
        |    SELECT q.vec_id AS qi, x.vec_id AS xi,
        |           list_cosine_similarity(q.embedding, x.embedding) AS sim
        |    FROM embeddings q JOIN embeddings x
        |      ON q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |  r AS (SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi) AS rn FROM s)
        |  SELECT qi, xi FROM r WHERE rn <= 5) t""".stripMargin,
    "dd_embed_dup" ->
      """SELECT a.vec_id AS i, b.vec_id AS j
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.45
        |ORDER BY i, j""".stripMargin,
    "ann_topk" ->
      """WITH s AS (
        |  SELECT q.vec_id AS qi, x.vec_id AS xi,
        |         list_cosine_similarity(q.embedding, x.embedding) AS sim
        |  FROM embeddings q JOIN embeddings x
        |    ON q.vec_id < 10 AND x.vec_id <> q.vec_id),
        |r AS (SELECT qi, xi, row_number() OVER (PARTITION BY qi ORDER BY sim DESC, xi) AS rn FROM s)
        |SELECT qi, xi FROM r WHERE rn <= 5 ORDER BY qi, xi""".stripMargin,
    "emb_quant" ->
      """SELECT vec_id, g.i AS idx,
        |       CAST(floor(CAST(embedding[g.i] AS DOUBLE) * (127.0 / m)) AS BIGINT) AS q,
        |       CAST(127.0 / m AS DOUBLE) AS scale
        |FROM (SELECT vec_id, embedding,
        |             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        |      FROM embeddings), generate_series(1, 64) AS g(i)
        |WHERE m > 0
        |ORDER BY vec_id, idx""".stripMargin,
    "emb_centroid" ->
      """SELECT label, g.i AS idx, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_q,
        |       CAST(sum(CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
        |         / 1000000.0 / count(*) AS centroid
        |FROM embeddings, generate_series(1, 64) AS g(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  ))

  /** `ann_ivf_rpq_served` answers from the PERSISTED index at its
    * CALIBRATED operating point, and its oracle is the same full-pipeline
    * DuckDB search recomputed at that point: the probe bound is the
    * nprobe the entry actually served at ([[lastServedNprobe]], set when
    * the entry ran earlier in the Verify process), every other stage the
    * formula-bound parent oracle's verbatim ([[rpqOracleSqlAt]]). On
    * corpora where calibration lands on the [[nprobeFor]] ceiling — the
    * random contract corpora, where recall keeps buying scanned fraction —
    * the substituted literal EQUALS the formula's value and the oracle is
    * value-identical to the parent's, the legacy shared-oracle contract.
    * With no served run in this JVM the formula bound stands in. */
  private def withServedOracle(base: Map[String, String]): Map[String, String] = {
    val servedSql = lastServedNprobe.get() match {
      case Some(np) => rpqOracleSqlAt(ivfOracleCtesAt(s"SELECT $np"))
      case None     => base("ann_ivf_rpq")
    }
    base +
      ("ann_ivf_rpq_served" -> servedSql) +
      // recall companion at the served operating point: DuckDB checks the
      // exact top-5 count, the floor gate runs server-side (the
      // ann_ivf_rpq_check pattern — same exact-count oracle)
      ("ann_ivf_rpq_served_check" -> base("ann_ivf_rpq_check"))
  }
}
