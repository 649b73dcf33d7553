package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-curation operators a training-data pipeline layers on top of the
  * dedup/similarity/text primitives: deterministic splits, per-language
  * quota sampling, benchmark decontamination, repetition scoring, duplicate
  * clustering, and exact distribution statistics (nearest-rank percentiles,
  * fixed-width histograms).
  *
  * Scale design mirrors the rest of the query surface: everything is a
  * hash-partitioned dataflow (map → hash-agg → hash/broadcast join); the one
  * iterative operator (connected-components clustering) runs an alternating
  * large-star/small-star contraction whose round count is O(log n) even on
  * adversarial path-shaped components, and whose per-round work shuffles
  * only the (small) near-dup edge list, never the corpus. Determinism
  * everywhere: splits and samples order by a multiplicative integer hash —
  * not engine RNG — so the DuckDB oracle reproduces them bit-for-bit.
  */
object PipelineQueries {

  /** Knuth's multiplicative constant; `(id * K) % p` with prime p is
    * injective for id < p, so hash order is total and tie-free. Both engines
    * evaluate it in 64-bit integer arithmetic (no overflow until id ~3.5e9
    * even at p = 1e9+7). */
  private val HashK = "2654435761"

  /** Eval-set membership for decontamination: a deterministic 1-in-97 slice
    * standing in for a held-out benchmark table. */
  private val EvalMod = 97

  /** Contamination n-gram width. Real pipelines use 8–13-gram overlap; this
    * synthetic corpus's documents share no 8-grams at all, so the contract
    * query uses the narrowest width that still flags only a sparse set
    * (4-gram ⇒ 7 of 500 docs at sf0.01; 3-gram would flag a third of the
    * corpus). Width is a single constant in both SQL texts. */
  private val ContamN = 4

  /** Bloom sizing for the broadcast decontamination path: 2^20 bits / k=5
    * holds ~100k eval grams under 1% fpp in a 128 KiB blob — one bounded
    * broadcast regardless of corpus size. */
  private val BloomBits = 1 << 20
  private val BloomK = 5

  /** md5-portable Bloom twin sizing: 2^17 bits / k=3 (the probe count is
    * the VALUES(0,1,2) table in both SQL texts) is deliberately TIGHT so
    * false positives occur at contract scale and the cross-engine oracle
    * proves both engines reproduce the same ones, not just the same true
    * hits. */
  private val Md5BloomBits = 1 << 17

  /** Shingle width for the source-pair overlap matrix: 8 words — wide
    * enough that only genuinely shared passages count (4-grams would link
    * every source pair on this small-vocabulary corpus). */
  private val OverlapN = 8

  /** Duplicate-span width for the corpus-level duplicate-mass signal
    * (dd_span_frac). 4 words: at sf0.01 the per-doc duplicated-gram
    * fraction then separates cleanly (median 0.03, a near-dup tail at 1.0,
    * 47/500 past the one-half gate) where 3-grams would mark 93% of this
    * small-vocabulary synthetic corpus duplicated. */
  private val SpanN = 4

  // --- Spark SQL ----------------------------------------------------------

  /** Shared CTE prelude of the Bloom decontamination entries: corpus grams,
    * the eval-side bloom blob (one row), and the training-side gram stream.
    * Parametrized on the blob sizing so [[bloomDeconAuto]] can run the same
    * shape with counted-eval-side sizing; the CONTRACT entries pin the
    * fixed defaults so their hashes stay byte-stable across rounds. */
  private def bloomPreludeWith(bits: Int, k: Int) =
    s"""d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
       |      WHERE size(split(text, ' ')) >= $ContamN),
       |g AS (SELECT doc_id, explode(word_ngrams(w, $ContamN)) AS s FROM d),
       |e AS (SELECT bloom_agg(xxhash64(s), $bits, $k) AS bf
       |      FROM (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0) ev),
       |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0)""".stripMargin

  private val bloomPrelude = bloomPreludeWith(BloomBits, BloomK)

  /** Auto-sized Bloom decontamination (round-14 verdict task 1): ONE cheap
    * aggregation over the eval side — the SMALL side by construction —
    * counts its distinct grams, [[graft.functions.BloomBlob.sizeFor]]
    * turns (count, targetFpp) into (numBits, k), and the same
    * scalar-subquery plan as `ds_bloom_decon` runs with that sizing. This
    * is the production entry point: the fixed 2^20/k=5 contract default
    * silently degrades once a real eval suite outgrows ~100k grams (1M
    * grams there ⇒ ~63% fpp), while sizing from the counted eval side
    * holds the target at one extra scan of the suite, never the corpus.
    *
    * `targetFpp` is PER GRAM, and a document is flagged when ANY of its
    * grams probes true — so the per-doc over-flag rate compounds to
    * ≈ gramsPerDoc × fpp. The 1e-4 default keeps that compounded rate
    * ~1% for ~100-gram documents (a 1% per-gram target measured 208
    * flagged vs 8 exact on the contract corpus), and the 1 KiB bit floor
    * keeps tiny eval slices from compounding through an over-dense
    * formula-floor blob. Returns (result, numBits, k, evalGramCount) so
    * callers can record the sizing AND derive the realized per-gram fpp
    * (see [[bloomDeconExpectedOverFlag]]). */
  def bloomDeconAuto(
      spark: SparkSession,
      sfDir: String,
      targetFpp: Double = 1e-4): (DataFrame, Int, Int, Long) = {
    // ensureViews, NOT ctxViewsOnly: the latter's empty prepared marker
    // would make every later Q.ctx on this session skip the wheel builds
    // (session poison for uw_* service — caught by TopKWheelSpec in-suite)
    Q.ensureViews(spark, sfDir)
    val nGrams = spark.sql(
      s"""SELECT count(DISTINCT s) FROM (
         |  SELECT explode(word_ngrams(split(text, ' '), $ContamN)) AS s
         |  FROM documents
         |  WHERE size(split(text, ' ')) >= $ContamN AND doc_id % $EvalMod = 0)""".stripMargin)
      .head().getLong(0)
    val (bits0, k) = graft.functions.BloomBlob.sizeFor(nGrams, targetFpp)
    val bits = math.max(bits0, 1 << 13)
    val df = spark.sql(
      s"""WITH ${bloomPreludeWith(bits, k)}
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM t
         |WHERE bloom_contains((SELECT bf FROM e), xxhash64(t.s))
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)
    (df, bits, k, nGrams)
  }

  /** Expected number of CLEAN training documents the sized blob over-flags
    * (round-15 verdict task 5 — the budget the scale record publishes next
    * to the measured flagged-minus-exact delta, so a reader can tell
    * budgeted false positives from a regression). A doc is flagged when
    * ANY of its grams probes true; a doc with NO gram in the eval set has
    * every probe be an independent-approximately false-positive trial at
    * the blob's realized per-gram rate p = (1 − e^(−k·n/m))^k, so its flag
    * probability is 1 − (1−p)^g for its g distinct grams, and the expected
    * over-flag count is the sum of that over exactly the docs the EXACT
    * join leaves unflagged (docs the exact join flags are true positives
    * on both paths — they never contribute an over-flag). One pass: per-doc
    * gram counts anti-joined against the exact hit set, then a closed-form
    * aggregate — no bloom involved, so it prices the blob, not re-runs it. */
  def bloomDeconExpectedOverFlag(
      spark: SparkSession, sfDir: String, bits: Int, k: Int, nEvalGrams: Long): Double = {
    Q.ensureViews(spark, sfDir)
    val p = math.pow(1.0 - math.exp(-k.toDouble * nEvalGrams.toDouble / bits.toDouble), k.toDouble)
    val row = spark.sql(
      s"""WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
         |           WHERE size(split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, explode(word_ngrams(w, $ContamN)) AS s FROM d),
         |ev AS (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0),
         |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0),
         |flagged AS (SELECT DISTINCT t.doc_id FROM t JOIN ev ON t.s = ev.s),
         |clean AS (
         |  SELECT t.doc_id, count(DISTINCT t.s) AS gcnt FROM t
         |  LEFT ANTI JOIN flagged ON t.doc_id = flagged.doc_id
         |  GROUP BY t.doc_id)
         |SELECT CAST(sum(1.0D - pow(1.0D - $p, gcnt)) AS DOUBLE) FROM clean""".stripMargin)
      .head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  private val sparkSql: Seq[(String, String)] = Seq(
    // deterministic train/val/test split: 80/10/10 by multiplicative hash
    // of the stable doc id. Hash-based (not random) so any engine — and any
    // re-run over a grown corpus — assigns unchanged rows to unchanged
    // splits, the property training pipelines need for reproducibility.
    "ds_split" ->
      s"""SELECT CASE WHEN (doc_id * $HashK) % 1000 < 800 THEN 'train'
         |            WHEN (doc_id * $HashK) % 1000 < 900 THEN 'val'
         |            ELSE 'test' END AS split,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_words
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    // language-balanced subsampling: up to 50 docs per language, picked in
    // deterministic hash order (a seeded shuffle both engines reproduce).
    // The standard rebalancing step before mixing a multilingual corpus.
    "ds_lang_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |             ORDER BY (doc_id * $HashK) % 1000000007, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin,

    // benchmark decontamination: flag training docs sharing any word
    // n-gram with the (broadcast-small) eval slice, with the shared-gram
    // count as evidence. Distinct-gram explode keeps the join input linear
    // in corpus size; the eval side is DISTINCT-collapsed before the join.
    "txt_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
         |           WHERE size(split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, explode(word_ngrams(w, $ContamN)) AS s
         |      FROM d),
         |e AS (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0),
         |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM t JOIN e ON t.s = e.s
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // Bloom-filter decontamination — the 100 TB shape of txt_decontaminate:
    // the eval side collapses to ONE bounded blob (bloom_agg partials merge
    // as byte ORs, a tree aggregation) consumed as an UNCORRELATED SCALAR
    // SUBQUERY — executed once, its value cached, so the corpus side is a
    // pure MAP-SIDE bloom_contains filter with no join at all. NOT a
    // cross-join against the 1-row blob frame: a join row pays an O(blob)
    // getBinary copy PER CORPUS GRAM (measured 20× slower at 100× corpus
    // scale — 3M grams × 128 KiB of memcpy), the same reason Spark's own
    // runtime bloom filter demands a constant/subquery bloom side. vs the
    // exact join: under ~10 MB of eval grams Spark broadcasts the hash join
    // anyway, but the hash map holds every gram STRING (tens of bytes
    // each) where the blob is 128 KiB TOTAL for ≤100k grams — and past the
    // broadcast threshold the exact join degrades to shuffling the full
    // corpus gram stream while the blob stays broadcastable for orders of
    // magnitude longer. False positives only (never a miss —
    // ds_bloom_decon_check pins that), the right trade for a
    // flag-then-verify pipeline. Blob content is hash-dependent →
    // rows-only contract entry; the md5 twin below carries the full value
    // oracle for the same bloom semantics.
    "ds_bloom_decon" ->
      s"""WITH $bloomPrelude
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM t
         |WHERE bloom_contains((SELECT bf FROM e), xxhash64(t.s))
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // the no-false-negative proof: every doc the EXACT decontamination
    // join flags must be bloom-flagged too (missed = 0 — a bloom miss on an
    // inserted item is impossible by construction, this pins the wiring).
    // Only n_exact is computed by BOTH engines; the DuckDB twin PINS
    // missed = 0 by construction (it has no bloom to probe), so the compare
    // enforces the Spark side's missed count against that fixed expectation
    // one-sidedly — there is no independent DuckDB bloom check.
    "ds_bloom_decon_check" ->
      s"""WITH $bloomPrelude,
         |bl AS (SELECT DISTINCT t.doc_id FROM t
         |       WHERE bloom_contains((SELECT bf FROM e), xxhash64(t.s))),
         |ex AS (SELECT DISTINCT t.doc_id FROM t
         |       JOIN (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0) ev
         |         ON t.s = ev.s)
         |SELECT CAST(count(*) AS BIGINT) AS n_exact,
         |       CAST(count(CASE WHEN bl.doc_id IS NULL THEN 1 END) AS BIGINT) AS missed
         |FROM ex LEFT JOIN bl ON ex.doc_id = bl.doc_id""".stripMargin,

    // md5-portable Bloom twin with a FULL value oracle (the dd_simhash_md5
    // pattern): probe positions derive from md5 via the same integer
    // arithmetic in both engines, the bit set is a DISTINCT position set,
    // and a gram hits iff all 3 probes land on set positions — so DuckDB
    // reproduces the bloom's false positives bit-for-bit, proving the
    // membership semantics (not just the true hits) cross-engine. Sized
    // tight (2^17 bits) so false positives actually occur at contract
    // scale.
    "ds_bloom_md5" ->
      s"""WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
         |           WHERE size(split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, explode(word_ngrams(w, $ContamN)) AS s FROM d),
         |h AS (SELECT doc_id, s,
         |             CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h1,
         |             CAST(conv(substring(md5(s), 17, 15), 16, 10) AS BIGINT) AS h2
         |      FROM g),
         |ks AS (SELECT i FROM VALUES (0), (1), (2) AS t(i)),
         |bits AS (SELECT DISTINCT (h1 + i * h2) % $Md5BloomBits AS b
         |         FROM h CROSS JOIN ks WHERE doc_id % $EvalMod = 0),
         |probe AS (SELECT doc_id, s, (h1 + i * h2) % $Md5BloomBits AS b
         |          FROM h CROSS JOIN ks WHERE doc_id % $EvalMod <> 0),
         |hit AS (SELECT doc_id, s FROM probe JOIN bits ON probe.b = bits.b
         |        GROUP BY doc_id, s HAVING count(*) = 3)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // intra-document repetition score (the Gopher-style rep signal):
    // duplicate-bigram fraction, integer counts + one division so both
    // engines agree bit-for-bit.
    "txt_repetition" ->
      """WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
        |           WHERE size(split(text, ' ')) >= 2),
        |b AS (SELECT doc_id, size(w) - 1 AS n_bi,
        |             size(word_ngrams(w, 2)) AS n_uniq
        |      FROM d)
        |SELECT doc_id, CAST(n_bi AS BIGINT) AS n_bigrams,
        |       CAST(n_bi - n_uniq AS DOUBLE) / n_bi AS dup_frac,
        |       CASE WHEN (n_bi - n_uniq) * 5 >= n_bi THEN 'repetitive' ELSE 'ok' END AS verdict
        |FROM b ORDER BY doc_id""".stripMargin,

    // exact nearest-rank percentiles per group: one distributed sort per
    // partition key (window), no interpolation — `ceil(n·q)`-th value is
    // pure integer pick, identical in any engine (quantile_cont-style
    // interpolation semantics differ between engines; nearest-rank doesn't).
    "q_percentile" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |           row_number() OVER (PARTITION BY o_orderpriority
        |                              ORDER BY o_totalprice, o_orderkey) AS rn,
        |           count(*) OVER (PARTITION BY o_orderpriority) AS n
        |           FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN o_totalprice END) AS p95,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN o_totalprice END) AS p99
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // fixed-width histogram: floor-bin then hash-agg — one map-side-combined
    // shuffle of bin counts, the scalable form of a distribution profile.
    "q_histogram" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    // token-budget sequence packing (the pretraining "pack documents into
    // fixed-length sequences" step), made deterministic and distributed:
    // docs are hashed into independent packer buckets (PARTITION BY keeps
    // every bucket's running token sum local — no global cumsum bottleneck),
    // packed greedily in hash order, and a doc opens in the bin where its
    // bucket-cumulative token count starts. Reported per (bucket, bin):
    // the packing manifest. 2048-token budget; division through DOUBLE is
    // exact here (counts << 2^53) and shared by both dialects.
    "ds_pack" ->
      s"""WITH t AS (SELECT doc_id, size(split(text, ' ')) AS n,
         |                  (doc_id * $HashK) % 32 AS bucket,
         |                  (doc_id * $HashK) % 1000000007 AS h FROM documents),
         |c AS (SELECT bucket, doc_id, n,
         |             sum(n) OVER (PARTITION BY bucket ORDER BY h, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT bucket, CAST(floor((cum - n) / 2048.0) AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM c GROUP BY bucket, bin ORDER BY bucket, bin""".stripMargin,

    // weighted mixture construction: subsample each source (language) at its
    // own rate — the "mix corpora at fixed ratios" step of a pretraining
    // recipe. Deterministic per-row hash gate, no RNG, no shuffle beyond the
    // final count: a row's fate depends only on its id and its source's
    // weight, so a grown corpus keeps every previously-kept row (the same
    // stability property as ds_split).
    "ds_mix" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
         |FROM documents
         |WHERE (doc_id * $HashK) % 1000 <
         |      CASE lang WHEN 'en' THEN 600 WHEN 'zh' THEN 400
         |                WHEN 'de' THEN 300 ELSE 150 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // curation-funnel accounting: every doc gets exactly one verdict by a
    // fixed precedence (length → repetition → language allowlist → kept),
    // reported as a per-verdict census — the drop-reason bookkeeping every
    // filtering pipeline publishes alongside its output. One map pass + one
    // tiny hash-agg. Spark side counts unique bigrams with the native
    // word_ngrams (empty array below 2 words, so no guard needed); the
    // oracle keeps the HOF chain under a CASE guard (slice() would fault
    // on sub-2-word rows there).
    "ds_funnel" ->
      """WITH d AS (SELECT doc_id, lang, split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, lang, size(w) AS n_words, size(w) - 1 AS n_bi,
        |             size(word_ngrams(w, 2)) AS n_uniq
        |      FROM d),
        |v AS (SELECT CASE WHEN n_words < 30 THEN 'too_short'
        |                  WHEN (n_bi - n_uniq) * 5 >= n_bi THEN 'repetitive'
        |                  WHEN lang NOT IN ('en', 'de', 'fr') THEN 'lang_filtered'
        |                  ELSE 'kept' END AS verdict
        |      FROM s)
        |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs
        |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin,

    // corpus-level duplicate-span mass (the exact-substring-dedup signal of
    // Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    // Better", arXiv:2107.06499, at word-n-gram granularity): per document,
    // the fraction of its distinct word 4-grams that occur in at least one
    // OTHER document. Complements txt_repetition (INTRA-doc duplication)
    // and the pairwise dedup family (whole-doc similarity): a doc can be
    // pairwise-unique yet assembled from corpus-duplicated spans — the
    // boilerplate/template signal. Dataflow: ONE corpus scan, one
    // distinct-gram explode (word_ngrams is distinct-per-doc, so a gram's
    // row count IS its document frequency), a gram-partitioned window for
    // that df, and one per-doc hash-agg — two shuffles, no join, never
    // pairs. (The equivalent dup-grams ⋈ grams formulation — what the
    // DuckDB oracle runs — costs three corpus scans and a join here;
    // measured 0.91 → 0.52 s at sf0.1.) Integer counts + one double
    // division, engine-exact.
    "dd_span_frac" ->
      s"""WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
         |           WHERE size(split(text, ' ')) >= $SpanN),
         |g AS (SELECT doc_id, explode(word_ngrams(w, $SpanN)) AS s FROM d),
         |c AS (SELECT doc_id, count(*) OVER (PARTITION BY s) AS df FROM g)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(count_if(df >= 2) AS BIGINT) AS n_dup,
         |       CAST(count_if(df >= 2) AS DOUBLE) / count(*) AS dup_frac,
         |       CASE WHEN count_if(df >= 2) * 2 >= count(*)
         |            THEN 'dup_heavy' ELSE 'ok' END AS verdict
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )

  /** Duplicate clustering: connected components over the exact near-dup
    * pair set (`dd_shingle_jaccard`), reported as (cluster representative,
    * member count). The canonical post-dedup step — a transitive family of
    * pairwise matches must collapse to ONE kept document, not pairwise
    * drops.
    *
    * Implementation is the alternating large-star/small-star contraction
    * (see [[connectedComponents]]): each round every node links its
    * neighbors to the minimum of its neighborhood, which contracts even
    * adversarial path-shaped components in O(log n) rounds — unlike one-hop
    * hash-min label propagation, whose round count is the component
    * DIAMETER (a 1M-link chain of template-drift near-dups would take 1M
    * rounds). Convergence is an exact zero-changed-edges test, one
    * accumulator scalar per round to the driver, never rows.
    */
  def ddCluster(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    // edges = the skew-capped pair set (dd_shingle_capped): the at-scale
    // default, and on corpora without a pathological stop shingle (incl.
    // this one) identical to the exact pairs
    connectedComponents(
      spark.sql(TextQueries.shingleJaccardSparkSql(
        capDf = Some(TextQueries.ShingleCapDf), fanW = Q.fanWidth(spark, "documents"),
        ordered = false)),
      inputDistinct = true) // the pair SQL ends GROUP BY i, j with i < j
  }

  /** Representative selection — the step that turns clusters into a dedup
    * DECISION: per duplicate cluster keep exactly one document (most words;
    * ties to the smallest doc_id — deterministic, so the oracle reproduces
    * it), reporting (cluster_id, keep_id, n_members). Downstream an
    * anti-join of the corpus against the non-kept members IS the dedup.
    * Memberships come from the same star fixpoint as [[ddCluster]]; the
    * selection itself is one windowed pass over the (small) membership
    * frame, never the corpus. (As CONTRACT queries, dd_cluster and
    * dd_cluster_keep each run their own fixpoint — deliberately, so every
    * entry is independently checkable; a production pipeline would
    * materialize [[connectedComponentsMembers]] once and derive both the
    * counts and the keep set from it.) */
  def ddClusterKeep(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    keepsFrom(connectedComponentsMembers(
      spark.sql(TextQueries.shingleJaccardSparkSql(
        capDf = Some(TextQueries.ShingleCapDf), fanW = Q.fanWidth(spark, "documents"),
        ordered = false)),
      inputDistinct = true), // the pair SQL ends GROUP BY i, j with i < j
      spark)
  }

  /** The END-TO-END curation decision — the composition every filtering
    * pipeline ships: a document survives into the curated corpus iff it
    * (a) passes the quality funnel (length, repetition, language allowlist
    * — [[Q.sql ds_funnel]]'s exact gates), (b) is not part of the eval
    * slice and shares no word 4-gram with it (txt_decontaminate's overlap
    * join), and (c) is not a dropped duplicate (a near-dup cluster member
    * that is NOT the cluster's keeper — dd_cluster_keep's selection).
    * Reported as a per-language census of survivors, so the result is
    * small and deterministic. Each stage reuses the exact building blocks
    * of its standalone contract entry, so the oracle composes the same
    * pieces in DuckDB (including the recursive-CTE transitive closure).
    *
    * Duplicate memberships come from [[clusterMembersShared]] — the
    * MEMOIZED star fixpoint (round-9 verdict task 4: re-running the
    * contraction at composition time cost 3.1 s of redundant plan work
    * that `dd_cluster_keep_shared` proved avoidable). The drops set is a
    * plain anti-join on the composed frame, not a session temp view (a
    * view name would leak into the user's catalog and race across
    * concurrent invocations). doc_id is never NULL, so the anti-join is
    * exactly the oracle's NOT IN. */
  def dsCurated(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    val members = clusterMembersShared(spark, sfDir)
    val keeps = keepsFrom(members, spark)
    val drops = members.join(keeps, "cluster_id")
      .where(col("id") =!= col("keep_id"))
      .select(col("id").cast("bigint").as("doc_id"))
    val survivors = spark.sql(
      s"""WITH d AS (SELECT doc_id, lang, split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, lang, size(w) AS n_words, size(w) - 1 AS n_bi,
         |             size(word_ngrams(w, 2)) AS n_uniq
         |      FROM d),
         |keptv AS (SELECT doc_id, lang, n_words FROM s
         |          WHERE n_words >= 30 AND (n_bi - n_uniq) * 5 < n_bi
         |            AND lang IN ('en', 'de', 'fr')),
         |g AS (SELECT doc_id, explode(word_ngrams(w, $ContamN)) AS gram
         |      FROM d WHERE size(w) >= $ContamN),
         |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % $EvalMod = 0),
         |contam AS (SELECT DISTINCT t.doc_id FROM g t JOIN e ON t.gram = e.gram
         |           WHERE t.doc_id % $EvalMod <> 0),
         |cur AS (SELECT k.doc_id, k.lang, k.n_words FROM keptv k
         |        WHERE k.doc_id % $EvalMod <> 0
         |          AND k.doc_id NOT IN (SELECT doc_id FROM contam))
         |SELECT doc_id, lang, n_words FROM cur""".stripMargin)
    survivors.join(drops, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_words").cast("bigint").as("n_words"))
      .orderBy("lang")
  }

  // lazy: composes ddClusterOraclePrelude, declared further down the object
  // (a strict val would capture null during initialization)
  private lazy val dsCuratedOracle =
    s"""$ddClusterOraclePrelude,
       |selk AS (SELECT l.cluster_id, l.node,
       |                row_number() OVER (PARTITION BY l.cluster_id
       |                                   ORDER BY w2.n_words DESC, l.node) AS rn
       |         FROM lab l
       |         JOIN (SELECT doc_id, len(string_split(text, ' ')) AS n_words
       |               FROM documents) w2 ON w2.doc_id = l.node),
       |dupdrop AS (SELECT node AS doc_id FROM selk WHERE rn > 1),
       |d2 AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |s2 AS (SELECT doc_id, lang, len(w) AS n_words, len(w) - 1 AS n_bi,
       |              CASE WHEN len(w) >= 2 THEN
       |                len(list_distinct([array_to_string(w[i:i+1], ' ')
       |                                   for i in range(1, len(w))]))
       |              ELSE 0 END AS n_uniq
       |       FROM d2),
       |keptv AS (SELECT doc_id, lang, n_words FROM s2
       |          WHERE n_words >= 30 AND (n_bi - n_uniq) * 5 < n_bi
       |            AND lang IN ('en', 'de', 'fr')),
       |g2 AS (SELECT doc_id, unnest(list_distinct(
       |         [array_to_string(w[i:i+${ContamN - 1}], ' ')
       |          for i in range(1, len(w) - ${ContamN - 2})])) AS gram
       |       FROM d2 WHERE len(w) >= $ContamN),
       |e2 AS (SELECT DISTINCT gram FROM g2 WHERE doc_id % $EvalMod = 0),
       |contam AS (SELECT DISTINCT t.doc_id FROM g2 t JOIN e2 ON t.gram = e2.gram
       |           WHERE t.doc_id % $EvalMod <> 0),
       |cur AS (SELECT k.doc_id, k.lang, k.n_words FROM keptv k
       |        WHERE k.doc_id % $EvalMod <> 0
       |          AND k.doc_id NOT IN (SELECT doc_id FROM contam)
       |          AND k.doc_id NOT IN (SELECT doc_id FROM dupdrop))
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_words) AS BIGINT) AS n_words
       |FROM cur GROUP BY lang ORDER BY lang""".stripMargin

  /** Representative selection over an `(id, cluster_id)` membership frame —
    * the derivation [[ddClusterKeep]] and the shared composition path both
    * run: one windowed pass over the (small) membership frame joined with
    * per-doc word counts. */
  private[graft] def keepsFrom(members: DataFrame, spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = spark.table("documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
    val w = Window.partitionBy("cluster_id")
    members.join(words, members("id") === words("doc_id"))
      .withColumn("rn", row_number().over(w.orderBy(col("n_words").desc, col("id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .where(col("rn") === 1)
      .select(col("cluster_id"), col("id").as("keep_id"),
        col("n_members").cast("bigint").as("n_members"))
      .orderBy("cluster_id")
  }

  // ---- shared-fixpoint composition path ----------------------------------

  // Bounded: each entry pins a persisted RDD, and a long-lived service that
  // retargets the documents view repeatedly (one filtered corpus per
  // pipeline run) must not accumulate them forever. Access-ordered LRU;
  // evicted entries unpersist their cached blocks (the stored backing RDD,
  // not df.rdd, which would be a fresh unrelated RDD).
  private val MembersMemoMax = 8
  private val membersMemo =
    new java.util.LinkedHashMap[String, (DataFrame, org.apache.spark.rdd.RDD[(Long, Long)])](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (DataFrame, org.apache.spark.rdd.RDD[(Long, Long)])]): Boolean = {
        val evict = size() > MembersMemoMax
        if (evict) e.getValue._2.unpersist(false)
        evict
      }
    }

  /** The membership materialization SHARED across consumers — the
    * production composition path the contract entries deliberately don't
    * take (each contract query runs its own fixpoint so the driver checks
    * it independently). Memoized per (session, corpus dir, resolved
    * `documents` plan): a pipeline that derives both the cluster census and
    * the keep set — or an example that retargets the documents view at a
    * filtered subset — pays the star fixpoint ONCE. The plan hash keys
    * retargeted views correctly: a different underlying corpus is a
    * different memo entry, never a stale hit. */
  def clusterMembersShared(spark: SparkSession, sfDir: String): DataFrame = {
    Q.ctx(spark, sfDir)
    // sessionUUID, not identityHashCode: identity hashes are not unique, so
    // after a session is GC'd a new session could alias its memo entries.
    // Returned frames are valid until LRU eviction unpersists the backing
    // RDD — still correct afterwards (Spark recomputes), but the fixpoint
    // silently re-runs; long-lived holders should re-call this method.
    val key = s"${org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)}#$sfDir#" +
      spark.table("documents").queryExecution.analyzed.semanticHash()
    membersMemo.synchronized {
      Option(membersMemo.get(key)) match {
        case Some((df, _)) => df
        case None =>
          val built = connectedComponentsMembersWithRdd(
            spark.sql(TextQueries.shingleJaccardSparkSql(
        capDf = Some(TextQueries.ShingleCapDf), fanW = Q.fanWidth(spark, "documents"),
        ordered = false)),
            inputDistinct = true) // the pair SQL ends GROUP BY i, j with i < j
          membersMemo.put(key, built)
          built._1
      }
    }
  }

  /** [[ddCluster]]'s census derived from the shared materialization. */
  def ddClusterShared(spark: SparkSession, sfDir: String): DataFrame =
    clusterMembersShared(spark, sfDir)
      .groupBy("cluster_id")
      .agg(count(lit(1)).cast("bigint").as("n_members"))
      .orderBy("cluster_id")

  /** [[ddClusterKeep]] derived from the shared materialization. */
  def ddClusterKeepShared(spark: SparkSession, sfDir: String): DataFrame =
    keepsFrom(clusterMembersShared(spark, sfDir), spark)

  /** Connected components over an undirected `(i, j)` pair frame:
    * (cluster representative = min member id, member count), representatives
    * ascending. See [[ddCluster]] for the scale argument.
    *
    * Contract: the pair relation is IRREFLEXIVE — every caller produces
    * strict `i < j` match pairs, and a self-pair carries no duplication
    * information, so `(x, x)` rows are ignored (a node whose only "edge" is
    * a self-loop is not a duplicate cluster). */
  private[queries] def connectedComponents(
      pairFrame: DataFrame, inputDistinct: Boolean = false): DataFrame =
    connectedComponentsWithRounds(pairFrame, inputDistinct = inputDistinct)._1

  /** Per-node cluster memberships `(id, cluster_id)` from the same star
    * fixpoint — the shape representative-selection needs ([[ddClusterKeep]]):
    * each fixpoint star contributes its children (child, root) and the root
    * itself (root, root). Materialized before the iteration state is
    * released, like the counts path. */
  private[queries] def connectedComponentsMembers(
      pairFrame: DataFrame, inputDistinct: Boolean = false): DataFrame =
    connectedComponentsMembersWithRdd(pairFrame, inputDistinct)._1

  /** Also returns the PERSISTED backing RDD, so a caching consumer (the
    * shared-members memo) can unpersist it on eviction — `df.rdd` would
    * manufacture a new RDD and leave the cached blocks pinned. */
  private def connectedComponentsMembersWithRdd(
      pairFrame: DataFrame, inputDistinct: Boolean = false)
      : (DataFrame, org.apache.spark.rdd.RDD[(Long, Long)]) = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val (stars, _) = starFixpoint(pairFrame, inputDistinct = inputDistinct)
    val members = stars
      .union(stars.values.distinct(stars.getNumPartitions).map(r => (r, r)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    members.count()
    stars.unpersist(blocking = false)
    (spark.createDataset(members).toDF("id", "cluster_id"), members)
  }

  /** Alternating large-star/small-star contraction (the MapReduce CC
    * algorithm of Kiveris et al., SoCC'14), returning the cluster frame and
    * the number of rounds it took — the round count is what the long-path
    * spec asserts on.
    *
    * Each round runs two halves over the canonical `(hi, lo)` edge set:
    *
    *  - large-star: every node `u` re-links each LARGER neighbor to the
    *    minimum of `u`'s closed neighborhood — long tails fold toward small
    *    ids from every node at once;
    *  - small-star: every node re-links its smaller neighbors (and itself)
    *    to the smallest of them — multi-parent nodes collapse to one parent.
    *
    * Components contract to stars rooted at their minimum id in O(log n)
    * rounds even for adversarial path-shaped components, where one-hop
    * hash-min label propagation needs DIAMETER rounds (a 1M-link chain of
    * template-drift near-dups would take 1M one-hop rounds). The price is
    * that each round shuffles the edge list itself (neighborhood mins +
    * re-link joins + dedup) rather than only a label stream — the right
    * trade because the edge list shrinks monotonically toward one edge per
    * non-root node while the round count stays logarithmic.
    *
    * Each half is one shuffle: the keyed edge view co-partitions once, the
    * per-key minimum derives locally from that partitioning, and re-links
    * stream through `zipPartitions` against the partition's min map (one
    * entry per distinct node — the footprint a reduceByKey combiner builds,
    * never a neighbor list per edge), so a round is 3 shuffles instead of
    * the 5 a reduceByKey+join formulation costs. A hub node of a giant
    * duplicate cluster still costs O(degree) streamed records, not
    * O(degree) heap. Convergence is an exact zero-changed-edges test: each
    * half counts re-links that moved an edge in a `LongAccumulator`, one
    * scalar per round to the driver, never rows. (Stage retries or
    * shared-lineage recomputation can only inflate a nonzero count, never
    * turn zero into nonzero, so the ==0 test is safe.) Superseded edge RDDs
    * are unpersisted each round. */
  private[graft] def connectedComponentsWithRounds(
      pairFrame: DataFrame,
      localSolveMaxEdges: Long = LocalSolveMaxEdges,
      inputDistinct: Boolean = false): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val (stars, rounds) = starFixpoint(pairFrame, localSolveMaxEdges, inputDistinct)
    // one row per duplicate cluster — small relative to the corpus but
    // unbounded in absolute terms, so it stays distributed; materialize it
    // before releasing the iteration state so the downstream read serves
    // from these blocks instead of recomputing the lineage
    val result = stars
      .map { case (_, root) => (root, 1L) }
      .reduceByKey(_ + _)
      .mapValues(_ + 1L) // + the root itself
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    stars.unpersist(blocking = false)
    (spark.createDataset(result).toDF("cluster_id", "n_members").orderBy("cluster_id"),
      rounds)
  }

  /** Edge-count ceiling for the adaptive driver-local solve: ≤ 2^20 edges
    * is ~16 MB collected — the same order as a broadcast join side. Near-dup
    * edge lists are orders of magnitude smaller than their corpus (233
    * clusters per 50k docs here), so most real corpora take the local path;
    * anything larger runs the distributed star contraction. */
  private[queries] val LocalSolveMaxEdges: Long = 1L << 20

  /** The star fixpoint itself: returns the PERSISTED star edge set
    * (child, root) — every component contracted to a star rooted at its
    * minimum id — plus the round count (0 when the local solve answered).
    * Callers derive counts ([[connectedComponentsWithRounds]]) or
    * memberships ([[connectedComponentsMembers]]) and unpersist the
    * returned RDD.
    *
    * Below `localSolveMaxEdges` the fixpoint is answered by a driver-side
    * union-find over the collected (bounded) edge list — the localness
    * decision AQE makes for small join sides, applied to the iterative
    * operator: ~10 scheduler round-trips of tiny distributed stages cost
    * ~1 s of fixed overhead that a path-compressed union-find over ≤ 16 MB
    * of longs answers in milliseconds. Union-by-min (the larger root always
    * attaches under the smaller) makes every final root its component's
    * minimum id — the exact postcondition of the star contraction, asserted
    * equal by PipelineSemanticSpec's property test on both paths. */
  private def starFixpoint(
      pairFrame: DataFrame,
      localSolveMaxEdges: Long = LocalSolveMaxEdges,
      inputDistinct: Boolean = false): (org.apache.spark.rdd.RDD[(Long, Long)], Int) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val defaultParts = spark.sessionState.conf.numShufflePartitions

    // canonical (hi, lo) edges: self-loops dropped, orientation fixed, deduped.
    // r19 (guide §2.4, verdict item 6): `inputDistinct = true` skips the
    // dedup shuffle — the production pair SQL's output is PROVABLY distinct
    // and canonically oriented (the `inter` stage ends `GROUP BY i, j`, its
    // sz joins are 1:1 per doc, and array_pairs over each sorted bucket
    // list emits strict i < j), so the `.distinct()` here re-shuffled the
    // full pair set to remove nothing. Callers with arbitrary edge frames
    // keep the default dedup; the union-find/star rounds themselves are
    // duplicate-tolerant either way (dups only repeat idempotent unions),
    // the flag exists purely to drop the wasted exchange.
    val canon: RDD[(Long, Long)] = pairFrame.select(col("i"), col("j")).as[(Long, Long)].rdd
      .flatMap { case (a, b) =>
        if (a == b) Iterator.empty
        else if (a > b) Iterator((a, b))
        else Iterator((b, a))
      }
    var cur: RDD[(Long, Long)] = (if (inputDistinct) canon else canon.distinct(defaultParts))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // size the round partitioner to the MEASURED edge count (~250k edges
    // per partition): every round runs ~5 shuffle jobs, and a near-dup edge
    // list is usually orders of magnitude smaller than the corpus — at the
    // session's corpus-sized partition count, per-round task overhead
    // dominates; a giant edge list still fans out to the session default.
    // The count also materializes the persist.
    val nEdges = cur.count()

    if (nEdges <= localSolveMaxEdges) {
      val edges = cur.collect()
      cur.unpersist(blocking = false)
      // union-find, path-halving find, union-by-min: the minimum id of a
      // component can never be attached under another root, so every final
      // root is its component's minimum — the star-contraction postcondition
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrElse(x, x)
        while (p != x) {
          val gp = parent.getOrElse(p, p)
          parent.update(x, gp) // halve the path as we walk it
          x = gp
          p = parent.getOrElse(x, x)
        }
        x
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
        }
      }
      // materialize the key set first: find() path-halves (mutates values),
      // and mutating a LongMap under its own iterator is not guaranteed safe
      val nodes = parent.keysIterator.toArray
      val stars = nodes.iterator
        .map(n => (n, find(n)))
        .filter { case (n, r) => n != r }
        .toArray
      val rdd = sc.parallelize(stars.toSeq, 1).persist(StorageLevel.MEMORY_AND_DISK)
      return (rdd, 0)
    }

    val part = new HashPartitioner(
      math.max(1, math.min(defaultParts, ((nEdges - 1) / 250000L + 1).toInt)))

    // Per-partition key → min over that key's values: one map entry per
    // DISTINCT key in the partition — the same footprint reduceByKey's
    // map-side combiner builds, never a neighbor list per edge.
    def localMin(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
      val m = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { case (k, v) => if (v < m.getOrElse(k, Long.MaxValue)) m.update(k, v) }
      m.iterator
    }

    var rounds = 0
    var converged = nEdges == 0L
    while (!converged) {
      rounds += 1
      val lsMoved = sc.longAccumulator(s"cc-large-star-moves-r$rounds")
      val ssMoved = sc.longAccumulator(s"cc-small-star-moves-r$rounds")

      // Each half is ONE shuffle: co-partition the keyed edge view, derive
      // the per-key min locally (no second reduceByKey shuffle), and stream
      // the same partition's edges against that min map via zipPartitions
      // (no join shuffle) — the round-5 5-shuffle round (bidir reduce, bidir
      // join, ls reduce, ls join, distinct) collapses to 3. Both sides of a
      // zip read the SAME shuffle output, which Spark serves from shuffle
      // files without recomputing the map stage.

      // large-star: every node u re-links each LARGER neighbor to the min of
      // u's closed neighborhood. Each undirected edge is emitted by exactly
      // one side (its smaller endpoint), so |ls| == |cur| and connectivity
      // is preserved.
      val bidir = cur.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
        .partitionBy(part) // shuffle 1
      val nbrMin = bidir.mapPartitions(localMin, preservesPartitioning = true)
      val ls = bidir.zipPartitions(nbrMin) { (edges, mins) =>
        val m = scala.collection.mutable.LongMap.empty[Long]
        mins.foreach { case (k, v) => m.update(k, v) }
        edges.flatMap { case (u, v) =>
          if (v <= u) Iterator.empty
          else {
            val mm = math.min(u, m(u)) // closed-neighborhood min
            if (mm != u) lsMoved.add(1L)
            Iterator((v, mm)) // v > u >= mm: canonical orientation holds
          }
        }
      }

      // small-star: group by the larger endpoint; its smaller neighbors (and
      // itself) all re-link to the smallest of them. (Task retries can still
      // inflate the accumulators — inflation keeps nonzero nonzero, so the
      // ==0 convergence test stays safe.)
      val lsPart = ls.partitionBy(part) // shuffle 2
      val ssMin = lsPart.mapPartitions(localMin, preservesPartitioning = true)
      val ssRewired = lsPart.zipPartitions(ssMin) { (edges, mins) =>
        val m = scala.collection.mutable.LongMap.empty[Long]
        mins.foreach { case (k, v) => m.update(k, v) }
        edges.flatMap { case (v, child) =>
          val mn = m(v)
          if (child == mn) Iterator.empty
          else { ssMoved.add(1L); Iterator((child, mn)) } // mn = min < child < v
        }
      }
      val next = ssRewired.union(ssMin)
        .distinct(part.numPartitions) // shuffle 3
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize: fires both halves' accumulators
      converged = lsMoved.value == 0L && ssMoved.value == 0L
      cur.unpersist(blocking = false)
      cur = next
    }
    (cur, rounds)
  }

  // --- DuckDB oracles -----------------------------------------------------

  /** Shared oracle prelude for the clustering family: the same capped edge
    * set (TextQueries' join-based shingle-Jaccard twin with the stop-shingle
    * cap), closed transitively with a recursive CTE, then min-reachable
    * label per node (`lab(node, cluster_id)`) — tiny-corpus-only, which is
    * all an oracle needs to be. */
  private val ddClusterOraclePrelude =
    s"""WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(
       |         [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS s
       |       FROM d),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          JOIN (SELECT s FROM sh GROUP BY s
       |                HAVING count(*) BETWEEN 2 AND ${TextQueries.ShingleCapDf}) ok
       |            ON ok.s = a.s
       |          GROUP BY a.doc_id, b.doc_id),
       |pairs AS (SELECT i, j FROM inter
       |          JOIN sz sa ON sa.doc_id = i
       |          JOIN sz sb ON sb.doc_id = j
       |          WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
       |edges AS (SELECT i AS a, b FROM (SELECT i, j AS b FROM pairs
       |                                 UNION ALL SELECT j, i FROM pairs) t(i, b)),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
       |),
       |lab AS (SELECT a AS node, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)""".stripMargin

  private val ddClusterOracle =
    s"""$ddClusterOraclePrelude
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
       |FROM lab GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  private val ddClusterKeepOracle =
    s"""$ddClusterOraclePrelude,
       |wc AS (SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents),
       |nm AS (SELECT cluster_id, count(*) AS n_members FROM lab GROUP BY cluster_id),
       |sel AS (SELECT l.cluster_id, l.node,
       |               row_number() OVER (PARTITION BY l.cluster_id
       |                                  ORDER BY w.n_words DESC, l.node) AS rn
       |        FROM lab l JOIN wc w ON w.doc_id = l.node)
       |SELECT s.cluster_id, CAST(s.node AS BIGINT) AS keep_id,
       |       CAST(n.n_members AS BIGINT) AS n_members
       |FROM sel s JOIN nm n ON n.cluster_id = s.cluster_id
       |WHERE s.rn = 1 ORDER BY s.cluster_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "ds_split" ->
      s"""SELECT CASE WHEN (doc_id * $HashK) % 1000 < 800 THEN 'train'
         |            WHEN (doc_id * $HashK) % 1000 < 900 THEN 'val'
         |            ELSE 'test' END AS split,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "ds_lang_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang
         |             ORDER BY (doc_id * $HashK) % 1000000007, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin,

    "txt_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |           WHERE len(string_split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, unnest(list_distinct(
         |        [array_to_string(w[i:i+${ContamN - 1}], ' ')
         |         for i in range(1, len(w) - ${ContamN - 2})])) AS s
         |      FROM d),
         |e AS (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0),
         |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM t JOIN e ON t.s = e.s
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "ds_bloom_decon_check" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |           WHERE len(string_split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, unnest(list_distinct(
         |        [array_to_string(w[i:i+${ContamN - 1}], ' ')
         |         for i in range(1, len(w) - ${ContamN - 2})])) AS s
         |      FROM d),
         |e AS (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0),
         |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0),
         |ex AS (SELECT DISTINCT t.doc_id FROM t JOIN e ON t.s = e.s)
         |SELECT CAST(count(*) AS BIGINT) AS n_exact,
         |       CAST(0 AS BIGINT) AS missed
         |FROM ex""".stripMargin,

    "ds_bloom_md5" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |           WHERE len(string_split(text, ' ')) >= $ContamN),
         |g AS (SELECT doc_id, unnest(list_distinct(
         |        [array_to_string(w[i:i+${ContamN - 1}], ' ')
         |         for i in range(1, len(w) - ${ContamN - 2})])) AS s
         |      FROM d),
         |h AS (SELECT doc_id, s,
         |             ('0x' || substr(md5(s), 1, 15))::BIGINT AS h1,
         |             ('0x' || substr(md5(s), 17, 15))::BIGINT AS h2
         |      FROM g),
         |ks AS (SELECT i FROM (VALUES (0), (1), (2)) t(i)),
         |bits AS (SELECT DISTINCT (h1 + i * h2) % $Md5BloomBits AS b
         |         FROM h CROSS JOIN ks WHERE doc_id % $EvalMod = 0),
         |probe AS (SELECT doc_id, s, (h1 + i * h2) % $Md5BloomBits AS b
         |          FROM h CROSS JOIN ks WHERE doc_id % $EvalMod <> 0),
         |hit AS (SELECT doc_id, s FROM probe JOIN bits ON probe.b = bits.b
         |        GROUP BY doc_id, s HAVING count(*) = 3)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd_src_overlap" ->
      s"""WITH d AS (SELECT source, string_split(text, ' ') AS w FROM documents
         |           WHERE len(string_split(text, ' ')) >= $OverlapN),
         |g0 AS (SELECT source, unnest(list_distinct(
         |         [array_to_string(w[i:i+${OverlapN - 1}], ' ')
         |          for i in range(1, len(w) - ${OverlapN - 2})])) AS s
         |       FROM d),
         |g AS (SELECT DISTINCT source, s FROM g0)
         |SELECT a.source AS src_a, b.source AS src_b,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM g a JOIN g b ON a.s = b.s AND a.source < b.source
         |GROUP BY a.source, b.source ORDER BY src_a, src_b""".stripMargin,

    "txt_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |b AS (SELECT doc_id, len(w) - 1 AS n_bi,
        |             len(list_distinct([array_to_string(w[i:i+1], ' ')
        |                                for i in range(1, len(w))])) AS n_uniq
        |      FROM d)
        |SELECT doc_id, CAST(n_bi AS BIGINT) AS n_bigrams,
        |       CAST(n_bi - n_uniq AS DOUBLE) / n_bi AS dup_frac,
        |       CASE WHEN (n_bi - n_uniq) * 5 >= n_bi THEN 'repetitive' ELSE 'ok' END AS verdict
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_percentile" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |           row_number() OVER (PARTITION BY o_orderpriority
        |                              ORDER BY o_totalprice, o_orderkey) AS rn,
        |           count(*) OVER (PARTITION BY o_orderpriority) AS n
        |           FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN o_totalprice END) AS p95,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN o_totalprice END) AS p99
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    "ds_pack" ->
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
         |                  (doc_id * $HashK) % 32 AS bucket,
         |                  (doc_id * $HashK) % 1000000007 AS h FROM documents),
         |c AS (SELECT bucket, doc_id, n,
         |             sum(n) OVER (PARTITION BY bucket ORDER BY h, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         |SELECT bucket, CAST(floor((cum - n) / 2048.0) AS BIGINT) AS bin,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_tokens
         |FROM c GROUP BY bucket, bin ORDER BY bucket, bin""".stripMargin,

    "ds_mix" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
         |FROM documents
         |WHERE (doc_id * $HashK) % 1000 <
         |      CASE lang WHEN 'en' THEN 600 WHEN 'zh' THEN 400
         |                WHEN 'de' THEN 300 ELSE 150 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "ds_funnel" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, lang, len(w) AS n_words, len(w) - 1 AS n_bi,
        |             CASE WHEN len(w) >= 2 THEN
        |               len(list_distinct([array_to_string(w[i:i+1], ' ')
        |                                  for i in range(1, len(w))]))
        |             ELSE 0 END AS n_uniq
        |      FROM d),
        |v AS (SELECT CASE WHEN n_words < 30 THEN 'too_short'
        |                  WHEN (n_bi - n_uniq) * 5 >= n_bi THEN 'repetitive'
        |                  WHEN lang NOT IN ('en', 'de', 'fr') THEN 'lang_filtered'
        |                  ELSE 'kept' END AS verdict
        |      FROM s)
        |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs
        |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin,

    "dd_cluster" -> ddClusterOracle,
    "dd_span_frac" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |           WHERE len(string_split(text, ' ')) >= $SpanN),
         |g AS (SELECT doc_id, unnest(list_distinct(
         |        [array_to_string(w[i:i+${SpanN - 1}], ' ')
         |         for i in range(1, len(w) - ${SpanN - 2})])) AS s
         |      FROM d),
         |dup AS (SELECT s FROM g GROUP BY s HAVING count(*) >= 2),
         |c AS (SELECT g.doc_id, count(*) AS n_dup
         |      FROM g JOIN dup ON g.s = dup.s GROUP BY g.doc_id),
         |t AS (SELECT doc_id, len(list_distinct(
         |        [array_to_string(w[i:i+${SpanN - 1}], ' ')
         |         for i in range(1, len(w) - ${SpanN - 2})])) AS n_grams FROM d)
         |SELECT t.doc_id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup,
         |       CAST(coalesce(n_dup, 0) AS DOUBLE) / n_grams AS dup_frac,
         |       CASE WHEN coalesce(n_dup, 0) * 2 >= n_grams
         |            THEN 'dup_heavy' ELSE 'ok' END AS verdict
         |FROM t LEFT JOIN c ON c.doc_id = t.doc_id
         |ORDER BY doc_id""".stripMargin,

    "dd_cluster_keep" -> ddClusterKeepOracle,
    "ds_curated" -> dsCuratedOracle,
  )

  /** Spark-side SQL text of a named entry — for tools that re-run an entry
    * over a derived corpus outside the contract harness
    * ([[graft.tools.BenchDedupScale]]'s decontamination growth probes). */
  private lazy val sparkSqlMap: Map[String, String] = sparkSql.toMap
  private[graft] def sqlFor(name: String): String =
    sparkSqlMap.getOrElse(name, throw new NoSuchElementException(
      s"no PipelineQueries entry named '$name' — known: ${sparkSqlMap.keys.toSeq.sorted.mkString(", ")}"))

  /** Source-pair contamination matrix: distinct shared 8-word shingles per
    * source pair — the corpus-curation signal for "which ingest feeds
    * duplicate each other". r18 shape (guide §2.4): per-shingle sorted
    * DISTINCT-SOURCE SETS (collect_set — partials dedup map-side) with
    * in-task pair generation, instead of the former DISTINCT + g ⋈ g
    * self-join on the shingle: the gram stream is shuffled ONCE where the
    * old plan computed the distinct twice and shuffled a third time for
    * the join, and each set's pair fan-out stays bounded by the SOURCE
    * count, never the document count. Identical output: collect_set's
    * distinct sources per gram are exactly the old g rows, so each shared
    * shingle contributes exactly one (a, b), a < b pair to the count in
    * both forms. At larger source counts the dd_shingle_capped stop-shingle
    * df-cap applies unchanged. */
  private def srcOverlapSql(fanW: Int): String =
    s"""WITH d AS (SELECT ${Q.repHint(fanW)}source, split(text, ' ') AS w FROM documents
       |           WHERE size(split(text, ' ')) >= $OverlapN),
       |g AS (SELECT source, explode(word_ngrams(w, $OverlapN)) AS s FROM d),
       |lists AS (SELECT sort_array(collect_set(source)) AS ss
       |          FROM g GROUP BY s),
       |shared AS (SELECT ss FROM lists WHERE size(ss) >= 2)
       |SELECT sa AS src_a, sb AS src_b, CAST(count(*) AS BIGINT) AS n_shared
       |FROM shared
       |LATERAL VIEW explode(ss) ta AS sa
       |LATERAL VIEW explode(ss) tb AS sb
       |WHERE sa < sb
       |GROUP BY sa, sb ORDER BY src_a, src_b""".stripMargin

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] =
    sparkSql.map { case (n, s) => n -> Q.sql(s) } :+
      ("dd_src_overlap" -> Q.sqlFan("documents")(srcOverlapSql)) :+
      ("dd_cluster" -> (ddCluster _)) :+
      ("dd_cluster_keep" -> (ddClusterKeep _)) :+
      ("ds_curated" -> (dsCurated _))
}
