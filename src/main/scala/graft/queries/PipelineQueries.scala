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

  // --- Spark SQL ----------------------------------------------------------

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
         |g AS (SELECT doc_id, explode(array_distinct(
         |        transform(sequence(0, size(w) - $ContamN),
         |                  i -> concat_ws(' ', slice(w, i + 1, $ContamN))))) AS s
         |      FROM d),
         |e AS (SELECT DISTINCT s FROM g WHERE doc_id % $EvalMod = 0),
         |t AS (SELECT doc_id, s FROM g WHERE doc_id % $EvalMod <> 0)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM t JOIN e ON t.s = e.s
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // intra-document repetition score (the Gopher-style rep signal):
    // duplicate-bigram fraction, integer counts + one division so both
    // engines agree bit-for-bit.
    "txt_repetition" ->
      """WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
        |           WHERE size(split(text, ' ')) >= 2),
        |b AS (SELECT doc_id, size(w) - 1 AS n_bi,
        |             size(array_distinct(transform(sequence(0, size(w) - 2),
        |                  i -> concat_ws(' ', slice(w, i + 1, 2))))) AS n_uniq
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
    // tiny hash-agg; the CASE guard keeps the bigram computation off the
    // sub-2-word rows (where slice() would fault) in both engines.
    "ds_funnel" ->
      """WITH d AS (SELECT doc_id, lang, split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, lang, size(w) AS n_words, size(w) - 1 AS n_bi,
        |             CASE WHEN size(w) >= 2 THEN
        |               size(array_distinct(transform(sequence(0, size(w) - 2),
        |                    i -> concat_ws(' ', slice(w, i + 1, 2)))))
        |             ELSE 0 END AS n_uniq
        |      FROM d),
        |v AS (SELECT CASE WHEN n_words < 30 THEN 'too_short'
        |                  WHEN (n_bi - n_uniq) * 5 >= n_bi THEN 'repetitive'
        |                  WHEN lang NOT IN ('en', 'de', 'fr') THEN 'lang_filtered'
        |                  ELSE 'kept' END AS verdict
        |      FROM s)
        |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs
        |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin,
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
      spark.sql(TextQueries.shingleJaccardSparkSql(capDf = Some(TextQueries.ShingleCapDf))))
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
    import org.apache.spark.sql.expressions.Window
    Q.ctx(spark, sfDir)
    val members = connectedComponentsMembers(
      spark.sql(TextQueries.shingleJaccardSparkSql(capDf = Some(TextQueries.ShingleCapDf))))
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

  /** Connected components over an undirected `(i, j)` pair frame:
    * (cluster representative = min member id, member count), representatives
    * ascending. See [[ddCluster]] for the scale argument.
    *
    * Contract: the pair relation is IRREFLEXIVE — every caller produces
    * strict `i < j` match pairs, and a self-pair carries no duplication
    * information, so `(x, x)` rows are ignored (a node whose only "edge" is
    * a self-loop is not a duplicate cluster). */
  private[queries] def connectedComponents(pairFrame: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairFrame)._1

  /** Per-node cluster memberships `(id, cluster_id)` from the same star
    * fixpoint — the shape representative-selection needs ([[ddClusterKeep]]):
    * each fixpoint star contributes its children (child, root) and the root
    * itself (root, root). Materialized before the iteration state is
    * released, like the counts path. */
  private[queries] def connectedComponentsMembers(pairFrame: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val (stars, _) = starFixpoint(pairFrame)
    val members = stars
      .union(stars.values.distinct(stars.getNumPartitions).map(r => (r, r)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    members.count()
    stars.unpersist(blocking = false)
    spark.createDataset(members).toDF("id", "cluster_id")
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
    * Both halves compute neighborhood minima via `reduceByKey` and emit
    * re-links through a co-partitioned join — no neighbor list is ever
    * materialized, so a hub node of a giant duplicate cluster costs O(degree)
    * streamed records, not O(degree) heap. Convergence is an exact
    * zero-changed-edges test: each half counts re-links that moved an edge
    * in a `LongAccumulator`, one scalar per round to the driver, never rows.
    * (Stage retries or shared-lineage recomputation can only inflate a
    * nonzero count, never turn zero into nonzero, so the ==0 test is safe.)
    * Superseded edge RDDs are unpersisted each round. */
  private[graft] def connectedComponentsWithRounds(
      pairFrame: DataFrame): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val (stars, rounds) = starFixpoint(pairFrame)
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

  /** The star fixpoint itself: returns the PERSISTED star edge set
    * (child, root) — every component contracted to a star rooted at its
    * minimum id — plus the round count. Callers derive counts
    * ([[connectedComponentsWithRounds]]) or memberships
    * ([[connectedComponentsMembers]]) and unpersist the returned RDD. */
  private def starFixpoint(
      pairFrame: DataFrame): (org.apache.spark.rdd.RDD[(Long, Long)], Int) = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.storage.StorageLevel
    val spark = pairFrame.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val defaultParts = spark.sessionState.conf.numShufflePartitions

    // canonical (hi, lo) edges: self-loops dropped, orientation fixed, deduped
    var cur: RDD[(Long, Long)] = pairFrame.select(col("i"), col("j")).as[(Long, Long)].rdd
      .flatMap { case (a, b) =>
        if (a == b) Iterator.empty
        else if (a > b) Iterator((a, b))
        else Iterator((b, a))
      }
      .distinct(defaultParts)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // size the round partitioner to the MEASURED edge count (~250k edges
    // per partition): every round runs ~5 shuffle jobs, and a near-dup edge
    // list is usually orders of magnitude smaller than the corpus — at the
    // session's corpus-sized partition count, per-round task overhead
    // dominates; a giant edge list still fans out to the session default.
    // The count also materializes the persist.
    val nEdges = cur.count()
    val part = new HashPartitioner(
      math.max(1, math.min(defaultParts, ((nEdges - 1) / 250000L + 1).toInt)))

    var rounds = 0
    var converged = nEdges == 0L
    while (!converged) {
      rounds += 1
      val lsMoved = sc.longAccumulator(s"cc-large-star-moves-r$rounds")
      val ssMoved = sc.longAccumulator(s"cc-small-star-moves-r$rounds")

      // large-star: per-node closed-neighborhood min via reduceByKey, then a
      // co-partitioned join re-links every larger neighbor to that min. Each
      // undirected edge is emitted by exactly one side (its smaller endpoint),
      // so |ls| == |cur| and connectivity is preserved. Persisted for the
      // round: it feeds TWO shuffles below (small-star's min and re-link),
      // which would otherwise recompute the join — the round's most
      // expensive stage — twice.
      val bidir = cur.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      val nbrMin = bidir.reduceByKey(part, math.min(_: Long, _: Long))
      val ls = bidir.join(nbrMin, part).flatMap { case (u, (v, mN)) =>
        if (v <= u) Iterator.empty
        else {
          val m = math.min(u, mN)
          if (m != u) lsMoved.add(1L)
          Iterator((v, m)) // v > u >= m: canonical orientation holds
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)

      // small-star: group by the larger endpoint; its smaller neighbors (and
      // itself) all re-link to the smallest of them. (Task retries can still
      // inflate the accumulators — inflation keeps nonzero nonzero, so the
      // ==0 convergence test stays safe.)
      val ssMin = ls.reduceByKey(part, math.min(_: Long, _: Long))
      val ssRewired = ls.join(ssMin, part).flatMap { case (u, (v, m)) =>
        if (v == m) Iterator.empty
        else { ssMoved.add(1L); Iterator((v, m)) } // m = min < v < u: canonical
      }
      val next = ssRewired.union(ssMin)
        .distinct(part.numPartitions)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize: fires both halves' accumulators
      converged = lsMoved.value == 0L && ssMoved.value == 0L
      ls.unpersist(blocking = false)
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
    "dd_cluster_keep" -> ddClusterKeepOracle,
  )

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] =
    sparkSql.map { case (n, s) => n -> Q.sql(s) } :+
      ("dd_cluster" -> (ddCluster _)) :+
      ("dd_cluster_keep" -> (ddClusterKeep _))
}
