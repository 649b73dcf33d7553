package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis + exact/n-gram deduplication operators over the `documents`
  * table — the training-data-pipeline surface a 100 TB corpus engine needs
  * beyond the reference's temporal operators.
  *
  * Every operator here is a pure distributed dataflow (explode → hash-agg →
  * hash-join); nothing collects to the driver, so each scales with executors.
  * All arithmetic is integer or single-division double so the DuckDB oracle
  * is bit-identical.
  */
object TextQueries {

  /** Stop-shingle document-frequency cap for `dd_shingle_capped`.
    * (Declared before `sparkSql`, which captures it at object init.) */
  val ShingleCapDf = 32

  /** Explicit whitespace class for the tokenizer regexes: Java's `\s`
    * includes `\x0B` (vertical tab) where RE2's does not, so the class is
    * spelled out to keep Spark and the DuckDB oracle bit-identical on ANY
    * corpus. Spark SQL unescapes string literals (hence the doubled
    * backslashes); DuckDB passes them through raw. */
  private val wsSpark = " \\\\t\\\\n\\\\f\\\\r"
  private val wsDuck  = " \\t\\n\\f\\r"

  private val enStops = Seq("the", "a", "of", "and", "to", "is", "in")
  private val enStopsSql = enStops.map(w => s"'$w'").mkString(", ")
  private def orChain(v: String) = enStops.map(w => s"$v = '$w'").mkString(" OR ")

  // --- Spark SQL ----------------------------------------------------------

  private val sparkSql: Seq[(String, String)] = Seq(
    // token counting + type/token stats (whitespace tokenizer)
    "txt_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_char,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
        |    / CAST(size(split(text, ' ')) AS DOUBLE) AS ttr,
        |  CAST(length(text) - (size(split(text, ' ')) - 1) AS DOUBLE)
        |    / CAST(size(split(text, ' ')) AS DOUBLE) AS mean_wlen
        |FROM documents ORDER BY doc_id""".stripMargin,

    // language-ID heuristic: English-stopword density (integer-ratio gate)
    "txt_lang_id" ->
      s"""SELECT doc_id,
         |  CAST(size(filter(split(text, ' '), w -> ${orChain("w")})) AS BIGINT) AS en_hits,
         |  CASE WHEN size(filter(split(text, ' '), w -> ${orChain("w")})) * 20
         |            >= size(split(text, ' ')) THEN 'en' ELSE 'unk' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    // quality scoring: length / punctuation / stopword-density gates, the
    // standard pre-training document filter. Ratios are single divisions
    // and the keep/drop verdict is pure integer comparison, so both engines
    // agree bit-for-bit.
    "txt_quality" ->
      s"""SELECT doc_id,
         |  CAST(size(split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(size(filter(split(text, ' '), w -> ${orChain("w")})) AS DOUBLE)
         |    / CAST(size(split(text, ' ')) AS DOUBLE) AS stop_ratio,
         |  CAST(size(regexp_extract_all(text, '[^A-Za-z0-9$wsSpark]', 0)) AS DOUBLE)
         |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
         |  CASE WHEN size(split(text, ' ')) BETWEEN 5 AND 1000
         |        AND size(filter(split(text, ' '), w -> ${orChain("w")})) * 20 >= size(split(text, ' '))
         |        AND size(regexp_extract_all(text, '[^A-Za-z0-9$wsSpark]', 0)) * 10 <= length(text)
         |       THEN 'keep' ELSE 'drop' END AS verdict
         |FROM documents ORDER BY doc_id""".stripMargin,

    // BPE-ish subword token count: letter runs, digit runs, and single
    // punctuation marks — the shape of a GPT-2-style pre-tokenizer, kept to
    // ASCII classes that Java regex (Spark) and RE2 (DuckDB) treat
    // identically. tokens-per-word is the standard fertility estimate.
    "txt_tokens_bpe" ->
      s"""SELECT doc_id,
         |  CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9$wsSpark]', 0)) AS BIGINT) AS n_tokens,
        |  CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9$wsSpark]', 0)) AS DOUBLE)
        |    / CAST(size(split(text, ' ')) AS DOUBLE) AS fertility
        |FROM documents ORDER BY doc_id""".stripMargin,

    // rolling polynomial fingerprint over the token stream. r18 (guide
    // §4.1): the aggregate/transform HOF chain is CodegenFallback — a
    // per-element lambda environment — so it runs as the native fused
    // [[graft.functions.PolyFingerprint]] loop instead; identical fold
    // (same length/ascii/int-widening/% semantics), pinned element-for-
    // element against the HOF form by PolyFingerprintSpec.
    "txt_fingerprint" ->
      """SELECT doc_id, poly_fp(split(text, ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // corpus statistics: top terms by document frequency (+ total term freq)
    "txt_topterms" ->
      """SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(count(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS w FROM documents) t
        |GROUP BY w ORDER BY df DESC, tf DESC, w LIMIT 10""".stripMargin,

    // tf-idf-style keyword extraction: top-3 terms per document, scored
    // tf·(N/df). The idf here is the RATIONAL inverse document frequency,
    // not ln(N/df): one IEEE multiply + divide is correctly rounded in any
    // engine, where transcendental functions differ in the last ulp between
    // libm implementations and would break the bit-exact oracle. This is a
    // deliberately different WEIGHTING, not just a rescale — ln dampens the
    // rare-term factor, so relative to log-tf-idf this score favors rarer
    // terms over high-tf common ones (and a term in every doc keeps score
    // tf·1 instead of 0). Fold the eval into buckets or precompute a
    // df→weight table if log weighting must be reproduced exactly.
    // r18 optimization (guide §2.3): df derives FROM tf — tf holds exactly
    // one row per (doc, term), so count(*) ≡ count(DISTINCT doc_id) — which
    // drops the second full token explode + distinct aggregation; the df
    // shuffle now carries distinct (doc, term) rows instead of every token.
    // r19 (verdict item 5): df is a WINDOW over tf — count(*) OVER
    // (PARTITION BY term) on one-row-per-(doc, term) input IS the document
    // frequency — so tf is referenced ONCE and the plan holds ONE Generate
    // node structurally. The r18 form referenced tf twice (scoring join +
    // df aggregate); CTE inlining planned the token explode subtree twice
    // and only AQE's runtime exchange reuse deduped it — a fragile
    // dedup (it silently vanished in r18's ds_bloom experiment). Same
    // integers (df), same double expression (tf·n/df), same row_number
    // total order; the tf-side exchange by term replaces the old join's
    // identical exchange, so no new shuffle is paid.
    "txt_tfidf" ->
      """WITH w AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE)
        |           / CAST(count(*) OVER (PARTITION BY tf.term) AS DOUBLE) AS score
        |  FROM tf CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin,

    // vocabulary OOV-rate filter: vocabulary = the corpus's top-50 terms by
    // document frequency (total order: df DESC, term — deterministic), each
    // document scored by its out-of-vocabulary token fraction. The standard
    // "unusual vocabulary" pre-training gate. Distributed shape: one
    // explode → df hash-agg, a 50-row vocab Spark auto-BROADCASTs into the
    // token join, one final hash-agg per doc — no driver work, scales with
    // executors at 100 TB.
    // r18 optimization (guide §2.3): ONE token explode — the (doc, term)
    // occurrence counts `wt` feed df (count(*) over wt ≡ count(DISTINCT
    // doc_id) over raw tokens), the vocab pick, AND the per-doc scoring
    // (occurrence-weighted: sum(oov·c) / sum(c) ≡ the per-token sums);
    // the old form exploded the full token stream twice and shuffled every
    // token into the df distinct-aggregation.
    "txt_oov" ->
      """WITH w AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
        |wt AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM wt GROUP BY term),
        |vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 50),
        |j AS (SELECT wt.doc_id, wt.c,
        |             CASE WHEN v.term IS NULL THEN wt.c ELSE 0 END AS oov
        |      FROM wt LEFT JOIN vocab v ON wt.term = v.term)
        |SELECT doc_id, CAST(sum(oov) AS BIGINT) AS n_oov,
        |       CAST(sum(c) AS BIGINT) AS n_tok,
        |       CAST(sum(oov) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS oov_rate,
        |       CASE WHEN sum(oov) * 4 <= sum(c) THEN 'keep' ELSE 'drop' END AS verdict
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // token-commonness score: mean corpus document-frequency of a doc's
    // tokens — the RATIONAL stand-in for unigram-LM log-prob scoring
    // (mean df is monotone in mean unigram probability for a df-weighted
    // model; sums and one division keep both engines bit-identical where
    // a log-prob's transcendental eval would not). Low mean_df = unusual
    // vocabulary, the same documents a perplexity filter flags.
    // r18 optimization (guide §2.3): same one-explode restructure as
    // txt_oov — df from the (doc, term) counts, per-doc sums occurrence-
    // weighted (sum(df·c) ≡ the per-token df sum; integer addition
    // regrouped, bit-exact).
    // r19 (verdict item 5): df as a WINDOW over wt (the txt_tfidf
    // restructure) — wt referenced once, ONE Generate node structurally,
    // no AQE-reuse dependence; same bigint df, same sums.
    "txt_commonness" ->
      """WITH w AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
        |wt AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
        |wd AS (SELECT doc_id, c, count(*) OVER (PARTITION BY term) AS df FROM wt)
        |SELECT doc_id, CAST(sum(df * c) AS BIGINT) AS df_sum,
        |       CAST(sum(c) AS BIGINT) AS n_tok,
        |       CAST(sum(df * c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS mean_df
        |FROM wd GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // document n-gram census through the NATIVE one-pass word_ngrams
    // expression (the building block behind decontamination and
    // shingle-Jaccard): distinct vs total 3-gram counts per doc. The
    // oracle recomputes the grams with DuckDB's list HOFs, so this entry
    // contract-checks the expression itself, not just its consumers.
    "txt_ngrams" ->
      """SELECT doc_id,
        |  CAST(size(word_ngrams(split(text, ' '), 3)) AS BIGINT) AS n_distinct,
        |  CAST(size(split(text, ' ')) - 2 AS BIGINT) AS n_total
        |FROM documents WHERE size(split(text, ' ')) >= 3
        |ORDER BY doc_id""".stripMargin,

    // exact dedup: hash-groupBy on a normalized key, keep-min representative
    "dd_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS group_sz
        |FROM documents
        |GROUP BY md5(substring(text, 1, 30))
        |HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,

  )

  /** Shingle-Jaccard pair SQL, optionally excluding "stop shingles" that
    * appear in more than `capDf` documents from pair generation.
    *
    * Why the cap exists: per-shingle doc lists make co-occurrence counting
    * linear in list size, EXCEPT that pair generation inside one list is
    * quadratic — one pathologically common shingle (a boilerplate phrase in
    * 1M documents) turns into 5·10¹¹ in-task pairs and kills the stage. A
    * df cap bounds every list at `capDf`, so per-list work is ≤ capDf²/2 and
    * the whole plan is again linear in corpus size.
    *
    * Effect on results: dropping a shingle can only LOWER intersection
    * counts, so estimated Jaccard ≤ true Jaccard and the capped output is a
    * subset of the exact pairs — precision stays 1; only pairs whose overlap
    * hinges on ubiquitous shingles are missed (for near-dup detection those
    * are exactly the uninformative matches). `capDf = None` is the exact
    * form. */
  private[graft] def shingleJaccardSparkSql(capDf: Option[Int], fanW: Int = 0,
      ordered: Boolean = true): String = {
    val cap = capDf.map(n => s" AND count(*) <= $n").getOrElse("")
    // `ordered = false` is the fixpoint-input form (r18 optimization, guide
    // §2.4): connectedComponents consumes the pair SET — its first move is a
    // canonical re-orientation — so the contract entries' global ORDER BY
    // (a full range-partitioned sort of the pair stream) is pure waste
    // there. Row-set identical by construction; the CONTRACT entries keep
    // the sorted form verbatim.
    val orderBy = if (ordered) "\nORDER BY i, j" else ""
    // r18 optimization (guide §1.2/§2.3): the gram ARRAY is computed once
    // (`g`) and both consumers derive from it — `sz` as a map-side
    // size(gs) projection instead of a second full split+ngram pass and a
    // count aggregation (word_ngrams emits DISTINCT grams, so the exploded
    // per-doc count(*) it replaced equals size(gs) exactly — the identity
    // the r17 verdict recorded for the over-flag budget). The tiny sz side
    // auto-broadcasts into the verification joins (584 KB scan estimate,
    // far under the 10 MB threshold). Scan fan-out per Q.fanWidth.
    s"""WITH d AS (SELECT ${Q.repHint(fanW)}doc_id, split(text, ' ') AS w FROM documents WHERE size(split(text, ' ')) >= 3),
       |g AS (SELECT doc_id, word_ngrams(w, 3) AS gs FROM d),
       |sh AS (SELECT ${Q.repHintBy(fanW, "s")}doc_id, explode(gs) AS s FROM g),
       |sz AS (SELECT doc_id, size(gs) AS n FROM g),
       |lists AS (SELECT sort_array(collect_list(doc_id)) AS ds
       |          FROM sh GROUP BY s HAVING count(*) > 1$cap),
       |pairs AS (SELECT p.i AS i, p.j AS j FROM lists
       |          LATERAL VIEW explode(array_pairs(ds)) t AS p),
       |inter AS (SELECT i, j, count(*) AS c FROM pairs GROUP BY i, j)
       |SELECT i, j FROM inter
       |JOIN sz sa ON sa.doc_id = i
       |JOIN sz sb ON sb.doc_id = j
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5$orderBy""".stripMargin
  }

  /** DuckDB twin of [[shingleJaccardSparkSql]] (join-based co-occurrence —
    * the oracle only needs to be correct, not skew-proof). */
  private[graft] def shingleJaccardDuckSql(capDf: Option[Int]): String = {
    val capJoin = capDf.map(n =>
      s"""
         |          JOIN (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND $n) ok
         |            ON ok.s = a.s""".stripMargin).getOrElse("")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |           WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(
       |         [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)])) AS s
       |       FROM d),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id$capJoin
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT i, j FROM inter
       |JOIN sz sa ON sa.doc_id = i
       |JOIN sz sb ON sb.doc_id = j
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
       |ORDER BY i, j""".stripMargin
  }

  // --- DuckDB oracles -----------------------------------------------------

  val oracles: Map[String, String] = Map(
    "txt_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_char,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_wlen
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_lang_id" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($enStopsSql))) AS BIGINT) AS en_hits,
         |  CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ($enStopsSql))) * 20
         |            >= len(string_split(text, ' ')) THEN 'en' ELSE 'unk' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($enStopsSql))) AS DOUBLE)
         |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9$wsDuck]')) AS DOUBLE)
         |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
         |  CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000
         |        AND len(list_filter(string_split(text, ' '), w -> w IN ($enStopsSql))) * 20 >= len(string_split(text, ' '))
         |        AND len(regexp_extract_all(text, '[^A-Za-z0-9$wsDuck]')) * 10 <= length(text)
         |       THEN 'keep' ELSE 'drop' END AS verdict
         |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_tokens_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9$wsDuck]')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9$wsDuck]')) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS fertility
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |                     w -> CAST(length(w) * 131 + ascii(w) AS BIGINT))),
        |    (h, x) -> (h * 31 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_topterms" ->
      """SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(count(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |GROUP BY w ORDER BY df DESC, tf DESC, w LIMIT 10""".stripMargin,

    "txt_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |         CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, term, score FROM ranked WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin,

    "txt_oov" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
        |vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 50),
        |j AS (SELECT w.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        |      FROM w LEFT JOIN vocab v ON w.term = v.term)
        |SELECT doc_id, CAST(sum(oov) AS BIGINT) AS n_oov,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate,
        |       CASE WHEN sum(oov) * 4 <= count(*) THEN 'keep' ELSE 'drop' END AS verdict
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "txt_commonness" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term)
        |SELECT w.doc_id, CAST(sum(df.df) AS BIGINT) AS df_sum,
        |       CAST(count(*) AS BIGINT) AS n_tok,
        |       CAST(sum(df.df) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_df
        |FROM w JOIN df ON w.term = df.term
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,

    "dd_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS group_sz
        |FROM documents
        |GROUP BY md5(substring(text, 1, 30))
        |HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,

    "dd_shingle_jaccard" -> shingleJaccardDuckSql(capDf = None),

    "dd_shingle_capped" -> shingleJaccardDuckSql(capDf = Some(ShingleCapDf)),

    "txt_ngrams" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3)
        |SELECT doc_id,
        |  CAST(len(list_distinct(list_transform(generate_series(1, len(w) - 2),
        |       i -> array_to_string(w[i:i+2], ' ')))) AS BIGINT) AS n_distinct,
        |  CAST(len(w) - 2 AS BIGINT) AS n_total
        |FROM d ORDER BY doc_id""".stripMargin,
  )

  val defs: Seq[(String, (SparkSession, String) => DataFrame)] =
    sparkSql.map { case (n, s) => n -> Q.sql(s) } ++ Seq(
      // exact 3-word-shingle Jaccard near-dup pairs (the ground truth the
      // MinHash/LSH variant in SimilarityQueries approximates).
      // Co-occurrence counting goes through per-shingle sorted doc lists
      // with in-task pair generation instead of a shingle self-join:
      // identical output, but the multi-ten-million-row join intermediate
      // never materializes (44× at sf0.1). Fanned: the gram explosion is
      // the suite's densest scan-side amplification.
      "dd_shingle_jaccard" ->
        Q.sqlFan("documents")(w => shingleJaccardSparkSql(capDf = None, fanW = w)),
      // skew-capped variant: the at-scale default (see shingleJaccardSparkSql)
      "dd_shingle_capped" ->
        Q.sqlFan("documents")(w => shingleJaccardSparkSql(capDf = Some(ShingleCapDf), fanW = w)),
    )
}
