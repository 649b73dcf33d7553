package graft.examples

import org.apache.spark.sql.SparkSession

/** Benchmark decontamination, both tiers, end to end on the synthetic
  * corpus — the workflow a training-data pipeline runs before every
  * pretraining mix:
  *
  *  1. EXACT tier: join the corpus's distinct word 4-grams against the
  *     eval slice's gram set (`txt_decontaminate` semantics) — the
  *     ground-truth pass, which shuffles the corpus gram stream once the
  *     eval side outgrows the broadcast threshold.
  *  2. BLOOM tier: collapse the eval grams to ONE `bloom_agg` blob and
  *     probe it through `bloom_contains((SELECT …), xxhash64(gram))` — an
  *     uncorrelated scalar subquery, evaluated once, so the corpus side is
  *     a join-free map-side filter with zero corpus-gram shuffle. False
  *     positives possible (bounded by the blob sizing), false negatives
  *     impossible — flag with the bloom, verify flagged docs exactly.
  *
  * The example prints both verdict sets and asserts the containment the
  * contract's `ds_bloom_decon_check` pins: exact ⊆ bloom.
  *
  * Run: `sbt "runMain graft.examples.DecontaminationExample"`
  */
object DecontaminationExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark) // word_ngrams, bloom_agg, bloom_contains

    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("documents")

    // shared gram stream: distinct word 4-grams per document; the eval
    // "benchmark" is the deterministic 1-in-97 doc slice
    val prelude =
      """d AS (SELECT doc_id, split(text, ' ') AS w FROM documents
        |      WHERE size(split(text, ' ')) >= 4),
        |g AS (SELECT doc_id, explode(word_ngrams(w, 4)) AS s FROM d),
        |t AS (SELECT doc_id, s FROM g WHERE doc_id % 97 <> 0)""".stripMargin

    val exact = spark.sql(
      s"""WITH $prelude,
         |e AS (SELECT DISTINCT s FROM g WHERE doc_id % 97 = 0)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM t JOIN e ON t.s = e.s GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)
    println("exact tier (ground truth):")
    exact.show(false)

    val bloom = spark.sql(
      s"""WITH $prelude,
         |e AS (SELECT bloom_agg(xxhash64(s), 1048576, 5) AS bf
         |      FROM (SELECT DISTINCT s FROM g WHERE doc_id % 97 = 0) ev)
         |SELECT t.doc_id, count(*) AS n_hits
         |FROM t WHERE bloom_contains((SELECT bf FROM e), xxhash64(t.s))
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin)
    println("bloom tier (128 KiB broadcast blob, map-side probe):")
    bloom.show(false)

    val exactIds = exact.select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomIds = bloom.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactIds.subsetOf(bloomIds),
      s"bloom missed ${exactIds.diff(bloomIds)} — false negatives are impossible")
    println(s"exact flagged ${exactIds.size} docs; bloom flagged ${bloomIds.size} " +
      s"(${bloomIds.size - exactIds.size} false positive(s)); exact ⊆ bloom ✓")

    spark.stop()
  }
}
