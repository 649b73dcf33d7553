package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, Q}

/** The curation operators composed into one end-to-end dedup-and-mix
  * pipeline — the flow a pretraining data run executes, here over the
  * synthetic documents corpus:
  *
  *   1. funnel filter (length / repetition / language verdicts)
  *   2. near-dup clustering over the kept set's shingle pairs
  *   3. representative selection (one keep per cluster)
  *   4. dedup application: anti-join the corpus against non-kept members
  *   5. deterministic mixture gate + train/val/test split manifest
  *
  * Every stage is the same hash-partitioned dataflow the contract queries
  * check individually; this example shows they compose without collecting
  * anything to the driver until the final (tiny) manifest.
  *
  * Run: `sbt "runMain graft.examples.CurationPipelineExample"`
  */
object CurationPipelineExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Q.ctx(spark, sfDir)

    val docs = spark.table("documents")
    val total = docs.count()

    // 1. funnel: keep docs passing length + repetition + language gates
    val kept = docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 30 && col("lang").isin("en", "de", "fr"))
      .withColumn("nbi", size(col("w")) - 1)
      // native one-pass distinct bigrams (graft.functions.WordNGrams) —
      // element-identical to the array_distinct/transform/slice HOF chain
      .withColumn("nuniq", size(expr("word_ngrams(w, 2)")))
      .where((col("nbi") - col("nuniq")) * 5 < col("nbi"))
      .select("doc_id", "lang", "text")
    println(s"funnel: $total docs -> ${kept.count()} kept")

    // 2-3. cluster the near-dup pairs of the KEPT set, pick one rep each.
    // The example retargets the documents view at the funnel survivors so
    // the clustering operators read the filtered corpus; try/finally keeps
    // any later user of this session from inheriting the narrowed view if
    // a clustering stage throws.
    val deduped =
      try {
        kept.createOrReplaceTempView("documents")
        // ONE star fixpoint serves both derivations (memoized membership
        // materialization; the memo keys on the retargeted view's plan, so
        // this filtered corpus never collides with the full one)
        val members = PipelineQueries.clusterMembersShared(spark, sfDir)
        val keeps = PipelineQueries.keepsFrom(members, spark)
          .select(col("keep_id").as("doc_id"))
        // every doc in a near-dup pair belongs to exactly one cluster: the
        // drop set is pair members minus the per-cluster keeps — and the
        // membership frame IS the pair-member set, no second shingle pass
        val pairDocs = members.select(col("id").as("doc_id"))
        val drops = pairDocs.join(keeps, Seq("doc_id"), "left_anti")
        val nDrops = drops.count()

        // 4. apply: anti-join the kept corpus against dropped members
        val out = kept.join(drops, Seq("doc_id"), "left_anti")
        println(s"dedup: ${kept.count()} kept -> ${out.count()} after dropping $nDrops near-dups")
        out
      } finally {
        docs.createOrReplaceTempView("documents") // restore the full-corpus view
      }

    // 5. mixture gate + split manifest (deterministic, no RNG). The two
    // decisions use DIFFERENT multipliers: with a shared hash the
    // mixture-kept subset (hash < rate) would be a prefix of the split
    // order and land entirely in 'train' — independent decisions need
    // independent hashes.
    val manifest = deduped
      .where(expr("(doc_id * 2654435761) % 1000") <
        when(col("lang") === "en", 600).when(col("lang") === "de", 300).otherwise(150))
      .withColumn("h2", expr("(doc_id * 2246822519) % 1000"))
      .withColumn("split",
        when(col("h2") < 800, "train").when(col("h2") < 900, "val").otherwise("test"))
      .groupBy("lang", "split").count().orderBy("lang", "split")
    manifest.show(50, truncate = false)
    spark.stop()
  }
}
