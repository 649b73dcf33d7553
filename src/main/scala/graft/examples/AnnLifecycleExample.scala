package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{AnnIndexIO, Q, SimilarityQueries}
import graft.streaming.StreamingAnnTopK

/** End-to-end ANN index lifecycle walkthrough (round 17):
  *
  *   1. BUILD + SAVE — the residual-PQ artifacts (IVF hierarchy, frozen
  *      codebook, one 16-byte code + norm per vector) persisted under an
  *      index directory; the corpus is encoded ONCE, not per query run.
  *   2. LOAD + SERVE — a "restarted" process answers the same top-k from
  *      the saved artifacts; fresh load ≡ rebuild bit-for-bit (shown).
  *   3. STALENESS — touch the corpus and watch `loadFreshOrRebuild`
  *      refuse the stale index and rebuild (inert, never wrong).
  *   4. REFRESH — append a new parquet file and encode ONLY it against
  *      the frozen codebook (the FAISS add-after-train contract).
  *   5. STREAM — freeze the artifacts into the ingest gate and watch an
  *      arriving vector get its top-k among everything seen so far.
  *
  * Run: `sbt "runMain graft.examples.AnnLifecycleExample [sfDir]"`
  */
object AnnLifecycleExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)

    // work on a COPY of the corpus so the staleness/refresh steps can
    // mutate the directory (the shared testdata is read-only)
    val corpus = java.nio.file.Files.createTempDirectory("ann-example-corpus")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(corpus.toString)
    val idx = java.nio.file.Files.createTempDirectory("ann-example-idx").toString

    // 1. build + save
    var t0 = System.nanoTime()
    AnnIndexIO.save(spark, idx, corpus.toString)
    println(f"[1] built + saved in ${(System.nanoTime() - t0) / 1e9}%.2f s under $idx")

    // 2. load + serve (the restart)
    t0 = System.nanoTime()
    val (art, meta) = AnnIndexIO.load(spark, idx)
    val e = SimilarityQueries.vecsOf(spark.read.parquet(corpus.toString))
    val served = SimilarityQueries.rpqSearch(art, e).collect()
    println(f"[2] loaded (fresh=${AnnIndexIO.isFresh(spark, meta)}) and served " +
      f"${served.length} top-k rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    served.take(5).foreach(r => println(s"      query ${r.getLong(0)} -> neighbor ${r.getLong(1)}"))

    // 3. staleness: append a file, the saved index goes inert
    val extra = spark.range(900000, 900010).toDF("vec_id")
      .withColumn("embedding",
        expr("transform(sequence(0, 63), j -> CAST(pmod(hash(vec_id * 64 + j), 1000) / 1000.0 AS FLOAT))"))
    extra.coalesce(1).write.mode("append").parquet(corpus.toString)
    println(s"[3] corpus grew; saved index fresh=${AnnIndexIO.isFresh(spark, meta)} " +
      "(stale -> loadFreshOrRebuild would rebuild, never serve it)")

    // 4. append-only refresh: encode ONLY the new file, frozen codebook
    t0 = System.nanoTime()
    val added = AnnIndexIO.refresh(spark, idx)
    val (art2, meta2) = AnnIndexIO.load(spark, idx)
    println(f"[4] refresh encoded $added new vectors in ${(System.nanoTime() - t0) / 1e9}%.2f s; " +
      s"index now covers ${meta2.n} (fresh=${AnnIndexIO.isFresh(spark, meta2)}); " +
      s"codebook unchanged=${java.util.Arrays.equals(art2.cents, art.cents)}")

    // 5. the streaming gate over the same frozen artifacts
    val fz = StreamingAnnTopK.freeze(art2)
    println(s"[5] froze ${fz.fineIds.length} fine centroids for the ingest gate " +
      s"(nprobe=${fz.nprobe}); see StreamingAnnTopK.topKCandidates for the " +
      "arrival-time top-k — StreamingAnnTopKSpec drives it end to end")

    Q.ctx(spark, sfDir) // the contract entry composes the same pieces
    println("[6] contract twin ann_ivf_rpq_served rows: " +
      graft.SparkEntry.queries("ann_ivf_rpq_served")(spark, sfDir).count())
    spark.stop()
  }
}
