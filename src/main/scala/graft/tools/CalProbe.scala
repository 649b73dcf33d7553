package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: print the nprobe calibration ladder + choice for the
  * contract corpora (needs private[graft] access, so it lives in tools). */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
    args.foreach { sfDir =>
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val n = df.count()
      val e = graft.queries.SimilarityQueries.vecsOf(df).persist()
      val art0 = graft.queries.SimilarityQueries.rpqArtifactsOf(e, n)
      val cp = art0.codes.persist()
      val (np, ladder) = graft.queries.SimilarityQueries.calibrateNprobe(art0, e)
      println(s"[calprobe] $sfDir n=$n formula=${graft.queries.SimilarityQueries.nprobeFor(n)} " +
        s"cal=$np ladder=${ladder.map { case (p, r) => f"$p:$r%.4f" }.mkString(",")}")
      cp.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
