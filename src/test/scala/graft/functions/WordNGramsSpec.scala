package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `word_ngrams(tokens, n)` replaces the pipeline's hot HOF gram chain —
  * it must be ELEMENT-IDENTICAL (values AND order) to
  * `array_distinct(transform(sequence(0, size(w)-n),
  *                           i -> concat_ws(' ', slice(w, i+1, n))))`
  * wherever that chain is defined, because the dedup/decontamination
  * entries hash and join the gram strings it produces. */
class WordNGramsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
  }

  test("fuzzed equivalence with the HOF chain, n in 2..5") {
    setup
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(0x9a11L)
    // word shapes that stress the chain: repeats (distinct matters),
    // empty tokens (double spaces survive split), single chars, unicode
    val vocab = Array("a", "b", "cat", "dog", "", "µ", "word", "a", "b")
    val docs = (0 until 2000).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("wng_docs")
    for (n <- 2 to 5) {
      val bad = spark.sql(
        s"""SELECT count(*) FROM (
           |  SELECT array_distinct(transform(sequence(0, size(w) - $n),
           |           i -> concat_ws(' ', slice(w, i + 1, $n)))) AS a,
           |         word_ngrams(w, $n) AS b
           |  FROM (SELECT split(text, ' ') AS w FROM wng_docs)
           |  WHERE size(w) >= $n) WHERE a <> b""".stripMargin)
        .collect()(0).getLong(0)
      assert(bad == 0L, s"n=$n: $bad rows diverged from the HOF chain")
    }
  }

  test("edge semantics: short arrays empty, NULL array NULL, NULL tokens skipped") {
    setup
    val r = spark.sql(
      """SELECT word_ngrams(array('a'), 2) AS short,
        |       word_ngrams(CAST(NULL AS ARRAY<STRING>), 2) AS nul,
        |       word_ngrams(array('a', NULL, 'b'), 2) AS sk""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) == Seq.empty)
    assert(r.isNullAt(1))
    // concat_ws skips NULLs: windows ('a', NULL) -> "a", (NULL, 'b') -> "b"
    assert(r.getSeq[String](2) == Seq("a", "b"))
  }

  test("distinct keeps first-occurrence order") {
    setup
    val r = spark.sql("SELECT word_ngrams(array('x','y','x','y','x'), 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(r == Seq("x y", "y x"))
  }
}
