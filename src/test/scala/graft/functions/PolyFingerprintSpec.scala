package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `poly_fp(ws)` replaces txt_fingerprint's HOF chain — it must be
  * VALUE-IDENTICAL to
  * `aggregate(transform(ws, w -> CAST(length(w)*131 + ascii(w) AS BIGINT)),
  *            CAST(7 AS BIGINT), (h, x) -> (h*31 + x) % 1000000007)`
  * on every input, because the entry's DuckDB oracle recomputes exactly
  * that fold. The fuzz deliberately stresses the semantics the kernel
  * re-implements: empty tokens (ascii('') = 0), non-ASCII first chars
  * (ascii = first CODE POINT, incl. supplementary planes), empty arrays
  * (fold = seed), NULL tokens (poison the running hash to NULL), and NULL
  * arrays. */
class PolyFingerprintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val setup: Unit = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.enable(spark)
  }

  private val hof =
    """aggregate(
      |  transform(ws, w -> CAST(length(w) * 131 + ascii(w) AS BIGINT)),
      |  CAST(7 AS BIGINT),
      |  (h, x) -> (h * 31 + x) % 1000000007)""".stripMargin

  test("fuzzed equivalence with the aggregate/transform HOF form") {
    setup
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(0xf19e12L)
    val alphabets = Array(
      "abcdefghij", // plain ascii
      "äöüßéñç",    // 2-byte utf-8 first chars
      "日本語中文",  // 3-byte
      new String(Character.toChars(0x1F600)) + new String(Character.toChars(0x10348)))
    def word(): String = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      val cps = a.codePointCount(0, a.length)
      val len = rnd.nextInt(6) // 0 = empty token
      (0 until len).map { _ =>
        val ci = a.offsetByCodePoints(0, rnd.nextInt(cps))
        new String(Character.toChars(a.codePointAt(ci)))
      }.mkString
    }
    val rows: Seq[(Int, Seq[String])] = (0 until 400).map { i =>
      if (i % 37 == 0) (i, null)
      else if (i % 11 == 0) (i, Seq.empty[String])
      else {
        val ws = (0 until rnd.nextInt(12)).map(_ => word())
        // every 7th non-trivial row gets a NULL token somewhere
        (i, if (i % 7 == 0 && ws.nonEmpty)
          ws.updated(rnd.nextInt(ws.length), null: String) else ws)
      }
    }
    rows.toDF("id", "ws").createOrReplaceTempView("pfp_rows")
    val bad = spark.sql(
      s"""SELECT count(*) FROM (
         |  SELECT id, poly_fp(ws) AS a, $hof AS b FROM pfp_rows)
         |WHERE NOT (a <=> b)""".stripMargin).head().getLong(0)
    assert(bad === 0L, "poly_fp diverged from the HOF fold")
  }

  test("the contract corpus itself agrees token-for-token") {
    setup
    graft.queries.Q.ctx(spark, "/root/testdata/sf0.001")
    val bad = spark.sql(
      s"""SELECT count(*) FROM (
         |  SELECT doc_id, poly_fp(split(text, ' ')) AS a,
         |         ${hof.replace("ws", "split(text, ' ')")} AS b
         |  FROM documents)
         |WHERE NOT (a <=> b)""".stripMargin).head().getLong(0)
    assert(bad === 0L)
  }
}
