package graft

import org.apache.spark.sql.functions._

/** SparkSessionExtensions wiring: the test session is built with
  * `.withExtensions(new GraftExtensions)` (SparkSpecBase) — the same
  * injection path `spark.sql.extensions=graft.GraftExtensions` takes on a
  * cluster — so pure-SQL references to the graft functions must resolve
  * and produce the values the Column API and the driver-side references
  * compute.
  */
class ExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_fp resolves in SQL and matches the driver-side fingerprint") {
    val got = spark.sql(
      "SELECT graft_fp('hello world graft') AS fp").as[Long].head()
    assert(got == graft.llm.TextAnalysis.fingerprintOf("hello world graft"))
    // and the Column API produces the identical value
    val viaCol = Seq("hello world graft").toDF("text")
      .select(graft.llm.TextAnalysis.fingerprint(col("text")))
      .as[Long].head()
    assert(got == viaCol)
  }

  test("graft_mix57 resolves in SQL and matches the mix57 column chain " +
    "across sign, zero, and large inputs") {
    val inputs = Seq(0L, 1L, -1L, 123456789L, Long.MaxValue, Long.MinValue)
    val viaSql = spark.sql(
      s"SELECT graft_mix57(CAST(x AS BIGINT)) AS h FROM " +
        s"(VALUES ${inputs.mkString("(", "), (", ")")}) AS t(x)")
      .as[Long].collect().toSeq
    val viaCol = inputs.toDF("x")
      .select(graft.ops.Sketch.mix57(col("x")).as("h"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.forall(h => h >= 0 && h < (1L << 57)),
      "mix57 must land in the 57-bit ring")
  }

  test("vec_dot / vec_cosine resolve in SQL over float arrays and match " +
    "driver arithmetic") {
    val sql =
      """SELECT
        |  vec_dot(a, b) AS dot,
        |  vec_cosine(a, b) AS cos
        |FROM (SELECT
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT),
        |        CAST(3.0 AS FLOAT)) AS a,
        |  array(CAST(4.0 AS FLOAT), CAST(-5.0 AS FLOAT),
        |        CAST(6.0 AS FLOAT)) AS b)""".stripMargin
    val (dot, cos) = spark.sql(sql).as[(Double, Double)].head()
    val want = 1.0 * 4 + 2.0 * (-5) + 3.0 * 6
    assert(dot == want)
    val expCos = want /
      (math.sqrt(1.0 + 4 + 9) * math.sqrt(16.0 + 25 + 36))
    assert(math.abs(cos - expCos) < 1e-15)
  }

  test("mis-called extension functions fail ANALYSIS with a real " +
    "wrong-number-of-arguments error naming the function — extra args " +
    "are never silently dropped, zero args never surfaces an opaque " +
    "NoSuchElementException") {
    for ((call, fname) <- Seq(
        ("graft_fp('a', 'b')", "graft_fp"),       // extra arg
        ("graft_fp()", "graft_fp"),               // zero args
        ("graft_mix57(1, 2)", "graft_mix57"),
        ("vec_dot(array(1.0F))", "vec_dot"),      // missing arg
        ("vec_cosine(array(1.0F), array(1.0F), array(1.0F))",
          "vec_cosine"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $call").collect()
      }
      assert(e.getMessage.contains(fname),
        s"error for `$call` must name the function: ${e.getMessage}")
    }
  }

  test("the q37 fingerprint query is expressible in PURE SQL through the " +
    "extension — no Scala in the loop") {
    val viaSql = {
      graft.core.Tables.documents(spark, sfDir)
        .createOrReplaceTempView("documents_ext")
      spark.sql(
        "SELECT doc_id, graft_fp(text) AS fp FROM documents_ext")
        .as[(Long, Long)].collect().toMap
    }
    val viaRegistry = SparkEntry.queries("q37_fingerprint")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaRegistry)
  }
}
