package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.TextAnalysis

/** The native [[graft.functions.StringRollingFp]] expression must be
  * value-identical to the composed higher-order-function fold it replaced
  * (fingerprintHof) — every oracle hash in the registry rides on this —
  * and must stay inside whole-stage codegen (the reason it exists).
  */
class FingerprintSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("native fingerprint == HOF fold corpus-wide, salted and unsalted") {
    val both = docs.select(
      TextAnalysis.fingerprint(col("text")).as("native"),
      TextAnalysis.fingerprintHof(col("text")).as("hof"),
      TextAnalysis.fingerprint(concat(col("text"), lit("|salt")))
        .as("native_s"),
      TextAnalysis.fingerprintHof(concat(col("text"), lit("|salt")))
        .as("hof_s"))
    assert(both.filter(col("native") =!= col("hof") ||
      col("native_s") =!= col("hof_s")).count() == 0L)
  }

  test("native fingerprint == HOF fold on the edge cases: empty, single " +
    "char, BMP unicode, astral plane, long, and null stays null") {
    val cases = Seq("", "a", "Z9 ~", "héllo wörld ✓",
      "a💩b", // astral: one code point, two UTF-16 units
      "x" * 10000)
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "t")
    val bad = df.select(
        TextAnalysis.fingerprint(col("t")).as("n"),
        TextAnalysis.fingerprintHof(col("t")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0L)
    val nulls = Seq((1L, null: String)).toDF("id", "t")
      .select(TextAnalysis.fingerprint(col("t")).as("n"))
      .collect()
    assert(nulls.head.isNullAt(0), "null text must fingerprint to null")
  }

  test("native fingerprint == the driver-side twin fingerprintOf on " +
    "ASCII, and works inside transform() lambdas") {
    val sample = docs.limit(50).select("text").as[String].collect()
    val viaCol = docs.limit(50)
      .select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(sample.map(TextAnalysis.fingerprintOf).toSeq == viaCol.toSeq)
    // per-token use under a higher-order transform (the q112 shape)
    val perTok = docs.limit(20)
      .select(transform(TextAnalysis.tokens(col("text")),
        t => TextAnalysis.fingerprint(t)).as("fps"),
        TextAnalysis.tokens(col("text")).as("w"))
      .as[(Seq[Long], Seq[String])].collect()
    for ((fps, ws) <- perTok)
      assert(fps == ws.map(TextAnalysis.fingerprintOf))
  }

  test("the fingerprint projection stays in whole-stage codegen with no " +
    "interpreted lambda") {
    val p = docs.select(TextAnalysis.fingerprint(col("text")))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"),
      s"the projection must carry the codegen star:\n$p")
    assert(!p.contains("lambdafunction"),
      s"the native form must not re-introduce the HOF:\n$p")
  }
}
