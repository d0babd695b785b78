package graft

import org.apache.spark.sql.functions._

/** Scratch: measure the native StringRollingFp expression against the
  * composed aggregate(split(...)) HOF it replaced — whole-doc fingerprints
  * and the per-token transform() shape, warm minimums over sf0.1.
  *
  * Measured 2026-08-14 (sf0.1, local[16], warm min of 5): scan floor
  * (length projection) 0.146 s; whole-doc fold HOF 0.275 s → native
  * 0.114 s (AT the scan floor — the fold itself is now free); per-token
  * transform shape HOF 0.292 s → native 0.172 s.
  */
object ProfileFp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-fp", 16)
      .master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.persist().count()
    import graft.llm.TextAnalysis
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(col("fp") % 1000003L)).collect() // mod keeps the sum in range
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[fp] $label%-22s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("scan floor (length)") {
      docs.select((length(col("text")) % 1000003L).cast("long").as("fp")) }
    time("whole-doc native") {
      docs.select(TextAnalysis.fingerprint(col("text")).as("fp")) }
    time("whole-doc hof") {
      docs.select(TextAnalysis.fingerprintHof(col("text")).as("fp")) }
    time("per-token native") {
      docs.select(explode(transform(TextAnalysis.tokens(col("text")),
        t => TextAnalysis.fingerprint(t))).as("fp")) }
    time("per-token hof") {
      docs.select(explode(transform(TextAnalysis.tokens(col("text")),
        t => TextAnalysis.fingerprintHof(t))).as("fp")) }
    spark.stop()
  }
}
