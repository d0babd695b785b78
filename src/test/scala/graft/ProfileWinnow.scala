package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: stage attribution for winnowPairs (q112) at bench scale. The
  * inlined stages below keep the ORIGINAL array-expression form (gram
  * hashes as a transform over positions, then posexplode) deliberately —
  * the measured A/B against the shipped explode-first/scalar-after form:
  * at sf0.1 the explode of the nested-HOF gram array costs 54 s of a 66 s
  * query (the Generate's child tree re-evaluates its expensive per-element
  * work), while the shipped lead()-chain form runs the whole query in
  * ~1.15-1.75 s (isolated Bench) with identical output — q112 re-verified
  * hash-green at sf0.001/0.01/0.1 after the swap. PlanSpec now locks the
  * "generator child must stay cheap" property.
  */
object ProfileWinnow {
  def time[A](label: String)(f: => A): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[winnow] $label: min ${ts.min}%.2f  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-winnow", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val k = 4; val win = 4
    val M36 = 1L << 36; val P21 = 1L << 21

    val base = docs
      .select(col("doc_id"), graft.llm.TextAnalysis.tokens(col("text")).as("__w"))
      .filter(coalesce(size(col("__w")), lit(0)) >= k + win - 1)
      .withColumn("__th",
        transform(col("__w"), t => graft.llm.TextAnalysis.fingerprint(t)))
      .withColumn("__gh",
        transform(sequence(lit(1), size(col("__w")) - lit(k - 1)), g =>
          (0 until k).foldLeft(lit(0L): org.apache.spark.sql.Column)((acc, j) =>
            pmod(acc * lit(31L) +
              element_at(col("__th"), (g + lit(j)).cast("int")), lit(M36)))))
    time("gram arrays") { base.select(sum(size(col("__gh")))).collect() }

    val grams = base.select(col("doc_id"), size(col("__gh")).as("__n"),
      posexplode(col("__gh")).as(Seq("__g", "__h")))
    time("+ explode") { grams.select(count(lit(1))).collect() }

    val selWin = Window.partitionBy(col("doc_id")).orderBy(col("__g"))
      .rowsBetween(Window.currentRow, win - 1)
    val fps = grams
      .withColumn("__key", min(col("__h") * lit(P21) +
        (lit(P21 - 1) - col("__g"))).over(selWin))
      .filter(col("__g") <= col("__n") - win)
      .select(col("doc_id"), shiftright(col("__key"), 21).as("__h"))
      .distinct()
    time("+ window + distinct (fps)") { fps.select(count(lit(1))).collect() }

    val a = fps.toDF("id_a", "__h"); val b = fps.toDF("id_b", "__h")
    val pairs = a.join(b, Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
    time("+ self-join pairs (unpersisted fps)") {
      pairs.select(count(lit(1))).collect()
    }

    time("whole winnowPairs") {
      graft.llm.Dedup.winnowPairs(docs, k = 4, win = 4, minShared = 2).count()
    }
    spark.stop()
  }
}
