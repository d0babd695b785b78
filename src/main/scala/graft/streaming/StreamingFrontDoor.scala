package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The assembled ingest front door, driven end to end WITH batch
  * cross-check: every frozen-artifact gate in the repo composed over ONE
  * stream the way a production ingest would run them —
  *
  *  - a reference corpus is frozen once into TWO stored artifacts: the
  *    LM store ([[StreamingQuality.writeLmStore]] — token counts +
  *    tercile cutoffs) and the eval-gram Bloom store
  *    ([[StreamingContamination.writeBloomStore]]);
  *  - the documents table then replays as a file-source stream in four
  *    micro-batches, and ONE `foreachBatch` runs all three gates per
  *    trigger: quality bucketing ([[StreamingQuality.bucketBatch]]),
  *    per-source mix drift ([[StreamingDrift.driftBatch]]) and the
  *    decontamination screen ([[StreamingContamination.screenBatch]]),
  *    the per-doc legs joined into one verdict row;
  *  - the SAME rehydrated LM store serves both the quality gate and the
  *    drift monitor — the one-store-two-monitors contract stated in
  *    [[StreamingDrift]], here actually exercised.
  *
  * Exit is non-zero unless: the union of per-doc verdict emissions equals
  * the batch twins on the same rows (quality and contamination are
  * stateless, so union == twin must hold bit-for-bit), every micro-batch
  * emitted one drift row per source present in it, and at least one
  * arrival was flagged by the screen (the fixture plants cross-split
  * near-dups). Driver-runnable at any SF:
  * `runMain graft.streaming.StreamingFrontDoor [sfDir]`.
  */
object StreamingFrontDoor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("source"), col("text"))

    // ---- freeze the artifacts once, from the reference corpus ----
    val work = Files.createTempDirectory("graft_front_door").toString
    StreamingQuality.writeLmStore(docs, s"$work/lm")
    val evalDocs = docs.join(
      graft.llm.TextAnalysis.dataSplit(docs)
        .filter(col("split") =!= "train").select("doc_id"), Seq("doc_id"))
    StreamingContamination.writeBloomStore(
      StreamingContamination.freeze(evalDocs), s"$work/bloom", spark)

    // gates start from the stores alone — no reference-corpus rescan
    val lm = StreamingQuality.freezeFromStore(spark, s"$work/lm")
    val bloom = StreamingContamination.freezeFromStore(spark, s"$work/bloom")

    // ---- replay the corpus as four in-order micro-batches ----
    for (i <- 0 until 4)
      docs.filter(pmod(col("doc_id"), lit(4)) === i)
        .repartition(2).write.mode("append").parquet(s"$work/in")
    val schema = spark.read.parquet(s"$work/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(s"$work/in")

    val verdicts = scala.collection.mutable.Set[
      (Long, String, Double, String, Long, Long, Boolean)]()
    val driftRows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val quality = StreamingQuality.bucketBatch(batch, lm)
        val screen = StreamingContamination.screenBatch(batch, bloom)
        val verdict = quality.join(screen, Seq("doc_id"))
        verdicts ++= verdict
          .as[(Long, String, Double, String, Long, Long, Boolean)].collect()
        val drift = StreamingDrift.driftBatch(batch, lm)
        val nSources = drift.count()
        driftRows += ((id, nSources,
          batch.select("source").distinct().count()))
        println(s"[front-door] batch $id: ${batch.count()} docs, " +
          s"$nSources sources scored for drift")
      }
      .start()
    q.awaitTermination()

    // ---- batch cross-check ----
    val twin = StreamingQuality.bucketBatch(docs, lm)
      .join(StreamingContamination.screenBatch(docs, bloom), Seq("doc_id"))
      .as[(Long, String, Double, String, Long, Long, Boolean)]
      .collect().toSet
    var ok = true
    if (verdicts.toSet != twin) {
      println(s"[front-door] FAIL: union of verdicts (${verdicts.size}) " +
        s"!= batch twin (${twin.size})")
      ok = false
    }
    driftRows.foreach { case (id, scored, present) =>
      if (scored != present) {
        println(s"[front-door] FAIL: batch $id scored $scored sources, " +
          s"$present present")
        ok = false
      }
    }
    if (!verdicts.exists(!_._7)) {
      println("[front-door] FAIL: no arrival was flagged by the screen")
      ok = false
    }
    val flagged = verdicts.count(!_._7)
    val tail = verdicts.count(_._4 == "tail")
    println(s"[front-door] ${if (ok) "OK" else "FAILED"}: " +
      s"${verdicts.size} verdicts, $flagged screened, $tail tail-bucketed, " +
      s"${driftRows.size} drift batches")
    lm.release()
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
