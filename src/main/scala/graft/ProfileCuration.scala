package graft

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock of the composed curation chain (q96), emitted as
  * a machine-readable artifact: `Q96_STAGES.json` (override with
  * `SPARK_GRAFT_Q96_FILE`) holds one JSON line with per-stage seconds,
  * row counts, and the [[graft.core.HostProbe]] load/CPU/IO stamps — so
  * the next "did q96 creep?" is answerable from the artifact alone:
  * which stage moved, and whether the host was loaded while it was
  * measured. Two rounds run; the SECOND round's timings are reported
  * (round 1 absorbs JIT/codegen warmup exactly as Bench's warmup pass
  * does) and both rounds print to stdout.
  *
  * `runMain graft.ProfileCuration [sfDir]` — defaults to sf0.1, the
  * bench scale.
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.builder("profile-curation", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    import graft.core.HostProbe
    val loadStart = HostProbe.loadavg()
    val spinStart = HostProbe.spinProbe()
    val ioStart = HostProbe.ioProbe()
    var report = Seq.empty[(String, Double, Long)]
    var ticks = Seq.empty[(String, Double)]
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      graft.core.CacheScope.scoped {
        val timed = scala.collection.mutable.ArrayBuffer[
          (String, Double, Long)]()
        val t00 = System.nanoTime()
        val st = graft.jobs.CurationPipeline.stages(docs, emb)
        val tCons = (System.nanoTime() - t00) / 1e9
        println(f"construct           $tCons%8.2f s")
        timed += (("construct", tCons, -1L))
        ticks = graft.jobs.CurationPipeline.lastConstructTicks.get()
        st.foreach { case (name, df) =>
          val t0 = System.nanoTime()
          val n = df.count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"$name%-20s $dt%8.2f s  ($n rows)")
          timed += ((name, dt, n))
        }
        val t1 = System.nanoTime()
        val vd = graft.jobs.CurationPipeline.verdictOf(docs, st)
        val tVb = (System.nanoTime() - t1) / 1e9
        println(f"verdict(build)      $tVb%8.2f s")
        timed += (("verdict_build", tVb, -1L))
        val t2 = System.nanoTime()
        val v = vd.count()
        val tVc = (System.nanoTime() - t2) / 1e9
        println(f"verdict(count)      $tVc%8.2f s  ($v rows)")
        timed += (("verdict_count", tVc, v))
        val total = (System.nanoTime() - t00) / 1e9
        println(f"TOTAL               $total%8.2f s")
        timed += (("total", total, -1L))
        report = timed.toSeq // the LAST (warm) round ships
      }
    }
    def f(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val stages = report.map { case (n, t, _) => "\"" + n + "\":" + f(t) }
      .mkString("{", ",", "}")
    val rows = report.collect { case (n, _, c) if c >= 0 =>
      "\"" + n + "\":" + c }.mkString("{", ",", "}")
    val load = HostProbe.stampJson(loadStart, spinStart, ioStart,
      HostProbe.loadavg(), HostProbe.spinProbe(), HostProbe.ioProbe())
    // construct-phase attribution: one seconds entry per pipeline
    // sub-stage (the eager fixpoints/materializations), warm round
    val cons = ticks.map { case (n, t) => "\"" + n + "\":" + f(t) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"q96_stages","stages":$stages,"construct_stages":$cons,"rows":$rows,"loadavg":$load,"sf":"$dir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_Q96_FILE", "Q96_STAGES.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[profile] could not write $out: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
