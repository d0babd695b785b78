package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch (r19): same-JVM alternating A/B of the minhash near-dup leg.
  *
  * A — the r18 shape: shingle relation via posexplode + lead window
  *     (one corpus Exchange on doc_id), 64-min signature aggregate over
  *     it, banding, bucket self-join, verify via collect_set sets.
  * B — in-row gram HASHES: per-doc shingle strings built in one
  *     projection (unrolled element_at chain, the cdcDedup idiom — NOT
  *     the slice/array_join stack the r18 experiment measured 2-4x
  *     slow), hashed in-row to the same masked xxhash64 values
  *     minHashSignatures computes; only the 8-byte hashes explode for
  *     the signature aggregate (map-side partial per doc, contiguous
  *     rows), and the verify sets come from array_distinct in the same
  *     cached projection — no window, no corpus-wide string Exchange,
  *     no collect_set.
  * C — fully in-row signatures: 64 array_min(transform(...)) passes per
  *     doc (no explode at all) — the HOF-vs-aggregate decision point.
  *
  * All variants produce bit-identical signature values by construction
  * (same xxhash64(shingle) & mask, same per-permutation outer hash), so
  * candidates and the verified pair set must match exactly — checked.
  */
object ProfileMinhashInRow {
  val Mask = 0x3FFFFFFFFFFFFFFFL

  def shingleArr(w: Int) = {
    val parts = (1 to w)
      .map(j => s"element_at(__w, i + ${j - 1})").mkString(", ")
    expr(s"transform(sequence(1, size(__w) - ${w - 1})," +
      s" i -> concat_ws(' ', $parts))")
  }

  def pairsInRow(docs: DataFrame, w: Int, tau: Double, bands: Int,
                 rowsPerBand: Int, fullyInRow: Boolean): DataFrame = {
    val base = graft.core.CacheScope.track(docs
      .select(col("doc_id"), graft.llm.TextAnalysis.tokens(col("text")).as("__w"))
      .filter(coalesce(size(col("__w")), lit(0)) >= w)
      .select(col("doc_id"), shingleArr(w).as("__sharr"))
      .select(col("doc_id"),
        transform(col("__sharr"),
          s => xxhash64(s).bitwiseAND(lit(Mask))).as("__gh"),
        array_distinct(col("__sharr")).as("shset"))
      .persist())
    base.count()
    val sigs =
      if (fullyInRow)
        base.select(col("doc_id"), array((1 to bands * rowsPerBand).map(i =>
          array_min(transform(col("__gh"),
            g => xxhash64(g + lit(i.toLong))))): _*).as("minhash"))
      else
        base.select(col("doc_id"), explode(col("__gh")).as("__g"))
          .groupBy(col("doc_id"))
          .agg(array((1 to bands * rowsPerBand).map(i =>
            min(xxhash64(col("__g") + lit(i.toLong)))): _*).as("minhash"))
    val banded = graft.core.CacheScope.track(sigs
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("minhash"), b * rowsPerBand + lit(1), lit(rowsPerBand))))
          .as(Seq("band", "bucket")))
      .withColumn("bucket", xxhash64(col("band"), col("bucket").cast("string")))
      .persist())
    banded.count()
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b2 = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val cand = a.join(b2, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(base.select(col("doc_id").as("id_a"), col("shset").as("set_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("shset").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** The r18 shape, inlined verbatim so A/B survives the shipped
    * implementation switching: shingle relation (posexplode + lead
    * window), 64-min aggregate signatures, banding, bucket self-join,
    * verify via collect_set. */
  def pairsOld(docs: DataFrame, w: Int, tau: Double, bands: Int,
               rowsPerBand: Int): DataFrame = {
    import graft.llm.Dedup
    val sh = graft.core.CacheScope.track(
      Dedup.shingles(docs, w, distinct = false)
        .filter(col("shingle").isNotNull).persist())
    val banded = graft.core.CacheScope.track(
      Dedup.bandedSignaturesOfSigs(
        Dedup.minHashSignatures(sh, bands * rowsPerBand),
        bands, rowsPerBand).persist())
    banded.count()
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b2 = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val cand = a.join(b2, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val setsById = sh.groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("shset"))
    cand
      .join(setsById.select(col("doc_id").as("id_a"), col("shset").as("set_a")), "id_a")
      .join(setsById.select(col("doc_id").as("id_b"), col("shset").as("set_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.core.Sessions.builder("profile-mh-inrow", 32)
      .master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // args: [dir] [rounds] [tau] [bands] [rowsPerBand] [raw|exact]
    val tau = args.drop(2).headOption.map(_.toDouble).getOrElse(0.8)
    val bands = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val rpb = args.drop(4).headOption.map(_.toInt).getOrElse(4)
    val useRaw = args.drop(5).headOption.contains("raw")
    println(s"tau=$tau bands=$bands rowsPerBand=$rpb raw=$useRaw")
    val docs = graft.core.Tables.documents(spark, dir)
    val scrubbed = docs.withColumn("text",
      graft.llm.TextAnalysis.scrub(col("text")))

    def exactOf(): DataFrame =
      if (useRaw) docs
      else graft.core.CacheScope.track(
        graft.llm.Dedup.exactCanonical(scrubbed)
          .filter(col("doc_id") === col("canonical_id"))
          .drop("canonical_id").persist())

    // equality check once: the pair sets must be identical
    {
      val (pa, pb, pc) = graft.core.CacheScope.scoped {
        val exact = exactOf(); exact.count()
        val a = pairsOld(exact, 3, tau, bands, rpb)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val b = pairsInRow(exact, 3, tau, bands, rpb, fullyInRow = false)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val c = pairsInRow(exact, 3, tau, bands, rpb, fullyInRow = true)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (a, b, c)
      }
      println(s"pairs A=${pa.size} B=${pb.size} C=${pc.size} " +
        s"equalAB=${pa == pb} equalAC=${pa == pc}")
      require(pa == pb && pa == pc, "variant outputs differ — abort")
    }

    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val mins = scala.collection.mutable.Map[String, Double]()
    for (r <- 1 to rounds; variant <- Seq("A", "B", "C")) {
      val t0 = System.nanoTime()
      graft.core.CacheScope.scoped {
        val exact = exactOf(); exact.count()
        val t1 = System.nanoTime()
        val p = variant match {
          case "A" => pairsOld(exact, 3, tau, bands, rpb)
          case "B" => pairsInRow(exact, 3, tau, bands, rpb, fullyInRow = false)
          case "C" => pairsInRow(exact, 3, tau, bands, rpb, fullyInRow = true)
        }
        p.select("id_a", "id_b").count()
        val dt = (System.nanoTime() - t1) / 1e9
        println(f"round $r variant $variant ${dt}%6.3f s (incl exact ${(System.nanoTime() - t0) / 1e9}%6.3f)")
        mins(variant) = math.min(mins.getOrElse(variant, Double.MaxValue), dt)
      }
    }
    println(mins.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k min ${v}%6.3f s" }.mkString("  "))
    spark.stop()
  }
}
