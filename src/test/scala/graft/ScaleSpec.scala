package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Similarity
import graft.ops.Scale

/** Scale-technique tests: salted aggregation equivalence, bounded top-K
  * aggregator vs collect_list+sort, bucketed join shuffle elimination.
  */
class ScaleSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("key"), col("cnt"), col("sum_value").cast("string"))
      .as[(String, Long, String)].collect().toSet
    val salted = Scale.saltedCountSum(ev,
        col("event_type"), col("value").cast("decimal(18,2)"), salts = 8)
      .select(col("key"), col("cnt"), col("sum_value").cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(salted == direct)
  }

  test("two-phase global cumsum equals the single-window form — on BOTH " +
    "sides of the r19 bounded-input cutover") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
    val naive = docs
      .withColumn("cum", sum(col("n_chars")).over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    // cutoverRows = 0 forces the two-phase device (the gate corpus is
    // under the default bound, so the default would test the window
    // against itself — the pre-r19 coverage must stay)
    val twoPhase = Scale.globalCumSum(docs, "doc_id", "n_chars",
        cutoverRows = 0L)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(twoPhase == naive)
    spark.sqlContext.clearCache()
    val viaCutover = Scale.globalCumSum(docs, "doc_id", "n_chars")
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(viaCutover == naive)
    spark.sqlContext.clearCache()
  }

  test("composite-key global cumsum equals the single-window form on a " +
    "(draw, id) order with duplicate draws") {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables.documents(spark, sfDir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(7)).as("draw"),
        col("n_chars"))
    val naive = rows
      .withColumn("cum", sum(col("n_chars")).over(
        Window.orderBy("draw", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    val scaled = Scale.globalCumSumOrdered(rows, Seq("draw", "doc_id"),
        "n_chars", cutoverRows = 0L)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(scaled == naive)
    spark.sqlContext.clearCache()
    val viaCutover = Scale.globalCumSumOrdered(rows, Seq("draw", "doc_id"),
        "n_chars")
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(viaCutover == naive)
    spark.sqlContext.clearCache()
  }

  test("global cumsum on empty input returns empty; CC fails loud when " +
    "round budget is too small for the diameter") {
    import graft.llm.Dedup
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    assert(Scale.globalCumSum(empty, "doc_id", "n_chars").count() == 0)
    spark.sqlContext.clearCache()
    // empty vertex set: label sum is SQL NULL — must converge, not NPE
    assert(Dedup.connectedComponents(
      Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // chain 1-2-3-4 needs 3 propagation rounds; 1 round must throw, not
    // silently return half-merged labels. driverBelow = 0 forces the
    // DISTRIBUTED fixpoint — the default driver union-find cutover has
    // no rounds to run out of (and that path's correctness is pinned in
    // LlmOpsSpec against this very fixpoint)
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(verts, chain, maxIters = 1,
        driverBelow = 0L).collect()
    }
  }

  test("Misra-Gries heavy hitters: dominant tokens survive the bounded " +
    "summary and the undercount respects the n/(k+1) bound") {
    import graft.llm.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val tokens = docs.select(explode(TextAnalysis.tokens(col("text")))
      .as("tok")).as[String]
    val n = tokens.count()
    val k = 32
    val sketch = tokens.groupByKey(_ => 0)
      .agg(Scale.topFreqColumn(k).name("top")).collect().head._2
    assert(sketch.size <= k)
    val exact = tokens.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    // every item above the MG threshold must be present
    val threshold = n / (k + 1)
    val mustSurvive = exact.filter(_._2 > threshold).keySet
    assert(mustSurvive.nonEmpty, "corpus should have heavy tokens")
    assert(mustSurvive.subsetOf(sketch.keySet),
      s"missing heavy hitters: ${mustSurvive -- sketch.keySet}")
    // reported counts never exceed the truth and undercount by <= threshold
    sketch.foreach { case (tok, c) =>
      assert(c <= exact(tok))
      assert(exact(tok) - c <= threshold,
        s"$tok undercounted by ${exact(tok) - c} > $threshold")
    }
  }

  test("TopFreqAgg buffer never exceeds k through reduce and merge, and " +
    "heavyHittersExact returns the exact top-N") {
    val agg = new Scale.TopFreqAgg(8)
    var buf = agg.zero
    (1 to 500).foreach { i =>
      buf = agg.reduce(buf, s"tok${i % 40}")
      assert(buf.size <= 8, s"buffer grew to ${buf.size}")
    }
    var other = agg.zero
    (1 to 500).foreach { i => other = agg.reduce(other, s"x${i % 40}") }
    assert(agg.merge(buf, other).size <= 8)
    // two-pass exact heavy hitters vs plain groupBy on the corpus tokens
    import graft.llm.TextAnalysis
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok")).as[String]
    val got = Scale.heavyHittersExact(tokens, sketchK = 32, topN = 10)
      .as[(String, Long)].collect().toSeq
    val want = tokens.groupBy("tok").count().as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(10).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("heavyHittersExact semi-join path (survivors > 128) is still exact") {
    // sketchK >= cardinality → the sketch never decrements and every item
    // survives pass 1; 200 survivors forces the broadcast semi-join branch
    // instead of the isin literal list
    val items = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(f"item$i%03d"))
    val ds = spark.createDataset(rnd42Shuffle(items))
    val got = Scale.heavyHittersExact(ds, sketchK = 256, topN = 15)
      .as[(String, Long)].collect().toSeq
    val want = items.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(15)
    assert(got == want, s"got $got\nwant $want")
  }

  private def rnd42Shuffle[T](xs: Seq[T]): Seq[T] =
    new scala.util.Random(42).shuffle(xs)

  test("bounded top-K aggregator matches collect_list + sort + slice") {
    val scores = Seq(
      ("a", 3.0, "x"), ("a", 5.0, "y"), ("a", 4.0, "z"), ("a", 5.0, "w"),
      ("b", 1.0, "q")).toDF("key", "score", "payload")
    val viaAgg = scores.as[(String, Double, String)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Scale.topKColumn(2).name("top"))
      .collect().toMap
    // expected: desc score, asc payload tie-break, capped at 2
    assert(viaAgg("a") == Seq("w", "y"))
    assert(viaAgg("b") == Seq("q"))
  }

  test("bounded-insertion TopKAgg equals sort-and-take on a seeded 400-row " +
    "group (duplicate scores, multi-partition merge path)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map(i =>
      ("g", rnd.nextInt(50).toDouble, f"p$i%03d"))
    val expected = rows.map(r => (r._2, r._3))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(7).map(_._2)
    val got = rows.toDF("key", "score", "payload")
      .repartition(8) // exercises merge() across partial buffers
      .as[(String, Double, String)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Scale.topKColumn(7).name("top"))
      .collect().toMap
    assert(got("g") == expected)
  }

  test("TopKLongAgg: buffer never exceeds k through reduce and merge; " +
    "distributed result equals sort-and-take (the q68/q72 refine rank)") {
    val agg = new Scale.TopKLongAgg(7)
    val rnd = new scala.util.Random(7)
    var buf = agg.zero
    val rows = (1 to 400).map(i => (rnd.nextInt(50).toDouble, i.toLong))
    rows.foreach { r =>
      buf = agg.reduce(buf, r)
      assert(buf.length <= 7, s"buffer grew to ${buf.length}")
    }
    var other = agg.zero
    rows.reverse.foreach { r => other = agg.reduce(other, r) }
    assert(agg.merge(buf, other).length <= 7)
    // multi-partition distributed path vs driver-side sort-and-take
    val expected = rows
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(7).map(_._2)
    val got = rows.map { case (s, p) => (1L, s, p) }
      .toDF("key", "score", "payload")
      .repartition(8) // exercises merge() across partial buffers
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Scale.topKLongColumn(7).name("top"))
      .collect().toMap
    assert(got(1L) == expected)
  }

  test("TopKLongAgg distinctPayloads: exact duplicates occupy one slot — " +
    "equals distinct-then-sort-take (the q72 multi-table ADC shape)") {
    val rnd = new scala.util.Random(13)
    val base = (1 to 150).map(i => (rnd.nextInt(25).toDouble, i.toLong))
    // every row duplicated 1-3× (tables colliding), shuffled across parts
    val rows = rnd.shuffle(base.flatMap(r => Seq.fill(1 + rnd.nextInt(3))(r)))
    val expected = base.distinct
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(10).map(_._2)
    val got = rows.map { case (s, p) => (1L, s, p) }
      .toDF("key", "score", "payload")
      .repartition(8)
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Scale.topKLongColumn(10, distinctPayloads = true).name("top"))
      .collect().toMap
    assert(got(1L) == expected)
    // buffer stays duplicate-free and bounded through reduce and merge
    val agg = new Scale.TopKLongAgg(10, distinctPayloads = true)
    var buf = agg.zero
    rows.foreach { r =>
      buf = agg.reduce(buf, r)
      assert(buf.length <= 10 && buf.distinct.length == buf.length)
    }
    var other = agg.zero
    rows.reverse.foreach { r => other = agg.reduce(other, r) }
    val m = agg.merge(buf, other)
    assert(m.length <= 10 && m.distinct.length == m.length)
  }

  test("pair-cap guards: identical under the cap, bounded on a hot key") {
    import java.sql.Timestamp
    import graft.jobs.{BoardStats, ItemCf}
    // small groups (3 events/user) — a cap of 10 must change nothing
    val small = (1 to 5).flatMap(u => (1 to 3).map(i =>
      (u.toLong, i.toLong * u, new Timestamp(i * 60000L))))
      .toDF("user_id", "item", "ts")
    def decay(cap: Int) = ItemCf.cooccurrenceDecay(small, n = 2,
        maxPerUser = cap)
      .select(col("a"), col("b"), round(col("together_count"), 9))
      .as[(Long, Long, Double)].collect().toSet
    assert(decay(10) == decay(0))
    // a planted hot user with 60 events: cap 10 bounds the pair fan-out
    val hot = (1 to 60).map(i => (99L, i.toLong, new Timestamp(i * 60000L)))
      .toDF("user_id", "item", "ts")
    val uncapped = ItemCf.positionalPairs(hot, n = 2).count()
    val capped = ItemCf.positionalPairs(hot, n = 2, maxPerUser = 10).count()
    assert(uncapped == 60L * 59 / 2 && capped == 10L * 9 / 2,
      s"uncapped=$uncapped capped=$capped")
    // and the cap keeps the MOST RECENT events (positions re-rank 1..N)
    val kept = ItemCf.positionalPairs(hot, n = 2, maxPerUser = 10)
      .select("a").distinct().as[Long].collect().toSet
    assert(kept == (51L to 59L).toSet, s"kept=$kept") // 60 is only ever 'b'

    val boards = (1 to 4).flatMap(b => (1 to 3).map(i =>
      (s"i$i$b", s"b$b"))).toDF("item", "board")
    def bw(cap: Int) = BoardStats.pairWeights(boards, maxPerBoard = cap)
      .as[(String, String, Long)].collect().toSet
    assert(bw(10) == bw(0))
    val hotBoard = (1 to 50).map(i => (f"i$i%03d", "hb")).toDF("item", "board")
    assert(BoardStats.pairWeights(hotBoard).count() == 50L * 49)
    assert(BoardStats.pairWeights(hotBoard, maxPerBoard = 10).count() == 10L * 9)
  }

  test("q42 IVF candidate volume is bounded at sf0.01 — < 0.3 · C(n,2), " +
    "the property the hyperplane path lost at low τ") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val n = emb.count()
    val totalPairs = n * (n - 1) / 2
    val cents = Similarity.trainIvfCentroids(emb, k = 64, tables = 12)
    val cand = Similarity.ivfCandidatePairs(emb, cents, probes = 1).count()
    assert(cand < 0.3 * totalPairs,
      s"IVF candidates $cand ≥ 0.3 × $totalPairs — bucketing stopped pruning")
  }

  test("two-phase source cap equals the single-window form on the uniform " +
    "corpus, a planted hot domain, and under forced fallback") {
    import graft.core.CacheScope
    import graft.llm.TextAnalysis
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "draw", "src_rank")
        .as[(Long, String, Long, Long)].collect().toSet
    val docsT = Tables.documents(spark, sfDir)
    // (a) the gate corpus (uniform source sizes)
    CacheScope.scoped {
      assert(canon(TextAnalysis.sourceCapTwoPhase(docsT, cap = 10)) ==
        canon(TextAnalysis.sourceCap(docsT, cap = 10)))
    }
    // (b) planted hot domain: one source 100× the others — the case the
    // single window serializes on and the pre-filter bounds
    val hot = (
      (1 to 4000).map(i => (i.toLong, "hot")) ++
      (4001 to 4040).map(i => (i.toLong, "tail_a")) ++
      (4041 to 4075).map(i => (i.toLong, "tail_b"))
    ).map { case (id, src) =>
      (id, src, s"$src document body $id " + s"filler${id % 97} end")
    }.toDF("doc_id", "source", "text")
    val exact = CacheScope.scoped {
      canon(TextAnalysis.sourceCap(hot, cap = 10))
    }
    CacheScope.scoped {
      assert(canon(TextAnalysis.sourceCapTwoPhase(hot, cap = 10)) == exact)
    }
    // the ranking window consumes the PRE-FILTERED relation: the threshold
    // filter must sit in the plan (the hot stratum enters the window
    // ~2·cap rows strong, not 4000)
    CacheScope.scoped {
      val p = TextAnalysis.sourceCapTwoPhase(hot, cap = 10)
        .queryExecution.executedPlan.toString
      assert(p.contains("__t"),
        s"pre-filter threshold must gate the window input:\n$p")
      assert(p.contains("Window"), p)
    }
    // (c) a pathologically small overSample starves every stratum's
    // pre-filter → the in-plan fallback must engage and stay exact
    CacheScope.scoped {
      assert(canon(TextAnalysis.sourceCapTwoPhase(hot, cap = 10,
        overSample = 1e-5)) == exact)
    }
  }

  test("bucketed tables join without an exchange") {
    for (t <- Seq("g_bucket_l", "g_bucket_r")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a metastore-less location left by a prior JVM blocks CREATE
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    Scale.writeBucketed(ev, "g_bucket_l", "user_id", 4)
    Scale.writeBucketed(ev.select(col("user_id"),
      col("value").as("v2")), "g_bucket_r", "user_id", 4)
    val l = spark.table("g_bucket_l")
    val r = spark.table("g_bucket_r")
    val joined = l.join(r, "user_id")
    // force SMJ (no broadcast) to observe the bucketed layout
    val smj = l.hint("merge").join(r.hint("merge"), "user_id")
    val plan = smj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed SMJ should have no shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("grouped two-phase rank equals the partitioned window, across " +
    "range-partition boundaries and multi-column groups") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // enough rows per group that groups straddle the 4 range partitions
    val rows = (1 to 2000).map { i =>
      (i.toLong, s"g${rnd.nextInt(3)}", s"h${rnd.nextInt(2)}",
        rnd.nextInt(50).toLong)
    }
    val df = rows.toDF("id", "ga", "gb", "v")
    val twoPhase = graft.core.CacheScope.scoped {
      Scale.groupedRankOrdered(df, Seq("ga", "gb"), Seq("v", "id"), "r",
          cutoverRows = 0L)
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    val w = Window.partitionBy("ga", "gb").orderBy(col("v"), col("id"))
    val viaWindow = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(twoPhase == viaWindow)
    // the r19 bounded-input cutover path must agree too
    val viaCutover = graft.core.CacheScope.scoped {
      Scale.groupedRankOrdered(df, Seq("ga", "gb"), Seq("v", "id"), "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    assert(viaCutover == viaWindow)
    // single group degenerates to the global rank
    val one = graft.core.CacheScope.scoped {
      Scale.groupedRankOrdered(df.withColumn("ga", lit("x")),
          Seq("ga"), Seq("v", "id"), "r", cutoverRows = 0L)
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    val wg = Window.orderBy(col("v"), col("id"))
    val globalR = df.withColumn("r", row_number().over(wg).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(one == globalR)
  }

  test("grouped two-phase rank keeps NULL-group rows and delimiter-laden " +
    "group values (no string-encoded composite key)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // group values: NULL, a value containing the u0001 delimiter the
    // old string key used, and a pair a naive concat would collide
    // ("ab"+"c" vs "a"+"bc")
    val gs = Seq(null, "ab", "a", "x\u0001y")
    val hs = Seq("c", "b\u0001c", null)
    val rows = (1 to 1200).map { i =>
      (i.toLong, gs(rnd.nextInt(gs.length)), hs(rnd.nextInt(hs.length)),
        rnd.nextInt(40).toLong)
    }
    val df = rows.toDF("id", "ga", "gb", "v")
    val twoPhase = graft.core.CacheScope.scoped {
      Scale.groupedRankOrdered(df, Seq("ga", "gb"), Seq("v", "id"), "r",
          cutoverRows = 0L)
        .select("id", "r").as[(Long, Long)].collect().toMap
    }
    assert(twoPhase.size == rows.size, "no rows may vanish")
    val w = Window.partitionBy("ga", "gb").orderBy(col("v"), col("id"))
    val viaWindow = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(twoPhase == viaWindow)
  }
}
