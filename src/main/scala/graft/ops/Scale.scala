package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scale techniques (SURVEY §7.2 step 7): skew-safe aggregation and a
  * bounded top-K aggregator. These are the knobs for the 100 TB posture —
  * the reference's own data is skewed (2-scene whitelist,
  * `flink-process/.../common/Constants.java:7`), so a plain `groupBy(scene)`
  * sends half the log through two reducers.
  */
object Scale {

  /** Salted two-phase aggregation for additive aggregates: phase 1 groups
    * on (key, salt) spreading a hot key over `salts` reducers with partial
    * (map-side) combine, phase 2 merges the partials per key. AQE's skew
    * handling covers joins; this covers the aggregation path when a single
    * group's state is itself the bottleneck.
    *
    * `aggs` maps output column name → (phase-1 agg of the input column,
    * phase-2 merge of the partial). E.g. count: (count(x), sum(partial));
    * sum: (sum(x), sum(partial)); max: (max(x), max(partial)).
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                aggs: Seq[(String, (Column, String => Column))]): DataFrame = {
    // The salt must be a deterministic function of row content: a salt from
    // spark_partition_id()/monotonically_increasing_id() changes when a map
    // task is re-executed after a fetch failure, so reducers that already
    // consumed the old outputs would double-count or drop partials. Hashing
    // every input column keeps re-executed tasks bit-identical; distinct
    // rows still spread a hot key across `salts` reducers (identical
    // duplicate rows share a salt, which only concentrates exact-duplicate
    // volume — acceptable, and the common hot-key shape is distinct rows).
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }: _*)
    phase1.groupBy(col("key"))
      .agg(aggs.head._2._2(s"__p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(s"__p_$n").as(n) }: _*)
  }

  /** Convenience: salted count + sum(value). */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts, Seq(
      "cnt" -> (count(lit(1)), (p: String) => sum(col(p))),
      "sum_value" -> (sum(value), (p: String) => sum(col(p)))))

  /** Bounded top-K typed aggregator: keeps at most `k` (score, payload)
    * pairs in the aggregation buffer, so per-group state is O(k) instead of
    * the O(group) `collect_list` + `sort_array` — or O(group) sort-per-
    * window-partition — pattern: the SURVEY §4.2 "optional custom piece"
    * for exact ordered top-K at 100 TB. Descending by score, ascending
    * payload tie-break (exactly `row_number` over (score desc, payload) ≤
    * k, with the ranking state bounded).
    *
    * The buffer invariant is "sorted, length ≤ k", so `reduce` never
    * re-sorts: a full buffer rejects a non-qualifying row in O(1) (the
    * common case once the group exceeds k) and otherwise binary-inserts in
    * O(log k) compares; `merge` is a linear merge of two sorted runs.
    *
    * `distinctPayloads = true` additionally collapses EXACT (score,
    * payload) duplicates inside the aggregation — the multi-table ANN
    * candidate shape, where the same neighbor arrives once per colliding
    * table with an identical score: absorbing duplicates here deletes the
    * upstream `distinct()` exchange over the full candidate set (an exact
    * duplicate occupies one slot instead of two, so top-k semantics match
    * distinct-then-rank). Payload uniqueness is only guaranteed for rows
    * whose duplicates agree on the score, which that shape does by
    * construction.
    */
  class TopKPayloadAgg[P](k: Int, distinctPayloads: Boolean = false)
                         (implicit ord: Ordering[P],
                          tt: scala.reflect.runtime.universe.TypeTag[P])
    extends Aggregator[(Double, P), Seq[(Double, P)], Seq[P]] {
    private def order(a: (Double, P), b: (Double, P)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && ord.lt(a._2, b._2))
    override def zero: Seq[(Double, P)] = Seq.empty
    override def reduce(buf: Seq[(Double, P)], in: (Double, P))
    : Seq[(Double, P)] = {
      if (k <= 0) buf
      else if (buf.length >= k && !order(in, buf(buf.length - 1))) buf
      else {
        var lo = 0
        var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (order(buf(mid), in)) lo = mid + 1 else hi = mid
        }
        // the insertion point is the one place an exact duplicate can live
        // (the order is total), so uniqueness is an O(1) check here
        if (distinctPayloads && lo < buf.length && buf(lo) == in) buf
        else {
          val out = scala.collection.mutable.ArrayBuffer.from(buf)
          out.insert(lo, in)
          if (out.length > k) out.remove(k)
          out.toSeq
        }
      }
    }
    override def merge(a: Seq[(Double, P)], b: Seq[(Double, P)])
    : Seq[(Double, P)] = {
      val out = new scala.collection.mutable.ArrayBuffer[(Double, P)](k)
      var i = 0
      var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        if (distinctPayloads && i < a.length && j < b.length && a(i) == b(j)) {
          out += a(i); i += 1; j += 1 // one slot for an exact duplicate
        } else if (j >= b.length || (i < a.length && order(a(i), b(j)))) {
          out += a(i); i += 1
        } else {
          out += b(j); j += 1
        }
      }
      out.toSeq
    }
    override def finish(buf: Seq[(Double, P)]): Seq[P] =
      buf.map(_._2)
    override def bufferEncoder: Encoder[Seq[(Double, P)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, P)]]()
    override def outputEncoder: Encoder[Seq[P]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[P]]()
  }

  /** String-payload top-K (the q22 ordered-toplist shape). */
  class TopKAgg(k: Int) extends TopKPayloadAgg[String](k)

  /** Long-payload top-K — the ANN refine-rank shape: per query, the
    * `refine` best neighbor ids by (score desc, id asc) with O(refine)
    * aggregation state, replacing an n-row sort per query window
    * partition. */
  class TopKLongAgg(k: Int, distinctPayloads: Boolean = false)
    extends TopKPayloadAgg[Long](k, distinctPayloads)

  def topKColumn(k: Int): TypedColumn[(Double, String), Seq[String]] =
    new TopKAgg(k).toColumn

  def topKLongColumn(k: Int, distinctPayloads: Boolean = false)
  : TypedColumn[(Double, Long), Seq[Long]] =
    new TopKLongAgg(k, distinctPayloads).toColumn

  /** (score, id)-payload top-K — the retrieval shape: rank AND score come
    * back from one bounded aggregate (posexplode position = rank), so a
    * top-k that must emit its scores needs neither a rejoin to recover
    * them nor a rank window. Tie order matches the id-only form: score
    * desc, then id asc (the payload tuple's own ordering at equal score). */
  def topKScoredLongColumn(k: Int)
  : TypedColumn[(Double, (Double, Long)), Seq[(Double, Long)]] =
    new TopKPayloadAgg[(Double, Long)](k).toColumn

  /** Mergeable Misra-Gries heavy-hitters summary: at most `k` (item, count)
    * counters per aggregation buffer, so finding the frequent items of an
    * unbounded stream costs O(k) state — the frequency counterpart of the
    * HLL distinct sketch in the kit. Guarantee: any item with true count
    * > n/(k+1) survives, and every reported count undercounts by at most
    * the total decrement amount (classic MG bounds); exact ranking of the
    * survivors comes from a cheap second pass filtered to them. `merge`
    * combines summaries then re-truncates with the same decrement rule, so
    * the bound holds across partitions (Agarwal et al.'s mergeable-summary
    * result).
    */
  class TopFreqAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // decrement all by the (k+1)-th largest count and drop zeros — one
        // MG "subtract the minimum" step batched. On the per-row reduce
        // path the size is exactly k+1, where the (k+1)-th largest IS the
        // minimum: O(k) instead of a sort (merge, size up to 2k, sorts)
        val dec =
          if (m.size == k + 1) m.values.min
          else m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (i, c) =>
          if (c - dec > 0) Some(i -> (c - dec)) else None
        }
      }
    override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
      shrink(m.updated(item, m.getOrElse(item, 0L) + 1L))
    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      })
    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  def topFreqColumn(k: Int): TypedColumn[String, Map[String, Long]] =
    new TopFreqAgg(k).toColumn

  /** Exact top-`topN` most frequent items, MG-pruned: pass 1 runs the
    * bounded [[TopFreqAgg]] summary (O(sketchK) state per partial, one
    * collect of ≤ sketchK counters — never the vocabulary) to find the
    * candidate set; pass 2 re-counts ONLY the survivors exactly and takes
    * the top `topN` by (count desc, item) — a TakeOrderedAndProject, never
    * a global sort. At 100 TB pass 2's scan filter drops every
    * non-candidate token before the shuffle, so the exact aggregation
    * touches ≤ sketchK groups.
    *
    * Exactness contract: the output is the true top-`topN` whenever the
    * true top-`topN` all survive pass 1 — guaranteed when their counts
    * exceed n/(sketchK+1) (the MG bound), and unconditionally when
    * sketchK ≥ the item cardinality (the summary never decrements — the
    * degenerate exact case; the gate corpus' 31-token near-uniform
    * vocabulary sits here, so q59 runs sketchK=32). In between, size
    * sketchK to the distribution's heavy tail.
    */
  def heavyHittersExact(items: org.apache.spark.sql.Dataset[String],
                        sketchK: Int, topN: Int): DataFrame = {
    val survivors = items.groupByKey(_ => 0)(Encoders.scalaInt)
      .agg(topFreqColumn(sketchK).name("top"))
      .collect().headOption.map(_._2.keySet).getOrElse(Set.empty[String])
    val base = items.toDF("item")
    // small survivor sets compile to an In predicate the scan can evaluate
    // inline; a heavy-tail sketchK (thousands of survivors) would bloat the
    // plan with a giant literal list instead — above the threshold, filter
    // via a broadcast semi-join on a survivors frame
    val filtered =
      if (survivors.size <= 128)
        base.filter(col("item").isin(survivors.toSeq.sorted.map(lit): _*))
      else {
        import items.sparkSession.implicits._
        val survivorDf = survivors.toSeq.sorted.toDF("item")
        base.join(broadcast(survivorDf), Seq("item"), "left_semi")
      }
    filtered
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(topN)
  }

  /** One [[TopFreqAgg]] summary of `items` as a (item, cnt) relation —
    * ≤ k rows. Partials combine map-side (the Aggregator's merge), so
    * the single reducer only folds k-sized summaries, never rows. */
  def topFreqSummary(items: org.apache.spark.sql.Dataset[String],
                     k: Int): DataFrame =
    items.groupByKey(_ => 0)(Encoders.scalaInt)
      .agg(topFreqColumn(k).name("top"))
      .select(explode(col("top")).as(Seq("item", "cnt")))

  /** Misra-Gries heavy-hitter STORE — the frequency member of the
    * mergeable-store family (bloom words OR, HLL registers MAX,
    * histogram counters ADD; MG counters ADD with a decrement budget):
    * [[writeTopFreqStore]]/[[appendTopFreqStore]] persist one ≤ k-row
    * summary per epoch, [[mergedHeavyHitters]] sums counters per item
    * over any epoch span. Contract (Agarwal et al., mergeable
    * summaries): merged counts never OVERCOUNT, undercount by at most
    * n/(k+1) over the merged span's n rows, and every item with true
    * count > n/(k+1) is present in the merge — so the store answers
    * "what was hot across these epochs" with k·epochs rows of state
    * where the exact answer needs the vocabulary. Unlike the
    * bloom/HLL/histogram stores the COUNTERS are not bit-reproducible
    * across runs (which rows absorb the decrements depends on partition
    * fold order) — the BOUND is the contract, and the tests pin the
    * bound, not bits. The layout record pins k: a span mixing summary
    * widths has no single decrement budget, so mismatched appends fail
    * loud.
    */
  /** Bounded size probe: "does `df` have at most `bound` rows?" via
    * limit(bound + 1).count() — short-circuits after pulling bound + 1
    * rows instead of running a complete count() pass. The graph driver
    * cutovers (CC / SCC / condensation) decide "is this graph small
    * enough to collect?" with this, so the decision costs O(bound) rows
    * even when the probed relation is corpus-sized — a full count()
    * there was a complete pass over a 100 TB-scale edge relation purely
    * to learn "is it small?" (r16 VERDICT item). OperatorSpec pins the
    * short-circuit with an accumulator-instrumented scan. */
  def atMostRows(df: DataFrame, bound: Long): Boolean = {
    require(bound >= 0L, s"bound must be non-negative: $bound")
    // limit() takes an Int: past Int.MaxValue the short-circuit cannot
    // be expressed, and clamping would silently answer true for any
    // larger relation (the r17 review catch) — fall back to the exact
    // count. A caller probing "may I collect 2^31 rows onto the
    // driver?" has bigger problems than the probe's cost.
    if (bound >= Int.MaxValue.toLong) df.count() <= bound
    else df.limit(bound.toInt + 1).count() <= bound
  }

  /** Pre-r16 top-freq stores recorded `k=<n>` — the SAME key set the
    * KMV family uses, which is why r16 renamed the key to `tfk=`. The
    * rename shipped with no migration hint, so a store written by a
    * pre-rename revision failed every read with a bare "not a top-freq
    * store" (r16 ADVICE). This hint upgrades that to an explicit
    * migration message: the fix is a one-line rewrite of the store's
    * `_graft_layout` record, not a rebuild of the data. */
  private val TopFreqLegacyHints = Map(
    Set("k") -> ("has the legacy pre-rename top-freq layout 'k=<n>' — " +
      "or is a KMV store, the key sets collide, which is why the key " +
      "was renamed. If this store was written by appendTopFreqStore " +
      "before the rename, rewrite its _graft_layout record once from " +
      "'k=<n>' to 'tfk=<n>' (the rows are unchanged); if it is a KMV " +
      "store, use the mergedKmvDistinct readers"))

  def writeTopFreqStore(items: org.apache.spark.sql.Dataset[String],
                        path: String, epoch: Long, k: Int): Unit = {
    val spark = items.sparkSession
    Sketch.requireEpochId(epoch)
    topFreqSummary(items, k)
      .select(col("item"), col("cnt"), lit(epoch).as("epoch"))
      .write.mode("overwrite").partitionBy("epoch").parquet(path)
    val (fs, lp) = Sketch.layoutFile(spark, path)
    val out = fs.create(lp, true)
    // "tfk=", not "k=": the KMV store's layout is exactly "k=<n>", and
    // key-set identity is how readStoreLayout tells families apart — a
    // shared key set would let a KMV merge silently accept an MG store
    try out.write(s"tfk=$k\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Whether a top-freq store (with its layout record) exists at `path`. */
  def topFreqStoreExists(spark: org.apache.spark.sql.SparkSession,
                         path: String): Boolean = {
    val (fs, lp) = Sketch.layoutFile(spark, path)
    fs.exists(lp)
  }

  /** Append one epoch's ≤ k-row summary; fails loud on a missing layout
    * record or a different k.
    *
    * Replay-idempotent by LAYOUT, because ADD-merged counters cannot be
    * deduplicated after the fact: the store partitions by epoch and this
    * write dynamically OVERWRITES only the incoming epoch's partition —
    * an at-least-once re-delivery (foreachBatch replays the same batch
    * id after a failure) rewrites its own epoch dir instead of appending
    * a second summary that [[mergedHeavyHitters]] would double-count,
    * which would break the never-overcount half of the MG contract.
    * (Read-side dedup is no alternative: MG summaries are not
    * bit-reproducible across runs, so two summaries of one epoch don't
    * compare equal.) The bloom/HLL stores tolerate duplicate epochs
    * because OR/MAX are idempotent merges; ADD is not. */
  def appendTopFreqStore(items: org.apache.spark.sql.Dataset[String],
                         path: String, epoch: Long, k: Int): Unit = {
    val spark = items.sparkSession
    require(epoch >= 0, s"epoch must be >= 0 (negative ids are reserved " +
      s"for fold baselines): $epoch")
    val kv = Sketch.readStoreLayout(spark, path, "top-freq", Set("tfk"),
      hints = TopFreqLegacyHints, optionalKeys = Set("folded_through"))
    // the fold keeps the NEWEST epoch partition live, so a replay of
    // that batch stays a self-overwrite; anything at or below the
    // watermark was folded into the baseline and must fail loud
    kv.get("folded_through").foreach(ft => require(epoch > ft.toLong,
      s"epoch $epoch was folded into the baseline of $path (watermark " +
        s"$ft) — ADD-merged MG counters double-count on replay; use a " +
        "fresh epoch id above the watermark"))
    require(kv("tfk") == k.toString,
      s"top-freq store at $path was written with (tfk=${kv("tfk")}), " +
        s"append requested (k=$k) — rebuild the store, mixed summary " +
        "widths have no single decrement budget")
    topFreqSummary(items, k)
      .select(col("item"), col("cnt"), lit(epoch).as("epoch"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(path)
  }

  /** Quiesced compaction of a top-freq store: fold every epoch EXCEPT
    * the newest into one per-item counter-sum baseline at the reserved
    * [[graft.ops.Sketch.FoldEpoch]] partition, leaving the newest
    * batch's partition in place. Counter addition is associative, so
    * [[mergedHeavyHitters]] is bit-identical across the fold AND the
    * replay story survives it: Structured Streaming re-delivers at most
    * the LAST batch, whose dynamic partition overwrite keeps rewriting
    * its own (still-live) partition — a full fold would have moved that
    * batch's rows into the baseline, and its replay would then
    * double-count (the never-overcount half of the MG contract).
    * Single-writer while quiesced; park/rename swap. */
  def compactTopFreqStore(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit = {
    Sketch.recoverParked(spark, path)
    val kv = Sketch.readStoreLayout(spark, path, "top-freq",
      Set("tfk"), hints = TopFreqLegacyHints,
      optionalKeys = Set("folded_through"))
    // the keep-newest protocol (fold everything below the newest live
    // epoch, watermark monotone, no watermark when nothing folded)
    // lives ONCE in Sketch.compactKeepNewest, shared with the CMS store
    Sketch.compactKeepNewest(spark, path, s"tfk=${kv("tfk")}",
      kv.get("folded_through").map(_.toLong)
        .getOrElse(graft.ops.Sketch.FoldEpoch),
      below => below.groupBy(col("item")).agg(sum(col("cnt")).as("cnt")),
      emptySchemaDdl = "item STRING, cnt BIGINT, epoch BIGINT")
  }

  /** Merge a store's epochs (all, or the span `epochFilter` keeps) into
    * (item, est_cnt), counters summed per item — ≤ k rows per epoch in,
    * ≤ k·epochs groups out, never the vocabulary. est_cnt ≤ true count,
    * true − est ≤ Σ per-epoch decrement budgets ≤ n/(k+1) over the
    * span's n rows. */
  def mergedHeavyHitters(spark: org.apache.spark.sql.SparkSession,
                         path: String,
                         epochFilter: Column = lit(true)): DataFrame = {
    val kv = Sketch.readStoreLayout(spark, path, "top-freq", Set("tfk"),
      hints = TopFreqLegacyHints,
      optionalKeys = Set("folded_through")) // loud
    val rows = Sketch.readStoreRows(spark, path,
      "item STRING, cnt BIGINT, epoch BIGINT")
    Sketch.guardFoldedWindow(spark, path, kv, epochFilter)
    rows
      .filter(epochFilter)
      .groupBy(col("item")).agg(sum(col("cnt")).as("est_cnt"))
  }

  /** Sentinel for the rank/prefix-sum devices' `cutoverRows` parameter:
    * resolve the bound from the session conf
    * (`spark.graft.rank.cutoverRows`, default [[DefaultRankCutoverRows]];
    * 0 disables the probe and always takes the two-phase path). */
  val RankCutoverFromConf: Long = -1L

  /** Default bounded-input cutover for [[globalCumSumOrdered]] /
    * [[groupedRankOrdered]]: inputs of at most this many rows take one
    * ordinary window instead of the two-phase device. 2^20 rows of rank
    * input (ids + order keys, ~50-100 B each) is well under one task's
    * sort budget at any deployment size — the same scale-adaptive-cutover
    * pattern as [[graft.llm.Dedup.connectedComponents]]'s `driverBelow`.
    * The bound is a row count, not a core count: it does not change
    * between local[8]/local[32]/a cluster. */
  val DefaultRankCutoverRows: Long = 1L << 20

  private def resolveRankCutover(df: DataFrame, cutoverRows: Long): Long =
    if (cutoverRows >= 0L) cutoverRows
    else df.sparkSession.conf
      .get("spark.graft.rank.cutoverRows", DefaultRankCutoverRows.toString)
      .toLong

  /** Bounded-input probe shared by the two-phase devices: persist the
    * input (scope-tracked) and ask [[atMostRows]]. On the bounded answer
    * the caller windows the CACHED frame (the probe's pass already
    * materialized it — upstream runs once); on the unbounded answer the
    * partial cache is dropped and the probe cost was O(bound) rows of
    * LocalLimit output (per-partition short-circuit), not a full pass. */
  private def boundedForRank(df: DataFrame, cutover: Long)
  : Option[DataFrame] = {
    if (cutover <= 0L) return None
    // respect a caller's existing persist (tokenBudgetSelectBy hands in a
    // frame it already cached) — re-persisting the same plan only warns
    val alreadyCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached =
      if (alreadyCached) df else graft.core.CacheScope.track(df.persist())
    if (atMostRows(cached, cutover)) Some(cached)
    else { if (!alreadyCached) cached.unpersist(false); None }
  }

  /** Scale-correct global running sum of an integral column ordered by a
    * unique key. The naive `sum.over(Window.orderBy(key))` funnels the whole
    * dataset through ONE window task (its Exchange is SinglePartition); this
    * is the classic two-phase prefix sum instead: range-partition on the key
    * (contiguous, ordered ranges), within-partition running sums in
    * parallel, then one bounded collect of the per-partition totals whose
    * exclusive prefix is broadcast back as each partition's offset. Integer
    * addition is order-independent, so the result is exact and deterministic
    * for a unique key regardless of where the range boundaries land.
    *
    * r19 bounded-input cutover: the two-phase form costs two extra jobs a
    * bounded input never needs (the range partitioner's sample pass plus
    * the per-partition-totals collect, each re-running the caller's
    * upstream plan). When the input is at most `cutoverRows` rows
    * (probed with [[atMostRows]] on a scope-tracked persist, so upstream
    * runs ONCE), the running sum is one ordinary window over the cached
    * rows — row-identical by the same order-independence argument, and the
    * SinglePartition exchange it plans carries at most `cutoverRows` rows
    * by construction. Above the bound the plan is exactly the pre-r19
    * two-phase shape (the probe's partial cache is dropped). `cutoverRows`:
    * [[RankCutoverFromConf]] resolves `spark.graft.rank.cutoverRows`
    * (default [[DefaultRankCutoverRows]]); 0 disables the probe — the
    * PlanSpec locks pin the at-scale shape through that setting.
    *
    * Cache note: the partitioned frame backs the returned plan — released
    * by the caller's CacheScope after its action (or clearCache outside).
    */
  def globalCumSum(df: DataFrame, orderCol: String, valueCol: String,
                   outCol: String = "cum",
                   cutoverRows: Long = RankCutoverFromConf): DataFrame =
    globalCumSumOrdered(df, Seq(orderCol), valueCol, outCol, cutoverRows)

  /** [[globalCumSum]] over a composite order key (e.g. (draw, id) for a
    * deterministic corpus shuffle: the draw orders, the unique id breaks
    * ties). Same two-phase layout; determinism needs the composite key to
    * be unique. */
  def globalCumSumOrdered(df: DataFrame, orderCols: Seq[String],
                          valueCol: String,
                          outCol: String = "cum",
                          cutoverRows: Long = RankCutoverFromConf)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    boundedForRank(df, resolveRankCutover(df, cutoverRows)) match {
      case Some(cached) =>
        val w = Window.orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return cached.withColumn(outCol,
          sum(col(valueCol).cast("long")).over(w))
      case None => ()
    }
    val parts = graft.core.CacheScope.track(df
      .repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .persist())
    val totals = parts.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offsets = totals.map { case (pid, t) =>
      val o = (pid, running); running += t; o
    }
    val offDf = parts.sparkSession.createDataFrame(offsets.toIndexedSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offDf), "__pid")
      .withColumn(outCol,
        sum(col(valueCol).cast("long")).over(w) + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Per-group rank under a total order — the grouped twin of
    * [[globalCumSumOrdered]], for "rank within stratum" layouts whose
    * strata can individually dwarf an executor (a per-language rank over a
    * 100 TB lake: `row_number over (partition by lang order by ...)` puts
    * ALL of `en` through one task). Range-partition on (group ++ order)
    * keys so each partition holds contiguous runs of at most a few groups,
    * count rows per (partition, group) — a tiny relation: ≤ partitions +
    * distinct-groups rows, because contiguous ranges mean each group spans
    * a prefix-closed set of partitions — derive each (partition, group)'s
    * exclusive prefix with a window over that counts relation (partition by
    * group, order by partition id), and broadcast it back. Within a
    * partition a group's rows are ranked by an ordinary window (safe: the
    * partition is executor-sized by construction). The offsets join uses
    * null-safe equality on the actual group columns — no string-encoded
    * composite key — so NULL group values and values containing any
    * delimiter rank correctly, and nothing round-trips through the driver.
    * Deterministic when (group ++ order) is unique.
    *
    * r19 bounded-input cutover (same device and conf as
    * [[globalCumSumOrdered]]): at most `cutoverRows` rows rank through one
    * ordinary `row_number` window over the probe's cached frame —
    * partitioned by the group columns when there are any (parallel by
    * group, no funnel at all), global otherwise (a SinglePartition
    * exchange of at most `cutoverRows` rows). Row-identical: rank under a
    * total order does not depend on the partitioning. Above the bound the
    * plan is exactly the pre-r19 two-phase shape.
    */
  def groupedRankOrdered(df: DataFrame, groupCols: Seq[String],
                         orderCols: Seq[String],
                         outCol: String = "rank",
                         cutoverRows: Long = RankCutoverFromConf)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    boundedForRank(df, resolveRankCutover(df, cutoverRows)) match {
      case Some(cached) =>
        val w =
          if (groupCols.isEmpty) Window.orderBy(orderCols.map(col): _*)
          else Window.partitionBy(groupCols.map(col): _*)
            .orderBy(orderCols.map(col): _*)
        return cached.withColumn(outCol, row_number().over(w).cast("long"))
      case None => ()
    }
    val keys = groupCols ++ orderCols
    val parts = graft.core.CacheScope.track(df
      .repartitionByRange(keys.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .persist())
    val counts = parts
      .groupBy(col("__pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // Exclusive per-group prefix over partition ids: range partitioning on
    // (group ++ order) makes lower pid = lower order range within a group,
    // so the running count over pid IS the group's rank offset.
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = counts
      .withColumn("__offset", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__offset"): _*)
    val joinCond = groupCols
      .map(c => col(c) <=> col(s"__og_$c"))
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    val w = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    parts.join(broadcast(offDf), joinCond)
      .withColumn(outCol, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid" +: "__opid" +: "__offset" +: groupCols.map(c => s"__og_$c"): _*)
  }

  /** Bucketed-table layout for co-located joins: write both sides bucketed
    * by the join key → the sort-merge join reads pre-bucketed files with no
    * Exchange (checked in BucketingSpec). At 100 TB this is the difference
    * between re-shuffling the fact table per query and never shuffling it.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Z-order (Morton) interleave of two non-negative integer columns,
    * `bits` bits each — the multi-dimension data-skipping sort key: rows
    * sorted (and range-partitioned into files) by this key cluster
    * locality in BOTH dimensions at once, so min/max file statistics
    * prune selective predicates on EITHER column, where a plain
    * lexicographic (x, y) sort key skips only on x. This is the layout
    * move behind every "Z-ORDER BY" table optimizer; here it is a pure
    * codegen'd integer expression (shift-free: division and modulo by
    * powers of two, exact in any engine), so the key costs one projection
    * at write time and composes with `repartitionByRange(zkey)` +
    * per-file sort for the actual 100 TB layout write. Inputs are clamped
    * to the `bits`-bit range (a value past the grid lands in the last
    * cell, never corrupts the interleave). Bit extraction is
    * `shiftright` + modulo — genuinely integer end to end, exact on the
    * full long domain rather than only on the clamped one (Column.divide
    * is double division in Spark; it was exact here only because the
    * clamp kept inputs under 2^53).
    */
  def zOrderKey(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val max = (1L << bits) - 1
    val cx = least(greatest(x.cast("long"), lit(0L)), lit(max))
    val cy = least(greatest(y.cast("long"), lit(0L)), lit(max))
    (0 until bits).map { b =>
      (shiftright(cx, b) % 2L) * lit(1L << (2 * b)) +
        (shiftright(cy, b) % 2L) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }
}
