package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Mergeable sketches, built deterministic-first: every hash is the
  * portable mod-2^57 rolling fingerprint (the q37 hash family with a SQL
  * twin), every counter/register is exact integer arithmetic, so the
  * sketch CONTENTS — not just the estimates — are bit-identical across
  * engines, partitionings, and merge orders, and a DuckDB oracle can
  * hash-check them. That is the whole design point: classic sketch
  * libraries hash with engine-private functions and sum floats, which
  * makes their output unverifiable-by-twin; these rebuild the same
  * structures on verifiable primitives.
  *
  * Both sketches are MERGEABLE by construction (counters add; registers
  * max), which is what makes them 100 TB operators: each partition
  * builds its bounded sketch map-side and the shuffle moves d·w counters
  * or m registers, never the corpus.
  */
object Sketch {

  /** The 57-bit hash domain shared with the fingerprint family. */
  val MixMod: Long = 1L << 57
  /** Odd multipliers (the splitmix64 constants truncated into the 57-bit
    * ring) — masking with 2^57−1 equals unsigned mod 2^57. */
  val MixK1: Long = (0xBF58476D1CE4E5B9L & (MixMod - 1)) | 1L
  val MixK2: Long = (0x94D049BB133111EBL & (MixMod - 1)) | 1L

  /** 57-bit finalizer avalanche over the polynomial fingerprint: three
    * xor-shifts interleaved with two modular multiplications, every step
    * exact integer arithmetic, so both engines compute the identical
    * mixed value. WHY it exists: the rolling fingerprint's LOW bits wrap
    * constantly and distribute well (the bucketing every dedup family
    * uses), but for short strings its HIGH bits barely wrap and stay
    * structured — a leading-zero rank read from them is garbage
    * (measured: raw-fp HLL estimates 5,000 distinct users as ~294;
    * mixed, ~5,075). Any sketch reading rank bits MUST go through this.
    *
    * Implemented as ONE native expression
    * ([[graft.functions.Avalanche57]]): any Column-DSL form of the
    * modular multiply references its input more than once, so the
    * composed tree grows exponentially through the five stages and
    * consumers like the HLL rank chain duplicate it 52-fold — measured
    * 6-15× query-level planning/codegen blowups. The native node keeps
    * the tree linear and the per-row cost five long ops; the value is
    * the exact `mod 2^57` chain the oracle twin ([[mixStagesSql]],
    * HUGEINT `%`) computes, pinned against a BigInteger reference in
    * OperatorSpec.
    */
  def mix57(x0: Column): Column =
    graft.functions.StringFunctions.avalanche57(x0, MixK1, MixK2)

  /** The oracle twin of one [[mix57]] stage sequence, as successive
    * expression rewrites over a column named `e` — returned as the list
    * of per-stage SQL expressions so generated oracles can stage them
    * through CTEs instead of exploding the tree 8-fold. */
  def mixStagesSql(e: String): Seq[String] = Seq(
    s"xor($e, ($e) >> 29)",
    s"CAST((CAST($e AS HUGEINT) * $MixK1) % $MixMod AS BIGINT)",
    s"xor($e, ($e) >> 29)",
    s"CAST((CAST($e AS HUGEINT) * $MixK2) % $MixMod AS BIGINT)",
    s"xor($e, ($e) >> 29)")

  private[graft] def testSalted(value: Column, salt: String): Column =
    salted(value, salt)

  private def salted(value: Column, salt: String): Column =
    mix57(TextAnalysis.fingerprint(concat(value.cast("string"), lit(salt))))

  /** Count-min sketch, built AND probed: `d` salted hash rows × `w`
    * counters over the exact per-item counts, then every distinct item
    * probed back — est = min over rows of its counter. The output
    * carries the true count next to the estimate because the defining
    * guarantee (`est ≥ true`, with equality unless the item collides in
    * every row) is what the oracle and the spec check.
    *
    * At 100 TB the build is the map-side-combined aggregate of the raw
    * stream into d·w bounded cells (the exact per-item count here is the
    * verification baseline — the thing the sketch exists to replace);
    * the probe joins bounded relations only.
    */
  def countMinEstimates(items: DataFrame, valueCol: String = "item",
                        d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 1, s"d and w must be positive: d=$d w=$w")
    val cnt = items.groupBy(col(valueCol))
      .agg(count(lit(1)).as("true_cnt"))
    val hashed = cnt.select(
      col(valueCol) +: col("true_cnt") +:
        (0 until d).map(j =>
          pmod(salted(col(valueCol), s"|cms$j"), lit(w.toLong))
            .as(s"__h$j")): _*)
    val counters = (0 until d).map { j =>
      hashed.groupBy(col(s"__h$j").as("bucket"))
        .agg(sum("true_cnt").as("counter"))
        .select(lit(j).as("row_j"), col("bucket"), col("counter"))
    }.reduce(_ unionByName _)
    val probes = (0 until d).map { j =>
      hashed.select(col(valueCol), col("true_cnt"),
        lit(j).as("row_j"), col(s"__h$j").as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(counters, Seq("row_j", "bucket"))
      .groupBy(col(valueCol), col("true_cnt"))
      .agg(min("counter").as("est_cnt"))
  }

  /** Count-min join-cardinality preflight: estimate `|A ⋈ B on key|`
    * WITHOUT joining the keys — as `min over rows j of
    * Σ_bucket cmA[j][b] · cmB[j][b]`, the classic sketch inner product.
    * Each row's product expands to `Σ_{h_j(x)=h_j(y)} a_x·b_y ⊇
    * Σ_k a_k·b_k`, so every row over-counts (collisions only ADD mass)
    * and the min is a one-sided upper estimate, exactly the count-min
    * point guarantee lifted to join size. The q218 preflight computes
    * the true `Σ_k a_k·b_k` by joining the per-key count relations —
    * correct, but it shuffles every distinct key; here each side folds
    * into d·w counters MAP-SIDE and the estimate is a d·w-row join,
    * which is the whole point at 100 TB (products and sums run in
    * DECIMAL(38,0): bucket counters are corpus-sized, so their products
    * overflow a BIGINT long before any real corpus does). The exact
    * value rides along as the audit column, like [[countMinEstimates]]'
    * `true_cnt`.
    *
    * Output: one row (d, w, est_rows, exact_rows), est_rows ≥ exact_rows.
    */
  def countMinJoinSize(a: DataFrame, b: DataFrame,
                       valueCol: String = "item",
                       d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 1, s"d and w must be positive: d=$d w=$w")
    def counters(items: DataFrame, as: String) = {
      val cnt = items.groupBy(col(valueCol))
        .agg(count(lit(1)).as("__c"))
      // ONE pass per side: all d bucket columns come off a single cnt
      // scan, unpivoted map-side into (row_j, bucket, __c) rows and
      // folded by key — the r14 ADVICE fix (d unioned groupBys each
      // re-ran the per-key aggregate from the raw items, ~d+1 full
      // input passes at the documented d=4). The d·|keys| unpivot rows
      // exist only map-side of one combine-enabled shuffle.
      val pairs = (0 until d).map(j => struct(lit(j).as("row_j"),
        pmod(salted(col(valueCol), s"|cms$j"), lit(w.toLong)).as("bucket")))
      cnt.select(explode(array(pairs: _*)).as("rb"), col("__c"))
        .groupBy(col("rb.row_j").as("row_j"), col("rb.bucket").as("bucket"))
        .agg(sum("__c").as(as))
    }
    // every hash row contributes to the min — a row where A's and B's
    // occupied buckets are DISJOINT has true inner product 0 (the
    // tightest bound of all), so missing rows must come back as 0 via
    // the row spine, not drop out of the min (dropping them inflates
    // the estimate, and with ALL rows disjoint the min of nothing is
    // NULL — the r14 review catch; the oracle fixes the same gap)
    val spine = a.sparkSession.range(d)
      .select(col("id").cast("int").as("row_j"))
    val ip = spine.join(
        counters(a, "__ca").join(counters(b, "__cb"),
            Seq("row_j", "bucket"))
          .groupBy(col("row_j"))
          .agg(sum(col("__ca").cast("decimal(38,0)") * col("__cb"))
            .as("__p0")),
        Seq("row_j"), "left")
      .select(coalesce(col("__p0"), lit(0L).cast("decimal(38,0)"))
        .as("__p"))
      .agg(min(col("__p")).as("__est"))
    val exact = a.groupBy(col(valueCol)).agg(count(lit(1)).as("__a"))
      .join(b.groupBy(col(valueCol)).agg(count(lit(1)).as("__b")),
        Seq(valueCol))
      .agg(coalesce(sum(col("__a").cast("decimal(38,0)") * col("__b")),
        lit(0L)).as("__ex"))
    // the decimal sums exist because counters are corpus-sized — so the
    // final LONG cast must clamp, not wrap: non-ANSI Spark casts decimal
    // overflow to NULL, and a NULL est_rows would let `est < threshold`
    // wave through exactly the join this preflight exists to block.
    // Long.MaxValue reads as "beyond any runnable join", bound preserved
    val MaxL = Long.MaxValue
    ip.crossJoin(exact)
      .select(lit(d.toLong).as("d"), lit(w.toLong).as("w"),
        least(col("__est"), lit(MaxL).cast("decimal(38,0)"))
          .cast("long").as("est_rows"),
        least(col("__ex"), lit(MaxL).cast("decimal(38,0)"))
          .cast("long").as("exact_rows"))
  }

  // ---------------------------------------------------------------------
  // Count-min EPOCH STORE (r16 VERDICT item #5): the persisted,
  // mergeable form of [[countMinEstimates]] — one d·w counter slab per
  // epoch, merged over any epoch span by per-(row, bucket) SUM. The CMS
  // is the ADD-merge family's frequency-ESTIMATE member (the MG top-freq
  // store answers "what is hot" with ≤ k rows; this answers "how often
  // is THIS item" for any probe, d·w rows per epoch): counter addition
  // is exactly re-counting, so a span merge is bit-identical to one-shot
  // sketching everything the epochs saw. ADD is not idempotent, so the
  // store inherits the top-freq replay discipline wholesale: epoch
  // partitions with dynamic self-overwrite, a folded_through watermark
  // on appends, and a fold that keeps the NEWEST epoch live.
  // ---------------------------------------------------------------------

  /** One epoch's (row_j, bucket, counter) slab — the counters half of
    * [[countMinEstimates]], via the one-pass unpivot device of
    * [[countMinJoinSize]] (never d separate input passes). Buckets with
    * no mass are absent: a missing (row, bucket) is zero, and zeros add
    * nothing under the span merge. */
  private def cmsCounterSlab(items: DataFrame, valueCol: String,
                             d: Int, w: Int): DataFrame = {
    val cnt = items.groupBy(col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val pairs = (0 until d).map(j => struct(lit(j).as("row_j"),
      pmod(salted(col(valueCol), s"|cms$j"), lit(w.toLong)).as("bucket")))
    cnt.select(explode(array(pairs: _*)).as("rb"), col("__c"))
      .groupBy(col("rb.row_j").as("row_j"), col("rb.bucket").as("bucket"))
      .agg(sum("__c").as("counter"))
  }

  /** Create/replace a CMS store at `path` with one epoch. Layout pins
    * d and w (`cmsd=`, `cmsw=` — counters from different geometries sum
    * garbage, the histogram grid discipline). */
  def writeCmsStore(items: DataFrame, path: String, epoch: Long,
                    valueCol: String = "item", d: Int = 4,
                    w: Int = 64): Unit = {
    require(d >= 1 && w >= 1, s"d and w must be positive: d=$d w=$w")
    requireEpochId(epoch)
    val spark = items.sparkSession
    cmsCounterSlab(items, valueCol, d, w)
      .select(col("row_j"), col("bucket"), col("counter"),
        lit(epoch).as("epoch"))
      .write.mode("overwrite").partitionBy("epoch").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"cmsd=$d,cmsw=$w\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Whether a CMS store (with its layout record) exists at `path`. */
  def cmsStoreExists(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean = {
    val (fs, lp) = layoutFile(spark, path)
    fs.exists(lp)
  }

  private def cmsLayoutKv(spark: org.apache.spark.sql.SparkSession,
                          path: String): Map[String, String] =
    readStoreLayout(spark, path, "CMS", Set("cmsd", "cmsw"),
      optionalKeys = Set(FoldedThroughKey))

  /** Append one epoch's counter slab. ADD-merged counters double-count
    * on replay, so idempotence comes from the WRITE LAYOUT (the top-freq
    * device): the store partitions by epoch and this write dynamically
    * overwrites only the incoming epoch's partition — an at-least-once
    * re-delivery rewrites its own dir. Epochs at or below the fold
    * watermark fail loud (their rows were merged into the baseline; a
    * replay would re-add them). */
  def appendCmsStore(items: DataFrame, path: String, epoch: Long,
                     valueCol: String = "item", d: Int = 4,
                     w: Int = 64): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val kv = cmsLayoutKv(spark, path)
    kv.get(FoldedThroughKey).foreach(ft => require(epoch > ft.toLong,
      s"epoch $epoch was folded into the baseline of $path (watermark " +
        s"$ft) — ADD-merged CMS counters double-count on replay; use a " +
        "fresh epoch id above the watermark"))
    require(kv("cmsd") == d.toString && kv("cmsw") == w.toString,
      s"CMS store at $path was written with (cmsd=${kv("cmsd")}," +
        s"cmsw=${kv("cmsw")}), append requested (d=$d,w=$w) — rebuild " +
        "the store, mixed geometries sum garbage")
    cmsCounterSlab(items, valueCol, d, w)
      .select(col("row_j"), col("bucket"), col("counter"),
        lit(epoch).as("epoch"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(path)
  }

  /** The merged (row_j, bucket, counter) relation of an epoch span —
    * per-cell SUM, d·w rows out at most, never the stream. */
  def mergedCmsCounters(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        epochFilter: Column = lit(true)): DataFrame = {
    val kv = cmsLayoutKv(spark, path)
    val rows = readStoreRows(spark, path,
      "row_j INT, bucket BIGINT, counter BIGINT, epoch BIGINT")
    guardFoldedWindow(spark, path, kv, epochFilter)
    rows.filter(epochFilter)
      .groupBy(col("row_j"), col("bucket"))
      .agg(sum(col("counter")).as("counter"))
  }

  /** Probe `probes`' distinct values against the merged span: est = min
    * over hash rows of the summed counter — bit-identical to
    * [[countMinEstimates]] run one-shot over everything the span's
    * epochs saw (counter addition is exactly re-counting), which is the
    * store's oracle-checkable identity (q245). Output (item, est_cnt);
    * items the span never saw may still report collision mass — the CMS
    * one-sided guarantee, est ≥ true, unchanged by the merge.
    *
    * The probe LEFT-joins the counter cells and coalesces a missing
    * cell to 0 (the r17 review catch, the same gap
    * [[countMinJoinSize]]'s row spine closes): the store only persists
    * occupied cells, so an inner join would let an unseen probe whose
    * cells are partially empty report its colliding cell's mass — a
    * real CMS reads the empty cell as 0, the tightest bound — and an
    * unseen probe with NO occupied cell would vanish from the output
    * entirely instead of answering est 0. */
  def mergedCmsEstimates(spark: org.apache.spark.sql.SparkSession,
                         path: String, probes: DataFrame,
                         valueCol: String = "item",
                         epochFilter: Column = lit(true)): DataFrame = {
    val kv = cmsLayoutKv(spark, path)
    val (d, w) = (kv("cmsd").toInt, kv("cmsw").toInt)
    val merged = mergedCmsCounters(spark, path, epochFilter)
    val items = probes.select(col(valueCol)).distinct()
    val hashed = (0 until d).map(j =>
      items.select(col(valueCol), lit(j).as("row_j"),
        pmod(salted(col(valueCol), s"|cms$j"), lit(w.toLong))
          .as("bucket")))
      .reduce(_ unionByName _)
    hashed.join(merged, Seq("row_j", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("counter"), lit(0L))).as("est_cnt"))
  }

  /** Quiesced compaction: fold every epoch EXCEPT the newest into one
    * per-cell SUM baseline at [[FoldEpoch]], newest kept live so a
    * replayed last batch stays a self-overwrite (the
    * [[graft.ops.Scale.compactTopFreqStore]] contract — ADD-family folds
    * must not turn a replay into a double count). Watermark carried
    * monotonically; park/rename swap; single-writer while quiesced. */
  def compactCmsStore(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    recoverParked(spark, path)
    val kv = cmsLayoutKv(spark, path)
    compactKeepNewest(spark, path,
      s"cmsd=${kv("cmsd")},cmsw=${kv("cmsw")}",
      kv.get(FoldedThroughKey).map(_.toLong).getOrElse(FoldEpoch),
      below => below.groupBy(col("row_j"), col("bucket"))
        .agg(sum(col("counter")).as("counter")),
      emptySchemaDdl =
        "row_j INT, bucket BIGINT, counter BIGINT, epoch BIGINT")
  }

  /** The shared keep-newest-live fold of the ADD-merge epoch stores
    * (top-freq MG counters, CMS counter slabs — extracted by the r17
    * review, the readStoreLayout consolidation argument applied to the
    * fold protocol): every epoch EXCEPT the newest folds through
    * `foldBelow` into one baseline slab at [[FoldEpoch]], the newest
    * partition stays live so a replayed last batch remains a
    * self-overwrite (ADD-merged counters double-count a replay whose
    * rows moved into the baseline — the whole reason these two families
    * cannot fold everything the way the idempotent families do), and
    * the `folded_through` watermark advances monotonically to the max
    * folded id. A compaction that folded NOTHING (single live epoch,
    * no prior watermark) records no watermark at all — a store that
    * never lost per-epoch rows must not arm the folded-window guard
    * (the r17-review false positive). */
  private[ops] def compactKeepNewest(
      spark: org.apache.spark.sql.SparkSession, path: String,
      baseLayout: String, prevFt: Long,
      foldBelow: DataFrame => DataFrame,
      emptySchemaDdl: String): Unit = {
    // cast: a partitionBy("epoch") column reads back with an INFERRED
    // (int-sized) type when every dir name fits one; a FILELESS store
    // (empty summary / empty first batch) folds as its empty relation
    val rows = readStoreRows(spark, path, emptySchemaDdl)
      .withColumn("epoch", col("epoch").cast("long"))
    val newestRow = rows.agg(max(col("epoch"))).head()
    if (newestRow.isNullAt(0)) return
    val newest = newestRow.getLong(0)
    val below = rows.filter(col("epoch") < newest)
    val folded = foldBelow(below.drop("epoch"))
      .withColumn("epoch", lit(FoldEpoch))
      .unionByName(rows.filter(col("epoch") === newest))
    val belowRow = below.agg(max(col("epoch"))).head()
    val ft = math.max(prevFt,
      if (belowRow.isNullAt(0)) prevFt else belowRow.getLong(0))
    swapFolded(spark, path, withFoldWatermark(baseLayout, ft), folded,
      partitionCols = Seq("epoch"))
  }

  /** HyperLogLog registers + estimate with NO floating-point anywhere
    * until the final two operations: the 57-bit fingerprint splits into
    * a bucket (`h mod m`) and a 51-bit remainder whose leading-zero rank
    * ρ ∈ [1, 52] is a generated integer-comparison chain (no log2);
    * registers are MAX(ρ) per bucket (0 where the bucket is empty —
    * the m-row spine is part of the relation); and the harmonic
    * denominator Σ 2^(−M_b) is carried as the EXACT integer
    * Σ 2^(52−M_b) (≤ m·2^52, fits a BIGINT). The estimate is then one
    * float multiply and one divide of exact integers —
    * `alpha · m² · 2^52 / harm_num` with alpha pinned at the 0.709
    * literal (the m = 64 constant) — so even the double is
    * bit-identical everywhere.
    *
    * Output: one row (m, n_exact, harm_num, n_zero, estimate).
    * `n_exact` is the verification baseline; `harm_num` is the
    * determinism anchor the oracle hash-checks even if a future engine
    * rounds the division differently; `n_zero` (empty registers, exact)
    * is the ingredient for the standard small-range linear-counting
    * correction `m·ln(m/V)` — emitted as data rather than applied,
    * because ln is a libm transcendental with no cross-engine
    * bit-equality guarantee and this operator's contract is
    * transcendental-free (the consumer applies it driver-side where
    * bit-stability doesn't matter).
    */
  def hllEstimate(items: DataFrame, valueCol: String = "item",
                  p: Int = 6): DataFrame = {
    val exact = items.agg(
      countDistinct(col(valueCol)).as("n_exact"))
    estimateFromRegisters(hllRegisters(items, valueCol, p), p)
      .crossJoin(exact)
      .select(col("m"), col("n_exact"), col("harm_num"), col("n_zero"),
        col("estimate"))
  }

  /** Grouped HLL — [[hllEstimate]] per group key, the q151 treatment
    * applied to distinct-counting: one (group, bucket) register relation
    * (bounded at groups × m rows however large the corpus), the
    * group-spine from the distinct groups so empty registers exist per
    * group, and the same transcendental-free exact-integer estimator.
    * The 100 TB shape for "UV per segment" dashboards where the exact
    * `countDistinct` per group (carried here as `n_exact` for
    * verification) becomes the dominant shuffle: registers cross the
    * wire, never user ids.
    */
  def groupedHllEstimate(items: DataFrame, groupCol: String,
                         valueCol: String = "item",
                         p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2, 16]: $p")
    val m = 1L << p
    val spark = items.sparkSession
    val h = salted(col(valueCol), "|hll")
    val rem = shiftright(h, p)
    val bits = 57 - p
    val maxRank = bits + 1
    val rank = (1 to bits).foldRight(lit(bits + 1)) { (k, rest) =>
      when(rem >= lit(1L << (bits - k)), lit(k)).otherwise(rest)
    }
    val regs = items
      .select(col(groupCol), pmod(h, lit(m)).as("bucket"), rank.as("__rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("__rho")).as("__reg"))
    val spine = items.select(col(groupCol)).distinct()
      .crossJoin(spark.range(m).select(col("id").as("bucket")))
    val reg2 = spine.join(regs, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("bucket"),
        coalesce(col("__reg"), lit(0)).cast("int").as("register"))
    val exact = items.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    reg2.groupBy(col(groupCol))
      .agg(sum(expr(s"shiftleft(1L, $maxRank - register)")).as("harm_num"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_zero"))
      .join(exact, Seq(groupCol))
      .select(col(groupCol), lit(m).as("m"), col("n_exact"),
        col("harm_num"), col("n_zero"),
        (lit(hllAlpha(m) * m.toDouble * m.toDouble *
          math.pow(2.0, maxRank)) / col("harm_num").cast("double"))
          .as("estimate"))
  }

  /** The full m-row HLL register relation for one batch of items:
    * (bucket ∈ [0, m), register = max rank, 0 where the bucket is empty —
    * the spine is part of the relation so two register relations merge by
    * a plain bucket-key MAX with no outer-join fiddling). This is the
    * mergeable unit [[writeHllStore]] persists per epoch.
    */
  def hllRegisters(items: DataFrame, valueCol: String = "item",
                   p: Int = 6): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2, 16]: $p")
    val m = 1L << p
    val spark = items.sparkSession
    val h = salted(col(valueCol), "|hll")
    // h is non-negative and m = 2^p, so the bucket-stripping division is
    // an exact right shift — Column.divide would route through doubles,
    // and h spans [0, 2^57), past the 53-bit exact-double range.
    val rem = shiftright(h, p) // in [0, 2^(57-p))
    val bits = 57 - p
    // rank = leading zeros of the bits-wide remainder + 1, as a pure
    // comparison chain (rank k ⇔ rem ∈ [2^(bits-k), 2^(bits-k+1)))
    val rank = (1 to bits).foldRight(lit(bits + 1)) { (k, rest) =>
      when(rem >= lit(1L << (bits - k)), lit(k)).otherwise(rest)
    }
    val regs = items
      .select(pmod(h, lit(m)).as("bucket"), rank.as("__rho"))
      .groupBy(col("bucket")).agg(max(col("__rho")).as("__reg"))
    val spine = spark.range(m).select(col("id").as("bucket"))
    spine.join(regs, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__reg"), lit(0)).cast("int").as("register"))
  }

  /** HLL set algebra (q177): estimate |A ∩ B| by inclusion–exclusion
    * over three register relations — A's, B's, and their bucket-wise
    * MAX union (the union of two HLL sketches IS the register max, the
    * same merge the store uses; there is no register-level intersection,
    * which is why the estimate subtracts). Every harmonic numerator is
    * the exact integer the q140 estimator carries, the three estimates
    * are single divisions by the folded constant, and the intersection
    * is `(est_a + est_b) − est_u` in that fixed association — so even
    * the derived float is bit-identical across engines. Exact
    * |A|, |B|, |A ∩ B| ride along as the verification baseline.
    *
    * Output: one row (m, n_a, n_b, n_ab_exact, harm_a, harm_b, harm_u,
    * est_intersect).
    */
  def hllIntersection(a: DataFrame, b: DataFrame,
                      valueCol: String = "item", p: Int = 6): DataFrame = {
    val m = 1L << p
    val maxRank = 57 - p + 1
    val c = hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, maxRank)
    val ra = hllRegisters(a, valueCol, p).localCheckpoint()
    val rb = hllRegisters(b, valueCol, p).localCheckpoint()
    val ru = ra.unionByName(rb)
      .groupBy(col("bucket")).agg(max(col("register")).as("register"))
    def harm(r: DataFrame, as: String) =
      r.agg(sum(expr(s"shiftleft(1L, $maxRank - register)")).as(as))
    val da = a.select(col(valueCol).as("__v")).distinct()
    val db = b.select(col(valueCol).as("__v")).distinct()
    val exact = da.agg(count(lit(1)).as("n_a"))
      .crossJoin(db.agg(count(lit(1)).as("n_b")))
      .crossJoin(da.join(db, Seq("__v"), "left_semi")
        .agg(count(lit(1)).as("n_ab_exact")))
    def est(h: org.apache.spark.sql.Column) = lit(c) / h.cast("double")
    harm(ra, "harm_a").crossJoin(harm(rb, "harm_b"))
      .crossJoin(harm(ru, "harm_u"))
      .crossJoin(exact)
      .select(lit(m).as("m"), col("n_a"), col("n_b"), col("n_ab_exact"),
        col("harm_a"), col("harm_b"), col("harm_u"),
        ((est(col("harm_a")) + est(col("harm_b"))) -
          est(col("harm_u"))).as("est_intersect"))
  }

  /** One-row (m, harm_num, n_zero, estimate) from an m-row register
    * relation — the estimator stage shared by the one-shot
    * [[hllEstimate]] and the store-merged [[mergedHllEstimate]]. */
  def estimateFromRegisters(registers: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    // Σ 2^(maxRank − register), maxRank = bits + 1, exact in a BIGINT
    val maxRank = 57 - p + 1
    registers.agg(
        sum(expr(s"shiftleft(1L, $maxRank - register)")).as("harm_num"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_zero"))
      .select(lit(m).as("m"), col("harm_num"), col("n_zero"),
        (lit(hllAlpha(m) * m.toDouble * m.toDouble *
          math.pow(2.0, maxRank)) / col("harm_num").cast("double"))
          .as("estimate"))
  }

  // ---------------------------------------------------------------------
  // Persistent register store: the incremental-UV layer. The reference
  // kept a per-day user SET in HBase and counted it per dashboard refresh
  // (flink-statistics ActionLogJobSecond.java:359-376) — exact but
  // corpus-sized state. Here each epoch (a day, a batch) persists its m
  // bounded registers; any span of epochs merges with a bucket-key MAX
  // (registers are max-mergeable by construction) into one estimate —
  // state is m rows per epoch regardless of corpus size, and the merged
  // result is bit-identical to recomputing over the union of the epochs'
  // items, which is what the parity test pins.
  // ---------------------------------------------------------------------

  private[ops] def layoutFile(spark: org.apache.spark.sql.SparkSession,
                              path: String) = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_layout")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Store-row read that survives a FILELESS store dir (r17 review
    * fallout): families whose per-epoch relation is data-derived —
    * MG summaries (a uniform rotation legitimately decrements every
    * counter away), CMS/KMV/histogram slabs of an EMPTY first batch —
    * can write ZERO rows, and `partitionBy` of an empty frame creates a
    * dir holding only `_SUCCESS` + the layout record. A plain
    * `spark.read.parquet` then dies with UNABLE_TO_INFER_SCHEMA on a
    * store that is perfectly healthy, just empty. The fallback returns
    * an empty frame with the family's declared row schema, so merges
    * answer their empty relation and appends into the store work. (The
    * HLL/bloom families write full register/word SPINES per epoch and
    * cannot be fileless; they keep plain inference.) */
  private[ops] def readStoreRows(spark: org.apache.spark.sql.SparkSession,
                                 path: String,
                                 emptySchemaDdl: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(emptySchemaDdl))
    }

  /** THE layout-record reader, shared by every store family (r15
    * next-round item: six families hand-rolled the same
    * open/readAllBytes/parse/require block ~8 times, and the r14
    * KMV-reads-HLL bug showed the drift risk is real). Parses the
    * record's `k1=v1,k2=v2` pairs and validates the EXACT key set —
    * key-set identity is what distinguishes the families (`k=` KMV vs
    * `bits=,k=` bloom vs `p=` HLL vs the two histogram grids vs
    * `gk=,group=`) — so any store pointed at the wrong family's reader
    * fails loud with the family name and the recorded text. `hints`
    * upgrades specific foreign key sets to a redirecting message (e.g.
    * "use mergedGroupedHistQuantiles"). */
  private[ops] def readStoreLayout(
      spark: org.apache.spark.sql.SparkSession,
      path: String, family: String,
      keys: Set[String],
      hints: Map[Set[String], String] = Map.empty,
      optionalKeys: Set[String] = Set.empty)
  : Map[String, String] = {
    val (fs, lp) = layoutFile(spark, path)
    require(fs.exists(lp),
      s"$family store at $path has no layout record — only stores " +
        s"written by the family's write entry point are mergeable " +
        "(the layout cannot be recovered from rows)")
    val in = fs.open(lp)
    val recorded =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    val kv = recorded.split(",").map(_.split("=", 2)).collect {
      case Array(k, v) => k -> v
    }.toMap
    // optional keys (fold watermarks) are stripped before the identity
    // check — a folded store is still its family
    val core = kv.keySet -- optionalKeys
    hints.get(core).foreach(h => require(core == keys,
      s"store at $path $h (layout record '$recorded')"))
    require(core == keys,
      s"store at $path is not a $family store (layout record " +
        s"'$recorded'; a $family layout carries exactly " +
        s"${keys.toSeq.sorted.mkString("[", ",", "]")})")
    kv
  }

  /** Layout line with the fold watermark appended — OMITTED when the
    * fold had nothing to erase (ft < 0): a store that never lost
    * per-epoch rows must not carry a vestigial watermark
    * ([[storeFoldedThrough]] answers "was anything folded away"). */
  private[ops] def withFoldWatermark(base: String, ft: Long): String =
    if (ft >= 0L) s"$base,$FoldedThroughKey=$ft" else base

  /** The fold-watermark layout key of the ADD-merge families: folds
    * erase per-epoch rows, so the duplicate-epoch replay guard would
    * silently pass for any folded-away id — the watermark keeps it
    * LOUD: appends must use an epoch strictly above it. */
  private[ops] val FoldedThroughKey = "folded_through"

  // the two histogram grids share keys modulo `group` — an ungrouped
  // merge over a GROUPED store would silently sum across segments (a
  // real relation, the wrong question), so each redirects to the other
  private val HistHints = Map(
    Set("lo", "width", "bins", "group") ->
      "is a grouped histogram store — use mergedGroupedHistQuantiles")
  private val GroupedHistHints = Map(
    Set("lo", "width", "bins") ->
      "is an UNGROUPED histogram store — use mergedHistQuantiles")

  /** Quiesced in-place store compaction — the swap half, shared by
    * every store family's `compact*Store`: write the folded relation
    * plus the (unchanged) layout record into `path__tmp`, then swap
    * under the park/rename/crash-recover protocol — a crash mid-swap
    * leaves either the old store or the folded one, never a torn dir.
    * The folded plan MUST read the live store lazily: it materializes
    * during the tmp write, before the live dir moves. Single-writer
    * while the owning stream is quiesced (every fold's contract). */
  /** Restore a store parked by a crashed swap (dst renamed to `__old`
    * but the folded tmp never renamed in): the parked dir moves back.
    * Every `compact*Store` calls this FIRST — the layout read would
    * otherwise fail loud on the torn window — and every streaming
    * runner with an auto-fold cadence calls it BEFORE its
    * exists-check: a batch replayed into the torn window would
    * otherwise see "no store", overwrite-CREATE a fresh one holding
    * only itself, and the next fold's recovery would then delete the
    * parked history as a stale leftover. Plain READERS stay read-only
    * by design: a reader that mutated would race other readers on the
    * rename, and the torn window already fails loud with the
    * no-layout-record message rather than answering wrong. Callers of
    * this method are WRITERS (the single-writer contract), so the
    * rename cannot race. */
  def recoverParked(spark: org.apache.spark.sql.SparkSession,
                    path: String): Unit = {
    val dstP = new org.apache.hadoop.fs.Path(path)
    val fs = dstP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.Sinks.recoverOld(fs,
      new org.apache.hadoop.fs.Path(path + "__old"), dstP)
  }

  private[ops] def swapFolded(spark: org.apache.spark.sql.SparkSession,
                              path: String, layoutLine: String,
                              folded: DataFrame,
                              partitionCols: Seq[String] = Nil): Unit = {
    val dstP = new org.apache.hadoop.fs.Path(path)
    val oldP = new org.apache.hadoop.fs.Path(path + "__old")
    val tmpP = new org.apache.hadoop.fs.Path(path + "__tmp")
    val fs = dstP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sinks.Sinks.recoverOld(fs, oldP, dstP)
    fs.delete(tmpP, true)
    val w = folded.write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmpP.toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(tmpP, "_graft_layout"),
      true)
    try out.write((layoutLine + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    graft.sinks.Sinks.renameOrThrow(fs, dstP, oldP)
    graft.sinks.Sinks.renameOrThrow(fs, tmpP, dstP)
    fs.delete(oldP, true)
    ()
  }

  /** The reserved epoch id every fold writes its baseline under —
    * OUTSIDE the id space of real batches (stream batch ids and date
    * epochs are ≥ 0), so an at-least-once replay of a batch after a
    * fold can never collide with the folded baseline: idempotent-merge
    * families (HLL MAX, bloom OR, KMV union) re-merge the replayed slab
    * harmlessly next to it, and the MG store's per-epoch dynamic
    * overwrite keeps rewriting the replayed batch's OWN partition. */
  val FoldEpoch: Long = -1L

  /** Every store write/append entry point calls this first (r17 ADVICE):
    * a negative caller epoch — `writeXStore(epoch = -1)` most of all —
    * would create a partition indistinguishable from the [[FoldEpoch]]
    * baseline, silently corrupting [[guardFoldedWindow]] /
    * [[compactKeepNewest]] semantics. Rejected uniformly at create AND
    * append so the invariant cannot be bypassed by the create path. */
  private[ops] def requireEpochId(epoch: Long): Unit =
    require(epoch >= 0, s"epoch must be >= 0 (negative ids are reserved " +
      s"for fold baselines): $epoch")

  /** Post-fold append semantics, by merge class (r17 ADVICE, resolved
    * in favor of replay tolerance): the ADD families (CMS, histograms,
    * MG/top-freq) REJECT appends at or below the fold watermark — their
    * rows were merged into the baseline and a replay would double-count.
    * The idempotent families (HLL MAX, bloom OR, KMV union) ACCEPT
    * them: an at-least-once source replaying an already-folded
    * micro-batch must stay harmless, not crash-loop the stream, and the
    * re-append lands the epoch's complete slab next to the baseline
    * (merging it in changes nothing). [[guardFoldedWindow]] treats such
    * a re-appended epoch as LIVE — a windowed read over it answers from
    * the recreated slab; the guard's refusal is reserved for folded
    * epochs with no per-epoch rows left (the live-epoch refinement
    * below). */

  /** Create/replace an HLL register store at `path` with one epoch.
    * Layout: (epoch, bucket, register) parquet rows — the full m-row
    * spine per epoch — plus a layout record pinning `p` (the precision
    * defines both the bucket split and the rank width; epochs sketched at
    * different p cannot be merged and the mismatch is not recoverable
    * from the rows). Epoch ids are caller-assigned (a date, a batch id);
    * re-appending an epoch id is harmless for the ESTIMATE (max of a max)
    * but duplicates rows — the single-writer contract from the signature
    * store applies.
    */
  def writeHllStore(items: DataFrame, path: String, epoch: Long,
                    valueCol: String = "item", p: Int = 6): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    hllRegisters(items, valueCol, p)
      .select(lit(epoch).as("epoch"), col("bucket"), col("register"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"p=$p\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Whether an HLL store (with its layout record) exists at `path` —
    * the create-vs-append decision for incremental writers (the
    * streaming register sink uses it per first batch). */
  def hllStoreExists(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean = {
    val (fs, lp) = layoutFile(spark, path)
    fs.exists(lp)
  }

  /** Append one epoch's registers to an existing store. Fails loud when
    * the store has no layout record or was written at a different
    * precision — mixed-p registers silently estimate garbage. */
  def appendHllStore(items: DataFrame, path: String, epoch: Long,
                     valueCol: String = "item", p: Int = 6): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val kv = readStoreLayout(spark, path, "HLL", Set("p"),
      optionalKeys = Set(FoldedThroughKey))
    require(kv("p") == p.toString,
      s"HLL store at $path was written with (p=${kv("p")}), append " +
        s"requested (p=$p) — rebuild the store, mixed precisions cannot " +
        "merge")
    hllRegisters(items, valueCol, p)
      .select(lit(epoch).as("epoch"), col("bucket"), col("register"))
      .write.mode("append").parquet(path)
  }

  /** Merge a store's epochs (all, or the ones `epochFilter` keeps — e.g.
    * a date range for a "UV over the last 7 days" ask) into one
    * (m, harm_num, n_zero, estimate) row: MAX register per bucket across
    * epochs, then the shared estimator. The merge reads m rows per epoch
    * and shuffles m buckets — never anything corpus-sized. */
  def mergedHllEstimate(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        epochFilter: Column = lit(true)): DataFrame = {
    val kv = readStoreLayout(spark, path, "HLL", Set("p"),
      optionalKeys = Set(FoldedThroughKey))
    val rows = spark.read.parquet(path)
    guardFoldedWindow(spark, path, kv, epochFilter)
    val merged = rows
      .filter(epochFilter)
      .groupBy(col("bucket")).agg(max(col("register")).as("register"))
    estimateFromRegisters(merged, kv("p").toInt)
  }

  /** Quiesced compaction: fold every epoch's registers into ONE epoch
    * holding the per-bucket MAX — a long-running monitor appends one
    * m-row slab per micro-batch forever, so the merge read grows with
    * elapsed triggers while the useful content is bounded at m
    * registers. MAX-merge is idempotent and associative, so the
    * post-fold estimate is bit-identical (StreamingSpec pins it across
    * a mid-stream fold) and an at-least-once replay of the last batch
    * stays harmless. Single-writer while quiesced; park/rename swap. */
  def compactHllStore(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    recoverParked(spark, path)
    val kv = readStoreLayout(spark, path, "HLL", Set("p"),
      optionalKeys = Set(FoldedThroughKey))
    // MAX-merge is replay-idempotent, so unlike the ADD families the
    // watermark here exists for READERS, not appenders: it is the only
    // surviving witness that a historical epoch span was folded away
    // (r16 ADVICE — a windowed read over erased epochs must be
    // detectable, see guardFoldedWindow / storeFoldedThrough)
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path, withFoldWatermark(s"p=${kv("p")}", ft),
      spark.read.parquet(path)
        .groupBy(col("bucket")).agg(max(col("register")).as("register"))
        .select(lit(FoldEpoch).as("epoch"), col("bucket"),
          col("register")))
  }

  // ---------------------------------------------------------------------
  // Bloom filter: the OR-mergeable sketch, completing the merge-class
  // trio (HLL registers merge by MAX, histogram/count-min counters by
  // ADD, bloom words by bitwise OR). Deterministic: k salted 57-bit
  // fingerprints per value, bit positions mod m; the word relation
  // carries the full (m/64)-row spine so two filters merge with a plain
  // word-key BIT_OR. No false negatives by construction — the probe's
  // defining guarantee — and the false-positive rate is the sizing
  // contract, not a correctness one.
  // ---------------------------------------------------------------------

  /** Build an m-bit bloom filter (m = 2^bitsLog2) over the DISTINCT
    * values of `valueCol` as a (word ∈ [0, m/32), bits BIGINT) relation.
    * Words are 32 bits wide on purpose: the max shift is 31, so every
    * word value stays positive and both engines' shift/bit_count
    * semantics agree on the whole domain (a 64-bit word would need
    * `1 << 63`, which overflows DuckDB's signed shift). One
    * map-side-combined BIT_OR collapses the member scan into m/32
    * bounded words — the mergeable unit; nothing corpus-sized survives
    * the build. */
  def bloomWords(members: DataFrame, valueCol: String,
                 bitsLog2: Int = 12, k: Int = 3): DataFrame = {
    require(bitsLog2 >= 5 && bitsLog2 <= 30,
      s"bitsLog2 must be in [5, 30]: $bitsLog2")
    require(k >= 1 && k <= 8, s"k must be in [1, 8]: $k")
    val m = 1L << bitsLog2
    val spark = members.sparkSession
    val flat = (0 until k).map { j =>
      val p = pmod(salted(col(valueCol), s"|bf$j"), lit(m))
      members.select(shiftright(p, 5).as("word"), (p % 32).as("bit"))
    }.reduce(_ unionByName _)
    val words = flat
      .groupBy(col("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(bit AS INT)))").as("bits"))
    spark.range(m >> 5).select(col("id").as("word"))
      .join(words, Seq("word"), "left")
      .select(col("word"), coalesce(col("bits"), lit(0L)).as("bits"))
  }

  /** Probe every distinct `valueCol` of `probes` against a
    * [[bloomWords]] relation: `maybe` = all k bits set. The word
    * relation is bounded, so it broadcasts; each probe value costs k
    * bounded-side lookups and one per-value MIN — no shuffle wider than
    * the distinct probe set. */
  def bloomProbe(words: DataFrame, probes: DataFrame, valueCol: String,
                 bitsLog2: Int = 12, k: Int = 3): DataFrame = {
    require(bitsLog2 >= 5 && bitsLog2 <= 30,
      s"bitsLog2 must be in [5, 30]: $bitsLog2")
    require(k >= 1 && k <= 8, s"k must be in [1, 8]: $k")
    val m = 1L << bitsLog2
    val d = probes.select(col(valueCol)).distinct()
    val flat = (0 until k).map { j =>
      val p = pmod(salted(col(valueCol), s"|bf$j"), lit(m))
      d.select(col(valueCol), shiftright(p, 5).as("word"),
        (p % 32).as("bit"))
    }.reduce(_ unionByName _)
    flat.join(broadcast(words), Seq("word"))
      .groupBy(col(valueCol))
      .agg(min(expr("shiftright(bits, CAST(bit AS INT)) & 1"))
        .as("__allset"))
      .select(col(valueCol), (col("__allset") === 1).as("maybe"))
  }

  /** Bloom-pruned semi join — the filter-pushdown use of the sketch
    * inside a relational plan: build [[bloomWords]] over the dim keys,
    * collapse the bounded word relation into ONE array literal on the
    * driver (m/32 longs — the same bounded-relation-to-broadcast move as
    * the prefetched-map join, J10), filter the fact side PER ROW with k
    * shift-and-mask bit tests (no shuffle, no distinct — a scan-side
    * predicate the way engine-native bloom joins push it), then run the
    * exact semi join on the survivors. No false negatives ⇒ the pruned
    * result EQUALS the plain semi join (the q178 oracle checks exactly
    * that); false positives only cost residual-join work, bounded by the
    * measured FPR.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    bitsLog2: Int = 16, k: Int = 3): DataFrame = {
    val m = 1L << bitsLog2
    val words = bloomWords(dim.select(col(dimKey).as("item")), "item",
      bitsLog2, k)
    val arr = words.orderBy(col("word")).select(col("bits"))
      .collect().map(_.getLong(0))
    // The word array stays a LITERAL inside the filter expression —
    // never a projected column, which would materialize m/32 longs into
    // every row buffer (measured 7× on the fact scan). Variable shifts
    // don't exist as column ops, so the bit test is `word AND mask ≠ 0`
    // with the mask fetched from a 32-entry literal by bit index.
    val masks = (0 until 32).map(1L << _).toArray
    val cond = (0 until k).map { j =>
      val p = pmod(salted(col(factKey), s"|bf$j"), lit(m))
      val w = get(lit(arr), shiftright(p, 5).cast("int"))
      val mask = get(lit(masks), (p % 32).cast("int"))
      w.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
    fact.filter(cond)
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  // ---------------------------------------------------------------------
  // Persistent bloom store: the seen-before gate kept incrementally.
  // Each epoch (a day, a batch) persists its m/32 bounded words; any
  // epoch span merges with a word-key BIT_OR into one filter —
  // bit-identical to building over the union of the epochs' members
  // (OR is idempotent/commutative/associative), which is what the
  // parity test pins. Same trio shape as the HLL and histogram stores;
  // the layout record pins (bitsLog2, k) because neither is recoverable
  // from the rows and a mixed-geometry merge probes garbage.
  // ---------------------------------------------------------------------

  /** Create/replace a bloom word store at `path` with one epoch.
    * Layout: (epoch, word, bits) parquet rows — the full m/32-word
    * spine per epoch — plus a layout record pinning bitsLog2 and k. */
  def writeBloomStore(members: DataFrame, path: String, epoch: Long,
                      valueCol: String = "item", bitsLog2: Int = 12,
                      k: Int = 3): Unit = {
    val spark = members.sparkSession
    requireEpochId(epoch)
    bloomWords(members, valueCol, bitsLog2, k)
      .select(lit(epoch).as("epoch"), col("word"), col("bits"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"bits=$bitsLog2,k=$k\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Whether a bloom store (with its layout record) exists at `path`. */
  def bloomStoreExists(spark: org.apache.spark.sql.SparkSession,
                       path: String): Boolean = {
    val (fs, lp) = layoutFile(spark, path)
    fs.exists(lp)
  }

  /** Append one epoch's words to an existing store. Fails loud when the
    * store has no layout record or a different geometry. */
  def appendBloomStore(members: DataFrame, path: String, epoch: Long,
                       valueCol: String = "item", bitsLog2: Int = 12,
                       k: Int = 3): Unit = {
    val spark = members.sparkSession
    requireEpochId(epoch)
    val kv = readStoreLayout(spark, path, "bloom", Set("bits", "k"),
      optionalKeys = Set(FoldedThroughKey))
    require(kv("bits") == bitsLog2.toString && kv("k") == k.toString,
      s"bloom store at $path was written with (bits=${kv("bits")}," +
        s"k=${kv("k")}), append requested (bits=$bitsLog2,k=$k) — " +
        "rebuild the store, mixed geometries cannot merge")
    bloomWords(members, valueCol, bitsLog2, k)
      .select(lit(epoch).as("epoch"), col("word"), col("bits"))
      .write.mode("append").parquet(path)
  }

  /** Merge a store's epochs (all, or an `epochFilter` span) into one
    * word relation with a word-key BIT_OR — m/32 rows per epoch read,
    * m/32 shuffled, never anything corpus-sized. */
  def mergedBloomWords(spark: org.apache.spark.sql.SparkSession,
                       path: String,
                       epochFilter: Column = lit(true)): DataFrame = {
    val kv = readStoreLayout(spark, path, "bloom", Set("bits", "k"),
      optionalKeys = Set(FoldedThroughKey)) // fail loud
    val rows = spark.read.parquet(path)
    guardFoldedWindow(spark, path, kv, epochFilter)
    rows
      .filter(epochFilter)
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
  }

  /** Probe `probes` against the merged span of a bloom store — reads
    * the geometry from the layout record so the probe hashes can never
    * desynchronize from the build. */
  def mergedBloomProbe(spark: org.apache.spark.sql.SparkSession,
                       path: String, probes: DataFrame,
                       valueCol: String = "item",
                       epochFilter: Column = lit(true)): DataFrame = {
    val kv = readStoreLayout(spark, path, "bloom", Set("bits", "k"),
      optionalKeys = Set(FoldedThroughKey))
    bloomProbe(mergedBloomWords(spark, path, epochFilter), probes,
      valueCol, kv("bits").toInt, kv("k").toInt)
  }

  /** Quiesced compaction: fold every epoch's words into ONE epoch
    * holding the per-word BIT_OR — OR-merge is idempotent, so the
    * post-fold probe set is bit-identical and a replayed last batch
    * re-ORs harmlessly. Same single-writer + park/rename contract as
    * every store fold. */
  def compactBloomStore(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit = {
    recoverParked(spark, path)
    val kv = readStoreLayout(spark, path, "bloom", Set("bits", "k"),
      optionalKeys = Set(FoldedThroughKey))
    // OR-merge is replay-idempotent — the watermark is the readers'
    // fold witness, not an append guard (see compactHllStore)
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path,
      withFoldWatermark(s"bits=${kv("bits")},k=${kv("k")}", ft),
      spark.read.parquet(path)
        .groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))
        .select(lit(FoldEpoch).as("epoch"), col("word"), col("bits")))
  }

  // ---------------------------------------------------------------------
  // Fixed-bin histogram quantiles: the add-mergeable companion to the
  // max-mergeable HLL registers. One map-side-combined pass collapses the
  // stream into `bins` bounded counters; quantiles read off the cumulative
  // with a DIVISION-FREE probe (cum·100 ≥ pct·total — no float ratio on
  // the comparison path), so the whole relation is oracle-checkable.
  // Exactness statement: the estimate is the upper edge of the bin the
  // true quantile falls in — error ≤ one bin width by construction,
  // chosen at declaration time, not data-dependent. Mergeable because
  // counters ADD (epochs union by summing), which is what the store
  // below exploits.
  // ---------------------------------------------------------------------

  /** The full bins-row histogram relation (bin ∈ [0, bins), cnt — zero
    * rows included via the spine, so two histograms merge with a plain
    * bucket-key SUM). Bin = floor((v − lo)/width) clamped to the grid;
    * the one double division per row is a single deterministic op. */
  def histogramBins(items: DataFrame, valueCol: String,
                    lo: Double, width: Double, bins: Int): DataFrame = {
    require(bins >= 2 && width > 0, s"bad grid: bins=$bins width=$width")
    val spark = items.sparkSession
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(bins - 1L))
    val h = items.select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    spark.range(bins).select(col("id").as("bin"))
      .join(h, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Quantile probe over a histogram relation: for each integer percent,
    * the smallest bin whose cumulative covers it (cum·100 ≥ pct·total —
    * all-integer), with the estimate as that bin's upper edge. With
    * `groupCols` the probe runs per group (the cumulative window
    * partitions on them); ungrouped, the window runs over the BINS-row
    * sketch relation — bounded at declaration time, which is why a
    * global-ordered window is fine here and nowhere else. The probe
    * needs no empty-bin spine: the cumulative only rises at nonempty
    * bins, so the smallest crossing bin is always a nonempty one. */
  def quantilesFromBins(binsDf: DataFrame, lo: Double, width: Double,
                        pcts: Seq[Int],
                        groupCols: Seq[String] = Nil): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in [1, 100]: $pcts")
    val spark = binsDf.sparkSession
    import org.apache.spark.sql.expressions.Window
    val base =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val w = base.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = base.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // persist + eager materialize: `c` feeds BOTH the probe and the
    // join-back; without it Spark recomputes the whole subtree — the
    // fact-table histogram build included — under each branch (a lazy
    // persist is also computed once per branch, the Dedup lesson). The
    // cached relation is the bins-row sketch (× groups), trivially
    // small; released by the caller's CacheScope.
    val c = graft.core.CacheScope.track(binsDf.select(
      groupCols.map(col) ++ Seq(col("bin"), col("cnt"),
        sum(col("cnt")).over(w).as("cum"),
        sum(col("cnt")).over(wAll).as("total")): _*).persist())
    c.count()
    val p = spark.createDataFrame(pcts.map(Tuple1(_))).toDF("pct")
    p.join(c, col("cum") * 100 >= col("pct") * col("total"))
      .groupBy(groupCols.map(col) :+ col("pct"): _*)
      .agg(min(col("bin")).as("bin"))
      .join(c, groupCols :+ "bin")
      .select(groupCols.map(col) ++ Seq(
        col("pct").cast("long").as("pct"), col("bin"),
        col("cum").as("cum_cnt"), col("total").as("total_cnt"),
        ((col("bin") + 1).cast("double") * lit(width) + lit(lo))
          .as("est")): _*)
  }

  /** Per-group fixed-bin histogram quantiles in one pass: the grouped
    * build collapses to (groups × bins) bounded counters map-side; the
    * probe partitions its windows on the group columns. No spine —
    * see [[quantilesFromBins]] for why the probe never needs one. */
  def groupedHistogramQuantiles(items: DataFrame, groupCols: Seq[String],
                                valueCol: String, lo: Double,
                                width: Double, bins: Int,
                                pcts: Seq[Int]): DataFrame =
    quantilesFromBins(
      groupedHistogramBins(items, groupCols, valueCol, lo, width, bins),
      lo, width, pcts, groupCols)

  /** The grouped build alone: (groupCols..., bin, cnt) counters, one
    * map-side-combined aggregate, no empty-bin spine (the probe never
    * needs one — see [[quantilesFromBins]] — and the store would only
    * carry dead rows). */
  def groupedHistogramBins(items: DataFrame, groupCols: Seq[String],
                           valueCol: String, lo: Double,
                           width: Double, bins: Int): DataFrame = {
    require(bins >= 2 && width > 0, s"bad grid: bins=$bins width=$width")
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(bins - 1L))
    items.select(groupCols.map(col) :+ bin.as("bin"): _*)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** One-pass histogram quantiles: build + probe. */
  def histogramQuantiles(items: DataFrame, valueCol: String,
                         lo: Double, width: Double, bins: Int,
                         pcts: Seq[Int]): DataFrame =
    quantilesFromBins(histogramBins(items, valueCol, lo, width, bins),
      lo, width, pcts)

  /** Create/replace a histogram store: (epoch, bin, cnt) parquet with a
    * layout record pinning (lo, width, bins) — mixed grids sum garbage
    * and the grid is not recoverable from rows. Same single-writer and
    * epoch conventions as the HLL store; NOTE the merge discipline
    * differs (counters ADD, so a replayed epoch id WOULD double-count —
    * epoch ids must be exactly-once here, e.g. the idempotent batchId
    * dedup below). */
  def writeHistStore(items: DataFrame, path: String, epoch: Long,
                     valueCol: String, lo: Double, width: Double,
                     bins: Int): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    histogramBins(items, valueCol, lo, width, bins)
      .select(lit(epoch).as("epoch"), col("bin"), col("cnt"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"lo=$lo,width=$width,bins=$bins\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append one epoch's histogram; fails loud on grid mismatch or a
    * reused epoch id (ADD-merged counters double-count on replay, unlike
    * the HLL registers — the store enforces what the algebra cannot
    * forgive). */
  def appendHistStore(items: DataFrame, path: String, epoch: Long,
                      valueCol: String, lo: Double, width: Double,
                      bins: Int): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val kv = readStoreLayout(spark, path, "histogram",
      Set("lo", "width", "bins"), HistHints, Set(FoldedThroughKey))
    val recorded = s"lo=${kv("lo")},width=${kv("width")},bins=${kv("bins")}"
    val requested = s"lo=$lo,width=$width,bins=$bins"
    require(recorded == requested,
      s"histogram store at $path was written with ($recorded), append " +
        s"requested ($requested) — rebuild, mixed grids sum garbage")
    // two replay guards, one per regime: the watermark covers epochs a
    // fold erased (their rows can no longer witness the duplicate), the
    // row probe covers live epochs
    kv.get(FoldedThroughKey).foreach(ft => require(epoch > ft.toLong,
      s"epoch $epoch was folded into the baseline of $path (watermark " +
        s"$ft) — ADD-merged counters double-count on replay; use a " +
        "fresh epoch id above the watermark"))
    val dup = readStoreRows(spark, path,
        "epoch BIGINT, bin BIGINT, cnt BIGINT")
      .filter(col("epoch") === epoch).limit(1).count()
    require(dup == 0L,
      s"epoch $epoch already present in $path — ADD-merged counters " +
        "double-count on replay; use a fresh epoch id")
    histogramBins(items, valueCol, lo, width, bins)
      .select(lit(epoch).as("epoch"), col("bin"), col("cnt"))
      .write.mode("append").parquet(path)
  }

  /** Merge a store's epochs (optionally filtered) by bucket-key SUM and
    * probe the quantiles — reads bins rows per epoch, never the data. */
  def mergedHistQuantiles(spark: org.apache.spark.sql.SparkSession,
                          path: String, pcts: Seq[Int],
                          epochFilter: Column = lit(true)): DataFrame = {
    // an ungrouped merge over a GROUPED store would silently sum across
    // segments (a real relation, the wrong question) — HistHints refuses
    val kv = readStoreLayout(spark, path, "histogram",
      Set("lo", "width", "bins"), HistHints, Set(FoldedThroughKey))
    val (lo, width) = (kv("lo").toDouble, kv("width").toDouble)
    val rows = readStoreRows(spark, path,
      "epoch BIGINT, bin BIGINT, cnt BIGINT")
    guardFoldedWindow(spark, path, kv, epochFilter)
    val merged = rows
      .filter(epochFilter)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    quantilesFromBins(merged, lo, width, pcts)
  }

  /** Quiesced compaction: fold every epoch's counters into ONE baseline
    * at [[FoldEpoch]] holding the per-bin SUM. Counter addition is
    * associative, so the post-fold quantiles are bit-identical. The
    * exactly-once append rule survives the fold LOUDLY: the layout
    * gains a `folded_through` watermark (the max id folded away), and
    * appends at or below it fail with the watermark — a fold must not
    * quietly turn a replayed id into a double count just because its
    * witness rows are gone. */
  def compactHistStore(spark: org.apache.spark.sql.SparkSession,
                       path: String): Unit = {
    recoverParked(spark, path)
    val kv = readStoreLayout(spark, path, "histogram",
      Set("lo", "width", "bins"), HistHints, Set(FoldedThroughKey))
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path,
      withFoldWatermark(
        s"lo=${kv("lo")},width=${kv("width")},bins=${kv("bins")}", ft),
      readStoreRows(spark, path, "epoch BIGINT, bin BIGINT, cnt BIGINT")
        .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
        .select(lit(FoldEpoch).as("epoch"), col("bin"), col("cnt")))
  }

  /** The watermark a full fold records: the max live epoch id folded
    * away, carried forward monotonically across repeated folds (an
    * empty store keeps the previous watermark). */
  private def foldWatermark(spark: org.apache.spark.sql.SparkSession,
                            path: String,
                            kv: Map[String, String]): Long = {
    val prev = kv.get(FoldedThroughKey).map(_.toLong)
      .getOrElse(FoldEpoch)
    val row = readStoreRows(spark, path, "epoch BIGINT")
      .agg(max(col("epoch").cast("long"))).head()
    if (row.isNullAt(0)) prev else math.max(prev, row.getLong(0))
  }

  /** The fold watermark recorded in ANY graft store's layout, if the
    * store has ever been compacted: every epoch at or below it was
    * merged into the [[FoldEpoch]] baseline and no longer exists as
    * per-epoch rows. Windowed readers slicing history on a store that
    * also gets compacted should consult this before trusting an epoch
    * span. Family-agnostic on purpose: it reads the raw layout record
    * without the key-set identity check, because "was this compacted"
    * is a question every family answers the same way. */
  def storeFoldedThrough(spark: org.apache.spark.sql.SparkSession,
                         path: String): Option[Long] = {
    val (fs, lp) = layoutFile(spark, path)
    if (!fs.exists(lp)) None
    else {
      val in = fs.open(lp)
      val recorded = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      recorded.split(",").map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == FoldedThroughKey => v.toLong
      }.filter(_ >= 0L)
      // negative = a pre-r17 nothing-to-fold compaction's vestigial
      // record; "was anything folded away" is No
    }
  }

  /** Post-fold window guard (r16 ADVICE, tightened by the r17 review):
    * a fold erases the per-epoch rows at or below the recorded
    * `folded_through` watermark, so an epoch window that claims any
    * folded id can only return empty/partial data — the span's own rows
    * were merged into the [[FoldEpoch]] baseline. The guard refuses
    * exactly when it can PROVE the overlap: the filter rejects the
    * baseline (a read including the baseline legitimately sees the
    * whole folded history) AND accepts at least one epoch in [0, ft] —
    * point-evaluated against a local range with limit(1), no store
    * read. Windows entirely above the watermark pass even when they
    * match nothing (a dashboard polling the current epoch before its
    * append lands must get its empty answer, not an error — the
    * r17-review false positive). Watermarks below zero (a compaction
    * that had nothing to fold) arm nothing.
    *
    * Proof cost, by domain size (the r17 VERDICT #3 refinement): below
    * 2^25 the probe is the EXACT [0, ft] range pass — a few ms of
    * codegen for batch-id and yyyymmdd-style domains (21001231 < 2^25).
    * For larger domains (unix seconds/millis epochs), where the exact
    * pass would scan billions of synthetic rows on every read, the probe
    * degrades to a SAMPLED one: the endpoints, a dense run at each end
    * of [0, ft], and a linear grid across it — ~48k local points, so any
    * folded-window claim wider than ft/2^14 (about 30 h of millis for a
    * 2026 unix-millis watermark, seconds-wide for a unix-seconds one) or
    * touching either end is still PROVEN and refused. A sampled miss
    * passes: refusal only ever fires on proof, so the dashboard-poll
    * empty window can never false-refuse; undetected narrow interior
    * windows fall back to the documented skip path (the layout still
    * carries the watermark; callers have [[storeFoldedThrough]]). A
    * filter that references non-epoch columns (legal against the full
    * store schema) cannot be point-evaluated against the synthetic
    * one-column frames — AnalysisException from the probe falls back to
    * the unguarded read for the same reason (r17 ADVICE), never to a
    * spurious unresolved-column error. And a below-watermark epoch an
    * idempotent-family replay RE-APPENDED is live again — the refusal
    * consults the store's actual epoch set and fires only for claimed
    * epochs with no per-epoch rows left (r17 ADVICE's false-refusal
    * class). */
  private[ops] def guardFoldedWindow(
      spark: org.apache.spark.sql.SparkSession, path: String,
      kv: Map[String, String], epochFilter: Column): Unit =
    kv.get(FoldedThroughKey).map(_.toLong)
      .filter(_ >= 0L).foreach { ft =>
      try {
        val seesBaseline = !spark.range(1)
          .select(lit(FoldEpoch).as("epoch"))
          .filter(epochFilter).isEmpty
        if (!seesBaseline) {
          val probes =
            if (ft < (1L << 25))
              spark.range(0L, ft + 1).select(col("id").as("epoch"))
            else {
              // endpoints + dense runs at both ends + a 2^14 grid:
              // every probe point is genuinely in [0, ft], so a hit is
              // a real folded-id claim, never a false positive
              val dense = 1L << 14
              val step = ft / dense
              val ends = spark.range(0L, dense.min(ft + 1)).toDF("id")
              val tail = spark.range((ft - dense).max(0L), ft + 1)
                .toDF("id")
              val grid = spark.range(0L, dense)
                .select((col("id") * step).as("id"))
              ends.union(tail).union(grid).select(col("id").as("epoch"))
            }
          val accepted = probes.filter(epochFilter)
          val claimsBelowWatermark = !accepted.limit(1).isEmpty
          // live-epoch refinement (r17 ADVICE): an idempotent-family
          // replay may have re-appended an already-folded epoch, whose
          // complete slab is then LIVE again — a window over it answers
          // real rows and must pass. Refuse only when the filter claims
          // a below-watermark id with NO per-epoch rows in the store.
          // The live set is O(#epochs) — sketch stores hold bounded
          // slabs per epoch, never corpora — and is consulted only on
          // the (rare) would-refuse path.
          val claimsFolded = claimsBelowWatermark && {
            val live = scala.util.Try(
              spark.read.parquet(path).select(col("epoch").cast("long"))
                .filter(col("epoch") >= 0L && col("epoch") <= ft)
                .distinct().collect().map(_.getLong(0)).toSet)
              .getOrElse(Set.empty[Long])
            live.isEmpty ||
              !accepted.filter(!col("epoch").isInCollection(live))
                .limit(1).isEmpty
          }
          require(!claimsFolded,
            s"epoch window over $path accepts epochs at or below the " +
              s"fold watermark $ft but excludes the $FoldEpoch baseline " +
              s"— the store was folded through epoch $ft and those " +
              s"epochs' rows no longer exist per-epoch; include epoch " +
              s"$FoldEpoch for the full folded history, or use epochs " +
              s"above $ft")
        }
      } catch {
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }

  /** Create/replace a GROUPED histogram store: (epoch, <group>, bin,
    * cnt) parquet with a layout record pinning the grid AND the group
    * column — per-segment latency/size quantiles over epoch spans, the
    * dashboard the ungrouped store cannot answer (r14 next-round item).
    * Counters ADD on merge, so epoch ids are exactly-once here too. */
  def writeGroupedHistStore(items: DataFrame, path: String, epoch: Long,
                            groupCol: String, valueCol: String,
                            lo: Double, width: Double, bins: Int): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    groupedHistogramBins(items, Seq(groupCol), valueCol, lo, width, bins)
      .select(lit(epoch).as("epoch"), col(groupCol), col("bin"), col("cnt"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"lo=$lo,width=$width,bins=$bins,group=$groupCol\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append one epoch's grouped histogram; fails loud on a grid or
    * group-column mismatch and on a reused epoch id (ADD-merged
    * counters double-count on replay — the ungrouped store's rule). */
  def appendGroupedHistStore(items: DataFrame, path: String, epoch: Long,
                             groupCol: String, valueCol: String,
                             lo: Double, width: Double, bins: Int): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val kv = readStoreLayout(spark, path, "grouped histogram",
      Set("lo", "width", "bins", "group"), GroupedHistHints,
      Set(FoldedThroughKey))
    val recorded = s"lo=${kv("lo")},width=${kv("width")}," +
      s"bins=${kv("bins")},group=${kv("group")}"
    val requested = s"lo=$lo,width=$width,bins=$bins,group=$groupCol"
    require(recorded == requested,
      s"grouped histogram store at $path was written with ($recorded), " +
        s"append requested ($requested) — rebuild, mixed layouts sum " +
        "garbage")
    kv.get(FoldedThroughKey).foreach(ft => require(epoch > ft.toLong,
      s"epoch $epoch was folded into the baseline of $path (watermark " +
        s"$ft) — ADD-merged counters double-count on replay; use a " +
        "fresh epoch id above the watermark"))
    val dup = readStoreRows(spark, path,
        s"epoch BIGINT, `$groupCol` STRING, bin BIGINT, cnt BIGINT")
      .filter(col("epoch") === epoch).limit(1).count()
    require(dup == 0L,
      s"epoch $epoch already present in $path — ADD-merged counters " +
        "double-count on replay; use a fresh epoch id")
    groupedHistogramBins(items, Seq(groupCol), valueCol, lo, width, bins)
      .select(lit(epoch).as("epoch"), col(groupCol), col("bin"), col("cnt"))
      .write.mode("append").parquet(path)
  }

  /** Merge a grouped store's epochs by (group, bin) SUM and probe the
    * per-group quantiles — reads (groups × bins) rows per epoch, never
    * the data; bit-identical to [[groupedHistogramQuantiles]] over the
    * union of everything the epochs saw (counter addition is exactly
    * re-counting). */
  def mergedGroupedHistQuantiles(spark: org.apache.spark.sql.SparkSession,
                                 path: String, pcts: Seq[Int],
                                 epochFilter: Column = lit(true))
  : DataFrame = {
    val kv = readStoreLayout(spark, path, "grouped histogram",
      Set("lo", "width", "bins", "group"), GroupedHistHints,
      Set(FoldedThroughKey))
    val (lo, width, g) =
      (kv("lo").toDouble, kv("width").toDouble, kv("group"))
    val rows = readStoreRows(spark, path,
      s"epoch BIGINT, `${kv("group")}` STRING, bin BIGINT, cnt BIGINT")
    guardFoldedWindow(spark, path, kv, epochFilter)
    val merged = rows
      .filter(epochFilter)
      .groupBy(col(g), col("bin")).agg(sum(col("cnt")).as("cnt"))
    quantilesFromBins(merged, lo, width, pcts, Seq(g))
  }

  /** [[compactHistStore]] for the grouped grid: per-(group, bin) SUM
    * into the [[FoldEpoch]] baseline; same loud `folded_through`
    * watermark on post-fold appends. */
  def compactGroupedHistStore(spark: org.apache.spark.sql.SparkSession,
                              path: String): Unit = {
    recoverParked(spark, path)
    val kv = readStoreLayout(spark, path, "grouped histogram",
      Set("lo", "width", "bins", "group"), GroupedHistHints,
      Set(FoldedThroughKey))
    val g = kv("group")
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path,
      withFoldWatermark(
        s"lo=${kv("lo")},width=${kv("width")},bins=${kv("bins")}," +
          s"group=$g", ft),
      readStoreRows(spark, path,
          s"epoch BIGINT, `$g` STRING, bin BIGINT, cnt BIGINT")
        .groupBy(col(g), col("bin")).agg(sum(col("cnt")).as("cnt"))
        .select(lit(FoldEpoch).as("epoch"), col(g), col("bin"),
          col("cnt")))
  }

  // ---------------------------------------------------------------------
  // KMV / theta sketch: the UNION-mergeable bottom-k distinct sketch —
  // the fourth merge class (HLL registers MAX, counters ADD, bloom words
  // OR; bottom-k sets merge by set-UNION then re-trim). It exists for
  // the set-algebra gap HLL leaves open: HLL intersections go through
  // inclusion–exclusion (q177), compounding the error of THREE
  // estimates and collapsing entirely for small overlaps; the theta
  // form estimates |A ∩ B| DIRECTLY by counting intersection hashes
  // below one shared threshold. Deterministic on the shared mix57
  // domain, exact integer arithmetic throughout, so the sketch
  // CONTENTS — the kept hashes themselves — are oracle-checkable.
  // ---------------------------------------------------------------------

  /** Bottom-k distinct-hash relation of `valueCol`: the k smallest
    * DISTINCT salted mix57 hashes (fewer rows when the input has fewer
    * distinct values — the sketch is then EXACT). `orderBy(h).limit(k)`
    * plans as TakeOrderedAndProject: per-partition bounded heaps of k
    * longs, never a global sort — the whole sketch is O(k) state however
    * large the corpus, which is what makes it a 100 TB operator.
    */
  def kmvHashes(items: DataFrame, valueCol: String = "item",
                k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    // NULL values are EXCLUDED from the sketch domain (the COUNT
    // DISTINCT convention the HLL twin already follows): a NULL hashes
    // to a NULL h, which Spark's ASC sort puts FIRST and DuckDB's puts
    // LAST — without this filter a single NULL silently occupies a
    // bottom-k slot on one engine and not the other
    items.select(salted(col(valueCol), "|kmv").as("h"))
      .filter(col("h").isNotNull)
      .distinct().orderBy(col("h")).limit(k)
  }

  /** One-row KMV distinct estimate: (k, n_kept, theta, estimate,
    * n_exact). Saturated (n_kept = k): theta is the k-th smallest hash
    * and `estimate = (k−1)·2^57 div theta` — the classic k-minimum-values
    * estimator, with theta itself excluded from the support (the k−1).
    * Unsaturated: the sketch holds EVERY distinct hash, so the estimate
    * is n_kept exactly (hash collisions aside, vanishing in a 2^57
    * domain — and deterministic, so both engines agree bit-for-bit
    * either way). `(k−1)·2^57` overflows a BIGINT from k = 65 up, so the
    * product runs as DECIMAL(38,0) on Spark / HUGEINT in the oracle (the
    * q223 device); `div` keeps the quotient exact integer arithmetic.
    * `n_exact` is the audited true distinct count, carried like q140's.
    */
  def kmvEstimate(items: DataFrame, valueCol: String = "item",
                  k: Int = 256): DataFrame = {
    val sketch = kmvHashes(items, valueCol, k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"))
    val exact = items.agg(countDistinct(col(valueCol)).as("n_exact"))
    sketch.crossJoin(exact)
      .select(lit(k.toLong).as("k"), col("n_kept"), col("theta"),
        kmvEstimateCol(k).as("estimate"), col("n_exact"))
  }

  /** The one KMV estimator expression over (n_kept, theta) — shared by
    * the one-shot, grouped, and store-merged forms so the three can
    * never drift. */
  private def kmvEstimateCol(k: Int): Column =
    when(col("n_kept") < k, col("n_kept"))
      .otherwise(expr(s"(cast(${k - 1} as decimal(38,0)) * $MixMod) " +
        "div theta"))

  /** Grouped KMV — [[kmvEstimate]] per group key (the q161 treatment
    * for the bottom-k sketch): each group keeps its k smallest distinct
    * hashes via the range-partitioned two-phase grouped rank
    * ([[Scale.groupedRankOrdered]] — a plain
    * `row_number over (partition by group)` funnels a low-cardinality
    * group's ENTIRE distinct-hash set through one task, the exact
    * failure that helper exists for; a Double-scored bounded aggregator
    * is out too, a 57-bit hash does not fit a Double). Output one row
    * per group: (group, k, n_kept, theta, estimate, n_exact) with the
    * same saturated/exact regimes as the ungrouped form. A group whose
    * values are all NULL emits (k, 0, null, 0, 0) — the row
    * [[kmvEstimate]] returns on that group's data alone, so the
    * grouped==one-shot-per-group equivalence holds for every group.
    */
  def groupedKmvEstimate(items: DataFrame, groupCol: String,
                         valueCol: String = "item",
                         k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    // cutoverRows = 0: the trim input here is one cheap projection +
    // distinct with a SINGLE consumer, the regime where the r19 rank
    // cutover's probe+persist is pure overhead — same-JVM conf-flip A/B
    // on q236 measured the cutover path 0.642 s vs 0.433 s two-phase
    // (6 alternating rounds), while the matrix path below keeps the
    // default (q238's flip measured the cutover WINNING 1.337 vs
    // 1.972 s). Row-identical either way (the device's contract).
    val sketch = groupedKmvHashes(items, groupCol, valueCol, k,
        cutoverRows = 0L)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"))
    val exact = items.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    // sketch LEFT-joined onto the exact group spine: a group whose
    // values are all NULL has no hashes (NULLs are outside the sketch
    // domain) but IS a group — it must surface as (k, 0, null, 0, 0),
    // exactly what kmvEstimate returns on that group's data alone (the
    // r14 ADVICE equivalence gap: an inner join silently dropped it)
    exact.join(sketch, Seq(groupCol), "left")
      .select(col(groupCol), lit(k.toLong).as("k"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("theta"),
        col("n_exact"))
      .select(col(groupCol), col("k"), col("n_kept"), col("theta"),
        kmvEstimateCol(k).as("estimate"), col("n_exact"))
  }

  /** Per-group bottom-k distinct-hash relation (groupCol, h) — the
    * grouped twin of [[kmvHashes]], shared by [[groupedKmvEstimate]]'s
    * sketch leg and the overlap matrix. Per-group trim goes through the
    * range-partitioned two-phase grouped rank
    * ([[graft.ops.Scale.groupedRankOrdered]]), never a plain per-group
    * window: a low-cardinality group would funnel its entire
    * distinct-hash set through one task. */
  def groupedKmvHashes(items: DataFrame, groupCol: String,
                       valueCol: String = "item",
                       k: Int = 256,
                       cutoverRows: Long =
                         graft.ops.Scale.RankCutoverFromConf): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val hashes = items
      .select(col(groupCol), salted(col(valueCol), "|kmv").as("h"))
      .filter(col("h").isNotNull) // NULLs excluded — see kmvHashes
      .distinct()
    graft.ops.Scale
      .groupedRankOrdered(hashes, Seq(groupCol), Seq("h"), "__rn",
        cutoverRows)
      .filter(col("__rn") <= k)
      .select(col(groupCol), col("h"))
  }

  /** Pairwise theta-sketch overlap MATRIX over a per-group bottom-k
    * hash relation — the audience-overlap dashboard at pure sketch
    * cost (r14 next-round item): one row per unordered group pair
    * (g_a < g_b) with the pair's own min threshold and the direct
    * intersection/union estimates, exactly [[thetaAlgebra]] run on
    * every pair at once. Everything after the input runs on bounded
    * relations: thresholds are |G| rows, the pair spine |G|² (the
    * matrix is meaningful for dashboard-scale group counts — event
    * types, cohorts, segments — not for million-key domains), and every
    * join below touches ≤ |G|·k hash rows.
    *
    * Output: (g_a, g_b, k, theta, n_inter, est_inter, n_union,
    * est_union), with `n_union = below_a + below_b − n_inter` (hash
    * sets are distinct within a group, so the inclusion–exclusion on
    * COUNTS is exact — unlike the cardinality estimates q177 chains).
    *
    * `maxGroups` is the loud bound on the |G|² pair spine (the store
    * guard discipline): a caller pointing the matrix at a million-key
    * group column gets an error carrying the count, not a silent
    * 10¹²-row cross join. Raise it deliberately for a genuinely large
    * dashboard; the spine cost is quadratic in it.
    */
  def thetaOverlapMatrix(hashes: DataFrame, groupCol: String,
                         k: Int, maxGroups: Int = 4096): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val h = hashes.select(col(groupCol).as("g"), col("h"))
      .localCheckpoint(true) // ≤ |G|·k rows, read four times below
    val th = h.groupBy(col("g"))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__max"))
      .select(col("g"),
        when(col("__n") < k, lit(MixMod)).otherwise(col("__max")).as("__t"))
      .localCheckpoint(true) // |G| rows: counted once, joined twice
    val nG = th.count()
    require(nG <= maxGroups,
      s"thetaOverlapMatrix: $nG groups would build a ${nG * nG}-row " +
        s"pair spine (maxGroups = $maxGroups) — the matrix is " +
        "quadratic in the group count; raise maxGroups only for a " +
        "deliberately large dashboard")
    val pairs = th.select(col("g").as("g_a"), col("__t").as("__ta"))
      .join(th.select(col("g").as("g_b"), col("__t").as("__tb")),
        col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        least(col("__ta"), col("__tb")).as("theta"))
      .localCheckpoint(true) // |G|² rows
    val belowA = h.join(broadcast(pairs),
        col("g") === col("g_a") && col("h") < col("theta"))
      .groupBy(col("g_a"), col("g_b")).agg(count(lit(1)).as("__nba"))
    val belowB = h.join(broadcast(pairs),
        col("g") === col("g_b") && col("h") < col("theta"))
      .groupBy(col("g_a"), col("g_b")).agg(count(lit(1)).as("__nbb"))
    val inter = h.as("x")
      .join(broadcast(h.as("y")),
        col("x.h") === col("y.h") && col("x.g") < col("y.g"))
      .join(broadcast(pairs), col("x.g") === col("g_a") &&
        col("y.g") === col("g_b") && col("x.h") < col("theta"))
      .groupBy(col("g_a"), col("g_b")).agg(count(lit(1)).as("__ni"))
    // assembly joins are all |G|²-bounded — broadcast them explicitly so
    // the static plan already shows the shape AQE would pick at runtime
    pairs
      .join(broadcast(belowA), Seq("g_a", "g_b"), "left")
      .join(broadcast(belowB), Seq("g_a", "g_b"), "left")
      .join(broadcast(inter), Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"), lit(k.toLong).as("k"), col("theta"),
        coalesce(col("__ni"), lit(0L)).as("n_inter"),
        (coalesce(col("__nba"), lit(0L)) + coalesce(col("__nbb"), lit(0L))
          - coalesce(col("__ni"), lit(0L))).as("n_union"))
      .select(col("g_a"), col("g_b"), col("k"), col("theta"),
        col("n_inter"),
        expr(s"(cast(n_inter as decimal(38,0)) * $MixMod) div theta")
          .as("est_inter"),
        col("n_union"),
        expr(s"(cast(n_union as decimal(38,0)) * $MixMod) div theta")
          .as("est_union"))
  }

  /** The overlap matrix straight from data, with exact audit columns —
    * [[kmvIntersection]] lifted to every group pair: per-pair exact
    * intersection by one value-keyed self-join of the distinct
    * (group, value) relation and exact union by count
    * inclusion–exclusion. The audit legs are the only corpus-sized
    * paths (the value self-join fans out by groups-per-value, bounded
    * by |G|); the estimating path collapses to ≤ |G|·k hashes map-side
    * first. Groups with no in-domain (non-NULL) value have no sketch
    * and no audience — they are absent from the matrix. */
  def groupedKmvOverlapMatrix(items: DataFrame, groupCol: String,
                              valueCol: String = "item",
                              k: Int = 256,
                              maxGroups: Int = 4096): DataFrame = {
    val est = thetaOverlapMatrix(
      groupedKmvHashes(items, groupCol, valueCol, k), groupCol, k,
      maxGroups)
    val du = items.select(col(groupCol).as("g"), col(valueCol).as("v"))
      .filter(col("v").isNotNull).distinct().localCheckpoint(true)
    val exInter = du.as("x")
      .join(du.as("y"), col("x.v") === col("y.v") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("g_a"), col("y.g").as("g_b"))
      .agg(count(lit(1)).as("__ei"))
    val ng = du.groupBy(col("g")).agg(count(lit(1)).as("__n"))
    val spine = ng.select(col("g").as("g_a"), col("__n").as("__na"))
      .join(ng.select(col("g").as("g_b"), col("__n").as("__nb")),
        col("g_a") < col("g_b"))
    val exact = spine.join(broadcast(exInter), Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"),
        coalesce(col("__ei"), lit(0L)).as("exact_inter"),
        (col("__na") + col("__nb") - coalesce(col("__ei"), lit(0L)))
          .as("exact_union"))
    est.join(broadcast(exact), Seq("g_a", "g_b"))
  }

  /** Direct theta-sketch set algebra over two KMV sketches: one row
    * (k, theta, n_inter, est_inter, n_union, est_union, exact_inter,
    * exact_union). theta = min of the two sketches' thresholds (a
    * saturated sketch's k-th hash; an unsaturated sketch kept everything,
    * so its threshold is the full domain 2^57); below theta BOTH sketches
    * are complete samples of their sets, so
    * `est = n_below · 2^57 div theta` estimates intersection and union
    * alike — and degrades to EXACT counts when both sketches are
    * unsaturated (theta = 2^57 makes the div an identity). One shared
    * threshold, one estimate — not inclusion–exclusion's three.
    *
    * 100 TB posture: each side collapses to ≤ k hashes map-side
    * (TakeOrderedAndProject) before anything joins; the set algebra and
    * the 1-row threshold run on ≤ 2k rows. The exact audit columns are
    * two distinct-aggregates over the inputs — drop them (they are the
    * only corpus-sized legs) when the sketch is the point.
    */
  def kmvIntersection(a: DataFrame, b: DataFrame,
                      valueCol: String = "item", k: Int = 256): DataFrame = {
    // NULLs are outside the sketch domain (see kmvHashes); keep the
    // exact audit columns on the same domain or they disagree with the
    // estimates they certify
    val da = a.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
    val db = b.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
    val exInter = da.intersect(db).agg(count(lit(1)).as("exact_inter"))
    val exUnion = da.union(db).distinct().agg(count(lit(1)).as("exact_union"))
    thetaAlgebra(kmvHashes(a, valueCol, k), kmvHashes(b, valueCol, k), k)
      .crossJoin(exInter).crossJoin(exUnion)
  }

  /** The theta-threshold set algebra over two already-built bottom-k
    * hash relations (one column `h` each): (k, theta, n_inter,
    * est_inter, n_union, est_union) — [[kmvIntersection]]'s estimating
    * core without the corpus-sized exact-audit legs, which is exactly
    * what a STORED sketch can compute (the store never retained the
    * data). */
  def thetaAlgebra(hashesA: DataFrame, hashesB: DataFrame,
                   k: Int): DataFrame = {
    val (theta, belowA, belowB) = thetaBelow(hashesA, hashesB, k)
    val nInter = belowA.intersect(belowB).agg(count(lit(1)).as("n_inter"))
    val nUnion = belowA.union(belowB).distinct()
      .agg(count(lit(1)).as("n_union"))
    theta.crossJoin(nInter).crossJoin(nUnion)
      .select(lit(k.toLong).as("k"), col("theta"),
        col("n_inter"),
        expr(s"(cast(n_inter as decimal(38,0)) * $MixMod) div theta")
          .as("est_inter"),
        col("n_union"),
        expr(s"(cast(n_union as decimal(38,0)) * $MixMod) div theta")
          .as("est_union"))
  }

  /** The shared theta-threshold prologue of the set algebra: the 1-row
    * min threshold and each side's below-theta hash set. Factored so
    * [[thetaAlgebra]] and [[thetaDifference]] can never disagree on
    * what theta is. */
  private def thetaBelow(hashesA: DataFrame, hashesB: DataFrame, k: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    // localCheckpoint, not persist: each side is ≤ k rows but read three
    // times (threshold, below-theta, set algebra), and the long-lived
    // monitor path (kmvStoreOverlap polled per quiesce) runs OUTSIDE any
    // CacheScope — a persist there accumulates cache entries forever,
    // where checkpoint blocks free with the reference
    val ha = hashesA.localCheckpoint(true)
    val hb = hashesB.localCheckpoint(true)
    def thetaOf(h: DataFrame, as: String) =
      h.agg(count(lit(1)).as("__n"), max(col("h")).as("__max"))
        .select(when(col("__n") < k, lit(MixMod))
          .otherwise(col("__max")).as(as))
    val theta = thetaOf(ha, "__ta").crossJoin(thetaOf(hb, "__tb"))
      .select(least(col("__ta"), col("__tb")).as("theta"))
    val belowA = ha.crossJoin(broadcast(theta)).filter(col("h") < col("theta"))
      .select(col("h"))
    val belowB = hb.crossJoin(broadcast(theta)).filter(col("h") < col("theta"))
      .select(col("h"))
    (theta, belowA, belowB)
  }

  /** Theta-sketch set DIFFERENCE over two bottom-k hash relations —
    * the algebra [[thetaAlgebra]] left open (r14 next-round item): below
    * the shared threshold both sketches are complete samples, so the
    * EXCEPT counts estimate |A∖B| and |B∖A| with the same one-threshold
    * estimator, degrading to exact when both sides are unsaturated.
    * Output: one row (k, theta, n_only_a, est_only_a, n_only_b,
    * est_only_b). The identity `n_only_a + n_only_b + n_inter = n_union`
    * holds by construction (the spec pins it against [[thetaAlgebra]]).
    */
  def thetaDifference(hashesA: DataFrame, hashesB: DataFrame,
                      k: Int): DataFrame = {
    val (theta, belowA, belowB) = thetaBelow(hashesA, hashesB, k)
    val nOnlyA = belowA.except(belowB).agg(count(lit(1)).as("n_only_a"))
    val nOnlyB = belowB.except(belowA).agg(count(lit(1)).as("n_only_b"))
    theta.crossJoin(nOnlyA).crossJoin(nOnlyB)
      .select(lit(k.toLong).as("k"), col("theta"),
        col("n_only_a"),
        expr(s"(cast(n_only_a as decimal(38,0)) * $MixMod) div theta")
          .as("est_only_a"),
        col("n_only_b"),
        expr(s"(cast(n_only_b as decimal(38,0)) * $MixMod) div theta")
          .as("est_only_b"))
  }

  /** [[kmvIntersection]]'s difference twin: the theta-sketch estimates
    * of |A∖B| and |B∖A| with the exact audit counts beside them (the
    * only corpus-sized legs — drop them when the sketch is the point).
    * NULLs are outside the sketch domain, exactly as in
    * [[kmvIntersection]]. */
  def kmvDifference(a: DataFrame, b: DataFrame,
                    valueCol: String = "item", k: Int = 256): DataFrame = {
    val da = a.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
    val db = b.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
    val exA = da.except(db).agg(count(lit(1)).as("exact_only_a"))
    val exB = db.except(da).agg(count(lit(1)).as("exact_only_b"))
    thetaDifference(kmvHashes(a, valueCol, k), kmvHashes(b, valueCol, k), k)
      .crossJoin(exA).crossJoin(exB)
  }

  /** The merged bottom-k hash relation of a KMV store (all epochs, or
    * an `epochFilter` span) — the stored-sketch twin of [[kmvHashes]],
    * reading ≤ k rows per epoch. */
  def mergedKmvHashes(spark: org.apache.spark.sql.SparkSession,
                      path: String,
                      epochFilter: Column = lit(true)): DataFrame = {
    val kv = kmvLayoutKv(spark, path)
    guardFoldedWindow(spark, path, kv, epochFilter)
    mergedHashesAtK(spark, path, kv("k").toInt, epochFilter)
  }

  private def mergedHashesAtK(spark: org.apache.spark.sql.SparkSession,
                              path: String, k: Int,
                              epochFilter: Column): DataFrame =
    readStoreRows(spark, path, "epoch BIGINT, h BIGINT")
      .filter(epochFilter)
      .select(col("h")).distinct().orderBy(col("h")).limit(k)

  /** Direct theta-sketch overlap of two KMV STORES — the q226 row
    * (minus the exact-audit columns no store can provide) computed
    * entirely from ≤ 2k stored hashes. Fails loud when the stores were
    * written at different k (their thresholds would not be comparable
    * sample rates). */
  def kmvStoreOverlap(spark: org.apache.spark.sql.SparkSession,
                      pathA: String, pathB: String,
                      epochFilter: Column = lit(true)): DataFrame = {
    val kvA = kmvLayoutKv(spark, pathA)
    val kvB = kmvLayoutKv(spark, pathB)
    val (ka, kb) = (kvA("k").toInt, kvB("k").toInt)
    require(ka == kb, s"KMV stores disagree on k ($ka vs $kb) — " +
      "their bottom-k sets are different sample rates and cannot overlap")
    guardFoldedWindow(spark, pathA, kvA, epochFilter)
    guardFoldedWindow(spark, pathB, kvB, epochFilter)
    thetaAlgebra(mergedHashesAtK(spark, pathA, ka, epochFilter),
      mergedHashesAtK(spark, pathB, ka, epochFilter), ka)
  }

  /** Create/replace a KMV store at `path` with one epoch: (epoch, h)
    * parquet rows — the epoch's bottom-k hash set — plus a layout record
    * pinning `k` (an epoch sketched at a smaller k may have DROPPED
    * hashes the merged bottom-k needs; mixed-k stores silently
    * under-estimate, so the mismatch fails loud on append, exactly the
    * HLL store's p discipline). Replaying an epoch id is harmless for
    * the estimate — the merge is a set union and duplicates vanish in
    * the distinct — making this store at-least-once-tolerant like the
    * HLL one (the MG store is the strict outlier, by construction). */
  def writeKmvStore(items: DataFrame, path: String, epoch: Long,
                    valueCol: String = "item", k: Int = 256): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    kmvHashes(items, valueCol, k)
      .select(lit(epoch).as("epoch"), col("h"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"k=$k\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Whether a KMV store (with its layout record) exists at `path`. */
  def kmvStoreExists(spark: org.apache.spark.sql.SparkSession,
                     path: String): Boolean = {
    val (fs, lp) = layoutFile(spark, path)
    fs.exists(lp)
  }

  // the layout filename is shared across store families — a KMV call
  // pointed at an HLL store (layout "p=6") must say "not a KMV store",
  // not throw a bare NumberFormatException (readStoreLayout's exact
  // key-set validation is what enforces this for every family)
  private def kmvLayoutKv(spark: org.apache.spark.sql.SparkSession,
                          path: String): Map[String, String] =
    readStoreLayout(spark, path, "KMV", Set("k"),
      optionalKeys = Set(FoldedThroughKey))

  private def readKmvK(spark: org.apache.spark.sql.SparkSession,
                       path: String): Int =
    kmvLayoutKv(spark, path)("k").toInt

  /** Append one epoch's bottom-k hashes; fails loud on a k mismatch. */
  def appendKmvStore(items: DataFrame, path: String, epoch: Long,
                     valueCol: String = "item", k: Int = 256): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val recorded = readKmvK(spark, path)
    require(recorded == k,
      s"KMV store at $path was written with (k=$recorded), append " +
        s"requested (k=$k) — rebuild the store, mixed k cannot merge")
    kmvHashes(items, valueCol, k)
      .select(lit(epoch).as("epoch"), col("h"))
      .write.mode("append").parquet(path)
  }

  /** Merge a store's epochs (all, or an `epochFilter` span) into one
    * estimate row. Any hash among the k smallest of the merged span is
    * among the k smallest of its own epoch, so the union of per-epoch
    * bottom-k sets CONTAINS the true bottom-k of the union — distinct +
    * re-trim recovers it exactly, and the merged estimate is
    * bit-identical to one-shot sketching everything the epochs saw. The
    * merge reads ≤ k rows per epoch, never the corpora. (No `n_exact`
    * column: the store deliberately does not retain the data that would
    * compute one.) */
  def mergedKmvEstimate(spark: org.apache.spark.sql.SparkSession,
                        path: String,
                        epochFilter: Column = lit(true)): DataFrame = {
    val kv = kmvLayoutKv(spark, path)
    val k = kv("k").toInt
    guardFoldedWindow(spark, path, kv, epochFilter)
    mergedHashesAtK(spark, path, k, epochFilter)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"))
      .select(lit(k.toLong).as("k"), col("n_kept"), col("theta"),
        kmvEstimateCol(k).as("estimate"))
  }

  /** Quiesced compaction: fold every epoch's bottom-k slab into ONE
    * epoch holding the merged bottom-k set (union + re-trim, exactly
    * the [[mergedKmvEstimate]] read) — set union is idempotent, so the
    * post-fold estimate is bit-identical and a replayed last batch
    * re-unions harmlessly. */
  def compactKmvStore(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    recoverParked(spark, path)
    val kv = kmvLayoutKv(spark, path)
    val k = kv("k").toInt
    // set-union merge is replay-idempotent — the watermark is the
    // readers' fold witness, not an append guard (see compactHllStore)
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path, withFoldWatermark(s"k=$k", ft),
      mergedHashesAtK(spark, path, k, lit(true))
        .select(lit(FoldEpoch).as("epoch"), col("h")))
  }

  // ---------------------------------------------------------------------
  // Grouped KMV store: (epoch, <group>, h) rows — per-segment bottom-k
  // sketches that merge by per-group set-union + re-trim, feeding the
  // overlap MATRIX without ever re-reading a corpus. Same union-merge
  // at-least-once tolerance as the ungrouped store; the layout record
  // pins BOTH k and the group column (rows from a different grouping
  // would silently cross-pollinate segments).
  // ---------------------------------------------------------------------

  /** Create/replace a grouped KMV store: one epoch's per-group bottom-k
    * hash sets plus a `gk=<k>,group=<col>` layout record (the `gk=`
    * prefix keeps [[readKmvK]] failing loud when an ungrouped call is
    * pointed here, and vice versa). */
  def writeGroupedKmvStore(items: DataFrame, path: String, epoch: Long,
                           groupCol: String, valueCol: String = "item",
                           k: Int = 256): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    groupedKmvHashes(items, groupCol, valueCol, k)
      .select(lit(epoch).as("epoch"), col(groupCol), col("h"))
      .write.mode("overwrite").parquet(path)
    val (fs, lp) = layoutFile(spark, path)
    val out = fs.create(lp, true)
    try out.write(s"gk=$k,group=$groupCol\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append one epoch's per-group bottom-k hashes; fails loud on a k or
    * group-column mismatch. Epoch replay is harmless (set union). */
  def appendGroupedKmvStore(items: DataFrame, path: String, epoch: Long,
                            groupCol: String, valueCol: String = "item",
                            k: Int = 256): Unit = {
    val spark = items.sparkSession
    requireEpochId(epoch)
    val (rk, rg) = readGroupedKmvLayout(spark, path)
    require(rk == k && rg == groupCol,
      s"grouped KMV store at $path was written with (k=$rk, group=$rg), " +
        s"append requested (k=$k, group=$groupCol) — rebuild the store")
    groupedKmvHashes(items, groupCol, valueCol, k)
      .select(lit(epoch).as("epoch"), col(groupCol), col("h"))
      .write.mode("append").parquet(path)
  }

  /** The merged per-group bottom-k relation of a grouped KMV store:
    * union the epochs' sets, re-trim to k per group. Any hash among a
    * group's merged bottom-k is among that group's bottom-k in some
    * epoch, so the re-trim recovers exactly the one-shot grouped sketch
    * of everything the epochs saw (the [[mergedKmvEstimate]] argument,
    * per group). The window here is a plain per-group row_number — fine
    * ONLY because its input is the STORE relation (≤ epochs·k rows per
    * group by construction), never a corpus. */
  def mergedGroupedKmvHashes(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             epochFilter: Column = lit(true)): DataFrame = {
    val kv = groupedKmvLayoutKv(spark, path)
    val (k, g) = (kv("gk").toInt, kv("group"))
    guardFoldedWindow(spark, path, kv, epochFilter)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(g)).orderBy(col("h"))
    readStoreRows(spark, path, s"epoch BIGINT, `$g` STRING, h BIGINT")
      .filter(epochFilter)
      .select(col(g), col("h")).distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(g), col("h"))
  }

  /** The pairwise audience-overlap matrix of a grouped KMV store —
    * [[thetaOverlapMatrix]] over the merged per-group bottom-k sets:
    * every segment pair's direct intersection/union estimate from ≤
    * |G|·k stored hashes, no corpus anywhere (the store never retained
    * one). */
  def groupedKmvStoreOverlapMatrix(spark: org.apache.spark.sql.SparkSession,
                                   path: String,
                                   epochFilter: Column = lit(true))
  : DataFrame = {
    val (k, g) = readGroupedKmvLayout(spark, path)
    thetaOverlapMatrix(mergedGroupedKmvHashes(spark, path, epochFilter),
      g, k)
  }

  /** Quiesced compaction of a grouped KMV store — the crawl-delta fold
    * applied here (r15 next-round item): a long-running monitor appends
    * one (epoch, group, h) slab per micro-batch FOREVER, so the merge
    * read grows with elapsed triggers even though each group's useful
    * content is bounded at k hashes. This folds every accumulated epoch
    * into ONE epoch holding each group's merged bottom-k set (union +
    * re-trim — exactly [[mergedGroupedKmvHashes]], so the post-fold
    * matrix is bit-identical; StreamingSpec pins it across a mid-stream
    * compaction). The folded baseline lands at the
    * reserved [[FoldEpoch]] id, so an at-least-once replay of the last
    * batch after the fold re-unions next to it (harmless), never
    * collides with it. Same single-writer contract as every
    * store fold: run while the stream is quiesced. The swap runs under
    * the park/rename/crash-recover protocol — a crash mid-swap leaves
    * either the old store or the folded one, never a torn dir. */
  def compactGroupedKmvStore(spark: org.apache.spark.sql.SparkSession,
                             path: String): Unit = {
    recoverParked(spark, path)
    val kv = groupedKmvLayoutKv(spark, path)
    val (k, g) = (kv("gk").toInt, kv("group"))
    // set-union merge is replay-idempotent — the watermark is the
    // readers' fold witness, not an append guard (see compactHllStore)
    val ft = foldWatermark(spark, path, kv)
    swapFolded(spark, path,
      withFoldWatermark(s"gk=$k,group=$g", ft),
      mergedGroupedKmvHashes(spark, path)
        .select(lit(FoldEpoch).as("epoch"), col(g), col("h")))
  }

  private def groupedKmvLayoutKv(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Map[String, String] =
    readStoreLayout(spark, path, "grouped KMV", Set("gk", "group"),
      optionalKeys = Set(FoldedThroughKey))

  private def readGroupedKmvLayout(spark: org.apache.spark.sql.SparkSession,
                                   path: String): (Int, String) = {
    val kv = groupedKmvLayoutKv(spark, path)
    (kv("gk").toInt, kv("group"))
  }

  /** The standard HLL bias-correction constant — a Scala-side double,
    * interpolated into the oracle as its exact decimal round-trip (the
    * q70 plane-literal device), so both engines multiply the identical
    * double. */
  def hllAlpha(m: Long): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }
}
