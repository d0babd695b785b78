package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ranking

/** Item-based collaborative filtering — the reference's densest pipeline
  * (`flink-itemcf/src/main/java/com/wufuqiang/itemcf/ItemIdCfVersion5.java:119-285`):
  * parse→distinct→per-user positional pairing with distance decay→pair-weight
  * sum→cosine normalization against per-item user counts→per-item descending
  * top list→size histogram.
  *
  * Spark-first re-expression: the reference's `groupBy(user).sortGroup(time)
  * .reduceGroup` pairing (an O(L²) in-heap loop per user) becomes a positional
  * self-join plus window expressions — same algebra, but it shuffles once on
  * `user`, stays in whole-stage codegen, and AQE can split a skewed user's
  * partition. Per-user event counts are bounded (~tens-to-hundreds in the
  * reference's 24h windows and in the test data), so the L² pair fan-out is
  * bounded per key; at 100 TB you'd cap L per user (top-N most recent) before
  * pairing, which the reference effectively does via its 24h scan window.
  */
object ItemCf {

  /** Interactions (user, item, ts) from the `events` table — `props.k` plays
    * the reference's `itemId` (JSON field extraction, as the reference's
    * fastjson parse at `ItemIdCfVersion5.java:123-140`), `detailPageShow`
    * filter becomes `event_type = 'click'`. Distinct mirrors `:143`.
    */
  def interactions(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("ts"))
      .filter(col("item").isNotNull)
      .distinct()

  /** Per-user positional pairs with the reference's distance decay
    * (`ItemIdCfVersion5.java:162-167`): items sorted by time within user get
    * positions 1..L; a pair at positional distance d scores 1.0 if d ≤ n,
    * else exp((n−d)/(2n+1)).
    *
    * Position ties on `ts` are broken by `item` so the pairing is a total
    * order (the reference's `sortGroup` leaves tie order undefined —
    * documented divergence for determinism).
    *
    * Output: one row per user per ordered position pair (i < j):
    * (user_id, a = item at i, b = item at j, i, j, score).
    *
    * `maxPerUser` (0 = unbounded) keeps only the N most-recent events per
    * user before pairing — the 100× hot-key guard: a user with L events
    * fans out L²/2 pairs, so one bot account with 10⁶ clicks would emit
    * 5·10¹¹ rows. The reference gets the same bound implicitly from its
    * 24 h scan window. Groups at or under the cap are untouched
    * (ScaleSpec pins the equivalence).
    */
  def positionalPairs(inter: DataFrame, n: Int, maxPerUser: Int = 0): DataFrame = {
    val bounded =
      if (maxPerUser <= 0) inter
      else inter.withColumn("__rn", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("ts").desc, col("item").desc)))
        .filter(col("__rn") <= maxPerUser).drop("__rn")
    val pos = bounded.withColumn("pos", row_number().over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("item"))))
    val l = pos.select(col("user_id"), col("item").as("a"), col("pos").as("i"))
    val r = pos.select(col("user_id"), col("item").as("b"), col("pos").as("j"))
    l.join(r, Seq("user_id"))
      .filter(col("i") < col("j") && col("a") =!= col("b"))
      .withColumn("dist", col("j") - col("i"))
      .withColumn("score",
        when(col("dist") <= n, lit(1.0))
          .otherwise(exp((lit(n) - col("dist")) / lit(2 * n + 1).cast("double"))))
      .drop("dist")
  }

  /** Faithful increment-emission pair weights (`ItemIdCfVersion5.java:168-192`,
    * the SURVEY §7.3 "A9 hard part"): per (user, oriented pair) in iteration
    * order (i asc, j asc) the reference emits a score only when it strictly
    * exceeds the running max of previously seen scores for that key, then
    * sums the emissions — so a pair's weight is the sum of successive maxima,
    * NOT the max. Both emission directions of one oriented key see identical
    * sequences, so weight(a→b) = S(a,b) + S(b,a) where S is the per-oriented-
    * key emitted sum; the result is symmetric.
    *
    * Expressed relationally: emitted(score) ⇔ score > max(score) over
    * preceding rows of the (user, a, b) key ordered by (i, j) — one window
    * expression instead of the reference's in-heap HashMap.
    */
  def cooccurrenceDecay(inter: DataFrame, n: Int,
                        maxPerUser: Int = 0): DataFrame = {
    val pairs = positionalPairs(inter, n, maxPerUser)
    val w = Window.partitionBy("user_id", "a", "b").orderBy("i", "j")
      .rowsBetween(Window.unboundedPreceding, -1)
    val emitted = pairs
      .withColumn("prev_max", max(col("score")).over(w))
      .filter(col("prev_max").isNull || col("score") > col("prev_max"))
      .groupBy("a", "b").agg(sum("score").as("s"))
    // weight(a,b) = S(a,b) + S(b,a), emitted for both directions. Sum the
    // two orientations on the UNORDERED key once and explode both output
    // directions: the previous `emitted union mirrored` re-planned (and
    // re-executed) the whole L² pair fan-out + running-max window under
    // each union branch — the most expensive subtree in the job, paid
    // twice for a two-row sum (guide §2.4: duplicated subtrees). Sums of
    // exactly two doubles are commutative, so the weights are
    // bit-identical to the union form.
    emitted
      .groupBy(least(col("a"), col("b")).as("__x"),
        greatest(col("a"), col("b")).as("__y"))
      .agg(sum(col("s")).as("together_count"))
      .select(explode(array(
          struct(col("__x").as("a"), col("__y").as("b")),
          struct(col("__y").as("a"), col("__x").as("b")))).as("__p"),
        col("together_count"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"),
        col("together_count"))
  }

  /** Plain symmetric co-occurrence (the `ItemIdCf.java:107-124` un-decayed
    * variant): count of users that interacted with both items, both
    * directions emitted.
    */
  def cooccurrenceSimple(inter: DataFrame): DataFrame = {
    val ui = inter.select("user_id", "item").distinct()
    val l = ui.select(col("user_id"), col("item").as("a"))
    val r = ui.select(col("user_id"), col("item").as("b"))
    // the count is direction-symmetric: generate each unordered pair ONCE
    // (a < b — half the join fan-out into the aggregate) and explode both
    // output directions after the count. Row-identical to the a =!= b
    // double-emission form.
    l.join(r, Seq("user_id")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("together_count"))
      .select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("__p"),
        col("together_count"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"),
        col("together_count"))
  }

  /** Cosine normalization (`ItemIdCfVersion5.java:194-218`): score =
    * togetherCount / sqrt(countUsers(a) * countUsers(b)), via two joins
    * against the per-item distinct-user counts. The counts side is tiny
    * (one row per item) → broadcast both joins; no shuffle of the pair table.
    */
  def cosineScores(cooc: DataFrame, inter: DataFrame): DataFrame = {
    val counts = inter.select("user_id", "item").distinct()
      .groupBy("item").agg(count(lit(1)).as("ucount"))
    cooc
      .join(broadcast(counts.select(col("item").as("a"), col("ucount").as("ca"))), "a")
      .join(broadcast(counts.select(col("item").as("b"), col("ucount").as("cb"))), "b")
      .withColumn("score",
        col("together_count").cast("double") /
          sqrt((col("ca") * col("cb")).cast("double")))
      .select("a", "b", "together_count", "score")
  }

  /** Per-item descending-score top list, reference output format `item_id2:
    * score,id3:score,...` built at `ItemIdCfVersion5.java:221-240,283`;
    * list bounds from the Redis publishing contract (cap 400 / min 20,
    * `flink-process/.../sink/hdfs2redis/Hdfs2RedisVersion5.java:84-91`).
    * Tie-break on neighbor id keeps it deterministic.
    */
  def topLists(scores: DataFrame, cap: Int = 400, minLen: Int = 0): DataFrame =
    Ranking.orderedConcat(scores, Seq(col("a")), col("score"), col("b"),
      col("b").cast("string"), cap, minLen, as = "toplist")

  /** Top lists in the reference's full `id:score` value format
    * (`ItemIdCfVersion5.java:231`). */
  def topListsWithScores(scores: DataFrame, cap: Int = 400,
                         minLen: Int = 0): DataFrame =
    Ranking.orderedConcat(scores, Seq(col("a")), col("score"), col("b"),
      concat_ws(":", col("b"), col("score")), cap, minLen, as = "toplist")

  /** The "quDuan" size histogram eyeball-check
    * (`ItemIdCfVersion5.java:242-278`). */
  def sizeHistogram(scores: DataFrame): DataFrame =
    Ranking.sizeHistogram(
      scores.groupBy("a").agg(count(lit(1)).as("sz")), col("sz"),
      Seq(400, 300, 200, 100, 90, 80, 70, 60, 50, 40, 30, 20, 10, 0))
}
