package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Ranking

/** Board/item co-occurrence statistics — the reference's
  * `flink-itemcf/src/main/java/com/wufuqiang/itemcf/huaban/ShuJuStat.java`.
  *
  * Pipeline: (item, board) pairs exploded from the `boardsList` JSON array
  * (`:54-72`), distinct, per-board and per-item counts (`:76-77`), then for
  * every ordered item pair sharing a board emit
  * `boardIdCount(board) + itemIdCount(second)` and sum over boards
  * (`:85-107`), finally per-item descending top lists + size histogram
  * (`:109-147`).
  *
  * Faithfulness note (SURVEY §7.3): the reference's `flag` is never set
  * false, so `boardIdCount` is reassigned on every row of the group — which
  * is observably identical to taking the group's constant per-board count,
  * so the relational form below diverges nowhere.
  */
object BoardStats {

  /** A5 fixture parse: one JSON object per line with `itemId` and a
    * `boardsList` array of `{boardId}` objects → exploded (item, board)
    * rows; unparseable lines dropped (`ShuJuStat.java:54-72`).
    */
  def fromJsonLines(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val schema = StructType(Seq(
      StructField("itemId", StringType),
      StructField("boardsList", ArrayType(StructType(Seq(
        StructField("boardId", StringType)))))))
    lines.select(from_json(col(lineCol), schema).as("j"))
      .filter(col("j").isNotNull && col("j.itemId").isNotNull)
      .select(col("j.itemId").as("item"),
        explode(col("j.boardsList")).as("b"))
      .select(col("item"), col("b.boardId").as("board"))
  }

  /** Pair weights: weight(a,b) = Σ over shared boards of
    * (boardCount(board) + itemCount(b)). All-integer arithmetic.
    *
    * `maxPerBoard` (0 = unbounded) caps how many items per board enter the
    * pairing self-join — the hot-key guard: a board with M items fans out
    * M² pairs, quadratic in the hottest board at 100×. The per-board and
    * per-item counts are still computed over ALL rows (the weights of the
    * surviving pairs are exact); only pair GENERATION is bounded, keeping
    * the first `maxPerBoard` items in id order per board. Boards at or
    * under the cap are untouched (ScaleSpec pins the equivalence).
    */
  def pairWeights(itemBoard: DataFrame, maxPerBoard: Int = 0): DataFrame = {
    val hb = graft.core.CacheScope.track(
      itemBoard.select("item", "board").distinct().persist())
    hb.count() // shared by four subplans; eager so the scan runs once
    val bc = hb.groupBy("board").agg(count(lit(1)).as("board_count"))
    val ic = hb.groupBy("item").agg(count(lit(1)).as("item_count"))
    val pairSrc =
      if (maxPerBoard <= 0) hb
      else hb.withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("board").orderBy("item")))
        .filter(col("__rn") <= maxPerBoard).drop("__rn")
    val a = pairSrc.select(col("item").as("a"), col("board"))
    val b = pairSrc.select(col("item").as("b"), col("board"))
    a.join(b, Seq("board")).filter(col("a") =!= col("b"))
      .join(broadcast(bc), Seq("board"))
      .join(broadcast(ic.select(col("item").as("b"), col("item_count"))), Seq("b"))
      .groupBy("a", "b")
      .agg(sum(col("board_count") + col("item_count")).as("weight"))
  }

  /** Per-item descending "b:weight,…" top list (`ShuJuStat.java:109-124`). */
  def topLists(weights: DataFrame, cap: Int = 400, minLen: Int = 0): DataFrame =
    Ranking.orderedConcat(weights, Seq(col("a")), col("weight"), col("b"),
      concat_ws(":", col("b"), col("weight")), cap, minLen, as = "toplist")

  /** The quDuan size histogram (`ShuJuStat.java:126-147`). */
  def sizeHistogram(weights: DataFrame): DataFrame =
    Ranking.sizeHistogram(
      weights.groupBy("a").agg(count(lit(1)).as("sz")), col("sz"),
      Seq(400, 300, 200, 100, 90, 80, 70, 60, 50, 40, 30, 20, 10, 0))
}
