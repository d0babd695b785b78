package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the classic time-series lookup
  * Spark has no native operator for: for every left row, attach the right
  * row with the greatest `rightTs` ≤ `leftTs` within the same key (left
  * semantics: unmatched left rows keep null payloads).
  *
  * Scale design — composed from existing operators, no custom physical
  * node needed (preference (a) of the custom-operator ladder): a naive
  * formulation is either a per-row correlated subquery or an exploding
  * range join; instead both sides are tagged and UNIONed, shuffled ONCE on
  * the key, sorted ONCE on (ts, side), and the payload is carried forward
  * with `last(..., ignoreNulls)` over the preceding-rows window — the
  * distributed merge-scan form. Right rows sort before left rows at equal
  * timestamps, so a right row exactly at `leftTs` matches (the standard
  * `l.ts >= r.ts` ASOF contract).
  *
  * Payload columns are packed into one struct before the window so all
  * returned fields come from the SAME right row (per-column last() could
  * mix rows when some payload fields are null). Right side should be
  * unique per (key, ts) — pre-aggregate otherwise; left/right non-key
  * column names must not collide (pre-select/rename as needed).
  */
object AsOf {

  /** Nearest-event join — the BIDIRECTIONAL as-of: for every left row,
    * the right row minimizing |rightTs − leftTs| within the key, ties
    * (equal distance both directions) to the BACKWARD match, null
    * payloads when the key has no right rows at all. Same merge-scan
    * design as [[joinAsOf]] — one shuffle on the key, one sort, the
    * backward candidate carried by `last(ignoreNulls)` over preceding
    * rows and the forward candidate by `first(ignoreNulls)` over
    * following rows, then ONE comparison picks the nearer — never a
    * per-key cross product. Timestamps must be NUMERIC (epoch ms): the
    * pick needs distance arithmetic, not just ordering. Right rows must
    * be unique per (key, ts) — pre-aggregate otherwise (equal-ts right
    * rows have no deterministic last()). A right row exactly at leftTs
    * counts as backward (distance 0, wins).
    */
  def joinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  payload: Seq[String]): DataFrame = {
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).cast("long").as("__ts"),
        struct((col(rightTs).cast("long").as("__nts") +:
          payload.map(col)): _*).as("__p"),
        lit(0).as("__side")): _*)
    val l = left.withColumn("__ts", col(leftTs).cast("long"))
      .withColumn("__side", lit(1))
    val merged = r.unionByName(l, allowMissingColumns = true)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prev = col("__prev")
    val next = col("__next")
    val pick = when(prev.isNull, next)
      .when(next.isNull, prev)
      .when(col("__ts") - prev.getField("__nts") <=
        next.getField("__nts") - col("__ts"), prev)
      .otherwise(next)
    val leftCols: Seq[Column] = left.columns.toSeq.map(col)
    merged
      .withColumn("__prev", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__next", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__pick", pick)
      .select(leftCols ++
        payload.map(p => col(s"__pick.$p").as(p)): _*)
  }

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"),
        struct(payload.map(col): _*).as("__p"), lit(0).as("__side")): _*)
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val merged = r.unionByName(l, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols: Seq[Column] = left.columns.toSeq.map(col)
    merged
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
