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
