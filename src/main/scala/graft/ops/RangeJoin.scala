package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — all (left, right) pairs with the same key whose
  * timestamps satisfy `r.ts ∈ [l.ts + lowerMs, l.ts + upperMs]` (the
  * stream-join shape Flink exposes as `intervalJoin`; Spark has no native
  * operator).
  *
  * Scale design: the naive form is an equi-join on the key with the range
  * as a post-filter — a full per-key cross product before filtering, which
  * detonates on hot keys. Here time is bucketed at the window width: each
  * right row lands in one bucket, each left row probes only the buckets
  * its window overlaps (≤ 2 when the width equals the span), and the join
  * key becomes (key, bucket) — a hot key's rows spread over its time range
  * instead of meeting in one reducer, and the residual range filter runs
  * on bounded buckets. Bucket ids are the floored epoch-ms multiples, pure
  * long arithmetic (no double division).
  */
object RangeJoin {

  private def floorTo(ms: Column, w: Long): Column = ms - pmod(ms, lit(w))

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   lowerMs: Long, upperMs: Long): DataFrame = {
    require(upperMs >= lowerMs, "upper bound must be >= lower bound")
    val w = math.max(upperMs - lowerMs, 1L)
    val lms = unix_millis(col(leftTs))
    val rms = unix_millis(col(rightTs))
    val l = left
      .withColumn("__lms", lms)
      .withColumn("__b", explode(sequence(
        floorTo(col("__lms") + lit(lowerMs), w),
        floorTo(col("__lms") + lit(upperMs), w),
        lit(w))))
    val r = right
      .withColumn("__rms", rms)
      .withColumn("__b", floorTo(col("__rms"), w))
    l.join(r, keys :+ "__b")
      .filter(col("__rms") >= col("__lms") + lit(lowerMs) &&
        col("__rms") <= col("__lms") + lit(upperMs))
      .drop("__b", "__lms", "__rms")
  }
}
