package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectations-shaped gate a training
  * pipeline runs before shipping a dataset (the Deequ/Great-Expectations
  * capability re-expressed as one Spark aggregate): every rule is a (name,
  * violation predicate) pair and the report is one row per rule with its
  * violation count next to the row total.
  *
  * 100 TB posture: ALL rules evaluate in ONE scan — conditional sums inside
  * a single hash aggregate (map-side combined, whole-stage codegen), never
  * one pass per rule; key-uniqueness checks ride the same aggregate as
  * `count − count_distinct`. The unpivot to report rows happens on the
  * single aggregated row, so it is free.
  */
object Audit {

  /** One report row per rule: (rule, violations, n_rows). `rowRules` are
    * violation predicates evaluated per row (a NULL predicate result counts
    * as a violation — an unexpected NULL is exactly what an audit must not
    * silently pass); `uniqueKeys` adds a `duplicate_<col>` rule per listed
    * column counting rows beyond the first per key value. Rows ordered by
    * rule name — a total order, so the report is hash-deterministic. */
  def audit(df: DataFrame, rowRules: Seq[(String, Column)],
            uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty, "no rules given")
    val ruleAggs = rowRules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(s"__v_$name")
    }
    val keyAggs = uniqueKeys.map { k =>
      (count(lit(1)) - count_distinct(col(k))).as(s"__v_duplicate_$k")
    }
    val allAggs = ruleAggs ++ keyAggs :+ count(lit(1)).as("__total")
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    val names = rowRules.map(_._1) ++ uniqueKeys.map(k => s"duplicate_$k")
    one.select(explode(array(names.map { n =>
        struct(lit(n).as("rule"), col(s"__v_$n").as("violations"),
          col("__total").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.violations").cast("long").as("violations"),
        col("r.n_rows").cast("long").as("n_rows"))
      .orderBy("rule")
  }
}
