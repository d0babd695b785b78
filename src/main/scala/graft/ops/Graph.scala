package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms beyond the connected-components fixpoint
  * (graft.llm.Dedup.connectedComponents): rank propagation done the way a
  * 100 TB Spark job has to do it — edge-partitioned joins, bounded
  * per-round state, lineage truncated every iteration.
  */
object Graph {

  /** Integer-arithmetic PageRank — engine-exact by construction: ranks
    * live in integer micro-units (vertex mass starts at `unit` = 10¹²)
    * and every propagation step is integer multiply/divide —
    * `contrib = (r · 85) div (100 · out_degree)` — so there is no
    * floating-point sum anywhere and the result is bit-identical under
    * any partitioning, shuffle order, or engine (the same reasoning as
    * the DECIMAL revenue device, taken to its fixed-point conclusion;
    * classic float PageRank sums doubles in shuffle order, which no
    * oracle can reproduce). Truncation loses at most `out_degree − 1`
    * micro-units per vertex per round — at unit = 10¹² that is noise in
    * the ranking and a worthwhile trade for determinism.
    *
    * Semantics: directed `edges` (src, dst); each round
    * r' = 0.15·unit + Σ_{u→v} (r_u · 85) div (100 · deg_u). By default,
    * vertices with no out-edges keep receiving but stop redistributing
    * (standard dangling-mass simplification — total mass decays,
    * RELATIVE ranks are what the operator is for). With
    * `redistributeDangling = true` the textbook definition applies
    * instead: each round the summed rank of dangling vertices is damped
    * and split evenly — every vertex additionally receives
    * `(Σ_dangling r · 85) div (100 · N)` — so total mass is conserved up
    * to integer truncation (one extra 1-row aggregate broadcast per
    * round, nothing else changes in the plan). The default stays the
    * simplification for oracle stability (q138's DuckDB twin encodes it).
    *
    * 100 TB posture: per round ONE join of the edge relation against the
    * bounded (vertex, rank) relation on the src key, one map-side
    * combined sum on dst, one left join back onto the vertex set — all
    * key-partitioned, nothing driver-side, no window. `localCheckpoint`
    * per round truncates the lineage exactly as the CC fixpoint does
    * (without it, round k's plan string is 2^k joins deep). Overflow
    * headroom is ENFORCED, not just documented: total graph mass never
    * exceeds N·unit (base adds 0.15·unit per vertex, propagation moves
    * ≤ 0.85 of existing mass), so a single rank is bounded by N·unit and
    * the hottest intermediate is r·85 — the guard requires
    * N·unit ≤ Long.Max/85 and auto-scales `unit` down to the largest
    * power of ten that fits when a caller-supplied unit would wrap
    * (logged; the N count is one bounded aggregate over the distinct
    * vertex ids, run once before the loop).
    *
    * Output: (id, rank_micro) — final ranks in micro-units.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 3,
               unit: Long = 1000000000000L,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(unit >= 100L, s"unit must be >= 100: $unit")
    val verts = vertices.select(col("id")).distinct().localCheckpoint()
    val n = math.max(1L, verts.count())
    val maxUnit = Long.MaxValue / 85L / n
    val u =
      if (unit <= maxUnit) unit
      else {
        var scaled = 1L
        while (scaled * 10L <= maxUnit) scaled *= 10L
        // println, not a logger: graft carries no logging dep and the
        // scale-down must be loud wherever stdout goes.
        println(s"graft.ops.Graph.pageRank: unit=$unit would overflow at " +
          s"n=$n vertices (max safe ${maxUnit}); auto-scaled to $scaled")
        scaled
      }
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val base = (u * 15L) / 100L
    var ranks = verts.select(col("id"), lit(u).as("r")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          expr("(r * 85L) div (100L * __deg)").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      val next = verts.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__s"), lit(0L))).as("r"))
      ranks =
        if (!redistributeDangling) next.localCheckpoint()
        else {
          // damped share of this round's dangling mass, split over all N:
          // a 1-row aggregate, broadcast by the k-row crossJoin idiom.
          val dangling = ranks.join(deg.withColumnRenamed("src", "id"),
              Seq("id"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L)).as("__dm"))
            .select(expr(s"(__dm * 85L) div (100L * ${n}L)").as("__share"))
          next.crossJoin(dangling)
            .select(col("id"), (col("r") + col("__share")).as("r"))
            .localCheckpoint()
        }
    }
    ranks.select(col("id"), col("r").as("rank_micro"))
  }
}
