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
    * r' = 0.15·unit + Σ_{u→v} (r_u · 85) div (100 · deg_u). Vertices
    * with no out-edges keep receiving but stop redistributing (standard
    * dangling-mass simplification — total mass decays, RELATIVE ranks
    * are what the operator is for).
    *
    * 100 TB posture: per round ONE join of the edge relation against the
    * bounded (vertex, rank) relation on the src key, one map-side
    * combined sum on dst, one left join back onto the vertex set — all
    * key-partitioned, nothing driver-side, no window. `localCheckpoint`
    * per round truncates the lineage exactly as the CC fixpoint does
    * (without it, round k's plan string is 2^k joins deep). Overflow
    * headroom: r·85 stays under Long.Max while total graph mass
    * N·unit ≤ ~10⁵ vertices at the default unit; scale `unit` down with
    * log₁₀(N) beyond that (the doc constant, not a hidden runtime
    * choice).
    *
    * Output: (id, rank_micro) — final ranks in micro-units.
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int = 3,
               unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val verts = vertices.select(col("id")).distinct()
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val base = (unit * 15L) / 100L
    var ranks = verts.select(col("id"), lit(unit).as("r")).localCheckpoint()
    for (_ <- 0 until iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"),
          expr("(r * 85L) div (100L * __deg)").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      ranks = verts.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__s"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_micro"))
  }
}
