package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding similarity search (north-star surface): brute-force cosine
  * top-k as the exact baseline, plus an LSH-bucketed approximate variant as
  * the 100 TB scale path.
  *
  * Dot products run through the codegen'd [[graft.functions.FloatVecDot]]
  * expression — a tight primitive loop summing in array order with double
  * accumulation, so results are bit-deterministic across partitionings (no
  * shuffle-order float drift) and bit-equal to the higher-order-function
  * form it replaced.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two float-array columns, double accumulation in array
    * order. */
  def dot(a: Column, b: Column): Column = VectorFunctions.vec_dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force cosine top-k: for each query vector, scan all corpus
    * vectors, rank by (cosine desc, id asc). The corpus side stays
    * partitioned; queries are broadcast (queries ≪ corpus is the ANN
    * shape). Per-partition top-k then global top-k via the rank window —
    * the heavy crossing is map-side only.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "score", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * splitmix64-style integer mix → uniform in [−0.5, 0.5]. Computed
    * driver-side into plane literals — seed-stable, no RNG state.
    */
  private def planeComponent(p: Int, i: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (java.lang.Math.floorMod(z, 1000000L).toDouble / 1e6) - 0.5
  }

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits; `seed` picks
    * an independent hyperplane family (one per hash table). The planes are
    * array<float> literals and each projection is one codegen'd
    * [[graft.functions.FloatVecDot]] — no per-row interpreted closures.
    */
  def lshBucket(vec: Column, nPlanes: Int, seed: Int = 0, dim: Int = 64): Column =
    (0 until nPlanes).map { p =>
      val plane = lit(Array.tabulate(dim)(i =>
        planeComponent(seed * 10007 + p, i).toFloat))
      when(VectorFunctions.vec_dot(vec, plane) > 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** One-pass banding shared by the LSH paths: every table's bucket id is
    * computed in a single projection and `posexplode`d into (tbl, bucket)
    * rows — ONE scan of the vectors instead of a `tables`-way union of
    * scans (the union form re-read the corpus per table). */
  private def bandedBuckets(df: DataFrame, tables: Int, nPlanes: Int,
                            idCol: String, vecCol: String, dim: Int,
                            idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col(vecCol), nPlanes, seed = t, dim = dim)): _*))
        .as(Seq("tbl", "bucket")))

  /** Embedding-cosine near-duplicate pairs: all pairs (a < b) with cosine ≥
    * `tau` — the embedding-space dedup variant (exact form; the LSH-bucketed
    * candidate path of [[lshTopK]] is the 100 TB route, where only
    * same-bucket pairs are scored). Norms are precomputed per vector and
    * broadcast so each pair costs one codegen'd dot product.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, tau: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      l2norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("nrm").as("na"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed embedding near-duplicate pairs — the 100 TB default:
    * vectors are bucketed by `tables` independent random-hyperplane
    * signatures of `nPlanes` bits; only same-(table, bucket) pairs are
    * scored, then verified with the exact cosine ≥ `tau` — no cartesian
    * anywhere in the plan. Candidates found by several tables are deduped
    * BEFORE the dot product so each surviving pair is scored once.
    *
    * Output is identical to [[embeddingNearDupPairs]] whenever every
    * qualifying pair collides in ≥1 table — miss probability per pair is
    * (1−p^nPlanes)^tables with p = 1 − θ/π; LlmOpsSpec pins recall 1.0 at
    * the registry parameters so tuning can't silently regress.
    */
  def embeddingNearDupPairsLsh(embeddings: DataFrame, tau: Double,
                               nPlanes: Int = 2, tables: Int = 16,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               dim: Int = 64): DataFrame = {
    val banded = bandedBuckets(embeddings, tables, nPlanes, idCol, vecCol,
      dim, "id", "v")
    val a = banded.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      l2norm(col(vecCol)).as("nrm"))
    cand
      .join(withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        col("nrm").as("na")), "id_a")
      .join(withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Approximate top-k: corpus pre-bucketed by random-hyperplane LSH (the
    * IVF-style inverted-list layout — at scale this is the partition key of
    * the stored index); each query probes only its own bucket across
    * `tables` independent hash tables, then exact-rank within candidates.
    * Recall is tunable via (nPlanes, tables).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, tables: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val c = bandedBuckets(corpus, tables, nPlanes, idCol, vecCol, dim,
      "neighbor_id", "cv")
    val q = bandedBuckets(queries, tables, nPlanes, idCol, vecCol, dim,
      "query_id", "qv")
    c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
  }
}
