package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{Retrieval, Similarity}

/** Scratch profiler for the q86 hybrid stored path: times each leg
  * (stored BM25, stored IVF+PQ, fusion) separately to locate the cost.
  * Run: sbt "Test/runMain graft.ProfileHybrid"
  */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("profile")
    val emb = Tables.embeddings(spark, sfDir)

    val sparsePath = java.nio.file.Files.createTempDirectory("ph_inv")
      .toString + "/index"
    Retrieval.writeInvertedIndex(Tables.documents(spark, sfDir), sparsePath)
    val densePath = java.nio.file.Files.createTempDirectory("ph_ivfpq")
      .toString + "/index"
    Similarity.writeIvfPqIndex(emb, densePath)

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val nFiles = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(densePath + "/postings"))
    }
    println(s"[profile] dense postings files: $nFiles")
    (1 to 3).foreach { i =>
      graft.core.CacheScope.scoped {
        time(s"round $i sparse") {
          Retrieval.searchInvertedIndex(spark, sparsePath,
            Retrieval.DefaultQueries, k = 10).count()
        }
      }
      time(s"round $i dense artifacts read") {
        spark.read.parquet(s"$densePath/centroids").collect()
        spark.read.parquet(s"$densePath/codebooks").collect()
      }
      time(s"round $i dense postings full scan") {
        spark.read.parquet(s"$densePath/postings").count()
      }
      time(s"round $i postings relation construction") {
        spark.read.parquet(s"$densePath/postings")
      }
      graft.core.CacheScope.scoped {
        val d = time(s"round $i dense search plan build") {
          Similarity.searchIvfPqIndex(spark, densePath,
            emb.filter(col("vec_id") < 5), emb, k = 10, refine = 256)
        }
        time(s"round $i dense search action") { d.count() }
      }
      graft.core.CacheScope.scoped {
        time(s"round $i fused") {
          val sparse = Retrieval.searchInvertedIndex(spark, sparsePath,
            Retrieval.DefaultQueries, k = 10)
          val dense = Similarity.searchIvfPqIndex(spark, densePath,
              emb.filter(col("vec_id") < 5), emb, k = 10, refine = 256)
            .withColumnRenamed("neighbor_id", "doc_id")
          Retrieval.rrfFuse(Seq(sparse, dense), c = 60.0, k = 10).count()
        }
      }
    }
    spark.stop()
  }
}
