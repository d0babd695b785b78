package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.Multimodal

/** Scratch: perceptual-pair counts per Hamming radius on the gate corpora. */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("profile-phash")
    implicit val s = spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val media = Multimodal.asMedia(Tables.documents(spark, sf))
      for (d <- Seq(3, 6)) {
        val n = Multimodal.perceptualDupPairs(media, maxDist = d).count()
        println(s"[phash] $sf maxDist=$d pairs=$n")
      }
      val h = Multimodal.perceptualHash(media).as[(Long, Long)].collect()
      println(s"[phash] $sf distinct hashes=${h.map(_._2).distinct.length}/${h.length}")
    }
    spark.stop()
  }
}
