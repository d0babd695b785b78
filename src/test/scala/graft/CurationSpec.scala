package graft

import org.apache.spark.sql.functions._

import graft.core.{CacheScope, Tables}
import graft.jobs.CurationPipeline

/** Composition invariants of the end-to-end curation chain (q96): the
  * value-level correctness of each stage is the DuckDB gate's job; what
  * these tests pin is the CHAIN — coverage, monotonicity, and that the
  * verdict frame is exactly the stage frames' set algebra.
  */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val (stages, verdict, total) = CacheScope.scoped {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val st = CurationPipeline.stages(docs, emb)
    val collected = st.map { case (n, df) =>
      n -> df.select("doc_id").as[Long].collect().toSet
    }
    val v = CurationPipeline.verdictOf(docs, st)
      .as[(Long, Boolean, String)].collect()
    (collected, v, docs.count())
  }

  test("verdict covers every document exactly once") {
    assert(verdict.length == total)
    assert(verdict.map(_._1).distinct.length == total)
  }

  test("final_keep is exactly drop_stage == 'kept'") {
    assert(verdict.forall { case (_, keep, stage) => keep == (stage == "kept") })
  }

  test("stage order matches the declared vocabulary and shrinks monotonically") {
    assert(stages.map(_._1) == CurationPipeline.StageNames)
    stages.sliding(2).foreach {
      case Seq((_, prev), (next, ids)) =>
        assert(ids.subsetOf(prev), s"stage $next grew beyond its predecessor")
      case _ =>
    }
  }

  test("drop_stage is the first stage a doc is missing from") {
    val byName = stages.toMap
    verdict.foreach { case (id, _, stage) =>
      val expected = stages.collectFirst {
        case (n, ids) if !ids.contains(id) => n
      }.getOrElse("kept")
      assert(stage == expected, s"doc $id: verdict $stage, stages say $expected")
    }
    // survivors of the whole chain are exactly the last stage's frame
    assert(verdict.filter(_._2).map(_._1).toSet == byName("mixture"))
  }

  test("the chain actually exercises its dropping stages on this corpus") {
    val drops = verdict.groupBy(_._3).map { case (k, v) => k -> v.length }
    assert(drops.getOrElse("kept", 0) > 0, "nothing survived")
    // the planted near-dups and the cap/mixture strata must each bite —
    // a chain where only one stage ever drops would not certify ordering
    Seq("near_dup", "source_cap", "mixture").foreach { s =>
      assert(drops.getOrElse(s, 0) > 0, s"stage $s dropped nothing")
    }
  }
}
