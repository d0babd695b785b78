package graft.queries

import graft.llm.TextAnalysis

/** The q96 composed-curation oracle: the ENTIRE
  * [[graft.jobs.CurationPipeline]] keep/drop chain as one DuckDB
  * statement, each stage's CTE reading the PREVIOUS stage's survivor
  * relation — scrub → exact dedup → lexical near-dup clusters with
  * best-of-quality retention → chunk rewrite → substring rewrite →
  * semantic clusters → repetition → quality → length trim → source cap →
  * mixture — emitting every input document's (final_keep, drop_stage).
  *
  * Every stage CTE is the gate-proven per-stage oracle (q49/q28/q29/q51/
  * q88/q74/q82/q76/q50/q36/q89/q64/q63 — see LlmQueries.oracles), rebased
  * from `documents` onto the running survivor set. What the per-stage
  * gates cannot see and this composition pins: stage ORDER, which text
  * each rewrite hands to the next stage, and which relation every
  * statistic (retention quality, p99 cutoffs, cap ranks, mixture draws)
  * is computed over. The semantic stage's exact-cosine pair CTE stands in
  * for the Spark side's IVF path on the recall-1.0 gate corpora, exactly
  * as q42/q76 established (the sf0.1 low-τ recall boundary is inherited
  * and documented there).
  */
object CurationOracle {
  import LlmQueries.{toksSql, stopSql, fpSql}

  /** Quality-score subquery (the q36 CTE shape) over relation `rel` →
    * (doc_id, quality_score). The score is exact double literals gated by
    * ratio comparisons computed identically on both engines. */
  private def qualitySql(rel: String): String =
    s"""SELECT doc_id,
      |  (CASE WHEN len(w) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
      |   + CASE WHEN CAST(len(list_filter(w, x -> list_contains($stopSql, x)))
      |              AS DOUBLE) / GREATEST(len(w), 1) > 0.01
      |          THEN 0.3 ELSE 0.0 END)
      |   + CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?''"()]', '',
      |                                          'g')) AS DOUBLE)
      |              / GREATEST(length(text), 1) < 0.2
      |          THEN 0.3 ELSE 0.0 END AS quality_score
      |FROM (SELECT doc_id, $toksSql AS w, text FROM $rel)""".stripMargin

  /** The default (q96) repetition stage: single-w top-3-gram dominance
    * over the semantic survivors. */
  private def ratioRepetitionCtes: String =
    s"""tk6 AS (SELECT doc_id, $toksSql AS w FROM smx),
      |sh6 AS (SELECT doc_id,
      |          w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |        FROM tk6, UNNEST(range(1, len(w) - 1)) AS t(i)
      |        WHERE len(w) >= 3),
      |c6 AS (SELECT doc_id, shingle, COUNT(*) AS n FROM sh6 GROUP BY 1, 2),
      |rp6 AS MATERIALIZED (SELECT doc_id, CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS BIGINT)
      |          AS rep_ratio
      |        FROM c6 GROUP BY doc_id),
      |rmx AS MATERIALIZED (SELECT smx.* FROM smx LEFT JOIN rp6 USING (doc_id)
      |        WHERE rp6.rep_ratio IS NULL OR rp6.rep_ratio <= 0.2),"""
      .stripMargin

  /** The q247 repetition stage: the full Gopher battery (q246's keep
    * flag — all six n-gram repetition thresholds) over the semantic
    * survivors, re-derived exactly like the q246 oracle but rebased from
    * `documents` onto `smx`. */
  private def gopherRepetitionCtes: String = {
    val thr = Map(2 -> 200, 3 -> 180, 4 -> 160, 5 -> 150, 8 -> 120,
      10 -> 100)
    val gramCtes = Seq(2, 3, 4, 5, 8, 10).map(n =>
      s"""SELECT doc_id, $n AS n,
        |  unnest(list_transform(generate_series(0, len(toks) - $n),
        |    s -> array_to_string(toks[s+1:s+$n], ' '))) AS g
        |FROM g6b WHERE len(toks) >= $n""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    val aggs = (Seq(2, 3, 4).map(n =>
      s"max(CASE WHEN n = $n THEN {'c': c, 'l': glen, 'g': g} END) " +
        s"AS t$n") ++
      Seq(5, 8, 10).map(n =>
        s"SUM(CASE WHEN n = $n AND c >= 2 THEN c * glen ELSE 0 END) " +
          s"AS d$n")).mkString(",\n    ")
    val chCols = (Seq(2, 3, 4).map(n =>
      s"COALESCE(t$n.c * t$n.l, 0) AS ch_t$n") ++
      Seq(5, 8, 10).map(n => s"COALESCE(d$n, 0) AS ch_d$n"))
      .mkString(",\n    ")
    val keep = (Seq(2, 3, 4).map(n =>
      s"ch_t$n * 1000 <= ${thr(n)} * total") ++
      Seq(5, 8, 10).map(n => s"ch_d$n * 1000 <= ${thr(n)} * total"))
      .mkString(" AND ")
    s"""g6t AS (SELECT doc_id, $toksSql AS toks FROM smx),
      |g6b AS (SELECT doc_id, toks,
      |          COALESCE(length(array_to_string(toks, ' ')), 0) AS total
      |        FROM g6t),
      |g6g AS (
      |  $gramCtes
      |),
      |g6c AS (SELECT doc_id, n, g, COUNT(*) AS c, length(g) AS glen
      |        FROM g6g GROUP BY 1, 2, 3),
      |g6s AS (SELECT doc_id,
      |    $aggs
      |  FROM g6c GROUP BY 1),
      |g6j AS MATERIALIZED (SELECT b.doc_id, b.total,
      |    $chCols
      |  FROM g6b b LEFT JOIN g6s USING (doc_id)),
      |rmx AS MATERIALIZED (SELECT smx.* FROM smx JOIN g6j USING (doc_id)
      |        WHERE total = 0 OR ($keep)),""".stripMargin
  }

  val sql: String = sqlWith(gopherRepetition = false)

  /** The q247 variant: identical chain, the repetition stage swapped for
    * the Gopher battery (r17 VERDICT #8). */
  def gopherSql: String = sqlWith(gopherRepetition = true)

  private def sqlWith(gopherRepetition: Boolean): String = {
    val url = TextAnalysis.UrlRe
    val email = TextAnalysis.EmailRe
    val repetitionCtes =
      if (gopherRepetition) gopherRepetitionCtes else ratioRepetitionCtes
    s"""WITH RECURSIVE
      |scx AS MATERIALIZED (SELECT doc_id,
      |          regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
      |                         '$email', '<EMAIL>', 'g') AS text,
      |          lang, source
      |        FROM documents),
      |exx AS MATERIALIZED (SELECT doc_id, text, lang, source FROM (
      |          SELECT scx.*, MIN(doc_id) OVER (PARTITION BY text) AS canon
      |          FROM scx)
      |        WHERE doc_id = canon),
      |tk2 AS (SELECT doc_id, $toksSql AS w FROM exx),
      |sh2 AS MATERIALIZED (SELECT DISTINCT doc_id,
      |          w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |        FROM tk2, UNNEST(range(1, len(w) - 1)) AS t(i)
      |        WHERE len(w) >= 3),
      |sz2 AS (SELECT doc_id, COUNT(*) AS sz FROM sh2 GROUP BY 1),
      |in2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |        FROM sh2 a JOIN sh2 b
      |          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |        GROUP BY 1, 2),
      |jp2 AS (SELECT id_a, id_b FROM in2
      |        JOIN sz2 sa ON id_a = sa.doc_id
      |        JOIN sz2 sb ON id_b = sb.doc_id
      |        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8),
      |ed2 AS (SELECT id_a AS src, id_b AS dst FROM jp2
      |        UNION ALL SELECT id_b AS src, id_a AS dst FROM jp2),
      |re2 AS (SELECT doc_id AS id, doc_id AS r FROM exx
      |        UNION
      |        SELECT e.dst AS id, re2.r AS r
      |        FROM ed2 e JOIN re2 ON e.src = re2.id),
      |cl2 AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster_id FROM re2 GROUP BY 1),
      |q2 AS MATERIALIZED (${qualitySql("exx")}),
      |kb2 AS MATERIALIZED (SELECT doc_id FROM (
      |          SELECT cl2.doc_id,
      |            FIRST_VALUE(cl2.doc_id) OVER (PARTITION BY cluster_id
      |              ORDER BY quality_score DESC, cl2.doc_id DESC) AS kept
      |          FROM cl2 JOIN q2 USING (doc_id))
      |        WHERE doc_id = kept),
      |ndx AS MATERIALIZED (SELECT exx.* FROM exx JOIN kb2 USING (doc_id)),
      |tk3 AS (SELECT doc_id, $toksSql AS w FROM ndx),
      |ck3 AS (SELECT doc_id, i AS chunk_idx,
      |          array_to_string(list_slice(w, i*16 + 1, i*16 + 16), ' ')
      |            AS chunk
      |        FROM tk3, UNNEST(range(0, (len(w) + 15) // 16)) AS t(i)),
      |rr3 AS (SELECT doc_id, chunk_idx, chunk,
      |          ROW_NUMBER() OVER (PARTITION BY chunk
      |                             ORDER BY doc_id, chunk_idx) AS rn
      |        FROM ck3),
      |ag3 AS MATERIALIZED (SELECT doc_id,
      |          string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
      |                     ORDER BY chunk_idx) AS text
      |        FROM rr3 GROUP BY doc_id),
      |crx AS MATERIALIZED (SELECT ndx.doc_id, ag3.text, ndx.lang, ndx.source
      |        FROM ndx JOIN ag3 USING (doc_id)
      |        WHERE length(COALESCE(ag3.text, '')) > 0),
      |tb4 AS MATERIALIZED (SELECT doc_id, $toksSql AS w FROM crx),
      |wn4 AS (SELECT doc_id, i - 1 AS s,
      |          array_to_string(list_slice(w, i, i + 7), ' ') AS win
      |        FROM tb4, UNNEST(range(1, len(w) - 6)) AS t(i)),
      |rx4 AS (SELECT doc_id, s,
      |          ROW_NUMBER() OVER (PARTITION BY win
      |                             ORDER BY doc_id, s) AS rn
      |        FROM wn4),
      |ds4 AS MATERIALIZED (SELECT doc_id, list_sort(list(s)) AS ds
      |        FROM rx4 WHERE rn > 1 GROUP BY doc_id),
      |fn4 AS MATERIALIZED (SELECT tb4.doc_id, COALESCE(len(w), 0) AS n_tokens,
      |          COALESCE(ds, []) AS dsn, COALESCE(w, []) AS wn
      |        FROM tb4 LEFT JOIN ds4 USING (doc_id)),
      |kp4 AS (SELECT doc_id, wn,
      |          list_filter(range(0, n_tokens), p ->
      |            len(list_filter(dsn, s -> s <= p AND p <= s + 7)) = 0)
      |            AS kept
      |        FROM fn4),
      |sr4 AS MATERIALIZED (SELECT doc_id,
      |          COALESCE(array_to_string(
      |            list_transform(kept, p -> wn[p + 1]), ' '), '') AS text
      |        FROM kp4),
      |srx AS MATERIALIZED (SELECT crx.doc_id, sr4.text, crx.lang, crx.source
      |        FROM crx JOIN sr4 USING (doc_id)
      |        WHERE length(sr4.text) > 0),
      |ev5 AS MATERIALIZED (SELECT e.vec_id, e.embedding
      |        FROM embeddings e JOIN srx ON e.vec_id = srx.doc_id),
      |dt5 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |          SUM(CAST(a.embedding[i] AS DOUBLE)
      |              * CAST(b.embedding[i] AS DOUBLE)) AS dp,
      |          SQRT(SUM(CAST(a.embedding[i] AS DOUBLE)
      |                   * CAST(a.embedding[i] AS DOUBLE))) AS na,
      |          SQRT(SUM(CAST(b.embedding[i] AS DOUBLE)
      |                   * CAST(b.embedding[i] AS DOUBLE))) AS nb
      |        FROM ev5 a, ev5 b, UNNEST(range(1, len(a.embedding) + 1)) AS t(i)
      |        WHERE a.vec_id < b.vec_id
      |        GROUP BY 1, 2),
      |ep5 AS MATERIALIZED (SELECT id_a, id_b FROM dt5 WHERE dp / (na * nb) >= 0.45),
      |ee5 AS (SELECT id_a AS src, id_b AS dst FROM ep5
      |        UNION ALL SELECT id_b AS src, id_a AS dst FROM ep5),
      |er5 AS (SELECT vec_id AS id, vec_id AS r FROM ev5
      |        UNION
      |        SELECT e.dst AS id, er5.r AS r
      |        FROM ee5 e JOIN er5 ON e.src = er5.id),
      |ec5 AS MATERIALIZED (SELECT id, MIN(r) AS comp FROM er5 GROUP BY 1),
      |sd5 AS MATERIALIZED (SELECT id AS doc_id FROM ec5 WHERE id <> comp),
      |smx AS MATERIALIZED (SELECT srx.* FROM srx WHERE NOT EXISTS (
      |          SELECT 1 FROM sd5 WHERE sd5.doc_id = srx.doc_id)),
      |$repetitionCtes
      |q7 AS MATERIALIZED (${qualitySql("rmx")}),
      |qmx AS MATERIALIZED (SELECT rmx.* FROM rmx JOIN q7 USING (doc_id)
      |        WHERE q7.quality_score >= 0.5),
      |nt8 AS MATERIALIZED (SELECT doc_id, lang, COALESCE(len($toksSql), 0) AS n_tokens
      |        FROM qmx),
      |ct8 AS MATERIALIZED (SELECT lang, ROUND(quantile_cont(n_tokens, 0.99), 6) AS cutoff
      |        FROM nt8 GROUP BY lang),
      |tmx AS MATERIALIZED (SELECT qmx.* FROM qmx
      |        JOIN nt8 ON qmx.doc_id = nt8.doc_id
      |        JOIN ct8 ON nt8.lang = ct8.lang
      |        WHERE nt8.n_tokens <= ct8.cutoff),
      |dc9 AS MATERIALIZED (SELECT doc_id, source,
      |          ${fpSql("text || '|srccap'")} % 1000000 AS draw
      |        FROM tmx),
      |rk9 AS MATERIALIZED (SELECT doc_id,
      |          ROW_NUMBER() OVER (PARTITION BY source
      |                             ORDER BY draw, doc_id) AS rk
      |        FROM dc9),
      |cpx AS MATERIALIZED (SELECT tmx.* FROM tmx JOIN rk9 ON tmx.doc_id = rk9.doc_id
      |        WHERE rk9.rk <= 20),
      |mxx AS MATERIALIZED (SELECT doc_id FROM cpx
      |        WHERE ${fpSql("text || '|mixture'")} % 1000000
      |          < CASE lang WHEN 'en' THEN 700000 ELSE 1000000 END)
      |SELECT d.doc_id,
      |  mxx.doc_id IS NOT NULL AS final_keep,
      |  CASE WHEN exx.doc_id IS NULL THEN 'exact'
      |       WHEN ndx.doc_id IS NULL THEN 'near_dup'
      |       WHEN crx.doc_id IS NULL THEN 'chunk_rewrite'
      |       WHEN srx.doc_id IS NULL THEN 'substring_rewrite'
      |       WHEN smx.doc_id IS NULL THEN 'semantic'
      |       WHEN rmx.doc_id IS NULL THEN 'repetition'
      |       WHEN qmx.doc_id IS NULL THEN 'quality'
      |       WHEN tmx.doc_id IS NULL THEN 'length_trim'
      |       WHEN cpx.doc_id IS NULL THEN 'source_cap'
      |       WHEN mxx.doc_id IS NULL THEN 'mixture'
      |       ELSE 'kept' END AS drop_stage
      |FROM documents d
      |LEFT JOIN exx ON d.doc_id = exx.doc_id
      |LEFT JOIN ndx ON d.doc_id = ndx.doc_id
      |LEFT JOIN crx ON d.doc_id = crx.doc_id
      |LEFT JOIN srx ON d.doc_id = srx.doc_id
      |LEFT JOIN smx ON d.doc_id = smx.doc_id
      |LEFT JOIN rmx ON d.doc_id = rmx.doc_id
      |LEFT JOIN qmx ON d.doc_id = qmx.doc_id
      |LEFT JOIN tmx ON d.doc_id = tmx.doc_id
      |LEFT JOIN cpx ON d.doc_id = cpx.doc_id
      |LEFT JOIN mxx ON d.doc_id = mxx.doc_id""".stripMargin
  }
}
