package graft.queries

/** Oracle CTE fragments shared ACROSS query objects. Lives in its own
  * dependency-free object so that referencing it from one object's
  * oracles map cannot re-enter another object's static initializer —
  * LlmOps's q167 oracle needs the label CTE that CorpusAudit's q154/
  * q155 oracles use, while CorpusAudit's q162 oracle reads
  * LlmOps.geom/QcBuckets; routing the shared string through either
  * object would make the two <clinit>s mutually dependent (the JVM
  * class-initializer deadlock class). */
object OracleCtes {

  /** q68's recursive-CTE label derivation over the planted near-dup
    * universe (same corpus plant, same exact-Jaccard >= 0.5 pairs,
    * min-reachable-id components) — exactly what q131/q146/q148 carry
    * inline. Emits CTEs dd/docs/sh/sizes/prs/vp/edges/reach/lbl. */
  /** q134's BM25 oracle chain (toks…top: tf/df, the df-ranked 5×3-term
    * panel, the log-free idf × folded-rational saturation, ppm-quantized
    * per-term contributions, per-query rank) — q134's oracle selects
    * `top WHERE rk <= 10`; q171's fusion reads the same chain so the
    * sparse arm has ONE spelling. */
  private[queries] val bm25Top: String =
    """toks AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS dl,
      |    t.term
      |  FROM documents,
      |    unnest(string_split(coalesce(text, ''), ' ')) AS t(term)),
      |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |ranked AS (SELECT term, df,
      |    CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INT) AS trk
      |  FROM dfreq),
      |qterms AS (SELECT CAST((trk - 4) // 3 AS INT) AS query_id, term, df
      |           FROM ranked WHERE trk BETWEEN 4 AND 18),
      |gl AS (SELECT CAST(count(*) AS BIGINT) AS nn,
      |    CAST(sum(len(string_split(coalesce(text, ''), ' '))) AS BIGINT) AS tt
      |  FROM documents),
      |scored AS (
      |  SELECT query_id, doc_id, CAST(count(*) AS INT) AS n_hit,
      |    CAST(sum(CAST(floor(1000000.0 * (
      |      ((2.0 * nn - 2.0 * df + 1.0) / (2.0 * df + 1.0)) *
      |      ((22.0 * tf * tt) /
      |       (10.0 * tf * tt + 3.0 * tt + 9.0 * dl * nn)))) AS BIGINT))
      |      AS BIGINT) AS score_fp
      |  FROM tf JOIN qterms USING (term) CROSS JOIN gl
      |  GROUP BY 1, 2),
      |top AS (SELECT query_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_fp DESC, doc_id ASC) AS INT) AS rk,
      |    doc_id, n_hit, score_fp
      |  FROM scored)""".stripMargin

  /** q82's exact-cosine oracle chain (v/p/r: DOUBLE[] cast, broadcast
    * 10-query panel, 6-dp cosine, per-query rank) — q82's oracle
    * selects `r WHERE rnk <= 5`; q171's dense arm reads the same
    * chain. */
  private[queries] val denseTopk: String =
    """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |    round(list_dot_product(q.e, c.e) /
      |      (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS cos6
      |  FROM v q JOIN v c ON c.vec_id != q.vec_id
      |  WHERE q.vec_id < 10),
      |r AS (SELECT qid, nid, cos6,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, nid ASC) AS INT) AS rnk
      |      FROM p)""".stripMargin

  private[queries] val labels: String =
    """WITH RECURSIVE dd AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    string_split(text, ' ')[1:len(string_split(text, ' ')) - 1]
      |  FROM documents),
      |docs AS (SELECT * FROM dd WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
      |  FROM docs, unnest(range(1, len(toks) - 1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |prs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |vp AS (
      |  SELECT d1, d2 FROM prs
      |  JOIN sizes s1 ON s1.doc_id = d1
      |  JOIN sizes s2 ON s2.doc_id = d2
      |  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5),
      |edges AS (SELECT d1 AS a, d2 AS b FROM vp
      |          UNION ALL SELECT d2, d1 FROM vp),
      |reach(n, m) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m),
      |lbl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n)""".stripMargin
}
