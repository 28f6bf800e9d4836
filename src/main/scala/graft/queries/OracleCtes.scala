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
