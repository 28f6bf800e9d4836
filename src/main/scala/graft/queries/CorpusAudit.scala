package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Corpus governance audits, round 14 of the declared surface
  * (SURVEY.md §2.2): leakage-aware split assignment (q154) and the
  * per-source duplication report (q155). The reference forwards every
  * row of every file blind (`app.py:128-139`); these are the reports a
  * curation pipeline publishes before anyone trains on what landed —
  * where the duplicates come from, and whether the train/val boundary
  * leaks near-duplicates.
  *
  * Determinism: split assignment rides the package's exact-BIGINT Knuth
  * bucket (no RNG, no engine hash), duplicate verdicts come off the
  * same near-dup label machinery q68/q131 certify, and every result
  * ends in a total ORDER BY.
  */
object CorpusAudit {

  /** q94's 80/10/10 split rule over an arbitrary BIGINT key — q154
    * applies the IDENTICAL arithmetic to a doc id and to a cluster id
    * (that identity is the point: moving the hash input from doc to
    * cluster is the whole fix). Lives in
    * [[graft.streaming.SplitRouter]] (the shared batch/stream
    * code-object convention) so the s98 ingest-time router runs the
    * same expression q158's oracle certifies. */
  private def splitOf(k: Column): Column =
    graft.streaming.SplitRouter.splitOf(k)

  /** q154 [EXT]: leakage-aware train/val/test split — the step between
    * dedup and training that q94's per-document split gets subtly
    * wrong: hashing the DOC id scatters near-duplicate cluster members
    * across splits, so validation sees paraphrases of training
    * documents and the eval number is contaminated — exactly the
    * internal leakage q133 DETECTS (shingle-overlap audit of eval docs
    * against the train set); q154 is the PREVENTION side of that pair,
    * fixing the assignment so the audit has nothing to find. The fix is one substitution: hash the
    * CLUSTER id (q68's connected-component label, every unclustered doc
    * its own singleton), so a near-dup cluster moves as a unit. q154
    * runs BOTH assignments over the planted near-dup corpus (originals
    * + truncated re-crawls — q68's universe) and publishes the
    * comparison a pipeline reads before picking: per method, the
    * split sizes, how many multi-member clusters exist, and how many of
    * them straddle a split boundary. The doc-hash row's nonzero
    * straddle count is the measured leak; the cluster-hash row's zero
    * is structural (members share the hash input), and the oracle
    * equality pins it rather than an engine-side assert.
    *
    * 100 TB: the label table is the materialized [[LlmOps.LabelTable]]
    * (pair-graph-sized, built once per corpus build — the q131/q145/
    * q146/q148 posture); the assignment is one corpus-id scan LEFT
    * JOINed to it on doc_id plus two pure-projection bucket columns;
    * both rollups SHRINK (a 6-way conditional count to one row, and a
    * per-cluster distinct-split count whose partial side collapses each
    * partition to its cluster count). Nothing corpus-sized is ever
    * re-keyed twice: the persisted assignment frame is (id, cluster,
    * two 5-char splits) — fingerprint rows, not bodies. FULLY ORACLED:
    * q68's recursive-CTE labels + the package's knuthBucketSql
    * arithmetic, rolled up identically. */
  val q154SplitClusterAware: Q = (spark, dir) => {
    val labels = LlmOps.LabelTable.of(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val d = t(spark, dir, "documents")
    val uni = d.select(col("doc_id"))
      .unionByName(d.select((col("doc_id") + 1000000).as("doc_id")))
    orderAll(clusterAwareSplit(labels, uni))
  }

  /** q154's core over explicit (doc_id, cluster_id) labels and a
    * (doc_id) universe — spec-drivable on hand graphs (the q144/q149
    * factoring pattern). */
  private[graft] def clusterAwareSplit(labels: DataFrame,
      uni: DataFrame): DataFrame = {
    val asg = uni.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id").isNotNull.as("clustered"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster"))
      .select(col("clustered"), col("cluster"),
        splitOf(col("doc_id")).as("split_doc"),
        splitOf(col("cluster")).as("split_cluster"))
      .scopedPersist
    def cnt(s: String, v: String) = sum(when(col(s) === v, 1L).otherwise(0L))
    val counts = asg.agg(
      cnt("split_doc", "train").as("tr_d"), cnt("split_doc", "val").as("va_d"),
      cnt("split_doc", "test").as("te_d"),
      cnt("split_cluster", "train").as("tr_c"),
      cnt("split_cluster", "val").as("va_c"),
      cnt("split_cluster", "test").as("te_c"))
    val leak = asg.filter(col("clustered"))
      .groupBy(col("cluster"))
      .agg(countDistinct(col("split_doc")).as("nd"),
        countDistinct(col("split_cluster")).as("nc"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("leak_d"),
        sum(when(col("nc") > 1, 1L).otherwise(0L)).as("leak_c"))
    // two 1-row aggregate frames — the cross join is a broadcast of one
    // row, and the persisted product serves both method arms below
    val one = counts.crossJoin(broadcast(leak)).scopedPersist
    val out = one.select(lit("doc_hash").as("method"),
        col("tr_d").as("n_train"), col("va_d").as("n_val"),
        col("te_d").as("n_test"), col("n_clusters"),
        col("leak_d").as("n_leaky_clusters"))
      .unionByName(one.select(lit("cluster_hash").as("method"),
        col("tr_c").as("n_train"), col("va_c").as("n_val"),
        col("te_c").as("n_test"), col("n_clusters"),
        col("leak_c").as("n_leaky_clusters")))
    out
  }

  /** q155 [EXT]: per-source duplication report — WHERE the duplicates
    * come from, the attribution a dedup audit (q146 answers "how much")
    * owes the crawl team: per source, its planted-universe document
    * count, how many of its documents sit in a near-dup cluster, how
    * many the canonical collapse (q131's keep-the-longest verdicts)
    * deletes, the token mass those deletions carry, and the drop rate.
    * A source whose drop rate dwarfs the rest is a mirror or a
    * re-crawl — the number that decides which feed gets fixed rather
    * than re-filtered forever.
    *
    * 100 TB: reads the materialized [[LlmOps.LabelTable]] (the
    * q131/q145/q146/q148 posture — no fresh connected components) and
    * reuses q131's bounded per-cluster window for verdicts; the
    * attribution is one doc_id-keyed LEFT JOIN of the source-carrying
    * id frame against the verdict frame (label-table-sized, broadcast
    * territory in practice) and a source-keyed rollup that SHRINKS to
    * the source count. Bodies never move — token counts ride as
    * BIGINTs from the one documents scan. FULLY ORACLED: q131's
    * recursive CTE + keep verdicts, joined to source and rolled up. */
  val q155DupBySource: Q = (spark, dir) => {
    val labels = LlmOps.LabelTable.of(spark, dir)
    val d = t(spark, dir, "documents")
    val nTok = size(split(col("text"), " ")).cast("long")
    val uni = d.select(col("doc_id"), col("source"), nTok.as("n_toks"))
      .unionByName(d.select((col("doc_id") + 1000000).as("doc_id"),
        col("source"), (nTok - 1).as("n_toks")))
    orderAll(dupBySource(labels, uni))
  }

  /** q155's core over an explicit (doc_id, cluster_id, cluster_size)
    * label table and a (doc_id, source, n_toks) universe —
    * spec-drivable on hand graphs. */
  private[graft] def dupBySource(labels: DataFrame,
      uniRaw: DataFrame): DataFrame = {
    val uni = uniRaw.scopedPersist
    val verdicts = LlmOps.q131WithLabels(labels,
      uni.select(col("doc_id"), col("n_toks")))
    val joined = uni.join(verdicts.select(col("doc_id"), col("keep")),
      Seq("doc_id"), "left")
    val agg = joined.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("keep").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
      sum(when(col("keep") === false, 1L).otherwise(0L)).as("n_dropped"),
      sum(when(col("keep") === false, col("n_toks")).otherwise(0L))
        .as("n_toks_dropped"))
    agg.select(col("source"), col("n_docs"), col("n_clustered"),
      col("n_dropped"), col("n_toks_dropped"),
      round(col("n_dropped").cast("double") / col("n_docs"), 6)
        .as("drop_rate"))
  }

  /** q158 [EXT]: the SHIPPED cluster-aware assignment — q154 compares
    * the two split methods and argues for the cluster hash; q158 emits
    * what a training job actually consumes: the per-document
    * (doc_id, cluster, clustered, split) table over the planted
    * universe, TOTAL (unlabeled docs are their own singleton cluster
    * and still get a split). The projection lives in
    * [[graft.streaming.SplitRouter]] (the s82/s85/s95/s97 shared
    * batch/stream code-object convention), so the s98 ingest-time
    * router — the label table riding as a static dimension under a
    * stream-static broadcast join — produces row-identically what this
    * oracle certifies.
    *
    * 100 TB: one broadcast join of the pair-graph-sized materialized
    * [[LlmOps.LabelTable]] onto the corpus-id stream plus row-local
    * Knuth bucket arithmetic — no aggregation, no corpus shuffle
    * beyond the dump sort. FULLY ORACLED: q68's recursive-CTE labels +
    * knuthBucketSql, per doc. */
  val q158SplitAssign: Q = (spark, dir) => {
    val labels = LlmOps.LabelTable.of(spark, dir)
    val d = t(spark, dir, "documents")
    val uni = d.select(col("doc_id"))
      .unionByName(d.select((col("doc_id") + 1000000).as("doc_id")))
    orderAll(graft.streaming.SplitRouter.assign(uni, labels))
  }

  val defs: Map[String, Q] = Map(
    "q154_split_cluster_aware" -> q154SplitClusterAware,
    "q155_dup_by_source" -> q155DupBySource,
    "q158_split_assign" -> q158SplitAssign)

  /** q68's recursive-CTE label derivation, shared by the q154/q155
    * mirrors exactly as q131/q146/q148 carry it (same corpus plant,
    * same exact-Jaccard ≥ 0.5 pairs, min-reachable-id components). */
  private val labelCtes: String =
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

  val oracles: Map[String, String] = Map(
    "q154_split_cluster_aware" ->
      // q68's labels + the package knuthBucketSql arithmetic on both
      // hash inputs, rolled up per method; the UNION ALL's two rows are
      // the two methods and the ORDER BY is the dump sort
      (labelCtes + s""",
        |uni AS (SELECT doc_id FROM documents
        |        UNION ALL SELECT doc_id + 1000000 FROM documents),
        |asg0 AS (
        |  SELECT u.doc_id, l.cluster_id IS NOT NULL AS clustered,
        |    coalesce(l.cluster_id, u.doc_id) AS cluster
        |  FROM uni u LEFT JOIN lbl l ON l.doc_id = u.doc_id),
        |asg AS (
        |  SELECT clustered, cluster,
        |    CASE WHEN ${knuthBucketSql("doc_id", 100)} < 80 THEN 'train'
        |         WHEN ${knuthBucketSql("doc_id", 100)} < 90 THEN 'val'
        |         ELSE 'test' END AS split_doc,
        |    CASE WHEN ${knuthBucketSql("cluster", 100)} < 80 THEN 'train'
        |         WHEN ${knuthBucketSql("cluster", 100)} < 90 THEN 'val'
        |         ELSE 'test' END AS split_cluster
        |  FROM asg0),
        |cnt AS (SELECT
        |    CAST(count(*) FILTER (WHERE split_doc = 'train') AS BIGINT) AS tr_d,
        |    CAST(count(*) FILTER (WHERE split_doc = 'val') AS BIGINT) AS va_d,
        |    CAST(count(*) FILTER (WHERE split_doc = 'test') AS BIGINT) AS te_d,
        |    CAST(count(*) FILTER (WHERE split_cluster = 'train') AS BIGINT) AS tr_c,
        |    CAST(count(*) FILTER (WHERE split_cluster = 'val') AS BIGINT) AS va_c,
        |    CAST(count(*) FILTER (WHERE split_cluster = 'test') AS BIGINT) AS te_c
        |  FROM asg),
        |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
        |    CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS leak_d,
        |    CAST(count(*) FILTER (WHERE nc > 1) AS BIGINT) AS leak_c
        |  FROM (SELECT cluster, count(DISTINCT split_doc) AS nd,
        |          count(DISTINCT split_cluster) AS nc
        |        FROM asg WHERE clustered GROUP BY 1))
        |SELECT 'doc_hash' AS method, tr_d AS n_train, va_d AS n_val,
        |  te_d AS n_test, n_clusters, leak_d AS n_leaky_clusters
        |FROM cnt, lk
        |UNION ALL
        |SELECT 'cluster_hash', tr_c, va_c, te_c, n_clusters, leak_c
        |FROM cnt, lk
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""").stripMargin,
    "q155_dup_by_source" ->
      // q131's keep verdicts (labels + keep-the-longest window) joined
      // to the source-carrying planted universe, rolled up per source;
      // sums CAST HUGEINT → BIGINT, empty-drop sources coalesce to 0
      (labelCtes + """,
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lbl GROUP BY 1),
        |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM dd),
        |kp AS (SELECT doc_id,
        |    (row_number() OVER (PARTITION BY cluster_id
        |                        ORDER BY n_toks DESC, doc_id ASC) = 1) AS keep
        |  FROM lbl JOIN sz USING (cluster_id) JOIN nt USING (doc_id)),
        |src AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, source,
        |    CAST(len(string_split(text, ' ')) - 1 AS BIGINT)
        |  FROM documents),
        |ag AS (SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(*) FILTER (WHERE keep IS NOT NULL) AS BIGINT)
        |      AS n_clustered,
        |    CAST(count(*) FILTER (WHERE keep = false) AS BIGINT) AS n_dropped,
        |    CAST(coalesce(sum(n_toks) FILTER (WHERE keep = false), 0)
        |      AS BIGINT) AS n_toks_dropped
        |  FROM src LEFT JOIN kp USING (doc_id) GROUP BY 1)
        |SELECT source, n_docs, n_clustered, n_dropped, n_toks_dropped,
        |  round(CAST(n_dropped AS DOUBLE) / n_docs, 6) AS drop_rate
        |FROM ag
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST, 5 NULLS FIRST, 6 NULLS FIRST""").stripMargin,
    "q158_split_assign" ->
      // q68's labels + the package knuthBucketSql arithmetic on the
      // cluster id, per document — q154's asg CTEs without the rollups
      (labelCtes + s""",
        |uni AS (SELECT doc_id FROM documents
        |        UNION ALL SELECT doc_id + 1000000 FROM documents),
        |asg0 AS (
        |  SELECT u.doc_id, coalesce(l.cluster_id, u.doc_id) AS cluster,
        |    l.cluster_id IS NOT NULL AS clustered
        |  FROM uni u LEFT JOIN lbl l ON l.doc_id = u.doc_id)
        |SELECT doc_id, cluster, clustered,
        |  CASE WHEN ${knuthBucketSql("cluster", 100)} < 80 THEN 'train'
        |       WHEN ${knuthBucketSql("cluster", 100)} < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM asg0
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST,
        |  4 NULLS FIRST""").stripMargin)
}
