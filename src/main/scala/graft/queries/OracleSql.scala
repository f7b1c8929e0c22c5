package graft.queries

/**
 * ANSI-ish SQL equivalents of every query in SparkEntry.queries, runnable
 * by DuckDB over the same parquet tables (lineitem / documents /
 * embeddings). Each one recomputes the ENTIRE pipeline — code_files
 * derivation, windowed edge generation, and the algorithm itself (PageRank
 * unrolled, WCC/BFS as recursive CTEs) — fully independently of Spark.
 *
 * Determinism contract with the Spark side:
 *  - repos are zero-padded so lexicographic order == dense-id order;
 *  - all tie-breaks are total orders ((weight desc, label asc) etc.);
 *  - doubles are produced by identical formula shapes and rounded to 6
 *    decimals on both sides.
 */
object OracleSql {

  val cap = GraphQueries.WindowCap

  /** code_files + edge derivation + undirected views (shared prefix). */
  val graphCte: String = s"""
WITH RECURSIVE cf AS MATERIALIZED (
  SELECT 'r' || lpad(CAST(l_partkey AS VARCHAR), 6, '0') AS repo,
         's' || CAST(l_suppkey AS VARCHAR) || '/f' || CAST(l_partkey % 64 AS VARCHAR) AS path,
         CAST(l_orderkey AS VARCHAR) AS commit_g,
         CASE WHEN l_returnflag = 'A' THEN 'scala'
              WHEN l_returnflag = 'R' THEN 'java' ELSE 'py' END AS lang,
         '// ' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
           || ' p' || CAST(l_partkey AS VARCHAR) || ' s' || CAST(l_suppkey AS VARCHAR) AS content
  FROM lineitem),
cg AS MATERIALIZED (SELECT DISTINCT commit_g AS g, repo AS r FROM cf),
cn AS MATERIALIZED (SELECT g, r, row_number() OVER (PARTITION BY g ORDER BY r) AS rn FROM cg),
ce AS MATERIALIZED (SELECT a.r AS src, b.r AS dst FROM cn a JOIN cn b
       ON a.g = b.g AND b.rn > a.rn AND b.rn <= a.rn + $cap),
pg AS MATERIALIZED (SELECT DISTINCT path AS g, repo AS r FROM cf),
pn AS MATERIALIZED (SELECT g, r, row_number() OVER (PARTITION BY g ORDER BY r) AS rn FROM pg),
pe AS MATERIALIZED (SELECT a.r AS src, b.r AS dst FROM pn a JOIN pn b
       ON a.g = b.g AND b.rn > a.rn AND b.rn <= a.rn + $cap),
edges AS MATERIALIZED (
  SELECT src, dst, 'co_commit' AS type, CAST(count(*) AS DOUBLE) AS weight
  FROM ce GROUP BY src, dst
  UNION ALL
  SELECT src, dst, 'shared_path' AS type, CAST(count(*) AS DOUBLE) AS weight
  FROM pe GROUP BY src, dst),
nodes AS MATERIALIZED (SELECT DISTINCT repo AS id FROM cf),
eu AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges) t),
es AS MATERIALIZED (SELECT src, dst FROM edges GROUP BY src, dst),
du AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM eu GROUP BY src),
ew AS MATERIALIZED (SELECT src, dst, sum(weight) AS w FROM
       (SELECT src, dst, weight FROM edges
        UNION ALL SELECT dst AS src, src AS dst, weight FROM edges) t GROUP BY src, dst),
wdeg AS MATERIALIZED (SELECT src AS id, sum(w) AS wd FROM ew GROUP BY src)"""

  val ingestSha: String = graphCte + """
SELECT repo, path, commit_g AS "commit", lang, sha256(content) AS content_sha256 FROM cf"""

  val graphEdges: String = graphCte + """
SELECT src AS src_repo, dst AS dst_repo, type, weight FROM edges"""

  val degree: String = graphCte + """
SELECT n.id AS repo, coalesce(du.d, 0) AS degree
FROM nodes n LEFT JOIN du ON du.id = n.id"""

  val degreeCentralityWeighted: String = graphCte + """
SELECT n.id AS repo, round(coalesce(s.w, 0.0), 6) AS score
FROM nodes n LEFT JOIN
  (SELECT src, sum(weight) AS w FROM edges GROUP BY src) s ON s.src = n.id"""

  /** Classic-form PageRank unrolled `iters` times: r0 = 0.15,
   *  r_{t+1}(v) = 0.15 + 0.85 Σ_{u→v} r_t(u)/deg(u) — proven identical to
   *  the engine's GDS delta form (init 1−d, score += d·Σ delta/deg). */
  private def prUnrolled(iters: Int, weighted: Boolean): String = {
    val steps = (1 to iters).map { t =>
      val prev = s"r${t - 1}"
      val inner =
        if (weighted)
          s"""SELECT e.dst AS id, sum(r.rank * e.w / wd.wd) AS m
             FROM ew e JOIN $prev r ON r.id = e.src JOIN wdeg wd ON wd.id = e.src
             GROUP BY e.dst"""
        else
          s"""SELECT e.dst AS id, sum(r.rank / dd.d) AS m
             FROM eu e JOIN $prev r ON r.id = e.src JOIN du dd ON dd.id = e.src
             GROUP BY e.dst"""
      s"""r$t AS MATERIALIZED (SELECT n.id, 0.15 + 0.85 * coalesce(s.m, 0.0) AS rank
         FROM r0_base n LEFT JOIN ($inner) s ON s.id = n.id)"""
    }.mkString(",\n")
    s""",
r0_base AS MATERIALIZED (SELECT id FROM nodes),
r0 AS MATERIALIZED (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes),
$steps
SELECT id AS repo, round(rank, 6) AS score FROM r$iters"""
  }

  val pagerank: String = graphCte + prUnrolled(5, weighted = false)
  val pagerankWeighted: String = graphCte + prUnrolled(5, weighted = true)

  /** Personalized variant: teleport vector 0.15·1_S (S = repos ≤ r000050),
   *  re-injected every classic-form step — provably identical to the
   *  engine's one-shot-init delta form (r_T = Σ_t d^t A^t b both ways). */
  private def pprUnrolled(iters: Int): String = {
    val base = "CASE WHEN n.id <= 'r000050' THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    val steps = (1 to iters).map { t =>
      val prev = s"p${t - 1}"
      s"""p$t AS MATERIALIZED (SELECT n.id, ($base) + 0.85 * coalesce(s.m, 0.0) AS rank
         FROM p0_base n LEFT JOIN (
           SELECT e.dst AS id, sum(r.rank / dd.d) AS m
           FROM eu e JOIN $prev r ON r.id = e.src JOIN du dd ON dd.id = e.src
           GROUP BY e.dst) s ON s.id = n.id)"""
    }.mkString(",\n")
    s""",
p0_base AS MATERIALIZED (SELECT id FROM nodes),
p0 AS MATERIALIZED (SELECT n.id, $base AS rank FROM nodes n),
$steps
SELECT id AS repo, round(rank, 6) AS score FROM p$iters"""
  }

  val pagerankPersonalized: String = graphCte + pprUnrolled(5)

  /** Shiloach-Vishkin-style min-label rounds, one MATERIALIZED level per
   *  round: hook (min over neighbor labels) then compress (jump to the
   *  label's own label). Replaces the recursive transitive closure, whose
   *  O(n·reach) row blowup cost 215 s at sf0.01 (this form: 2.5 s). With
   *  compression the label horizon roughly doubles per round, so k=8
   *  covers any remotely plausible component diameter at the gate scales;
   *  fixpoint verified empirically (l7 == l8 at sf0.001 and sf0.01). */
  private def wccRounds(k: Int): String = {
    val rounds = (1 to k).map { t =>
      s"""n$t AS MATERIALIZED (SELECT x.id, least(x.comp, coalesce(min(l.comp), x.comp)) AS comp
         FROM l${t - 1} x LEFT JOIN eu e ON e.src = x.id LEFT JOIN l${t - 1} l ON l.id = e.dst
         GROUP BY x.id, x.comp),
l$t AS MATERIALIZED (SELECT a.id, least(a.comp, b.comp) AS comp
         FROM n$t a JOIN n$t b ON b.id = a.comp)"""
    }.mkString(",\n")
    s""",
l0 AS MATERIALIZED (SELECT id, id AS comp FROM nodes),
$rounds"""
  }

  val wcc: String = graphCte + wccRounds(8) + """
SELECT id AS repo, comp AS component_repo FROM l8"""

  val wccConsecutive: String = graphCte + wccRounds(8) + """
SELECT id AS repo, CAST(dense_rank() OVER (ORDER BY comp) - 1 AS BIGINT) AS component
FROM l8"""

  /** Two synchronous LPA iterations; vote = Σ edge weight per neighbor
   *  label, tie → smaller label. */
  val lpa: String = graphCte + """,
l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes),
v1 AS MATERIALIZED (SELECT e.src AS id, l.label AS label, sum(e.w) AS wt
       FROM ew e JOIN l0 l ON l.id = e.dst GROUP BY e.src, l.label),
p1 AS MATERIALIZED (SELECT id, label, row_number() OVER
        (PARTITION BY id ORDER BY wt DESC, label ASC) AS rk FROM v1),
l1 AS MATERIALIZED (SELECT n.id, coalesce(p.label, n.label) AS label FROM l0 n
       LEFT JOIN (SELECT id, label FROM p1 WHERE rk = 1) p ON p.id = n.id),
v2 AS MATERIALIZED (SELECT e.src AS id, l.label AS label, sum(e.w) AS wt
       FROM ew e JOIN l1 l ON l.id = e.dst GROUP BY e.src, l.label),
p2 AS MATERIALIZED (SELECT id, label, row_number() OVER
        (PARTITION BY id ORDER BY wt DESC, label ASC) AS rk FROM v2),
l2 AS MATERIALIZED (SELECT n.id, coalesce(p.label, n.label) AS label FROM l1 n
       LEFT JOIN (SELECT id, label FROM p2 WHERE rk = 1) p ON p.id = n.id)
SELECT id AS repo, label AS label_repo FROM l2"""

  private val triCorners: String = """
tri AS MATERIALIZED (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM es a JOIN es b ON b.src = a.dst
        JOIN es c ON c.src = a.src AND c.dst = b.dst),
corners AS MATERIALIZED (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
tcnt AS MATERIALIZED (SELECT id, count(*) AS t FROM corners GROUP BY id)"""

  val triangleCount: String = graphCte + "," + triCorners + """
SELECT n.id AS repo, coalesce(tc.t, 0) AS triangles
FROM nodes n LEFT JOIN tcnt tc ON tc.id = n.id"""

  val lcc: String = graphCte + "," + triCorners + """
SELECT n.id AS repo,
       round(CASE WHEN coalesce(du.d, 0) < 2 THEN 0.0
             ELSE 2.0 * coalesce(tc.t, 0) / (du.d * (du.d - 1.0)) END, 6) AS coefficient
FROM nodes n LEFT JOIN du ON du.id = n.id LEFT JOIN tcnt tc ON tc.id = n.id"""

  val nodeSimilarity: String = graphCte + """,
inter AS MATERIALIZED (SELECT l.src AS a, r.src AS b, count(*) AS i
          FROM eu l JOIN eu r ON l.dst = r.dst AND l.src <> r.src
          WHERE l.src <= 'r001000' AND r.src <= 'r001000'
          GROUP BY l.src, r.src),
sim AS MATERIALIZED (SELECT a, b, CAST(i AS DOUBLE) / (da.d + db.d - i) AS s
        FROM inter JOIN du da ON da.id = a JOIN du db ON db.id = b),
ranked AS MATERIALIZED (SELECT a, b, s, row_number() OVER
            (PARTITION BY a ORDER BY s DESC, b ASC) AS rank
           FROM sim WHERE s >= 1e-42)
SELECT a AS repo1, b AS repo2, round(s, 6) AS similarity, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

  val bfs: String = graphCte + """,
src0 AS (SELECT min(id) AS s FROM nodes),
reach AS (SELECT s AS id, 0 AS lvl FROM src0
          UNION
          SELECT e.dst AS id, r.lvl + 1 AS lvl FROM reach r
          JOIN eu e ON e.src = r.id WHERE r.lvl < 15)
SELECT id AS repo, CAST(min(lvl) AS BIGINT) AS level FROM reach GROUP BY id"""

  // ------------------------------------------------------------------
  // pipeline oracles (documents / embeddings)
  // ------------------------------------------------------------------

  val dedupExact: String = """
WITH d AS (SELECT doc_id, sha256(text) AS digest FROM documents),
c AS (SELECT digest, min(doc_id) AS canonical_id FROM d GROUP BY digest)
SELECT d.doc_id, c.canonical_id, d.digest FROM d JOIN c ON c.digest = d.digest"""

  val textTokens: String = """
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_ws_tokens,
  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))
     + len(list_filter(regexp_split_to_array(text, '[a-zA-Z0-9\s]+'), x -> len(x) > 0)) AS BIGINT) AS n_bpe_tokens
FROM documents"""

  val textQuality: String = """
WITH base AS (
  SELECT doc_id, text,
    CAST(length(text) AS DOUBLE) AS nchars,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS DOUBLE) AS ntok,
    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> len(x) > 0) AS atoks
  FROM documents),
m AS (
  SELECT doc_id, nchars, ntok,
    (nchars - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) / greatest(nchars, 1.0) AS alpha,
    (nchars - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))) / greatest(nchars, 1.0) AS punct,
    CASE WHEN len(atoks) > 0 THEN
      CAST(len(list_filter(atoks, x -> list_contains(['the','of','and','to','in','a','is','that','it','was','for','on','are','with','as'], x))) AS DOUBLE) / len(atoks)
    ELSE 0.0 END AS stop,
    CASE WHEN ntok > 0 THEN (nchars - ntok + 1) / ntok ELSE 0.0 END AS mwl
  FROM base)
SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens,
  round(alpha, 6) AS alpha_ratio, round(punct, 6) AS punct_ratio,
  round(stop, 6) AS stop_ratio,
  round((CASE WHEN ntok >= 10 AND ntok <= 100000 THEN 1.0 ELSE 0.3 END) * 0.25
      + (CASE WHEN mwl >= 3 AND mwl <= 12 THEN 1.0 ELSE 0.4 END) * 0.15
      + least(alpha * 1.5, 1.0) * 0.3
      + (1.0 - least(punct * 5, 1.0)) * 0.1
      + least(stop * 4, 1.0) * 0.2, 6) AS quality
FROM m"""

  val langId: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿ]+'), x -> len(x) > 0) AS t
  FROM documents),
sc AS (
  SELECT doc_id, 'en' AS lang, len(list_filter(t, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS hits FROM toks
  UNION ALL
  SELECT doc_id, 'de', len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht','mit'], x))) FROM toks
  UNION ALL
  SELECT doc_id, 'fr', len(list_filter(t, x -> list_contains(['le','la','les','et','est','dans','pour'], x))) FROM toks
  UNION ALL
  SELECT doc_id, 'es', len(list_filter(t, x -> list_contains(['el','la','los','que','es','para','con'], x))) FROM toks),
best AS (SELECT doc_id, lang, hits, row_number() OVER
          (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rk FROM sc)
SELECT doc_id, CASE WHEN hits > 0 THEN lang ELSE 'und' END AS detected_lang,
       CAST(hits AS BIGINT) AS marker_hits
FROM best WHERE rk = 1"""

  val annCosine: String = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 2000),
p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        list_inner_product(a.e, b.e) /
        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS c
      FROM v a JOIN v b ON a.vec_id <> b.vec_id),
r AS (SELECT a, b, c, row_number() OVER (PARTITION BY a ORDER BY c DESC, b ASC) AS rank FROM p)
SELECT a, b, round(c, 6) AS cosine, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5"""

  /** MinHash signatures (first 4 hash lanes) over word 3-shingles —
   *  string-min of sha256('lane:' || shingle), portable across engines. */
  val minhash: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
  FROM documents),
sh AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
       FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i) gs),
mh AS (SELECT doc_id,
         min(sha256('0:' || g)) AS h0, min(sha256('1:' || g)) AS h1,
         min(sha256('2:' || g)) AS h2, min(sha256('3:' || g)) AS h3
       FROM sh GROUP BY doc_id)
SELECT doc_id, h0, h1, h2, h3 FROM mh"""

  /** Portable SimHash signatures (simhash_check) — a FULL value oracle:
   *  bit j = sign of Σ ±tf over tokens, with the token's bit j read as the
   *  parity of hex digit j of sha256(token); weights are integer counts so
   *  the sign is exact in both engines. Emitted as two 32-bit halves
   *  (hi = bits 32..63, lo = bits 0..31) to avoid the 1<<63 overflow.
   *  Mirrors Dedup.simhashPortable. */
  val simhashCheck: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
  FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS w
       FROM (SELECT doc_id, unnest(t) AS tok FROM toks) u GROUP BY 1, 2),
th AS (SELECT doc_id, w, sha256(tok) AS h FROM tf),
bits AS (SELECT doc_id, bit,
           sum(CASE WHEN substr(h, bit + 1, 1) IN ('1','3','5','7','9','b','d','f')
                    THEN w ELSE -w END) AS s
         FROM th, LATERAL (SELECT unnest(generate_series(0, 63)) AS bit) b
         GROUP BY 1, 2)
SELECT doc_id,
  CAST(sum(CASE WHEN s > 0 AND bit >= 32 THEN (1::BIGINT << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
  CAST(sum(CASE WHEN s > 0 AND bit < 32 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS lo
FROM bits GROUP BY doc_id"""

  /** N-gram Jaccard near-dup pairs (word 5-shingles, J ≥ 0.3) — a FULL
   *  value oracle: the engine's PPJoin prefix filter is lossless and its
   *  hashed-shingle Jaccard equals string-shingle Jaccard (64-bit hashes,
   *  distinct shingles), so an inverted-index SQL join over the raw
   *  shingle strings recomputes the identical pair set and values. */
  val dedupNgram: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
  FROM documents),
sh AS (SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS g
       FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i) gs),
sl AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM sh x JOIN sh y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT i.a, i.b, round(i.c * 1.0 / (na.n + nb.n - i.c), 6) AS jaccard
FROM inter i JOIN sl na ON na.doc_id = i.a JOIN sl nb ON nb.doc_id = i.b
WHERE i.c * 1.0 / (na.n + nb.n - i.c) >= 0.3"""

  /** Winnowing-lite document fingerprint — the 4 smallest sha256 digests
   *  of the distinct word 3-shingles, concatenated; sha2 hex is identical
   *  across engines, so this is a full value oracle (docs with < 3 tokens
   *  fingerprint to the empty string on both sides). */
  val docFingerprint: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
  FROM documents),
sh AS (SELECT DISTINCT doc_id, sha256(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS d
       FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i) gs),
rk AS (SELECT doc_id, d, row_number() OVER (PARTITION BY doc_id ORDER BY d) AS r FROM sh),
fp AS (SELECT doc_id, string_agg(d, '' ORDER BY d) AS f FROM rk WHERE r <= 4 GROUP BY doc_id)
SELECT toks.doc_id, coalesce(fp.f, '') AS fingerprint
FROM toks LEFT JOIN fp ON toks.doc_id = fp.doc_id"""

  /** MinHash-LSH near-dup pairs — the full pipeline is engine-portable
   *  (sha256 string-min lanes, 4×2 banding, bucket cap 50, exact shingle
   *  Jaccard ≥ 0.3 verification), mirroring Dedup.minhashLsh(k=3, bands=4,
   *  rowsPerBand=2). */
  val dedupLshPairs: String = """
WITH toks AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
  FROM documents),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
       FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i) gs),
shl AS (SELECT doc_id, list(g) AS sg FROM sh GROUP BY doc_id),
mh AS (SELECT doc_id,
         min(sha256('0:' || g)) AS h0, min(sha256('1:' || g)) AS h1,
         min(sha256('2:' || g)) AS h2, min(sha256('3:' || g)) AS h3,
         min(sha256('4:' || g)) AS h4, min(sha256('5:' || g)) AS h5,
         min(sha256('6:' || g)) AS h6, min(sha256('7:' || g)) AS h7
       FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, '0_' || sha256(h0 || '|' || h1) AS bucket FROM mh
  UNION ALL SELECT doc_id, '1_' || sha256(h2 || '|' || h3) FROM mh
  UNION ALL SELECT doc_id, '2_' || sha256(h4 || '|' || h5) FROM mh
  UNION ALL SELECT doc_id, '3_' || sha256(h6 || '|' || h7) FROM mh),
bsz AS (SELECT bucket, count(*) AS bs FROM banded GROUP BY bucket),
bounded AS (SELECT b.doc_id, b.bucket FROM banded b JOIN bsz ON bsz.bucket = b.bucket
            WHERE bsz.bs <= 50),
cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bounded l JOIN bounded r ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
jac AS (SELECT c.a, c.b,
          CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
            len(list_distinct(list_concat(sa.sg, sb.sg))) AS jaccard
        FROM cand c JOIN shl sa ON sa.doc_id = c.a JOIN shl sb ON sb.doc_id = c.b)
SELECT a, b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= 0.3"""

  /** ArticleRank unrolled: denominator deg+avgDeg (constant scalar). */
  private def arUnrolled(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      val prev = s"a${t - 1}"
      s"""a$t AS MATERIALIZED (SELECT n.id, 0.15 + 0.85 * coalesce(s.m, 0.0) AS rank
         FROM a0 n LEFT JOIN (
           SELECT e.dst AS id, sum(r.rank / (dd.d + ad.v)) AS m
           FROM eu e JOIN $prev r ON r.id = e.src JOIN du dd ON dd.id = e.src
           CROSS JOIN avgdeg ad GROUP BY e.dst) s ON s.id = n.id)"""
    }.mkString(",\n")
    s""",
avgdeg AS MATERIALIZED (SELECT avg(CAST(coalesce(du.d, 0) AS DOUBLE)) AS v
           FROM nodes n LEFT JOIN du ON du.id = n.id),
a0 AS MATERIALIZED (SELECT id, CAST(0.15 AS DOUBLE) AS rank FROM nodes),
$steps
SELECT id AS repo, round(rank, 6) AS score FROM a$iters"""
  }

  val articleRank: String = graphCte + arUnrolled(5)

  /** Eigenvector: 3 power iterations, L2 normalization per step. */
  val eigenvector: String = graphCte + """,
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
e0 AS MATERIALIZED (SELECT id, (SELECT 1.0 / n FROM nn) AS rank FROM nodes),
s1 AS MATERIALIZED (SELECT n.id, coalesce(x.s, 0.0) AS s FROM e0 n LEFT JOIN
       (SELECT e.dst AS id, sum(r.rank) AS s FROM eu e JOIN e0 r ON r.id = e.src
        GROUP BY e.dst) x ON x.id = n.id),
n1 AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS nrm FROM s1),
e1 AS MATERIALIZED (SELECT id, CASE WHEN (SELECT nrm FROM n1) = 0 THEN s
                  ELSE s / (SELECT nrm FROM n1) END AS rank FROM s1),
s2 AS MATERIALIZED (SELECT n.id, coalesce(x.s, 0.0) AS s FROM e1 n LEFT JOIN
       (SELECT e.dst AS id, sum(r.rank) AS s FROM eu e JOIN e1 r ON r.id = e.src
        GROUP BY e.dst) x ON x.id = n.id),
n2 AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS nrm FROM s2),
e2 AS MATERIALIZED (SELECT id, CASE WHEN (SELECT nrm FROM n2) = 0 THEN s
                  ELSE s / (SELECT nrm FROM n2) END AS rank FROM s2),
s3 AS MATERIALIZED (SELECT n.id, coalesce(x.s, 0.0) AS s FROM e2 n LEFT JOIN
       (SELECT e.dst AS id, sum(r.rank) AS s FROM eu e JOIN e2 r ON r.id = e.src
        GROUP BY e.dst) x ON x.id = n.id),
n3 AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS nrm FROM s3),
e3 AS MATERIALIZED (SELECT id, CASE WHEN (SELECT nrm FROM n3) = 0 THEN s
                  ELSE s / (SELECT nrm FROM n3) END AS rank FROM s3)
SELECT id AS repo, round(rank, 6) AS score FROM e3"""

  /** Link-prediction kernels over canonical edges with src ≤ r000500. */
  val linkPrediction: String = graphCte + """,
pairs AS MATERIALIZED (SELECT src AS n1, dst AS n2 FROM es WHERE src <= 'r000500'),
cnb AS MATERIALIZED (SELECT p.n1, p.n2, count(*) AS c,
         sum(CASE WHEN dz.d > 1 THEN 1.0 / ln(dz.d) ELSE 0.0 END) AS aa,
         sum(CASE WHEN dz.d > 0 THEN 1.0 / dz.d ELSE 0.0 END) AS ra
       FROM pairs p
       JOIN eu a ON a.src = p.n1
       JOIN eu b ON b.src = p.n2 AND b.dst = a.dst
       JOIN du dz ON dz.id = a.dst
       GROUP BY p.n1, p.n2)
SELECT p.n1 AS repo1, p.n2 AS repo2,
  coalesce(cnb.c, 0) AS commonNeighbors,
  coalesce(d1.d, 0) + coalesce(d2.d, 0) - coalesce(cnb.c, 0) AS totalNeighbors,
  CAST(coalesce(d1.d, 0) * coalesce(d2.d, 0) AS DOUBLE) AS preferentialAttachment,
  round(coalesce(cnb.aa, 0.0), 6) AS adamicAdar,
  round(coalesce(cnb.ra, 0.0), 6) AS resourceAllocation
FROM pairs p
LEFT JOIN cnb ON cnb.n1 = p.n1 AND cnb.n2 = p.n2
LEFT JOIN du d1 ON d1.id = p.n1
LEFT JOIN du d2 ON d2.id = p.n2"""

  /** SCC on the parity-directed view: component = max id in the SCC. */
  /** SCC on the parity-directed view: component = max id in the SCC.
   *  Mutual reach is an inherently O(n²·deg) closure in SQL, so the gate
   *  runs on the induced ≤ r000500 subgraph (no-op at sf0.001; 164 s →
   *  2 s at sf0.01) — GraphQueries.scc applies the identical gate-scale
   *  bound. */
  val scc: String = graphCte + """,
agg AS MATERIALIZED (SELECT src, dst, sum(weight) AS w FROM edges
      WHERE src <= 'r000500' AND dst <= 'r000500' GROUP BY src, dst),
d AS MATERIALIZED (
      SELECT CASE WHEN CAST(w AS BIGINT) % 2 = 1 THEN src ELSE dst END AS src,
             CASE WHEN CAST(w AS BIGINT) % 2 = 1 THEN dst ELSE src END AS dst
      FROM agg),
reach AS (SELECT src AS a, dst AS b FROM d
          UNION
          SELECT r.a, d.dst AS b FROM reach r JOIN d ON d.src = r.b),
mutual AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
           JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a)
SELECT n.id AS repo,
  greatest(n.id, coalesce(m.mx, n.id)) AS component_repo
FROM (SELECT id FROM nodes WHERE id <= 'r000500') n LEFT JOIN
  (SELECT v, max(u) AS mx FROM mutual GROUP BY v) m ON m.v = n.id"""

  /** Per-level BFS frontier unroll over the induced ≤`bound` subgraph:
   *  emits subn/sube, frontier f0..fK + cumulative seenK, and
   *  `sd(v, s, dd)` = min-distance pairs (each (s,v) lands in exactly one
   *  frontier level). Replaces the recursive closure `reach`, whose
   *  UNION-dedup carried (id, s, lvl) for EVERY lvl reached — the frontier
   *  deltas are the semi-naive form (~n² rows total instead of n²·depth;
   *  closeness 64 s → 3 s at sf0.01). */
  private def bfsFrontierUnrolled(maxDepth: Int, bound: String): String = {
    val levels = (1 to maxDepth).map { t =>
      s"""f$t AS MATERIALIZED (SELECT DISTINCT f.s, e.dst AS v, $t AS lvl
         FROM f${t - 1} f JOIN sube e ON e.src = f.v
         WHERE NOT EXISTS (SELECT 1 FROM seen${t - 1} sn
                           WHERE sn.s = f.s AND sn.v = e.dst)),
seen$t AS MATERIALIZED (SELECT s, v FROM seen${t - 1}
         UNION ALL SELECT s, v FROM f$t)"""
    }.mkString(",\n")
    val allf = (0 to maxDepth).map(l => s"SELECT s, v, lvl FROM f$l")
      .mkString(" UNION ALL ")
    s""",
subn AS MATERIALIZED (SELECT id FROM nodes WHERE id <= '$bound'),
sube AS MATERIALIZED (SELECT src, dst FROM eu
  WHERE src <= '$bound' AND dst <= '$bound'),
f0 AS MATERIALIZED (SELECT id AS s, id AS v, 0 AS lvl FROM subn),
seen0 AS MATERIALIZED (SELECT s, v FROM f0),
$levels,
sd AS MATERIALIZED (SELECT v, s, lvl AS dd FROM ($allf) t)"""
  }

  /** Closeness + harmonic on the induced subgraph of repos ≤ r000500. */
  val closeness: String = graphCte + bfsFrontierUnrolled(15, "r000500") + """,
nsub AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM subn),
far AS (SELECT v AS id, CAST(sum(dd) AS DOUBLE) AS f, count(*) AS rc,
               sum(1.0 / dd) AS h FROM sd WHERE v <> s GROUP BY v)
SELECT n.id AS repo,
  round(CASE WHEN coalesce(far.f, 0.0) > 0.0 THEN far.rc / far.f ELSE 0.0 END, 6) AS closeness,
  round(coalesce(far.h, 0.0) / (SELECT n - 1.0 FROM nsub), 6) AS harmonic
FROM subn n LEFT JOIN far ON far.id = n.id"""

  /** Brandes betweenness on the induced ≤ r000500 subgraph, fully unrolled:
   *  per-level σ tables (σ_l(v) = Σ preds σ_{l−1}) then dependency tables
   *  δ_l(v) = σ_l(v) · Σ_{succ w} (1+δ_{l+1}(w))/σ_{l+1}(w), BC = Σ_s δ / 2
   *  (undirected). Level cap must match the engine's maxDepth. */
  private def betweennessUnrolled(maxDepth: Int): String = {
    // every chained CTE is MATERIALIZED: each sg/dl level is referenced up
    // to 3× downstream, and DuckDB's default inlining would re-expand the
    // whole chain per reference (exponential plan growth → hang).
    val sg = (1 to maxDepth).map { l =>
      s"""sg$l AS MATERIALIZED (SELECT t.v, t.s, sum(p.sg) AS sg
         FROM sd t JOIN sube e ON e.dst = t.v JOIN sg${l - 1} p ON p.s = t.s AND p.v = e.src
         WHERE t.dd = $l GROUP BY t.v, t.s)"""
    }.mkString(",\n")
    val dl = (maxDepth - 1 to 1 by -1).map { l =>
      s"""dl$l AS MATERIALIZED (SELECT t.s, t.v, t.sg * coalesce(c.csum, 0.0) AS delta
         FROM sg$l t LEFT JOIN (
           SELECT w.s, e.src AS v, sum((1.0 + w.delta) / ws.sg) AS csum
           FROM dl${l + 1} w JOIN sg${l + 1} ws ON ws.s = w.s AND ws.v = w.v
           JOIN sube e ON e.dst = w.v GROUP BY w.s, e.src) c
         ON c.s = t.s AND c.v = t.v)"""
    }.mkString(",\n")
    val unioned = (1 to maxDepth).map(l => s"SELECT s, v, delta FROM dl$l")
      .mkString(" UNION ALL ")
    bfsFrontierUnrolled(maxDepth, "r000500") + s""",
sg0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(1 AS DOUBLE) AS sg FROM subn),
$sg,
dl$maxDepth AS MATERIALIZED (SELECT s, v, CAST(0 AS DOUBLE) AS delta FROM sg$maxDepth),
$dl,
alld AS ($unioned),
bcv AS (SELECT v, sum(delta) / 2.0 AS b FROM alld WHERE v <> s GROUP BY v)
SELECT n.id AS repo, round(coalesce(bcv.b, 0.0), 6) AS score
FROM subn n LEFT JOIN bcv ON bcv.v = n.id"""
  }

  val betweenness: String = graphCte + betweennessUnrolled(10)

  /** Bellman-Ford unrolled `iters` rounds from the min repo over the
   *  undirected min-parallel-weight view — identical to the engine's
   *  synchronous relaxation after the same number of supersteps. */
  private def ssspUnrolled(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT x.id, min(x.d) AS d FROM (
         SELECT id, d FROM d${k - 1}
         UNION ALL
         SELECT e.dst AS id, p.d + e.w AS d
         FROM d${k - 1} p JOIN ewmin e ON e.src = p.id) x GROUP BY x.id)"""
    }.mkString(",\n")
    s""",
ewmin AS MATERIALIZED (SELECT src, dst, min(weight) AS w FROM
  (SELECT src, dst, weight FROM edges
   UNION ALL SELECT dst AS src, src AS dst, weight FROM edges) t GROUP BY src, dst),
d0 AS (SELECT min(id) AS id, CAST(0.0 AS DOUBLE) AS d FROM nodes),
$steps
SELECT id AS repo, round(d, 6) AS distance FROM d$iters"""
  }

  val sssp: String = graphCte + ssspUnrolled(10)

  /** Unweighted all-pairs distances on the induced ≤ r000500 subgraph —
   *  the same frontier unroll as `closeness`, streamed as pairs. */
  val allShortestPaths: String = graphCte + bfsFrontierUnrolled(10, "r000500") + """
SELECT s AS source_repo, v AS target_repo, CAST(dd AS DOUBLE) AS distance
FROM sd"""

  val nodeSimilarityWeighted: String = graphCte + """,
interw AS MATERIALIZED (SELECT l.src AS a, r.src AS b, sum(least(l.w, r.w)) AS smin
           FROM ew l JOIN ew r ON l.dst = r.dst AND l.src <> r.src
           WHERE l.src <= 'r001000' AND r.src <= 'r001000'
           GROUP BY l.src, r.src),
simw AS MATERIALIZED (SELECT a, b, smin / (da.wd + db.wd - smin) AS s
         FROM interw JOIN wdeg da ON da.id = a JOIN wdeg db ON db.id = b),
rankedw AS MATERIALIZED (SELECT a, b, s, row_number() OVER
             (PARTITION BY a ORDER BY s DESC, b ASC) AS rank
            FROM simw WHERE s >= 1e-42)
SELECT a AS repo1, b AS repo2, round(s, 6) AS similarity, CAST(rank AS BIGINT) AS rank
FROM rankedw WHERE rank <= 5"""

  /** Bellman-Ford unrolled `rounds` times from the min subgraph repo over
   *  the induced ≤`bound` undirected min-parallel-weight view. With enough
   *  rounds this is CONVERGED (verified empirically: extra rounds change
   *  nothing at the gate scales), so it equals Dijkstra / A-star /
   *  delta-stepping exactly — costs are unique even where paths aren't. */
  private def subBfUnrolled(rounds: Int, bound: String): String = {
    val steps = (1 to rounds).map { k =>
      s"""b$k AS MATERIALIZED (SELECT x.id, min(x.d) AS d FROM (
         SELECT id, d FROM b${k - 1}
         UNION ALL
         SELECT e.dst AS id, p.d + e.w AS d
         FROM b${k - 1} p JOIN sewmin e ON e.src = p.id) x GROUP BY x.id)"""
    }.mkString(",\n")
    s""",
subn AS MATERIALIZED (SELECT id FROM nodes WHERE id <= '$bound'),
sewmin AS MATERIALIZED (SELECT t.src, t.dst, min(t.weight) AS w FROM
  (SELECT src, dst, weight FROM edges
   UNION ALL SELECT dst AS src, src AS dst, weight FROM edges) t
  JOIN subn a ON a.id = t.src JOIN subn b ON b.id = t.dst
  GROUP BY t.src, t.dst),
b0 AS (SELECT min(id) AS id, CAST(0.0 AS DOUBLE) AS d FROM subn),
$steps"""
  }

  /** A* h=0 point-to-point costs: converged BF distances, restricted to
   *  the 3 lexicographically-largest subgraph repos (reached only). */
  val astar: String = graphCte + subBfUnrolled(20, "r000500") + """,
tg AS (SELECT id FROM subn ORDER BY id DESC LIMIT 3)
SELECT t.id AS target_repo, round(d.d, 6) AS cost
FROM tg t JOIN b20 d ON d.id = t.id"""

  /** Delta-stepping distances = the same converged BF surface. */
  val deltaStepping: String = graphCte + subBfUnrolled(20, "r000500") + """
SELECT id AS repo, round(d, 6) AS distance FROM b20"""

  val oneHot: String = graphCte + """,
langs AS (SELECT repo, list_sort(list_distinct(list(lang))) AS ls FROM cf GROUP BY repo)
SELECT repo,
  CAST(CASE WHEN list_contains(ls, 'java')  THEN 1 ELSE 0 END AS BIGINT) AS has_java,
  CAST(CASE WHEN list_contains(ls, 'py')    THEN 1 ELSE 0 END AS BIGINT) AS has_py,
  CAST(CASE WHEN list_contains(ls, 'scala') THEN 1 ELSE 0 END AS BIGINT) AS has_scala
FROM langs"""

  /** Long-form property stream after two mutates: undirected simple degree
   *  + weighted natural out-degree (both formulas already oracle-pinned by
   *  graph_degree / degree_centrality). */
  val streamNodeProperties: String = graphCte + """
SELECT n.id AS repo, 'degree' AS property,
       CAST(coalesce(du.d, 0) AS DOUBLE) AS value
FROM nodes n LEFT JOIN du ON du.id = n.id
UNION ALL
SELECT n.id AS repo, 'wdegree' AS property, coalesce(s.w, 0.0) AS value
FROM nodes n LEFT JOIN
  (SELECT src, sum(weight) AS w FROM edges GROUP BY src) s ON s.src = n.id"""

  /** Configured similarity proc: cosine over user vectors with
   *  sourceIds (<200) / targetIds (<1000), cutoff 0.0 BEFORE topK=4. */
  val similarityProc: String = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT * FROM v WHERE vec_id < 200),
t AS (SELECT * FROM v WHERE vec_id < 1000),
p AS (SELECT s.vec_id AS item1, t.vec_id AS item2,
        list_inner_product(s.e, t.e) /
        (sqrt(list_inner_product(s.e, s.e)) * sqrt(list_inner_product(t.e, t.e))) AS c
      FROM s JOIN t ON s.vec_id <> t.vec_id),
f AS (SELECT * FROM p WHERE c >= 0.0),
r AS (SELECT item1, item2, c, row_number() OVER
       (PARTITION BY item1 ORDER BY c DESC, item2 ASC) AS rank FROM f)
SELECT item1, item2, round(c, 6) AS similarity, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 4"""

  /** Property oracle (k1coloring_check): a proper coloring has ZERO
   *  conflicting edges — the Spark side counts conflicts from its actual
   *  coloring on the induced ≤ r001000 subgraph. */
  val k1coloringCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, CAST(0 AS BIGINT) AS conflict_edges
FROM nodes WHERE id <= 'r001000'"""

  /** Property oracle (mst_check): a minimum spanning forest has exactly
   *  (component size − 1) edges inside every connected component; the
   *  Spark side counts its actual forest's edges per WCC component. */
  val mstCheck: String = graphCte + wccRounds(8) + """
SELECT comp AS component_repo, CAST(count(*) AS BIGINT) AS nodes,
       CAST(count(*) - 1 AS BIGINT) AS tree_edges
FROM l8 GROUP BY comp"""

  /** Property oracle (louvain_check): the assignment covers every node of
   *  the fixed ≤ r001000 subgraph exactly once, and its modularity beats
   *  the singleton start partition; Spark measures both. */
  val louvainCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS full_cover,
       true AS beats_singletons
FROM nodes WHERE id <= 'r001000'"""

  /** Property oracle (yens_check): k loopless cost-ordered distinct paths,
   *  first = Dijkstra optimum, on the ≤ r000300 subgraph; Spark checks its
   *  actual paths, the oracle pins all four invariants. */
  val yensCheck: String = """
SELECT true AS first_is_shortest, true AS costs_nondecreasing,
       true AS all_loopless, true AS paths_distinct"""

  /** Property oracle (hyperball_check): the m=64 sketch's reachable-ball
   *  estimates track the exact MS-BFS ball sizes on the ≤ r000500
   *  subgraph (mean rel-err ≤ 0.25, max ≤ 1.0); Spark measures both. */
  val hyperballCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS mean_relerr_le_025,
       true AS max_relerr_le_1
FROM nodes WHERE id <= 'r000500'"""

  /** Property oracle (fastrp_check): iteration-weight (0,1,1) combination
   *  of per-iteration L2-normalized embeddings ⇒ every norm ≤ 2; dim 32;
   *  one embedding per graph node. Spark measures its actual output. */
  val fastrpCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS dim_32,
       CAST(0 AS BIGINT) AS norm_violations
FROM nodes"""

  /** Property oracle (node2vec_check): skip-gram SGD over the walk corpus
   *  must produce one dim-16 embedding per graph node and DESCEND the
   *  negative-sampling loss (last step's mean sample loss < first's) —
   *  the Node2VecModel training contract; Spark measures its actual loss
   *  trajectory and embedding shapes. */
  val node2vecCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS dim_16,
       true AS loss_decreased
FROM nodes"""

  /** Property oracle (graphsage_check): one L2-normalized dim-8 embedding
   *  per graph node and a descending unsupervised GraphSageLoss across
   *  epochs — the GraphSageModelTrainer contract; Spark measures its
   *  actual loss trajectory, dims, and norms. */
  val graphsageCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS dim_8,
       CAST(0 AS BIGINT) AS unit_norm_violations, true AS loss_decreased
FROM nodes"""

  /** Property oracle (graphsage_train_check): the multi-layer Adam
   *  trainer (2-layer sigmoid stack, exact backprop) must produce one
   *  L2-normalized dim-8 embedding per graph node and descend the
   *  unsupervised loss; Spark measures its actual trajectory/dims/norms. */
  val graphsageTrainCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS nodes, true AS dim_8,
       CAST(0 AS BIGINT) AS unit_norm_violations, true AS loss_decreased
FROM nodes"""

  /** Property oracle (random_walk_check): walksPerNode = 1 ⇒ one walk per
   *  graph node, and every hop must follow a real directed edge (Spark
   *  anti-joins its actual hops against the Natural edge set). */
  val randomWalkCheck: String = graphCte + """
SELECT CAST(count(*) AS BIGINT) AS walks, CAST(0 AS BIGINT) AS bad_steps
FROM nodes"""

  /** Property oracle (dfs_check): an unbounded undirected DFS visits the
   *  source's whole connected component exactly once — the oracle
   *  recomputes the reachable set of the min repo on the ≤ r000500
   *  induced subgraph with a recursive CTE; Spark reports its actual
   *  visited count, distinct visit orders, and source-first flag. */
  val dfsCheck: String = graphCte + """,
seu AS MATERIALIZED (SELECT src, dst FROM eu
  WHERE src <= 'r000500' AND dst <= 'r000500'),
src0 AS (SELECT min(id) AS s FROM nodes WHERE id <= 'r000500'),
reach AS (SELECT s AS id FROM src0
          UNION
          SELECT e.dst AS id FROM reach r JOIN seu e ON e.src = r.id)
SELECT CAST(count(*) AS BIGINT) AS nodes,
       CAST(count(*) AS BIGINT) AS distinct_orders,
       true AS source_first
FROM reach"""

  /** Property oracle (multimodal_check): every synthesized BMP payload
   *  decodes to an 11-dim feature vector with in-range channel means and
   *  a luminance histogram summing to 1; Spark counts violations over its
   *  actual raster math, the oracle pins the doc count and zero. */
  val multimodalCheck: String = """
SELECT CAST(count(*) AS BIGINT) AS docs, CAST(0 AS BIGINT) AS violations
FROM documents"""

  /** Value oracle (video_frames): the GVID sampling schedule is fully
   *  portable — 6 frames / fps 25 / n=3 gives source indices ⌊i·6/3⌋ =
   *  {0,2,4}, timestamps idx·40 ms, and constant 118-byte BMP frames
   *  (54-byte header + 64 sha512 pixel bytes). */
  val videoFrames: String = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 40 AS BIGINT) AS ts_ms, CAST(118 AS BIGINT) AS frame_bytes
FROM documents CROSS JOIN (VALUES (0), (2), (4)) t(f)"""

  /** Property oracle (video_frames_check): every frame sliced out of the
   *  GVID container decodes through the full raster feature path (11-dim
   *  vector, unit histogram); Spark counts violations. */
  val videoFramesCheck: String = """
SELECT CAST(count(*) AS BIGINT) AS docs, CAST(3 * count(*) AS BIGINT) AS frames,
       CAST(0 AS BIGINT) AS violations
FROM documents"""

  /** Property oracle (knn_recall): LSH recall@5 vs the exact brute-force
   *  top-k must clear the 0.25 regression floor; Spark measures it. */
  val knnRecall: String = """
SELECT CAST(count(*) AS BIGINT) AS queries, true AS recall_ge_0_25
FROM embeddings WHERE vec_id < 2000"""

  /** Property oracle (ivf_recall): IVF cell-restricted recall@5 vs the
   *  exact brute-force top-k must clear the 0.10 regression floor (a broken
   *  cell assignment or pair scan drops it to ~k/n); Spark measures it. */
  val ivfRecall: String = """
SELECT CAST(count(*) AS BIGINT) AS queries, true AS recall_ge_0_10
FROM embeddings WHERE vec_id < 2000"""

  /** Property oracle (ann_descent_recall): NN-descent refinement must lift
   *  recall@5 over the raw LSH init (0.35-0.47) to ≥0.80; Spark measures it. */
  val annDescentRecall: String = """
SELECT CAST(count(*) AS BIGINT) AS queries, true AS recall_ge_0_80
FROM embeddings WHERE vec_id < 2000"""

  /** Embedding-cosine near-dup pairs — FULL value oracle: DuckDB
   *  recomputes every pairwise cosine with list_inner_product and applies
   *  the same unrounded τ filter (round only on output, like Spark). */
  val dedupEmbedding: String = """
WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 2000),
p AS (SELECT a.vec_id AS a, b.vec_id AS b,
        list_inner_product(a.e, b.e) /
        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS c
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
SELECT a, b, round(c, 6) AS cosine FROM p WHERE c >= 0.35"""

  /** Canonical assignment over the near-dup graph — FULL value oracle for
   *  the Dedup × Wcc composition: recursive min-label propagation over the
   *  symmetrized pair edges; canonical = min reachable id (= min id of the
   *  connected component). Pair volume is a few hundred rows at gate
   *  scales, so the transitive closure is trivial for DuckDB. */
  val dedupEmbeddingCanon: String = """
WITH RECURSIVE v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 2000),
p AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE list_inner_product(a.e, b.e) /
        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.35),
e AS MATERIALIZED (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT vec_id AS id, vec_id AS lbl FROM v
  UNION
  SELECT e.b AS id, r.lbl AS lbl FROM r JOIN e ON e.a = r.id
)
SELECT id AS vec_id, CAST(min(lbl) AS BIGINT) AS canonical_id FROM r GROUP BY id"""

  /** Property oracle (dedup_embedding_check): the LSH path's verified
   *  pairs are a subset of the exact pairs (false_positives = 0 by
   *  construction) with recall ≥ 0.6; exact_pairs is recomputed fully. */
  val dedupEmbeddingCheck: String = """
WITH v AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 2000)
SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
       CAST(0 AS BIGINT) AS false_positives, true AS recall_ge_0_60
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.e, b.e) /
      (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.35"""

  val all: Map[String, String] = Map(
    "dedup_embedding" -> dedupEmbedding,
    "dedup_embedding_canon" -> dedupEmbeddingCanon,
    "dedup_embedding_check" -> dedupEmbeddingCheck,
    "k1coloring_check" -> k1coloringCheck,
    "mst_check" -> mstCheck,
    "fastrp_check" -> fastrpCheck,
    "node2vec_check" -> node2vecCheck,
    "graphsage_check" -> graphsageCheck,
    "graphsage_train_check" -> graphsageTrainCheck,
    "random_walk_check" -> randomWalkCheck,
    "hyperball_check" -> hyperballCheck,
    "louvain_check" -> louvainCheck,
    "yens_check" -> yensCheck,
    "knn_recall" -> knnRecall,
    "ivf_recall" -> ivfRecall,
    "video_frames" -> videoFrames,
    "video_frames_check" -> videoFramesCheck,
    "ann_descent_recall" -> annDescentRecall,
    "astar" -> astar,
    "delta_stepping" -> deltaStepping,
    "one_hot" -> oneHot,
    "stream_node_properties" -> streamNodeProperties,
    "similarity_proc" -> similarityProc,
    "betweenness" -> betweenness,
    "sssp" -> sssp,
    "node_similarity_weighted" -> nodeSimilarityWeighted,
    "all_shortest_paths" -> allShortestPaths,
    "article_rank" -> articleRank,
    "eigenvector" -> eigenvector,
    "link_prediction" -> linkPrediction,
    "scc" -> scc,
    "closeness" -> closeness,
    "ingest_sha" -> ingestSha,
    "graph_edges" -> graphEdges,
    "graph_degree" -> degree,
    "degree_centrality" -> degreeCentralityWeighted,
    "pagerank" -> pagerank,
    "pagerank_weighted" -> pagerankWeighted,
    "pagerank_personalized" -> pagerankPersonalized,
    "wcc" -> wcc,
    "wcc_consecutive" -> wccConsecutive,
    "lpa" -> lpa,
    "triangle_count" -> triangleCount,
    "lcc" -> lcc,
    "node_similarity" -> nodeSimilarity,
    "bfs" -> bfs,
    "dedup_exact" -> dedupExact,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "lang_id" -> langId,
    "ann_cosine" -> annCosine,
    "dedup_minhash" -> minhash,
    "dedup_lsh_pairs" -> dedupLshPairs,
    "doc_fingerprint" -> docFingerprint,
    "dedup_ngram_pairs" -> dedupNgram,
    "simhash_check" -> simhashCheck,
    "dfs_check" -> dfsCheck,
    "multimodal_check" -> multimodalCheck)
}
