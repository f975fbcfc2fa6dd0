package graft.oracle

import graft.model.Ns
import graft.sources.{Dicts, SynthTranscripts}

/** DuckDB-dialect oracle SQL for every SparkEntry query (the driver runs
  * these against the same parquet tables and hash-compares the results).
  *
  * The transcript table, dictionaries, linking and emission are re-derived
  * here in pure SQL. The fragments are BUILT FROM THE SAME SCALA CONSTANTS
  * as the Spark side (SynthTranscripts.occWords, Dicts.occupationRows, Ns)
  * so the two implementations cannot drift on data values — only on logic,
  * which is exactly what the correctness gate should test.
  */
object OracleSql {

  /** occupation word list as a VALUES table. */
  private val occValues = SynthTranscripts.occWords.zipWithIndex
    .map { case (w, i) => s"($i,'$w')" }.mkString(",")

  /** occupation dictionary rows as a VALUES table. */
  private val occDictValues = Dicts.occupationRows
    .flatMap { case (rid, term, alts) => alts.map(a => s"($rid,'$term','$a')") }
    .mkString(",")

  /** clean_term simple variant (lower, -→space, strip, remove spaces). */
  def cleanSimple(e: String): String =
    s"replace(trim(replace(lower($e),'-',' ')),' ','')"

  /** clean_term stemmer variant (culturalForm.py:513-521) as nested CASEs.
    * Stages: simple-clean → drop trailing s → drop ism/ist/ing → drop er. */
  def stem(e: String): String = {
    val t0 = cleanSimple(e)
    val t1 = s"(CASE WHEN $t0 LIKE '%s' THEN substr($t0,1,length($t0)-1) ELSE $t0 END)"
    val t2 = s"(CASE WHEN length($t1)>=3 AND substr($t1,length($t1)-2,3) IN ('ism','ist','ing') THEN substr($t1,1,length($t1)-3) ELSE $t1 END)"
    s"(CASE WHEN $t2 LIKE '%er' THEN substr($t2,1,length($t2)-2) ELSE $t2 END)"
  }

  /** Shared CTE block: transcripts, mentions, dictionaries, linked mentions.
    * Mirrors SynthTranscripts / Mentions / Dicts / Link exactly. */
  val BASE: String = s"""
WITH occ(i, w) AS (VALUES $occValues),
tr AS (
  SELECT 'conv_' || lpad(CAST(e.event_id // 20 AS VARCHAR), 6, '0') AS conv_id,
         CAST(e.event_id % 20 AS INT) AS turn_idx,
         CASE e.event_type WHEN 'purchase' THEN 'user' WHEN 'click' THEN 'assistant'
              WHEN 'view' THEN 'assistant' WHEN 'signup' THEN 'system' ELSE 'tool' END AS role,
         'I visited Nation_' || CAST(e.event_id % 31 AS VARCHAR)
           || ' and met Customer#' || lpad(CAST((e.event_id * 7) % 200 AS VARCHAR), 9, '0')
           || ' working as ' || o.w
           || CASE WHEN e.event_id % 5 = 0 THEN ' at Supplier#' || lpad(CAST((e.event_id * 3) % 13 AS VARCHAR), 9, '0') ELSE '' END
           || CASE WHEN e.event_id % 7 = 0 THEN ' leaving Nation_' || CAST((e.event_id + 4) % 31 AS VARCHAR) ELSE '' END
           || '.' AS text,
         CASE WHEN e.event_type = 'error' THEN 'tool_' || CAST(e.event_id % 5 AS VARCHAR) ELSE '' END AS tool,
         e.ts AS ts
  FROM events e JOIN occ o ON o.i = CAST(e.event_id % 12 AS INT)
),
men AS (
  SELECT conv_id, turn_idx, kind, surface, text FROM (
    SELECT conv_id, turn_idx, 'place' AS kind, regexp_extract(text, 'visited (Nation_[0-9]+)', 1) AS surface, text FROM tr
    UNION ALL SELECT conv_id, turn_idx, 'place_left', regexp_extract(text, 'leaving (Nation_[0-9]+)', 1), text FROM tr
    UNION ALL SELECT conv_id, turn_idx, 'person', regexp_extract(text, 'met (Customer#[0-9]{9})', 1), text FROM tr
    UNION ALL SELECT conv_id, turn_idx, 'org', regexp_extract(text, 'at (Supplier#[0-9]{9})', 1), text FROM tr
    UNION ALL SELECT conv_id, turn_idx, 'occupation', regexp_extract(text, 'working as ([A-Za-z-]+)', 1), text FROM tr
  ) WHERE surface IS NOT NULL AND surface <> ''
),
place_dict AS (
  SELECT ${cleanSimple("n_name")} AS key, '${Ns.place}' || CAST(n_nationkey AS VARCHAR) AS uri FROM nation
  UNION ALL
  SELECT ${cleanSimple("r_name")}, '${Ns.place}r' || CAST(r_regionkey AS VARCHAR) FROM region
),
people_dict AS (
  SELECT lower(c_name) AS key, '${Ns.person}' || CAST(c_custkey AS VARCHAR) AS uri,
         CAST(c_custkey AS BIGINT) AS custkey,
         '${Ns.viaf}' || CAST(c_custkey // 3 AS VARCHAR) AS viaf_uri
  FROM customer
),
org_dict AS (SELECT lower(s_name) AS key, '${Ns.org}' || CAST(s_suppkey AS VARCHAR) AS uri FROM supplier),
occ_dict_raw(row_id, term, alt) AS (VALUES $occDictValues),
occ_dict AS (
  SELECT ${stem("alt")} AS key, min_by(term, row_id) AS term
  FROM occ_dict_raw GROUP BY 1
),
linked AS (
  SELECT m.conv_id, m.turn_idx, m.kind, m.surface, m.text,
         d.uri IS NOT NULL AS matched,
         d.uri AS obj_value, d.uri IS NOT NULL AS obj_is_iri,
         '' AS obj_lang, '' AS obj_dtype
  FROM men m LEFT JOIN place_dict d ON ${cleanSimple("m.surface")} = d.key
  WHERE m.kind IN ('place','place_left')
  UNION ALL
  SELECT m.conv_id, m.turn_idx, m.kind, m.surface, m.text,
         d.uri IS NOT NULL,
         COALESCE(d.uri, '${Ns.kg}temp/' || replace(m.surface, '#', '')),
         TRUE, '', ''
  FROM men m LEFT JOIN people_dict d ON lower(m.surface) = d.key
  WHERE m.kind = 'person'
  UNION ALL
  SELECT m.conv_id, m.turn_idx, m.kind, m.surface, m.text,
         d.uri IS NOT NULL,
         COALESCE(d.uri, '${Ns.org}' || replace(m.surface, '#', '') || '_ORG'),
         TRUE, '', ''
  FROM men m LEFT JOIN org_dict d ON lower(m.surface) = d.key
  WHERE m.kind = 'org'
  UNION ALL
  SELECT m.conv_id, m.turn_idx, m.kind, m.surface, m.text,
         d.term IS NOT NULL,
         CASE WHEN d.term LIKE 'http%' THEN d.term
              WHEN d.term IS NOT NULL THEN 'ISO-3166-2:' || d.term
              ELSE m.surface END,
         COALESCE(d.term LIKE 'http%', FALSE),
         '',
         CASE WHEN COALESCE(d.term LIKE 'http%', FALSE) THEN '' ELSE '${Ns.xsdString}' END
  FROM men m LEFT JOIN occ_dict d ON ${stem("m.surface")} = d.key
  WHERE m.kind = 'occupation'
),
emitting AS (
  SELECT * FROM linked WHERE kind NOT IN ('place','place_left') OR matched
),
ctx AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, kind ORDER BY turn_idx) AS ordinal
  FROM emitting
),
all_triples_raw AS (
  SELECT DISTINCT '${Ns.conv}' || conv_id AS subj, '${Ns.rdfType}' AS pred,
         '${Ns.tPerson}' AS obj_value, TRUE AS obj_is_iri, '' AS obj_lang, '' AS obj_dtype FROM tr
  UNION ALL
  SELECT DISTINCT '${Ns.conv}' || conv_id, '${Ns.rdfsLabel}', conv_id, FALSE, 'en', '' FROM tr
  UNION ALL
  SELECT '${Ns.conv}' || conv_id,
         CASE kind WHEN 'place' THEN '${Ns.mentionsPlace}' WHEN 'place_left' THEN '${Ns.leftPlace}'
              WHEN 'person' THEN '${Ns.knowsPerson}' WHEN 'org' THEN '${Ns.memberOf}'
              ELSE '${Ns.hasOccupation}' END,
         obj_value, obj_is_iri, obj_lang, obj_dtype
  FROM emitting
  UNION ALL
  SELECT '${Ns.conv}' || l.conv_id, '${Ns.spatialRel}', l.obj_value, TRUE, '', ''
  FROM linked l
  WHERE l.kind = 'place_left' AND l.matched AND NOT EXISTS (
    SELECT 1 FROM linked v WHERE v.kind = 'place' AND v.matched
      AND v.conv_id = l.conv_id AND v.obj_value = l.obj_value)
  UNION ALL
  SELECT '${Ns.ctx}' || conv_id || '_' || kind || 'Context_' || CAST(ordinal AS VARCHAR),
         '${Ns.rdfType}', '${Ns.tContext}', TRUE, '', '' FROM ctx
  UNION ALL
  SELECT '${Ns.ctx}' || conv_id || '_' || kind || 'Context_' || CAST(ordinal AS VARCHAR),
         '${Ns.hasTarget}', '/conv[' || conv_id || ']/turn[' || CAST(turn_idx AS VARCHAR) || ']',
         FALSE, '', '' FROM ctx
  UNION ALL
  SELECT '${Ns.ctx}' || conv_id || '_' || kind || 'Context_' || CAST(ordinal AS VARCHAR),
         '${Ns.hasSnippet}', text, FALSE, 'en', '' FROM ctx
  UNION ALL
  SELECT d.uri, '${Ns.owlSameAs}', d.viaf_uri, TRUE, '', ''
  FROM (SELECT DISTINCT obj_value FROM linked WHERE kind='person' AND matched) p
  JOIN people_dict d ON d.uri = p.obj_value
  UNION ALL
  SELECT d.uri, '${Ns.owlSameAs}', '${Ns.person}' || CAST(d.custkey - 1 AS VARCHAR), TRUE, '', ''
  FROM (SELECT DISTINCT obj_value FROM linked WHERE kind='person' AND matched) p
  JOIN people_dict d ON d.uri = p.obj_value
  WHERE d.custkey % 5 <> 0
),
all_triples AS (SELECT DISTINCT * FROM all_triples_raw)
"""

  /** sameAs closure as a recursive CTE over the emitted sameAs triples. */
  val CLOSURE_CTES: String = s""",
sa_edges AS (
  SELECT subj AS a, obj_value AS b FROM all_triples WHERE pred = '${Ns.owlSameAs}'
),
und AS (SELECT a, b FROM sa_edges UNION SELECT b, a FROM sa_edges),
reach AS (
  WITH RECURSIVE r(n, m) AS (
    SELECT a, a FROM und
    UNION
    SELECT r.n, e.b FROM r JOIN und e ON r.m = e.a
  ) SELECT * FROM r
),
canon AS (SELECT n AS node, min(m) AS canon FROM reach GROUP BY n)
"""

  val queries: Map[String, String] = Map(
    "kg_transcripts" ->
      (BASE + "SELECT conv_id, turn_idx, role, text, tool, ts FROM tr"),
    "kg_mentions" ->
      (BASE + "SELECT conv_id, turn_idx, kind, surface FROM men"),
    "kg_linked" ->
      (BASE + """SELECT conv_id, turn_idx, kind, surface, matched,
                 obj_value, obj_is_iri, obj_lang, obj_dtype FROM linked"""),
    "kg_ordinals" ->
      (BASE + s"""SELECT conv_id, turn_idx, kind, ordinal,
                 '${Ns.ctx}' || conv_id || '_' || kind || 'Context_' || CAST(ordinal AS VARCHAR) AS ctx_uri
                 FROM ctx"""),
    "kg_triples" ->
      (BASE + "SELECT * FROM all_triples"),
    "kg_sameas_clusters" ->
      (BASE + CLOSURE_CTES + "SELECT node, canon FROM canon"),
    "kg_triples_canon" ->
      (BASE + CLOSURE_CTES + s"""
SELECT DISTINCT
  COALESCE(cs.canon, t.subj) AS subj, t.pred,
  COALESCE(co.canon, t.obj_value) AS obj_value,
  t.obj_is_iri, t.obj_lang, t.obj_dtype
FROM all_triples t
LEFT JOIN canon cs ON t.subj = cs.node
LEFT JOIN canon co ON t.obj_is_iri AND t.obj_value = co.node"""),
    "kg_unmapped" ->
      (BASE + "SELECT kind, surface, count(*) AS n FROM linked WHERE NOT matched GROUP BY kind, surface"),
    "kg_stats" ->
      (BASE + """, per AS (
  SELECT regexp_extract(subj, '(conv_[0-9]+)', 1) AS conv, count(*) AS n
  FROM all_triples WHERE regexp_extract(subj, '(conv_[0-9]+)', 1) <> ''
  GROUP BY 1)
SELECT count(*) AS n_convs, CAST(sum(n) AS BIGINT) AS total_triples, max(n) AS max_per_conv,
       min(n) AS min_per_conv, CAST(sum(n) AS DOUBLE)/count(*) AS avg_per_conv
FROM per"""),
    "kg_heading" ->
      (BASE + """SELECT conv_id, turn_idx,
  COALESCE(
    last_value(CASE WHEN role='system' THEN text END IGNORE NULLS)
      OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    first_value(CASE WHEN role='system' THEN text END IGNORE NULLS)
      OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
    '') AS heading
FROM tr"""),
    "kg_first_person" ->
      (BASE + """SELECT conv_id, min_by(obj_value, turn_idx) AS first_person
FROM linked WHERE kind = 'person' GROUP BY conv_id""")
  )
}
