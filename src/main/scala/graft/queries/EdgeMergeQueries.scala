package graft.queries

import graft.Q
import graft.pipelines.{DdiPipeline, DiseaseEdgesPipeline}

/** DDI, DGI, disease–drug, and DDA edge-merge queries (node_data/drug.py /
  * disease.py edge chains), each oracle-checked end-to-end. These close the
  * reference dataflows that reused already-proven kernels but had no named
  * analog after round 2 — and `dgi_ctd` puts the P9 conflicting-evidence
  * exclusion on an oracle path. */
object EdgeMergeQueries {

  /** Shared pair-dedup subquery shape: winner-orientation undirected dedup
    * under an explicit total order (QUALIFY over least/greatest). */
  val ddiMerged = Q(
    "ddi_merged",
    """WITH li AS (SELECT 'DB' || l_partkey AS drug1, 'DB' || l_suppkey AS drug2,
      |    l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_discount,
      |    l_quantity, l_tax FROM lineitem),
      |kegg AS (
      |  SELECT drug1, drug2, recommendation, source FROM (
      |    SELECT drug1, drug2,
      |      NULLIF(CONCAT_WS('|',
      |        CASE WHEN l_discount > 0.05 THEN 'contraindication' END,
      |        CASE WHEN l_quantity > 25 THEN 'precaution' END), '') AS recommendation,
      |      'Kegg' AS source, l_orderkey, l_linenumber
      |    FROM li WHERE l_returnflag = 'A')
      |  QUALIFY row_number() OVER (
      |    PARTITION BY least(drug1, drug2), greatest(drug1, drug2)
      |    ORDER BY l_orderkey, l_linenumber) = 1),
      |dd AS (
      |  SELECT drug1, drug2, interaction_level, interaction_type, source FROM (
      |    SELECT drug1, drug2,
      |      CASE WHEN l_tax < 0.03 THEN 'Minor'
      |           WHEN l_tax < 0.06 THEN 'Moderate' ELSE 'Major' END AS interaction_level,
      |      NULLIF(CONCAT_WS('|',
      |        CASE WHEN l_discount > 0.05 THEN 'metabolism' END,
      |        CASE WHEN l_quantity > 25 THEN 'serum_concentration' END), '') AS interaction_type,
      |      'DDInter' AS source, l_orderkey, l_linenumber
      |    FROM li WHERE l_returnflag = 'N' AND l_linestatus = 'F')
      |  QUALIFY row_number() OVER (
      |    PARTITION BY least(drug1, drug2), greatest(drug1, drug2)
      |    ORDER BY l_orderkey, l_linenumber) = 1)
      |SELECT COALESCE(k.drug1, d.drug1) AS drug1,
      |  COALESCE(k.drug2, d.drug2) AS drug2,
      |  CONCAT_WS('|',
      |    CASE WHEN d.drug1 IS NOT NULL THEN 'DDInter' END,
      |    CASE WHEN k.drug1 IS NOT NULL THEN 'Kegg' END) AS source,
      |  k.recommendation, d.interaction_level, d.interaction_type
      |FROM kegg k FULL OUTER JOIN dd d
      |  ON k.drug1 = d.drug1 AND k.drug2 = d.drug2""".stripMargin) {
    (s, d) => DdiPipeline.merged(s, d)
  }

  /** P9 on an oracle path: groups whose evidence set contains BOTH
    * conflicting markers are excluded whole (HAVING NOT (both)). */
  val dgiCtd = Q(
    "dgi_ctd",
    """WITH r AS (SELECT l_suppkey AS entrez, 'DB' || l_partkey AS drug,
      |    CASE WHEN l_quantity > 25 THEN 'increases_expression'
      |         ELSE 'decreases_expression' END AS action,
      |    'ref:' || l_orderkey AS ref
      |  FROM lineitem WHERE l_returnflag = 'R')
      |SELECT entrez, drug, MIN(action) AS action_type,
      |  string_agg(DISTINCT ref, '|' ORDER BY ref) AS refs
      |FROM r GROUP BY entrez, drug
      |HAVING NOT (bool_or(action = 'increases_expression')
      |        AND bool_or(action = 'decreases_expression'))""".stripMargin) {
    (s, d) => DdiPipeline.dgiCtd(s, d)
  }

  val diseaseDrugMerged = Q(
    "disease_drug_merged",
    """WITH li AS (SELECT 'mondo:' || l_partkey AS disease_id,
      |    'DB' || l_suppkey AS drug_id,
      |    l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem),
      |ctd AS (SELECT disease_id, drug_id,
      |    string_agg(DISTINCT 'pmid:' || l_orderkey, '|'
      |      ORDER BY 'pmid:' || l_orderkey) AS pubmed_ids,
      |    'CTD' AS source
      |  FROM li WHERE l_returnflag = 'A' GROUP BY 1, 2),
      |chembl AS (
      |  SELECT disease_id, drug_id, max_phase, 'ChEMBL' AS source FROM (
      |    SELECT disease_id, drug_id,
      |      CAST(floor(l_quantity / 10) AS DOUBLE) AS max_phase,
      |      l_orderkey, l_linenumber
      |    FROM li WHERE l_returnflag = 'N' AND floor(l_quantity / 10) > 0)
      |  QUALIFY row_number() OVER (PARTITION BY disease_id, drug_id
      |    ORDER BY max_phase DESC, l_orderkey, l_linenumber) = 1),
      |kegg AS (SELECT DISTINCT disease_id, drug_id, 'KEGG' AS source
      |  FROM li WHERE l_returnflag = 'R')
      |SELECT
      |  COALESCE(c.disease_id, t.disease_id, k.disease_id) AS disease_id,
      |  COALESCE(c.drug_id, t.drug_id, k.drug_id) AS drug_id,
      |  CONCAT_WS('|',
      |    CASE WHEN t.disease_id IS NOT NULL THEN 'CTD' END,
      |    CASE WHEN c.disease_id IS NOT NULL THEN 'ChEMBL' END,
      |    CASE WHEN k.disease_id IS NOT NULL THEN 'KEGG' END) AS source,
      |  c.max_phase, t.pubmed_ids
      |FROM chembl c
      |FULL OUTER JOIN ctd t
      |  ON c.disease_id = t.disease_id AND c.drug_id = t.drug_id
      |FULL OUTER JOIN kegg k
      |  ON COALESCE(c.disease_id, t.disease_id) = k.disease_id
      |  AND COALESCE(c.drug_id, t.drug_id) = k.drug_id""".stripMargin) {
    (s, d) => DiseaseEdgesPipeline.diseaseDrugMerged(s, d)
  }

  val ddaMerged = Q(
    "dda_merged",
    """WITH li AS (SELECT 'mondo:' || l_partkey AS d1, 'mondo:' || l_suppkey AS d2,
      |    l_orderkey, l_linenumber, l_linestatus, l_discount, l_tax FROM lineitem),
      |g AS (
      |  SELECT d1 AS disease_id1, d2 AS disease_id2,
      |    score AS disgenet_jaccard_genes_score,
      |    'Disgenet Disease-Disease Gene' AS source FROM (
      |    SELECT d1, d2, round(l_discount, 3) AS score, l_orderkey, l_linenumber
      |    FROM li WHERE l_linestatus = 'O' AND round(l_discount, 3) <> 0.0)
      |  QUALIFY row_number() OVER (PARTITION BY least(d1, d2), greatest(d1, d2)
      |    ORDER BY score DESC, l_orderkey, l_linenumber) = 1),
      |v AS (
      |  SELECT d1 AS disease_id1, d2 AS disease_id2,
      |    score AS disgenet_jaccard_variants_score,
      |    'Disgenet Disease-Disease Variant' AS source FROM (
      |    SELECT d1, d2, round(l_tax, 3) AS score, l_orderkey, l_linenumber
      |    FROM li WHERE l_linestatus = 'F' AND round(l_tax, 3) <> 0.0)
      |  QUALIFY row_number() OVER (PARTITION BY least(d1, d2), greatest(d1, d2)
      |    ORDER BY score DESC, l_orderkey, l_linenumber) = 1)
      |SELECT COALESCE(g.disease_id1, v.disease_id1) AS disease_id1,
      |  COALESCE(g.disease_id2, v.disease_id2) AS disease_id2,
      |  CONCAT_WS('|',
      |    CASE WHEN g.disease_id1 IS NOT NULL
      |      THEN 'Disgenet Disease-Disease Gene' END,
      |    CASE WHEN v.disease_id1 IS NOT NULL
      |      THEN 'Disgenet Disease-Disease Variant' END) AS source,
      |  g.disgenet_jaccard_genes_score, v.disgenet_jaccard_variants_score
      |FROM g FULL OUTER JOIN v
      |  ON g.disease_id1 = v.disease_id1 AND g.disease_id2 = v.disease_id2
      |WHERE COALESCE(g.disease_id1, v.disease_id1)
      |  <> COALESCE(g.disease_id2, v.disease_id2)""".stripMargin) {
    (s, d) => DiseaseEdgesPipeline.ddaMerged(s, d)
  }

  /** MONDO child→parent is_a edges (disease.py:1410-1446): the disease
    * module's most-used edge type — every ontology rollup needs it. */
  val diseaseHierarchy = Q(
    "disease_hierarchy",
    """WITH p AS (SELECT c_custkey AS child,
      |    unnest(list_distinct([c_custkey // 7, c_custkey // 11])) AS parent
      |  FROM customer WHERE c_custkey >= 7)
      |SELECT 'mondo:' || child AS src, 'mondo:' || parent AS dst,
      |  'disease_is_a_disease' AS label
      |FROM p WHERE parent >= 1""".stripMargin) {
    (s, d) => DiseaseEdgesPipeline.hierarchyEdges(s, d)
  }

  /** MalaCards comorbidity (disease.py:1127-1163,1584-1611): chained dict
    * admissions, self-pair filter, first-encounter undirected dedup. */
  val diseaseComorbidity = Q(
    "disease_comorbidity",
    """WITH mc AS (SELECT p_partkey AS f, p_partkey * 3 AS mondo
      |            FROM part WHERE p_partkey % 3 <> 0),
      |sm AS (SELECT s_suppkey AS f, s_suppkey + 7 AS mc2
      |       FROM supplier WHERE s_suppkey % 5 <> 0),
      |r AS (SELECT m1.mondo AS d1, m2.mondo AS d2, l_orderkey, l_linenumber
      |  FROM lineitem
      |  JOIN mc m1 ON l_partkey = m1.f
      |  JOIN sm ON l_suppkey = sm.f
      |  JOIN mc m2 ON sm.mc2 = m2.f
      |  WHERE m1.mondo <> m2.mondo)
      |SELECT 'mondo:' || d1 AS src, 'mondo:' || d2 AS dst,
      |  'disease_is_comorbid_with_disease' AS label
      |FROM r
      |QUALIFY row_number() OVER (PARTITION BY least(d1, d2), greatest(d1, d2)
      |  ORDER BY l_orderkey, l_linenumber) = 1""".stripMargin) {
    (s, d) => DiseaseEdgesPipeline.comorbidityEdges(s, d)
  }

  /** PathoPhenoDB organism→disease (disease.py:1448-1487): manual-
    * assertion evidence + DOID→MONDO dict admission, one row per
    * interaction (the reference never dedups). */
  val organismDisease = Q(
    "organism_disease",
    """WITH m AS (SELECT p_partkey AS f, p_partkey + 50000 AS mondo
      |           FROM part WHERE p_partkey % 4 <> 0)
      |SELECT 'ncbitaxon:' || l_suppkey AS src, 'mondo:' || mondo AS dst,
      |  'organism_causes_disease' AS label
      |FROM lineitem JOIN m ON l_partkey = m.f
      |WHERE l_returnflag = 'A'""".stripMargin) {
    (s, d) => DiseaseEdgesPipeline.organismDiseaseEdges(s, d)
  }

  val all: Seq[Q] = Seq(ddiMerged, dgiCtd, diseaseDrugMerged, ddaMerged,
    diseaseHierarchy, diseaseComorbidity, organismDisease)
}
