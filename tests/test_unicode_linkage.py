"""Unicode capability for the fold/edit-distance operators (VERDICT r7
tasks 4+5): the r7 engine ASCII-gated every Levenshtein-family linkage
query and casefolded only [A-Z], so "Привет" ≠ "привет" and non-ASCII
records silently dropped out of entity resolution. This suite builds a
multilingual two-source fixture with known cross-source near-duplicates
and requires:

  * exact DuckDB oracle parity for the linkage + sorted-neighborhood
    queries — proving the generated fold table and the ASCII projection
    (functions/casefold.py) really are engine-identical where lower()
    and levenshtein diverge;
  * real linkage power: the Cyrillic typo pair, the Greek CASE pair,
    the accented-vs-stripped French pair, and the Latin/Cyrillic
    HOMOGLYPH pair must all actually link, with the expected distances;
  * honest scope: the CJK pair (character edit distance is not a
    meaningful metric there) is gated out, not silently mis-scored.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

# Two feeds (src_a / src_b) carrying the same records with small
# perturbations. Block key = first 4 projected chars, so each pair
# shares its opening word; distances are measured over the projected
# 40-char key.
_DOCS_SQL = """
SELECT * FROM (VALUES
  -- Cyrillic: identical but one-codepoint typo (вокзал/вокзол)
  (1,  'москва центральный вокзал расписание поездов и билеты', 'ru', 'src_a', 54),
  (2,  'москва центральный вокзол расписание поездов и билеты', 'ru', 'src_b', 54),
  -- Cyrillic CASE: same text, different case (folds equal -> dist 0)
  (3,  'Санкт-Петербург Невский Проспект музеи и театры города', 'ru', 'src_a', 55),
  (4,  'санкт-петербург невский проспект МУЗЕИ И ТЕАТРЫ ГОРОДА', 'ru', 'src_b', 55),
  -- Greek CASE + final sigma: ΤΕΛΟΣ folds to τελοσ, ς unifies to σ
  (5,  'ΓΛΩΣΣΙΚΑ ΜΟΝΤΕΛΑ ΘΕΛΟΥΝ ΔΕΔΟΜΕΝΑ ΕΚΠΑΙΔΕΥΣΗΣ ΤΕΛΟΣ', 'el', 'src_a', 51),
  (6,  'γλωσσικα μοντελα θελουν δεδομενα εκπαιδευσης τελος', 'el', 'src_b', 50),
  -- French: accented vs diacritic-stripped (projection unifies)
  (7,  'déjà les données d''entraînement déterminent le modèle', 'fr', 'src_a', 54),
  (8,  'deja les donnees d''entrainement determinent le modele', 'fr', 'src_b', 54),
  -- HOMOGLYPH: Cyrillic а/е/о/р/с/у/х typed inside Latin text
  (9,  'data pipeline report for the sales group analysis', 'en', 'src_a', 50),
  (10, 'dаta pipeline repоrt for the sаles grоup analysis', 'en', 'src_b', 50),
  -- CJK: same-block pair that must be GATED (no linkage rows)
  (11, '机器学习模型需要大量训练数据来学习语言统计规律', 'zh', 'src_a', 23),
  (12, '机器学习模型需要大量训练数据来学习语言统计规则', 'zh', 'src_b', 23),
  -- unpaired distractors + degenerates
  (13, 'совершенно другой текст про погоду и климат сибири', 'ru', 'src_a', 51),
  (14, 'an unrelated english document about spark planning', 'en', 'src_b', 51),
  (15, NULL, 'en', 'src_a', 0),
  (16, '', 'en', 'src_b', 0)
) AS t(doc_id, text, lang, source, n_chars)
"""

QUERIES = [
    "record_linkage_fuzzy",
    "linkage_entities",
    "sorted_neighborhood_pairs",
    "sorted_neighborhood_multikey",
]


@pytest.fixture(scope="module")
def linkage_sf_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="unilink_sf_")
    duckdb.sql(f"COPY ({_DOCS_SQL}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_unicode_linkage_oracle_parity(spark, linkage_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, linkage_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], linkage_sf_dir), name)


def test_nonascii_records_link_with_expected_distances(spark, linkage_sf_dir):
    rows = {
        r.doc_id: r
        for r in REGISTRY["record_linkage_fuzzy"].fn(spark, linkage_sf_dir).collect()
    }
    # Cyrillic typo: exactly one substituted codepoint
    assert rows[1].match_doc == 2 and rows[1].dist == 1, rows.get(1)
    # Cyrillic case pair: fold makes the keys equal
    assert rows[3].match_doc == 4 and rows[3].dist == 0, rows.get(3)
    # Greek case + final-sigma pair
    assert rows[5].match_doc == 6 and rows[5].dist == 0, rows.get(5)
    # French accents vs stripped: projection unifies to dist 0
    assert rows[7].match_doc == 8 and rows[7].dist == 0, rows.get(7)
    # Latin/Cyrillic homoglyphs unify via the TR39 confusable map
    assert rows[9].match_doc == 10 and rows[9].dist == 0, rows.get(9)
    # CJK pair is gated out (projection still multi-byte), distractors
    # have no cross-source match within distance 8
    for absent in (11, 12, 13, 14, 15, 16):
        assert absent not in rows, rows.get(absent)


def test_homoglyph_pair_forms_one_entity(spark, linkage_sf_dir):
    ents = {
        r.doc_id: r.entity
        for r in REGISTRY["linkage_entities"].fn(spark, linkage_sf_dir).collect()
    }
    assert ents[9] == ents[10]
    assert ents[1] == ents[2]
    assert 11 not in ents and 12 not in ents
