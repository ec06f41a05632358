"""Unicode capability for the trained text operators (VERDICT r6 task
1): the driver fixture is ASCII word salad, so the codepoint-exactness
claims behind `bpe_merges`/`bpe_vocab`/`langid_trained` — lifted off
their r6 ASCII gates — need a genuinely multilingual fixture. This
suite trains them on CJK (spaceless), Arabic, Greek (including
UPPERCASE final-sigma words, where full lower() would diverge between
engines), Turkish (İ — the other probed lower() divergence), French
diacritics, combining marks, and supplementary-plane emoji, and
requires:

  * exact DuckDB oracle parity (rows + schema + values) — proving the
    ASCII-fold + codepoint-substring design really is engine-identical
    outside ASCII, exactly where lower()-based normalization breaks;
  * real classification power: unlike the label-independent driver
    fixture (chance accuracy, documented), distinct scripts have
    disjoint trigram profiles, so Cavnar–Trenkle must get the
    held-out docs RIGHT, not just deterministically;
  * BPE merges that actually cross into non-ASCII symbols.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest

from asr_training_data_pipeline_spark.api import REGISTRY, oracles
from asr_training_data_pipeline_spark.testing import compare_frames, run_oracle

# doc_id % 5 == 0 rows are the langid scoring split; every language
# block below therefore carries exactly one held-out doc whose text
# reuses the block's phrases. Greek rows 11/13 are intentionally
# UPPERCASE (Σ->ς final-sigma trap) and Turkish rows carry İ/ı — on
# both, Unicode lower() is engine-divergent (probed), so parity here
# is exactly the property the ASCII-only fold was chosen to provide.
_DOCS_SQL = """
SELECT * FROM (VALUES
  (1,  '机器学习模型需要大量训练数据来学习语言的统计规律', 'zh', 'u1', 24),
  (2,  '训练数据的质量决定了语言模型的最终效果和泛化能力', 'zh', 'u2', 24),
  (3,  '大规模语言模型的训练数据需要仔细的清洗和去重处理', 'zh', 'u3', 24),
  (4,  '数据去重是训练数据准备流程中的关键步骤之一', 'zh', 'u4', 21),
  (5,  '语言模型的训练数据质量和数据去重非常重要', 'zh', 'u5', 20),
  (6,  'نماذج اللغة الكبيرة تحتاج إلى بيانات تدريب عالية الجودة', 'ar', 'u6', 55),
  (7,  'جودة بيانات التدريب تحدد أداء نماذج اللغة في النهاية', 'ar', 'u7', 52),
  (8,  'إزالة التكرار من بيانات التدريب خطوة أساسية في المعالجة', 'ar', 'u8', 55),
  (9,  'تنظيف البيانات وإزالة التكرار يحسن جودة نماذج اللغة', 'ar', 'u9', 51),
  (10, 'بيانات التدريب عالية الجودة مهمة لنماذج اللغة الكبيرة', 'ar', 'u10', 53),
  (11, 'ΤΑ ΓΛΩΣΣΙΚΑ ΜΟΝΤΕΛΑ ΧΡΕΙΑΖΟΝΤΑΙ ΔΕΔΟΜΕΝΑ ΕΚΠΑΙΔΕΥΣΗΣ', 'el', 'u11', 54),
  (12, 'η ποιότητα των δεδομένων εκπαίδευσης καθορίζει το μοντέλο', 'el', 'u12', 57),
  (13, 'Η ΑΦΑΙΡΕΣΗ ΔΙΠΛΟΤΥΠΩΝ ΑΠΟ ΤΑ ΔΕΔΟΜΕΝΑ ΕΙΝΑΙ ΒΑΣΙΚΗ', 'el', 'u13', 51),
  (14, 'τα δεδομένα εκπαίδευσης θέλουν καθαρισμό και αφαίρεση διπλοτύπων', 'el', 'u14', 64),
  (15, 'τα γλωσσικά μοντέλα θέλουν δεδομένα εκπαίδευσης με ποιότητα', 'el', 'u15', 59),
  (16, 'İstanbul''daki dil modelleri eğitim verisi kalitesine bağlıdır', 'tr', 'u16', 61),
  (17, 'eğitim verisindeki yinelenen kayıtların ayıklanması önemlidir', 'tr', 'u17', 61),
  (18, 'büyük dil modelleri için eğitim verisi temizliği şarttır', 'tr', 'u18', 56),
  (19, 'İyi eğitim verisi dil modelinin başarısını doğrudan etkiler', 'tr', 'u19', 59),
  (20, 'dil modelleri eğitim verisi kalitesi ve temizliği ister', 'tr', 'u20', 55),
  (21, 'les modèles de langue exigent des données d''entraînement propres', 'fr', 'u21', 64),
  (22, 'la qualité des données d''entraînement détermine le modèle élève', 'fr', 'u22', 63),
  (23, 'déduplication des données d''entraînement est une étape nécessaire', 'fr', 'u23', 65),
  (24, 'nettoyer les données améliore la qualité du modèle de langue', 'fr', 'u24', 60),
  (25, 'les données d''entraînement propres améliorent le modèle de langue', 'fr', 'u25', 65),
  (26, NULL, 'en', 'u26', 0),
  (27, '', 'en', 'u27', 0),
  (28, 'x', 'en', 'u28', 1),
  (29, 'étude déjà vu — étude with a combining mark', 'fr', 'u29', 45),
  (30, '🤖🌍🤖🌍🤖 data 🤖🌍 emoji 🤖🌍🤖 corpus 🤖🌍', 'xx', 'u30', 38),
  (31, 'ＦＵＬＬＷＩＤＴＨ ＬＡＴＩＮ ｔｅｘｔ ｈｅｒｅ', 'en', 'u31', 24)
) AS t(doc_id, text, lang, source, n_chars)
"""

QUERIES = ["bpe_merges", "bpe_vocab", "langid_trained"]


@pytest.fixture(scope="module")
def unicode_sf_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="uni_sf_")
    duckdb.sql(f"COPY ({_DOCS_SQL}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", QUERIES)
def test_unicode_oracle_parity(spark, unicode_sf_dir, name):
    spdf = REGISTRY[name].fn(spark, unicode_sf_dir).toPandas()
    compare_frames(spdf, run_oracle(oracles()[name], unicode_sf_dir), name)


def test_langid_classifies_real_scripts(spark, unicode_sf_dir):
    """On genuinely multilingual text the trained trigram profiles are
    script-disjoint, so the five single-script held-out docs (5=zh,
    10=ar, 15=el, 20=tr, 25=fr) must ALL classify correctly — this is
    the capability claim, not just determinism."""
    rows = {
        r.doc_id: r
        for r in REGISTRY["langid_trained"].fn(spark, unicode_sf_dir).collect()
    }
    for doc_id, lang in [(5, "zh"), (10, "ar"), (15, "el"), (20, "tr"), (25, "fr")]:
        assert rows[doc_id].predicted == lang, (doc_id, rows[doc_id])
        assert bool(rows[doc_id].correct)


def test_bpe_learns_nonascii_merges(spark, unicode_sf_dir):
    """The merge table must reach beyond ASCII: with spaceless CJK
    docs as single word types, frequent character bigrams like 训练 /
    数据 are the corpus's top pairs, so at least one learned merge is
    fully non-ASCII (and every merged symbol still concatenates its
    pair exactly, codepoint-wise)."""
    rows = REGISTRY["bpe_merges"].fn(spark, unicode_sf_dir).collect()
    assert len(rows) > 0
    assert any(max(ord(c) for c in r.merged) > 127 for r in rows), rows
    for r in rows:
        a, b = r.pair.split(" ")
        assert r.merged == a + b


def test_generated_casefold_table(spark):
    """VERDICT r7 task 4: the generated fold table must lower
    Cyrillic/Greek/Latin-accented text identically on both engines —
    and must NOT touch the known engine-divergent codepoints (İ has no
    1:1 simple map; ς unifies INTO σ, never the reverse)."""
    import duckdb

    from asr_training_data_pipeline_spark.functions.casefold import (
        FOLD_DST, FOLD_SRC, fold_sql)

    cases = [
        ("Привет МИР", "привет мир"),
        ("ΓΛΩΣΣΙΚΆ ΜΟΝΤΈΛΑ ΤΕΛΟΣ", "γλωσσικά μοντέλα τελοσ"),
        ("ΤΈΛΟΣ ΕΚΠΑΙΔΕΥΣΗΣ ς", "τέλοσ εκπαιδευσησ σ"),
        ("ÉTUDE Déjà Ç Ñ Ø Ā Ł", "étude déjà ç ñ ø ā ł"),
        ("İstanbul Iı", "İstanbul iı"),  # İ folds to itself (no 1:1 map)
        ("日本語 🤖 ＦＵＬＬ", "日本語 🤖 ＦＵＬＬ"),  # out of scope: unchanged
    ]
    table = str.maketrans(FOLD_SRC, FOLD_DST)
    con = duckdb.connect()
    from pyspark.sql import functions as F

    src_df = spark.createDataFrame([(s,) for s, _ in cases], ["text"])
    spark_out = {
        r.text: r.folded
        for r in src_df.select(
            "text", F.translate("text", FOLD_SRC, FOLD_DST).alias("folded")
        ).collect()
    }
    for s, want in cases:
        assert s.translate(table) == want, (s, s.translate(table))
        assert con.sql(f"select {fold_sql(chr(39) + s + chr(39))}").fetchone()[0] == want
        assert spark_out[s] == want, (s, spark_out[s])


def test_bpe_vocab_nonascii_symbols(spark, unicode_sf_dir):
    """The induced vocabulary carries CJK/Arabic/Greek/emoji symbols
    with exact corpus counts; char conservation holds across scripts
    (pandas str.len counts code points, matching Spark length)."""
    vocab = REGISTRY["bpe_vocab"].fn(spark, unicode_sf_dir).toPandas()
    syms = set(vocab.symbol)
    assert any(max(ord(c) for c in s) > 0x4E00 for s in syms)  # CJK
    assert "🤖" in syms or any("🤖" in s for s in syms)  # supplementary
