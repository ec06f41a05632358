"""Perceptual-hash image dedup (multimodal_phash_dedup): the DCT
kernel against a loop-written reference, band-LSH completeness against
the brute-force Hamming join, and engineered near-duplicate recall."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from asr_training_data_pipeline_spark.operators.multimodal import (
    _PHASH_BANDS,
    _PHASH_BLOCK,
    _PHASH_HAMMING_MAX,
    _PHASH_N,
    _decode_image_stub,
    image_phash,
    media_table,
    phash_near_dup_pairs,
)


def _reference_phash(payload: bytes) -> int:
    """Independent pHash written the slow, obvious way: explicit
    O(n^2) DCT-II sums per coefficient — no basis-matrix matmul, no
    batching — so a transcription bug in the engine kernel cannot be
    mirrored here."""
    img = _decode_image_stub(payload)
    sh, sw = img.shape
    n = _PHASH_N
    thumb = np.empty((n, n), dtype=np.float64)
    for r in range(n):
        for c in range(n):
            thumb[r, c] = img[min(r * sh // n, sh - 1), min(c * sw // n, sw - 1)]
    coeffs = np.empty((_PHASH_BLOCK, _PHASH_BLOCK), dtype=np.float64)
    for k in range(_PHASH_BLOCK):
        for l_ in range(_PHASH_BLOCK):
            sk = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
            sl = np.sqrt(1.0 / n) if l_ == 0 else np.sqrt(2.0 / n)
            acc = 0.0
            for i in range(n):
                row = 0.0
                for j in range(n):
                    row += thumb[i, j] * np.cos(
                        np.pi * (2 * j + 1) * l_ / (2 * n)
                    )
                acc += row * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
            coeffs[k, l_] = sk * sl * acc
    block = coeffs.ravel()[1:]
    bits = block > np.median(block)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


_BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 8,
    "pack my box with five dozen liquor jugs " * 9,
    "sphinx of black quartz judge my vow " * 10,
    "how vexingly quick daft zebras jump " * 11,
]


def _mutate(text: str, pos: int) -> str:
    # flip one character: a near-identical image under the byte decode
    return text[:pos] + ("#" if text[pos] != "#" else "@") + text[pos + 1 :]


@pytest.fixture(scope="module")
def media_fixture(spark):
    rows = []
    mid = 0
    for t in _BASE_TEXTS:
        rows.append((mid, t.encode("utf-8")))
        mid += 1
        rows.append((mid, _mutate(t, 7).encode("utf-8")))  # near-dup
        mid += 1
    rows.append((100, _BASE_TEXTS[0].encode("utf-8")))  # exact dup of 0
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_phash_kernel_matches_loop_reference(media_fixture):
    got = {
        r["media_id"]: r["phash"]
        for r in image_phash(media_fixture).collect()
    }
    for mid, payload in media_fixture.collect():
        assert got[mid] == _reference_phash(bytes(payload)), mid
        assert got[mid] >= 0  # 63 bits: sign bit never set


def test_band_lsh_equals_brute_force(media_fixture, spark, sf_dir):
    # real corpus + the engineered fixture: LSH pair set must equal
    # the O(n^2) Hamming join at the exact-recall threshold
    corpus = media_table(spark, sf_dir).select("media_id", "payload")
    hashes = image_phash(corpus).collect()
    hs = {r["media_id"]: r["phash"] for r in hashes}
    ids = sorted(hs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hs[a] ^ hs[b]).count("1") <= _PHASH_HAMMING_MAX:
                brute.add((a, b))
    lsh = {
        (r["media_id_a"], r["media_id_b"])
        for r in phash_near_dup_pairs(
            image_phash(corpus), _PHASH_HAMMING_MAX
        ).collect()
    }
    assert lsh == brute


def test_engineered_near_dups_found(media_fixture):
    pairs = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(image_phash(media_fixture)).collect()
    }
    # the exact duplicate is at distance 0
    assert pairs[(0, 100)] == 0
    # every single-character mutation stays within the Hamming ball
    for base in range(0, 8, 2):
        assert (base, base + 1) in pairs, f"near-dup pair {base} missed"
        assert pairs[(base, base + 1)] <= _PHASH_HAMMING_MAX


def test_band_lsh_rejects_threshold_at_band_count(media_fixture):
    with pytest.raises(ValueError):
        phash_near_dup_pairs(image_phash(media_fixture), _PHASH_BANDS)


def test_phash_pixels_never_shuffle(media_fixture):
    """Plan shape: the only exchange below the pair join carries the
    8-byte hash (and band keys), never the payload column."""
    plan = phash_near_dup_pairs(
        image_phash(media_fixture)
    )._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln
    ]
    assert exchanges, "expected at least one exchange in the pair join"
    assert "payload" not in plan.split("MapInPandas")[0] or all(
        "payload" not in ln for ln in exchanges
    )


# ---------------- audio fingerprint (multimodal_audio_dedup) --------

def _audio_fixture(spark, texts):
    rows = []
    for i, t in enumerate(texts):
        rows.append((i, t.encode("utf-8"),
                     {"mime": "audio/fake-pcm", "frame_rate": 16000,
                      "content_length": len(t), "lang": "en"}))
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<mime:string,frame_rate:int,content_length:bigint,lang:string>",
    )


def test_audio_hash_deterministic_and_positive(spark):
    from asr_training_data_pipeline_spark.operators.multimodal import audio_ahash

    texts = [t * 12 for t in _BASE_TEXTS]
    media = _audio_fixture(spark, texts + texts)  # duplicate block
    got = audio_ahash(media).collect()
    hs = {r["media_id"]: r["phash"] for r in got}
    n = len(texts)
    for i in range(n):
        assert hs[i] == hs[i + n]  # identical payloads, identical hash
        assert hs[i] >= 0  # 63 bits: sign clear


def test_audio_near_dups_found_and_lsh_complete(spark):
    from asr_training_data_pipeline_spark.operators.multimodal import (
        audio_ahash,
        phash_near_dup_pairs,
    )

    base = [t * 12 for t in _BASE_TEXTS]
    texts = []
    for t in base:
        texts.append(t)
        texts.append(_mutate(t, len(t) // 2))  # same length, one byte off
    media = _audio_fixture(spark, texts)
    hashes = {r["media_id"]: r["phash"] for r in audio_ahash(media).collect()}
    brute = {
        (a, b)
        for i, a in enumerate(sorted(hashes))
        for b in sorted(hashes)[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= _PHASH_HAMMING_MAX
    }
    lsh = {
        (r["media_id_a"], r["media_id_b"])
        for r in phash_near_dup_pairs(audio_ahash(media)).collect()
    }
    assert lsh == brute
    # robustness: a single flipped byte moves few cells — every
    # mutation pair stays within a loose Hamming bound, and at least
    # half sit inside the exact-recall ball (cells NEAR the grid
    # median legitimately flip, so d <= 3 for ALL pairs would be an
    # over-claim the fingerprint doesn't make)
    dists = [
        bin(hashes[k] ^ hashes[k + 1]).count("1")
        for k in range(0, len(texts), 2)
    ]
    assert all(d <= 10 for d in dists), dists
    assert sum(d <= _PHASH_HAMMING_MAX for d in dists) >= len(dists) // 2, dists


def test_phash_canonical_cluster_algebra(spark, media_fixture, tmp_path):
    """End-to-end manifest on the engineered fixture: the exact copy
    and the near-dup of base 0 collapse into ONE cluster surviving as
    media_id 0; every other (base, mutation) pair survives as the
    base; the manifest covers every input exactly once."""
    import duckdb as _duck
    import shutil as _sh

    d = str(tmp_path / "sfc")
    import os as _os

    _os.makedirs(d, exist_ok=True)
    rows = [(int(r["media_id"]), bytes(r["payload"]).decode("utf-8"))
            for r in media_fixture.collect()]
    con = _duck.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    con.execute(f"""
COPY (SELECT doc_id, text, 'en' AS lang, 'srcP' AS source,
             CAST(length(text) AS BIGINT) AS n_chars FROM t)
TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        _sh.copyfile(f"{src}/{t}.parquet", f"{d}/{t}.parquet")

    from asr_training_data_pipeline_spark.api import REGISTRY

    got = {
        r["media_id"]: (r["survivor_id"], r["cluster_size"], r["keep"])
        for r in REGISTRY["multimodal_phash_canonical"].fn(spark, d).collect()
    }
    assert set(got) == {r[0] for r in rows}
    # base 0's cluster: {0 (base), 1 (mutation), 100 (exact copy)}
    assert got[0] == (0, 3, True)
    assert got[1] == (0, 3, False)
    assert got[100] == (0, 3, False)
    # the other engineered pairs survive as their even base
    for base in (2, 4, 6):
        assert got[base] == (base, 2, True)
        assert got[base + 1] == (base, 2, False)
    # exactly one survivor per cluster
    survivors = [m for m, (_s, _c, k) in got.items() if k]
    assert sorted(survivors) == [0, 2, 4, 6]


def test_audio_canonical_dense_dup_bounded(spark):
    """Dense-dup corpus (the multimodal_audio_dedup hazard): a 40-copy
    clique must yield a ONE-row-per-clip manifest whose clusters match
    brute-force connected components over the full pairwise Hamming
    graph — and the rep-collapse must keep the banded self-join's
    input at one vertex per DISTINCT fingerprint, so the intermediate
    pair set is bounded by dup-structure, not corpus size."""
    from asr_training_data_pipeline_spark.operators.multimodal import (
        audio_ahash,
        canonical_manifest,
        phash_near_dup_pairs,
    )

    base = [t * 12 for t in _BASE_TEXTS]
    texts = []
    for t in base:
        texts.extend([t] * 40)            # dense clique: 40 exact copies
        texts.append(_mutate(t, len(t) // 2))  # plus one near-dup
    media = _audio_fixture(spark, texts)
    hashes = {r["media_id"]: r["phash"] for r in audio_ahash(media).collect()}

    # brute-force components over the FULL clip graph
    parent = {m: m for m in hashes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= _PHASH_HAMMING_MAX:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp_of = {m: find(m) for m in ids}
    sizes = {}
    for m, c in comp_of.items():
        sizes[c] = sizes.get(c, 0) + 1

    got = {
        r["media_id"]: (r["survivor_id"], r["cluster_size"], r["keep"])
        for r in canonical_manifest(
            audio_ahash(media), slot="canonical_hashes:test"
        ).collect()
    }
    assert set(got) == set(ids)  # one row per clip, always
    for m in ids:
        assert got[m] == (comp_of[m], sizes[comp_of[m]], m == comp_of[m]), m

    # rep-collapse bound: the pair join runs over distinct hashes only
    distinct = len(set(hashes.values()))
    reps = (
        audio_ahash(media)
        .groupBy("phash")
        .agg(F.min("media_id").alias("media_id"))
        .select("media_id", "phash")
    )
    rep_pairs = phash_near_dup_pairs(reps).count()
    assert rep_pairs <= distinct * (distinct - 1) // 2
    # a 40-clique contributes ZERO rep pairs (one vertex), so the rep
    # pair count is far below the clip graph's (~40*39/2 per clique)
    assert rep_pairs < 40


def test_streaming_audio_gate_equals_batch_twin(spark, sf_dir):
    """The audio ingest gate: the streamed frame must EQUAL the batch
    twin built from the same expressions (stateless-plan unification,
    as the SimHash/Bloom gates), and every flagged clip must verify at
    hamming <= radius against a corpus clip on the other side of the
    arrival split."""
    from asr_training_data_pipeline_spark.streaming.windows import (
        _SIMGATE_MOD,
        streaming_audio_gate_frames,
    )

    streamed, twin = streaming_audio_gate_frames(spark, sf_dir)
    got = [tuple(r) for r in streamed.collect()]
    want = [tuple(r) for r in twin.collect()]
    assert got == want
    assert got  # the fixture flags real near-dups; equality isn't vacuous
    for media_id, _band, matched_id, hamming in got:
        assert media_id % _SIMGATE_MOD == 0
        assert matched_id % _SIMGATE_MOD != 0
        assert 0 <= hamming <= _PHASH_HAMMING_MAX
