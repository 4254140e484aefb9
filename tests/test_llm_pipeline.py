"""Unit/property tests for the LLM-data-pipeline slice (dedup,
similarity, textstats, multimodal) beyond the registry-wide oracle
parity in test_parity.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from empdia_iceberg_spark.operators import dedup, multimodal, similarity, textstats
from tests.conftest import SF_DIR


def test_minhash_lsh_equals_exact(spark):
    """Verified LSH candidates must reproduce the exact Jaccard answer
    (miss probability at the 0.8 threshold is ~5e-8 with 32×4 bands)."""
    exact = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in dedup.doc_ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in dedup.doc_minhash_near_dup(spark, SF_DIR).collect()
    }
    assert exact, "fixture should contain planted near-dup pairs"
    assert lsh == exact


def test_verify_pairs_restricted_path_matches_direct(spark):
    """The candidate-restricted verify branch (taken above the
    64 MB corpus gate, so never exercised by the small fixtures on the
    registry path) must return exactly the direct corpus-wide rows —
    the restriction only changes WHERE the shingles for the verify join
    are computed, never which pairs qualify."""
    from empdia_iceberg_spark.sources.tables import load

    sh = dedup._shingled_docs(spark, SF_DIR)
    direct = dedup._verify_pairs(dedup.lsh_candidates(sh), sh).collect()
    sh = dedup._shingled_docs(spark, SF_DIR)
    restricted = dedup._verify_pairs(
        dedup.lsh_candidates(sh), sh, docs=load(spark, SF_DIR, "documents")
    ).collect()
    assert direct == restricted and direct, "restricted verify must be value-identical"


def test_lsh_bucket_cap_degrades_predictably(spark, monkeypatch):
    """r11 (r10 ADVICE): a degenerate heavy-hitter bucket (many
    identical docs sharing every band bucket) must degrade predictably
    under LSH_BUCKET_ID_CAP — pairs come from the id-smallest CAP
    members, and the drop is visible through LAST_LSH_OBSERVATION —
    instead of growing one unbounded aggregation row. Uncapped corpora
    must report zero drops."""
    monkeypatch.setattr(dedup, "LSH_BUCKET_ID_CAP", 4)
    n = 9
    sh = spark.createDataFrame(
        [(i, ["alpha beta gamma", "beta gamma delta"]) for i in range(n)],
        "doc_id long, sh array<string>",
    )
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidates(sh).collect()}
    expected = {(a, b) for a in range(4) for b in range(4) if a < b}
    assert pairs == expected, "capped bucket must keep id-smallest members' pairs"
    drops = dedup.LAST_LSH_OBSERVATION.get
    assert drops["n_dropped_ids"] > 0
    assert drops["n_capped_buckets"] > 0

    monkeypatch.setattr(dedup, "LSH_BUCKET_ID_CAP", 65_536)
    sh2 = spark.createDataFrame(
        [(i, ["alpha beta gamma", "beta gamma delta"]) for i in range(n)],
        "doc_id long, sh array<string>",
    )
    all_pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidates(sh2).collect()}
    assert all_pairs == {(a, b) for a in range(n) for b in range(n) if a < b}
    drops = dedup.LAST_LSH_OBSERVATION.get
    assert drops["n_dropped_ids"] == 0 and drops["n_capped_buckets"] == 0


def test_verify_docs_arg_gate(spark):
    """Below the corpus-size gate the registry path takes the direct
    branch (None); the gate helper must flip on byte size, not rows."""
    assert dedup._verify_docs_arg(spark, SF_DIR) is None  # tiny fixture
    assert dedup._corpus_bytes(SF_DIR) < dedup.CAND_RESTRICT_MIN_CORPUS_BYTES


def test_simhash_blocking_has_no_false_negatives(spark):
    """Pigeonhole: hamming ≤ 3 over 4 chunks ⇒ the chunk-blocked
    candidate set contains every qualifying pair. Brute-force all pairs
    of signatures and compare."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = dedup.simhash(docs).collect()
    ids = np.array([r.doc_id for r in sigs])
    vals = np.array([r.simhash for r in sigs], dtype=np.int64).astype(np.uint64)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.doc_simhash_near_dup(spark, SF_DIR).collect()
    }
    expected = {}
    for i in range(len(ids)):
        x = vals[i] ^ vals[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= dedup.SIMHASH_MAX_HAMMING)[0]:
            a, b = ids[i], ids[i + 1 + j]
            expected[(min(a, b), max(a, b))] = int(ham[j])
    assert got == expected


def test_knn_matches_numpy_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids)
    ids = ids[order]
    m = np.array([r.embedding for r in emb], dtype=np.float64)[order]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    rows = similarity.knn_cosine_top5(spark, SF_DIR).collect()
    assert len(rows) == 100
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rs in by_query.items():
        qi = int(np.searchsorted(ids, qid))
        s = sims[qi].copy()
        s[qi] = -np.inf  # exclude self
        top = sorted(range(len(s)), key=lambda j: (-s[j], ids[j]))[: len(rs)]
        assert [r.neighbor_id for r in sorted(rs, key=lambda r: r.rank)] == [
            int(ids[j]) for j in top
        ]
        for r in rs:
            ni = int(np.searchsorted(ids, r.neighbor_id))
            assert r.cos_sim == pytest.approx(sims[qi, ni], abs=1e-6)


def test_lsh_ann_is_structurally_sound(spark):
    """Approximate by design: assert structure (ranks contiguous from 1,
    cos values equal the true cosine for each returned pair) rather than
    recall, which is legitimately low for near-orthogonal random data."""
    rows = similarity.knn_cosine_lsh(spark, SF_DIR).collect()
    assert rows
    emb = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()}
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rs in by_query.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for r in rs:
            a, b = emb[qid], emb[r.neighbor_id]
            true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert r.cos_sim == pytest.approx(true_cos, abs=1e-6)


def test_exact_dedup_keeps_min_id(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    survivors = dedup.doc_dedup_survivors(spark, SF_DIR).collect()
    # survivor count per lang can never exceed doc count per lang
    per_lang = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in survivors:
        assert r.n_docs <= per_lang[r.lang]
    assert sum(r.n_docs for r in survivors) <= docs.count()


def test_fingerprint_matches_manual_md5(spark):
    doc = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    fp_row = (
        textstats.doc_fingerprint(spark, SF_DIR)
        .filter(F.col("doc_id") == doc.doc_id)
        .collect()[0]
    )
    k = textstats.FP_GRAM
    grams = [doc.text[i : i + k] for i in range(len(doc.text) - k + 1)]
    expected = min(hashlib.md5(g.encode()).hexdigest() for g in grams)
    assert fp_row.fingerprint == expected
    assert fp_row.n_grams == len(grams)


def test_multimodal_features_deterministic(spark):
    rows = multimodal.multimodal_feature_extract(spark, SF_DIR).limit(10).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for r in rows:
        buf = docs[r.asset_id].encode("utf-8")
        assert r.n_bytes == len(buf)
        expected = multimodal.fake_decode_features(np.array([buf], dtype=object))[0]
        feats = [getattr(r, f"f{j}") for j in range(multimodal.N_FEATURES)]
        assert np.allclose(feats, expected, atol=1e-6)  # f-cols are det-rounded@6
        assert abs(sum(feats) - 1.0) < 1e-5  # L1-normalized histogram


def test_decode_media_compressed_codecs_still_stubbed():
    """Compressed codecs (PNG/MP3/video) stay documented stubs; the
    uncompressed containers decode for real via the numpy codecs."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG", "image")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"ID3\x03", "audio")
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"anything", "video")


def test_ppm_wav_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    samples = rng.integers(-32768, 32767, size=100, dtype=np.int16)
    out, rate = multimodal.decode_wav(multimodal.encode_wav(samples, rate=8000))
    assert rate == 8000
    assert (out == samples).all()
    # decode_media dispatches to the real codecs on container magic
    assert (multimodal.decode_media(multimodal.encode_ppm(px), "image") == px).all()
    got, _ = multimodal.decode_media(multimodal.encode_wav(samples), "audio")
    assert (got == samples).all()
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5\n1 1\n255\nx")


def test_multimodal_decode_features_real_decode(spark):
    """Every image/audio asset must decode (decoded=True) with the
    expected dims/sample counts; video stays undecoded by design."""
    rows = multimodal.multimodal_decode_features(spark, SF_DIR).collect()
    assert rows
    docs = {r.doc_id: r.text for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("doc_id", "text").collect()}
    for r in rows:
        if r.modality == "image":
            assert r.decoded and (r.width, r.height) == (8, 8) and r.n_samples == 192
            raw = np.frombuffer(docs[r.asset_id].encode(), dtype=np.uint8)
            exp = float(np.resize(raw if raw.size else np.zeros(1, np.uint8), 192).mean())
            assert abs(r.mean_level - exp) < 1e-5
        elif r.modality == "audio":
            assert r.decoded and r.n_samples >= 1
        else:
            assert not r.decoded


def test_dedup_clusters_consistent_with_pairs(spark):
    """Component assignment must place both ends of every near-dup pair
    in the same component, and each component's id must be the min
    doc_id of its member set (the deterministic survivor policy)."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.doc_ngram_jaccard_pairs(spark, SF_DIR).collect()
    ]
    comp = {r.doc_id: r.component for r in dedup.doc_dedup_clusters(spark, SF_DIR).collect()}
    assert comp  # planted duplicates exist at every sf
    for a, b in pairs:
        assert comp[a] == comp[b], (a, b)
    by_comp = {}
    for doc, c in comp.items():
        by_comp.setdefault(c, []).append(doc)
    for c, members in by_comp.items():
        assert c == min(members)


def test_cms_estimate_bounds(spark):
    """Count-min estimates must never under-count, and the depth-4 min
    keeps overestimates within the standard eps*N bound (eps = e/width)
    with overwhelming probability on this vocabulary."""
    import math

    rows = textstats.token_cms_estimates(spark, SF_DIR).collect()
    assert len(rows) == 20
    n_tokens = (
        textstats.load(spark, SF_DIR, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    eps = math.e / textstats.CMS_WIDTH
    for r in rows:
        assert r.cms_estimate >= r.true_count  # CMS never undercounts
        assert r.cms_estimate <= r.true_count + eps * n_tokens


def test_corpus_tokenizer_contract_no_vertical_tab():
    """Data-contract tripwire for the cross-engine tokenizer boundary
    documented in operators/dedup.py: Java regex \\s includes vertical
    tab (\\x0B), DuckDB's RE2 \\s does not, so a document containing
    \\x0B would tokenize differently across engines in EVERY
    shingle/token oracle. The driver corpus must stay \\x0B-free at
    every SF — if this fires, normalize \\x0B at ingest or pin an
    explicit whitespace class on both engines before chasing mystery
    hash mismatches."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        t = pq.read_table(f"/root/testdata/{sf}/documents.parquet", columns=["text"])
        hits = pc.sum(pc.cast(pc.match_substring(t["text"], "\x0b"), "int64")).as_py()
        assert not hits, (
            f"{sf}: {hits} documents contain vertical tab — Java vs RE2 "
            "\\s+ tokenization diverges; see operators/dedup.py header"
        )


def test_doc_chunking_beyond_64_chunks(spark, tmp_path):
    """The chunking oracle once capped at 64 chunks via CROSS JOIN
    range(0, 64) while the Spark side derives n_chunks unbounded — a
    one-sided truncation latent until a document exceeds
    1 + 63*stride chars. Pin parity on a document long enough to need
    80+ chunks."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from empdia_iceberg_spark import registry
    import __spark_entry__ as entry

    big = "word " * 2500  # 12500 chars -> ceil((12500-1)/150)+1 = 84 chunks
    d = tmp_path / "sf_chunk"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], "int64"),
                "text": pa.array([big, "short text"], "string"),
                "lang": pa.array(["en", "en"], "string"),
                "source": pa.array(["t", "t"], "string"),
                "n_chars": pa.array([len(big), 10], "int64"),
            }
        ),
        str(d / "documents.parquet"),
    )
    sdf = registry.queries()["doc_chunking"](spark, str(d))
    srows = sorted(map(tuple, sdf.collect()))
    assert max(r[1] for r in srows) >= 80  # genuinely beyond the old cap
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    orows = sorted(map(tuple, con.execute(entry.oracle_sql()["doc_chunking"]).fetchall()))
    assert srows == orows


def test_minhash_kernel_matches_naive_reference(monkeypatch):
    """r10 vectorized minhash kernel (JVM-pre-hashed shingles + chunked
    minimum.reduceat): bucket keys must equal a naive per-doc
    reference using the same hash family, including across chunk
    boundaries (chunk cap forced tiny) and for docs bigger than the
    cap; empty shingle sets emit nothing."""
    import numpy as np
    import pandas as pd

    from empdia_iceberg_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_N,
        _MINHASH_SEED,
        _minhash_band_batches,
    )

    rng = np.random.RandomState(7)
    # kernel contract: shingles arrive PRE-HASHED as int64
    docs = {
        1: list(rng.randint(-(2**62), 2**62, size=30)),
        3: list(rng.randint(-(2**62), 2**62, size=400)),  # over the tiny cap
        4: [],  # must be dropped
        5: [123456789],
    }
    docs[2] = docs[1][25:] + list(rng.randint(-(2**62), 2**62, size=5))
    pdf = pd.DataFrame(
        {"doc_id": sorted(docs), "sh": [docs[k] for k in sorted(docs)]}
    )

    # force chunk boundaries mid-batch AND a single doc over the cap
    import empdia_iceberg_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_MINHASH_CHUNK_SHINGLES", 48)
    out = pd.concat(list(_minhash_band_batches()(iter([pdf]))))

    # naive reference: same family, per doc
    r = np.random.RandomState(_MINHASH_SEED)
    rows = MINHASH_N // LSH_BANDS
    a = r.randint(1, 2**62, size=MINHASH_N).astype(np.uint64) | np.uint64(1)
    b = r.randint(0, 2**62, size=MINHASH_N).astype(np.uint64)
    fold = r.randint(1, 2**62, size=rows).astype(np.uint64) | np.uint64(1)
    expect = {}
    for doc_id, sh in docs.items():
        if not sh:
            continue
        base = np.asarray(sh, dtype=np.int64).view(np.uint64)
        sig = (a[:, None] * base[None, :] + b[:, None]).min(axis=1)
        expect[doc_id] = (sig.reshape(LSH_BANDS, rows) * fold).sum(axis=1).view(np.int64)

    assert set(out["doc_id"]) == {1, 2, 3, 5}
    for doc_id, grp in out.groupby("doc_id"):
        got = grp.sort_values("band")["bucket"].to_numpy()
        assert (got == expect[doc_id]).all(), f"doc {doc_id} buckets diverge"

    # and with the production cap (single chunk here) identical buckets
    monkeypatch.setattr(dd, "_MINHASH_CHUNK_SHINGLES", 131_072)
    out2 = pd.concat(list(_minhash_band_batches()(iter([pdf]))))
    merged = out.merge(out2, on=["doc_id", "band"], suffixes=("_tiny", "_big"))
    assert (merged["bucket_tiny"] == merged["bucket_big"]).all()


def test_recall_histogram_identity_and_bounds(spark):
    """The recall audit folded against ITSELF must be one (k, n) row —
    perfect recall — and the IVF/LSH audits' histograms must cover all
    queries with n_hit in [0, k]."""
    from empdia_iceberg_spark.operators.similarity import (
        TOP_K,
        _exact_topk_frame,
        _recall_histogram,
    )

    exact = _exact_topk_frame(spark, SF_DIR)
    n_queries = exact.select("query_id").distinct().count()
    ident = _recall_histogram(exact, _exact_topk_frame(spark, SF_DIR)).collect()
    assert [(r.n_hit, r.n_queries) for r in ident] == [(TOP_K, n_queries)]

    audit = similarity.knn_ivf_recall_audit(spark, SF_DIR).collect()
    assert sum(r.n_queries for r in audit) == n_queries
    assert all(0 <= r.n_hit <= TOP_K for r in audit)


def test_exact_dedup_binary_key_matches_hex_key(spark, monkeypatch):
    """r11 (VERDICT ask #4): the 32-byte-binary-group-key plan must
    return exactly the pre-r11 hex-string-key rows — unhex is a
    bijection, so only shuffle width changes, never the groups. Runs
    at sf0.1 — the only test SF whose documents contain exact
    duplicates (8 groups); smaller fixtures would pass vacuously on
    empty results."""
    sf = "/root/testdata/sf0.1"
    binary = dedup.doc_exact_dedup(spark, sf).collect()
    monkeypatch.setattr(dedup, "EXACT_DEDUP_BINARY_KEY", False)
    hexkey = dedup.doc_exact_dedup(spark, sf).collect()
    assert binary == hexkey and binary, "key layouts must be value-identical"
