"""Scaling-corpus fixture generators (`fixtures.docs_corpus_path` /
`emb_corpus_path` / `chain_pairs_path`) — the dedup-lane inputs of
scripts/bench_scaling.py.  Determinism and the planted near-duplicate
structure are the contract: the lanes' pair counts only mean anything
if the corpus is reproducible."""

import math

from fiona_spark import fixtures
from fiona_spark.operators import dedup


def test_docs_corpus_deterministic_and_dup_structure(spark, tmp_path):
    p1 = fixtures.docs_corpus_path(spark, 2000, cache_dir=str(tmp_path))
    docs = spark.read.parquet(p1)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == 2000
    # regeneration into a fresh cache dir is bit-identical
    p2 = fixtures.docs_corpus_path(spark, 2000,
                                   cache_dir=str(tmp_path / "b"))
    rows2 = {r["doc_id"]: r["text"]
             for r in spark.read.parquet(p2).collect()}
    assert rows == rows2
    # dup structure: ids >= n_base are one-word edits of their base
    n_base = 2000 - 200
    n_close = 0
    for did in range(n_base, 2000):
        a = rows[did].split()
        # the base is pmod(xxhash64('d', id), n_base) — engine-side;
        # verify structurally: exactly one word differs from SOME base
        # doc of the same length (cheap necessary condition: 12-20
        # words, vocabulary words only)
        assert 12 <= len(a) <= 20
    # MinHash actually finds a large fraction of the planted dups
    pairs = dedup.minhash_lsh_pairs(docs, n_perm=32, bands=8,
                                    threshold=0.5).count()
    assert pairs >= 100        # 200 planted; banding recall is partial


def test_emb_corpus_quantizable_and_dups(spark, tmp_path):
    p = fixtures.emb_corpus_path(spark, 1000, cache_dir=str(tmp_path))
    emb = spark.read.parquet(p)
    r = emb.orderBy("vec_id").first()
    assert len(r["embedding"]) == 64
    assert all(-1.0 <= v <= 1.0 for v in r["embedding"])
    # every value is k/1000 or k/1000 + j/20000 — floor(v*20000) exact
    for v in r["embedding"]:
        assert math.isclose(round(v * 20000), v * 20000, abs_tol=1e-9)
    got = dedup.embedding_neardup_pairs(emb, band_bits=16).count()
    assert got >= 80           # 100 planted near-dups at cos ~0.9999


def test_chain_pairs_components(spark, tmp_path):
    p = fixtures.chain_pairs_path(spark, 16_000, cache_dir=str(tmp_path))
    ch = spark.read.parquet(p)
    assert ch.count() == 16_000 - 16_000 // 16
    cc = dedup.connected_components_df(ch)
    assert cc.select("group").distinct().count() == 1000
    # labels are the chain minima: multiples of chain_len
    mins = [r["group"] for r in
            cc.select("group").distinct().limit(20).collect()]
    assert all(g % 16 == 0 for g in mins)
