"""Deduplication + similarity-search operators (training-data pipeline).

No Fiona counterpart — these are the web-scale data-curation operators
the engine adds on top of the reference's scan/filter model (the brief's
first-class extension set).  Everything below is expressed as DataFrame
transformations that stay inside whole-stage codegen (xxhash64, bitwise
ops, groupBy aggregates); the only Python is the embedding signature
UDF, which is one Arrow-vectorized matrix multiply.

Scale design:
  * Candidate generation is always an equi-join on a band key — never
    an O(n^2) cross join.  Band keys are int64s, so the shuffle is
    compact; banded self-joins of hot keys are bounded because a band
    bucket with B members yields B^2 pairs — the ``max_bucket`` guard
    drops degenerate buckets (boilerplate-only shingles) exactly like
    web-dedup pipelines drop stop-shingles.
  * Exact verification (Jaccard / Hamming / cosine) runs only on
    candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Mersenne prime 2^61-1: a*x+b mod p stays exact in int64/float128-free
# arithmetic as long as operands are reduced first (we reduce x, and use
# 32-bit a/b so a*x fits in unsigned 93 bits -> do it in two limbs).
_P = (1 << 61) - 1


def _perm_coeffs(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, n_perm, dtype=np.int64)
    b = rng.integers(0, 1 << 31, n_perm, dtype=np.int64)
    return a, b


def word_shingles(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-shingles per document, JVM-side (split/transform)."""
    ws = F.split(F.col(text_col), " ")
    sh = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))")
    return (docs.select(id_col, F.explode(sh).alias("shingle"))
            .distinct())


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_perm: int = 64,
                       shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """MinHash signature per document: n_perm int64 columns m0..m{n-1}.

    Universal-hash permutations h_j(x) = (a_j * x + b_j) mod (2^61-1)
    over xxhash64 shingle values — all codegen'd column arithmetic, one
    groupBy(doc).min() per permutation (a single shuffle).
    """
    a, b = _perm_coeffs(n_perm, seed)
    sh = word_shingles(docs, id_col, text_col, shingle_n)
    # reduce x into [0, P) first so a*x fits: split a*x into hi/lo limbs
    # mod P using (2^61 ≡ 1): with a < 2^31 and x < 2^61, a*x < 2^92 —
    # compute in two 46-bit halves to stay exact in signed int64.
    x = F.pmod(F.xxhash64("shingle"), F.lit(_P))
    xl = x.bitwiseAND(F.lit((1 << 31) - 1))          # low 31 bits
    xh = F.shiftright(x, 31)                          # high 30 bits
    aggs = []
    for j in range(n_perm):
        aj, bj = int(a[j]), int(b[j])
        # a*x mod P = (a*xh*2^31 + a*xl) mod P; a*xh < 2^61, fits
        hi = F.pmod(F.shiftleft(F.pmod(F.lit(aj) * xh, F.lit(_P)), 31), F.lit(_P))
        hj = F.pmod(hi + F.lit(aj) * xl + F.lit(bj), F.lit(_P))
        aggs.append(F.min(hj).alias(f"m{j}"))
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_perm: int = 64,
                      bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.5, seed: int = 42,
                      max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate pairs by MinHash LSH + exact Jaccard verification.

    Signature -> ``bands`` band keys (rows = n_perm/bands) -> band-key
    equi-self-join for candidates -> exact shingle-set Jaccard on the
    candidates only.  Output: (id_a, id_b, jaccard) with jaccard >=
    threshold, id_a < id_b.
    """
    rows = n_perm // bands
    sig = minhash_signatures(docs, id_col, text_col, n_perm, shingle_n, seed)
    band_structs = F.array(*[
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(*[F.col(f"m{bi * rows + j}") for j in range(rows)])
                 .alias("key"))
        for bi in range(bands)])
    banded = (sig.select(id_col, F.explode(band_structs).alias("b"))
              .select(id_col, F.col("b.band").alias("band"),
                      F.col("b.key").alias("key")))
    # degenerate-bucket guard (boilerplate shingle sets)
    sizes = banded.groupBy("band", "key").count().filter(F.col("count") <= max_bucket)
    banded = banded.join(F.broadcast(sizes.select("band", "key")), ["band", "key"])
    rhs = banded.select(F.col(id_col).alias("_idb"), "band", "key")
    cand = (banded.join(rhs, ["band", "key"])
            .filter(F.col(id_col) < F.col("_idb"))
            .select(F.col(id_col).alias("id_a"), F.col("_idb").alias("id_b"))
            .distinct())
    return exact_jaccard(docs, cand, id_col, text_col, shingle_n, threshold)


def exact_jaccard(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  threshold: float = 0.0) -> DataFrame:
    """Exact shingle-set Jaccard for given (id_a, id_b) pairs."""
    sh = word_shingles(docs, id_col, text_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (pairs.join(sa, "id_a").join(sb, ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("ninter")))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("ninter") / (F.col("na") + F.col("nb") - F.col("ninter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document over word tokens, fully JVM-side.

    bit i of the hash = sign of sum over tokens of (2*bit_i(xxhash64) - 1).
    64 conditional-sum aggregates in one groupBy — one shuffle, all
    codegen.  Output: (id_col, simhash long).
    """
    tok = docs.select(id_col, F.explode(F.split(text_col, " ")).alias("t"))
    h = F.xxhash64("t")
    aggs = [F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{i}")
            for i in range(64)]
    sums = tok.groupBy(id_col).agg(*aggs)
    bit_terms = []
    for i in range(64):
        # set bit i when the weighted sum is positive; bit 63 lands on
        # the sign bit — shiftleft on long handles it via overflow
        bit_terms.append(F.shiftleft((F.col(f"s{i}") > 0).cast("long"), i))
    out = bit_terms[0]
    for t2 in bit_terms[1:]:
        out = out.bitwiseOR(t2)
    return sums.select(id_col, out.alias("simhash"))


def hamming_pairs(df: DataFrame, id_col: str, hash_col: str,
                  max_dist: int = 3, band_bits: int = 16) -> DataFrame:
    """Pairs within Hamming distance ``max_dist`` of an int64 hash.

    Banded LSH: 64/band_bits exact-band buckets; by pigeonhole any pair
    with distance < 64/band_bits shares a band.  Candidates verified
    with JVM-side bit_count.  Output: (id_a, id_b, hamming).
    """
    n_bands = 64 // band_bits

    def band_mask(b: int) -> int:
        m = (((1 << band_bits) - 1) << (b * band_bits)) & 0xFFFFFFFFFFFFFFFF
        return m - (1 << 64) if m >= (1 << 63) else m

    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.col(hash_col).bitwiseAND(F.lit(band_mask(b))).alias("key"))
        for b in range(n_bands)])
    a = (df.select(id_col, hash_col)
         .withColumn("b", F.explode(bands))
         .select(F.col(id_col).alias("id_a"), F.col(hash_col).alias("_ha"),
                 F.col("b.band").alias("band"), F.col("b.key").alias("key")))
    bside = a.select(F.col("id_a").alias("id_b"), F.col("_ha").alias("_hb"),
                     "band", "key")
    cand = (a.join(bside, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_ha", "_hb").distinct())
    return (cand.withColumn("hamming", F.expr("bit_count(_ha ^ _hb)"))
            .filter(F.col("hamming") <= max_dist)
            .select("id_a", "id_b", "hamming"))


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_dist: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs (composition)."""
    return hamming_pairs(simhash(docs, id_col, text_col), id_col, "simhash",
                         max_dist=max_dist)


# ---------------------------------------------------------------------------
# Embedding similarity (ANN)
# ---------------------------------------------------------------------------

def sign_lsh_signatures(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int = 64,
                        n_planes: int = 64, seed: int = 7) -> DataFrame:
    """Random-hyperplane signature: bit j = (emb . plane_j) > 0.

    One Arrow-vectorized matrix multiply per batch (the only Python in
    this module); planes are deterministic from ``seed`` and live in the
    UDF closure (broadcast with the task, ~32 KB).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    @F.pandas_udf(T.LongType())
    def sig(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy(object)).astype(np.float64)   # (B, dim)
        bits = (m @ planes) > 0.0                              # (B, n_planes)
        out = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(out.astype(np.int64))

    return emb.select(id_col, sig(vec_col).alias("sig"))


def ann_cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64, band_bits: int = 8,
                    seed: int = 7) -> DataFrame:
    """Approximate top-k cosine neighbors per query via sign-LSH buckets.

    Query/candidate signatures band-joined (8x8-bit bands); exact cosine
    reranking JVM-side (zip_with/aggregate — no Python in the rerank).
    Output: (qid, cid, cosine, rnk<=k).  Recall improves with bands;
    the brute-force exact path is ``contract.q_embed_topk``.
    """
    from pyspark.sql import Window

    n_bands = 64 // band_bits

    def band_mask(b: int) -> int:
        m = (((1 << band_bits) - 1) << (b * band_bits)) & 0xFFFFFFFFFFFFFFFF
        return m - (1 << 64) if m >= (1 << 63) else m

    qs = sign_lsh_signatures(queries, id_col, vec_col, dim, seed=seed) \
        .withColumnRenamed("sig", "_qsig")
    cs = sign_lsh_signatures(emb, id_col, vec_col, dim, seed=seed)
    bands_q = F.array(*[F.struct(F.lit(b).alias("band"),
                                 F.col("_qsig").bitwiseAND(F.lit(band_mask(b)))
                                 .alias("key")) for b in range(n_bands)])
    bands_c = F.array(*[F.struct(F.lit(b).alias("band"),
                                 F.col("sig").bitwiseAND(F.lit(band_mask(b)))
                                 .alias("key")) for b in range(n_bands)])
    qb = (queries.join(qs, id_col)
          .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"), "_qsig")
          .withColumn("b", F.explode(bands_q))
          .select("qid", "qe", F.col("b.band").alias("band"), F.col("b.key").alias("key")))
    cb = (emb.join(cs, id_col)
          .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"), "sig")
          .withColumn("b", F.explode(bands_c))
          .select("cid", "ce", F.col("b.band").alias("band"), F.col("b.key").alias("key")))
    cand = (qb.join(cb, ["band", "key"])
            .filter(F.col("qid") != F.col("cid"))
            .select("qid", "qe", "cid", "ce").distinct())
    dot = F.expr("aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                 "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    nq = F.expr("sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    nc = F.expr("sqrt(aggregate(transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")
    scored = cand.select("qid", "cid", (dot / (nq * nc)).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "cid")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy keeper selection)
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, content_cols: list[str],
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact content key; single shuffle."""
    w_key = F.xxhash64(*content_cols)
    from pyspark.sql import Window
    w = Window.partitionBy(w_key).orderBy(id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
