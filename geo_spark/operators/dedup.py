"""Deduplication operators for web-scale text corpora.

Four tiers, cheapest-first (all shuffle-aware — the 100 TB design notes are
inline):

- **exact**: md5(text) groupBy — one shuffle on a uniform hash key; no skew
  by construction.
- **MinHash + LSH**: shingle → minhash signature (vectorized numpy pandas
  UDF, one pass) → band buckets → candidate pairs via a self-join on
  (band_idx, band_hash) — the shuffle key is the bucket id, so only
  near-duplicate clusters co-locate; banding keeps the candidate set linear
  in practice. Verification recomputes exact Jaccard on the pair.
- **SimHash**: 64-bit fingerprint via sign-sum of per-token hash vectors;
  near-dups = Hamming distance ≤ t, found by pigeonhole banding (4 bands of
  16 bits → any pair within distance 3 shares a band).
- **n-gram Jaccard**: exact verification metric for candidate pairs.

Determinism: all hash functions are fixed-constant multiplicative/xorshift —
no RNG state, reproducible across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 64


def _token_ngrams(text: str, n: int) -> set:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) over int64 input."""
    x = arr.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


def _hash_str64(s: str) -> int:
    """Deterministic 64-bit string hash (blake2b — C speed, unsalted)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def _shingle_hashes(text: str, ngram: int) -> np.ndarray:
    grams = _token_ngrams(text, ngram)
    if not grams:
        return np.zeros(1, dtype=np.int64)
    # Python's hash() is salted; blake2b is deterministic and C-speed
    out = np.fromiter((_hash_str64(g) for g in grams), dtype=np.uint64, count=len(grams))
    return out.astype(np.int64)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = _N_PERM_DEFAULT,
    ngram: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — vectorized MinHash over token n-grams.

    Permutations are (a_i * h + b_i) mod p with fixed seeded constants; the
    whole signature matrix for an Arrow batch is one numpy einsum-style
    broadcast, no per-row Python beyond shingling.
    """
    rng = np.random.RandomState(42)
    A = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
    B = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            h = _shingle_hashes(txt or "", ngram).astype(np.uint64)
            # (n_perm, n_shingles) permuted hashes → row-wise min
            vals = (
                (A[:, None].astype(np.uint64) * (h[None, :] & np.uint64(0x7FFFFFFFFFFFFFFF)))
                + B[:, None].astype(np.uint64)
            ) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return df.select(id_col, sig_udf(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = _N_PERM_DEFAULT,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b, est_jaccard ≥ threshold).

    LSH banding: signature split into ``bands`` bands of n_perm/bands rows;
    docs sharing any band-hash become candidates (self-join on the bucket).
    est_jaccard = fraction of matching signature positions.
    """
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n_perm, ngram)
    banded = sigs.select(
        id_col,
        "signature",
        F.posexplode(
            F.array(*[
                F.hash(*[F.col("signature")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)])
                for b in range(bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(_N_PERM_DEFAULT if n_perm is None else n_perm))
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .drop("sig_a", "sig_b")
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over whitespace tokens."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, txt in enumerate(texts):
            toks = (txt or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.fromiter(
                (_hash_str64(tk) for tk in toks), dtype=np.uint64, count=len(toks)
            )
            bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            fp = np.uint64(0)
            for b in np.flatnonzero(votes > 0):
                fp |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return df.select(id_col, simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via pigeonhole banding.

    Band count is derived from the parameter: ``max_hamming + 1`` contiguous
    bands over the 64 fingerprint bits guarantee (pigeonhole) that any pair
    with ≤ max_hamming differing bits agrees on at least one whole band, so
    recall is exact for every ``max_hamming`` ≤ 63. The exact Hamming filter
    after the bucket join removes false positives.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if b < 64 % n_bands else 0) for b in range(n_bands)]
    offs = [sum(widths[:b]) for b in range(n_bands)]
    fps = simhash_fingerprints(df, id_col, text_col)
    bands = [
        F.shiftrightunsigned(F.col("simhash"), offs[b])
        .bitwiseAND(F.lit((1 << widths[b]) - 1))
        .alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = fps.select(id_col, "simhash", F.posexplode(F.array(*bands)).alias("band_idx", "band_val"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming).drop(
        "sh_a", "sh_b"
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: (text_hash, n_docs, keep_id=min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Exact token-n-gram Jaccard for given (id_a, id_b) pairs — SQL-only.

    Texts join in by id; the n-gram sets and intersection/union sizes are
    built with higher-order array functions (JVM-side).
    """
    def grams(col):
        toks = F.filter(F.split(col, " "), lambda x: x != "")
        n_tok = F.size(toks)
        idxs = F.sequence(F.lit(0), F.greatest(n_tok - ngram, F.lit(0)))
        return F.array_distinct(
            F.when(
                n_tok >= ngram,
                F.transform(
                    idxs, lambda i: F.array_join(F.slice(toks, i + 1, ngram), " ")
                ),
            ).otherwise(F.array(F.array_join(toks, " ")))
        )

    texts = df.select(F.col(id_col), grams(F.col(text_col)).alias("grams"))
    out = (
        pairs.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn("n_union", F.size(F.array_union("grams_a", "grams_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("n_union") == 0, F.lit(0.0)).otherwise(
                F.col("n_inter").cast("double") / F.col("n_union")
            ),
        )
        .drop("grams_a", "grams_b")
    )
    return out
