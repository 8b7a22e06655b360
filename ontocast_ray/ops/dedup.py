"""Deduplication ops: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale shapes (the part that must survive 100 TB):

- **exact**: hash inside ``map_batches`` (never shuffle raw text), then ONE
  ``groupby(text_sha)`` with vectorized Min/Count aggregates — the classic
  hash-partition + per-group-first.
- **minhash-lsh**: signatures are numpy-vectorized per batch; each doc emits
  ``bands`` tiny (band_key, doc_id) rows; ONE groupby on band_key; candidate
  pairs verified per bucket. Bucket rows are ~16 bytes — the shuffle moves
  signatures, not documents.
- **simhash**: 64-bit signature per doc, banded into 4×16-bit keys, same
  bucket-groupby shape; Hamming check per bucket.
- **ngram-jaccard**: exact verifier used inside buckets (never all-pairs).
- **embedding-cosine**: random-hyperplane LSH buckets → within-bucket matmul.

All ops return duplicate PAIRS (doc_id_a < doc_id_b) or keep-lists, both as
Datasets; keep-list = groupby-connected-components-free "first id wins within
bucket", which matches the oracle semantics used in tests.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min
from ontocast_ray.util import pool

_WS = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# exact dedup


def _sha_batch(batch: pa.Table) -> pa.Table:
    # 128-bit prefix: a 64-bit key has a real birthday-collision count at
    # 10^12 docs (~1e24/2^65); 128 bits keeps it negligible at any scale
    texts = batch["text"].to_pylist()
    hashes = [hashlib.sha256((t or "").encode()).hexdigest()[:32] for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_sha": pa.array(hashes, type=pa.string()),
        }
    )


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """→ (doc_id, n_copies): one row per distinct text, keeping min doc_id."""
    hashed = docs.map_batches(_sha_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_sha").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )
    return agg.select_columns(["doc_id", "n_copies"])


# ---------------------------------------------------------------------------
# shingles + minhash


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """crc32 of word k-shingles (stable across processes)."""
    words = _WS.split((text or "").strip().lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words and words[0] else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    return np.unique(
        np.array([zlib.crc32(s.encode()) for s in shingles], dtype=np.uint64)
    )


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """num_perm universal-hash minhash; coefficient table built once per actor."""

    def __init__(self, num_perm: int = 64, seed: int = 7, shingle_k: int = 5):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        # (num_perm, n_shingles) universal hash, min over shingles
        vals = (np.outer(self.a, shingles) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = [
            self.signature(_shingle_hashes(t, self.shingle_k)).astype(np.int64)
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
            }
        )


def _band_rows(batch: pa.Table, bands: int, n_parts: int) -> pa.Table:
    doc_ids, keys, parts = [], [], []
    for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["minhash"].to_pylist()):
        sig = np.asarray(sig, dtype=np.int64)
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            # 64-bit band key: a 32-bit key collides pervasively at 10^12
            # docs, turning LSH buckets into giant false-candidate pools
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            key = f"{b}:{h}"
            doc_ids.append(doc_id)
            keys.append(key)
            parts.append(zlib.crc32(key.encode()) % n_parts)
    return pa.table(
        {
            "band_key": pa.array(keys, type=pa.string()),
            "doc_id": pa.array(doc_ids, type=pa.int64() if len(doc_ids) and isinstance(doc_ids[0], int) else pa.string()),
            "bucket_part": pa.array(parts, type=pa.int32()),
        }
    )


def _bucket_pairs_partition(group: pd.DataFrame) -> pd.DataFrame:
    """All LSH buckets of one coarse partition in a single kernel call.

    groupby-per-bucket would invoke Python once per bucket (≈ one per doc per
    band); here the shuffle key is crc32(band_key) % P and the real buckets
    are looped inside one pandas groupby — the per-invocation overhead is
    amortized P-ways instead of bucket-ways.
    """
    a_out, b_out = [], []
    for _, rows in group.groupby("band_key", sort=False):
        ids = sorted(set(rows["doc_id"].tolist()))
        if len(ids) < 2:
            continue
        rep = ids[0]
        a_out.extend([rep] * (len(ids) - 1))
        b_out.extend(ids[1:])
    return pd.DataFrame({"doc_id_a": a_out, "doc_id_b": b_out})


def minhash_lsh_candidates(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int = 4,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """→ candidate near-dup pairs (doc_id_a, doc_id_b), deduped."""
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=pool(concurrency),
    )
    band_rows = sigs.map_batches(
        lambda b: _band_rows(b, bands, n_parts), batch_format="pyarrow"
    )
    pairs = band_rows.groupby("bucket_part").map_groups(
        _bucket_pairs_partition, batch_format="pandas"
    )
    # same pair can surface from several bands → distinct
    return pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(Count(alias_name="n_bands"))


def ngram_jaccard_verify(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    threshold: float = 0.7,
    shingle_k: int = 5,
) -> "ray.data.Dataset":
    """Exact Jaccard check of candidate pairs (broadcast small-side shingle map).

    The candidate set is small relative to the corpus; the docs needed for
    verification are collected once and broadcast via ray.put — a map-side
    join, not a shuffle. (At extreme scale this becomes a semi-join on
    doc_id; the verify kernel is unchanged.)
    """
    import ray

    pair_rows = pairs.select_columns(["doc_id_a", "doc_id_b"]).take_all()
    needed = {r["doc_id_a"] for r in pair_rows} | {r["doc_id_b"] for r in pair_rows}
    empty = pa.table(
        {
            "doc_id_a": pa.array([], type=pa.int64()),
            "doc_id_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    if not pair_rows:
        return ray.data.from_arrow(empty)

    def collect(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in needed]
        return batch.take(pa.array(keep, type=pa.int64()))

    subset = docs.map_batches(collect, batch_format="pyarrow").take_all()
    shingle_map = {
        r["doc_id"]: set(_shingle_hashes(r["text"], shingle_k).tolist()) for r in subset
    }
    out_a, out_b, sims = [], [], []
    for r in pair_rows:
        sa = shingle_map.get(r["doc_id_a"], set())
        sb = shingle_map.get(r["doc_id_b"], set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(r["doc_id_a"])
            out_b.append(r["doc_id_b"])
            sims.append(round(j, 6))
    if not out_a:
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array(out_a),
                "doc_id_b": pa.array(out_b),
                "jaccard": pa.array(sims, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# simhash


class SimHasher:
    """64-bit simhash over word unigram+bigram features (built once per actor)."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    @staticmethod
    def simhash64(text: str) -> int:
        words = _WS.split((text or "").strip().lower())
        feats = words + [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]
        if not feats or feats == [""]:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for f in feats:
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(f.encode(), digest_size=8).digest(), "big")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = []
        for t in texts:
            s = self.simhash64(t)
            sigs.append(s - (1 << 64) if s >= (1 << 63) else s)  # two's-complement int64
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sigs, type=pa.int64()),
            }
        )


def simhash_signatures(docs: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return docs.map_batches(SimHasher, batch_format="pyarrow", concurrency=pool(concurrency))


def simhash_candidates(
    docs: "ray.data.Dataset", max_hamming: int = 3, concurrency: int = 4,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """Banded simhash near-dup pairs: 4×16-bit keys → coarse-partitioned
    bucket groupby (see _bucket_pairs_partition) → Hamming check."""
    sigs = simhash_signatures(docs, concurrency=concurrency)

    def bands(batch: pa.Table) -> pa.Table:
        doc_ids, keys, full, parts = [], [], [], []
        for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            u = sig & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                key = f"{b}:{(u >> (16 * b)) & 0xFFFF:04x}"
                doc_ids.append(doc_id)
                keys.append(key)
                full.append(sig)
                parts.append(zlib.crc32(key.encode()) % n_parts)
        return pa.table(
            {"band_key": keys, "doc_id": doc_ids, "simhash": full,
             "bucket_part": pa.array(parts, type=pa.int32())}
        )

    def bucket_partition(group: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, d_out = [], [], []
        for _, rows in group.groupby("band_key", sort=False):
            rows = rows.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].tolist()
            hs = [h & 0xFFFFFFFFFFFFFFFF for h in rows["simhash"].tolist()]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(hs[i] ^ hs[j]).count("1")
                    if d <= max_hamming:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        d_out.append(d)
        return pd.DataFrame({"doc_id_a": a_out, "doc_id_b": b_out, "hamming": d_out})

    pairs = (
        sigs.map_batches(bands, batch_format="pyarrow")
        .groupby("bucket_part")
        .map_groups(bucket_partition, batch_format="pandas")
    )
    return pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_dedup_candidates(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """Random-hyperplane LSH buckets → within-bucket cosine ≥ threshold pairs."""
    first = embeddings.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float32)

    import ray

    planes_ref = ray.put(planes)

    class Bucketer:
        def __init__(self, planes_ref):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
            signs = (vecs @ self.planes) > 0
            keys = ["".join("1" if b else "0" for b in row) for row in signs]
            parts = [zlib.crc32(k.encode()) % n_parts for k in keys]
            return pa.table(
                {
                    "bucket": pa.array(keys, type=pa.string()),
                    id_col: batch[id_col],
                    vec_col: batch[vec_col],
                    "bucket_part": pa.array(parts, type=pa.int32()),
                }
            )

    def bucket_pairs_partition(group: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, s_out = [], [], []
        for _, rows in group.groupby("bucket", sort=False):
            ids = rows[id_col].tolist()
            if len(ids) < 2:
                continue
            vecs = np.array(rows[vec_col].tolist(), dtype=np.float32)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            nv = vecs / norms
            sims = nv @ nv.T
            n = len(ids)
            for i in range(n):
                for j in range(i + 1, n):
                    if sims[i, j] >= threshold:
                        lo, hi = sorted((ids[i], ids[j]))
                        a_out.append(lo)
                        b_out.append(hi)
                        s_out.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "cosine": s_out})

    bucketed = embeddings.map_batches(
        Bucketer, fn_constructor_kwargs={"planes_ref": planes_ref},
        batch_format="pyarrow", concurrency=pool(2),
    )
    pairs = bucketed.groupby("bucket_part").map_groups(
        bucket_pairs_partition, batch_format="pandas"
    )
    # a pair can surface from more than one bucket → distinct
    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))
