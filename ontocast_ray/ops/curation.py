"""Corpus-curation operators: per-source caps and benchmark decontamination.

Two standard web-corpus curation steps (C4 / RefinedWeb / Gopher lineage)
the reference lacks, built Ray-Data-first:

- **cap_per_group**: keep at most ``cap`` rows per group (per-domain /
  per-source caps against boilerplate-heavy domains dominating a corpus).
  Selection is deterministic: the ``cap`` rows with the smallest
  ``splitmix64(seed, id)`` survive — a pure function of (seed, ids), so
  results are identical across runs and cluster sizes and SQL-re-derivable
  (rank by the same mix in the oracle). Execution is combiner-first: every
  input block is pre-capped inside ``map_batches`` (≤ cap rows per group
  leave any block), then one coarse-partitioned groupby finishes — shuffle
  volume is O(cap × groups), never O(rows).

- **decontaminate**: flag training documents sharing any word-k-shingle
  with an evaluation/benchmark corpus (train/test leakage detection, the
  GPT-3 appendix-C / Gopher decontamination shape). The eval side is tiny
  by definition (benchmarks are MBs, the corpus is TBs), so its distinct
  shingle hashes are collected once on the driver, ``ray.put`` once, and
  every train task probes the broadcast sorted array via ``searchsorted``
  — a pure map over the corpus, zero shuffle. Shingle hashes are the same
  rolling FNV-over-word-hashes kernel MinHash uses (ops/dedup.py:72), so
  counts match an exact string-shingle SQL oracle barring 64-bit
  collisions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import _fold_kgrams, _word_hashes_batch
from .interleave import splitmix64


def cap_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 0,
    n_parts: int = 16,
) -> "ray.data.Dataset":
    """Keep at most ``cap`` rows per ``group_col`` value, deterministically.

    Survivors are the ``cap`` rows of each group with the smallest
    ``splitmix64(seed, id)`` (ties broken by id — the mix is a bijection,
    so ties only occur for duplicated ids). All input columns pass through.
    """

    def _precap(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ids = df[id_col].to_numpy().astype(np.uint64)
        # keep the full-width unsigned mix as the sort key — the SQL oracle
        # orders by the same UBIGINT, so the order must be exact, not a
        # float projection
        df["_cap_u"] = splitmix64(ids, seed)
        out = (
            df.sort_values(["_cap_u", id_col], kind="mergesort")
            .groupby(group_col, sort=False)
            .head(cap)
        )
        part = (
            pd.util.hash_array(np.asarray(out[group_col]), categorize=False)
            % np.uint64(n_parts)
        ).astype(np.int64)
        out = out.assign(_cap_part=part)
        return pa.Table.from_pandas(out, preserve_index=False)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["_cap_u", id_col], kind="mergesort")
            .groupby(group_col, sort=False)
            .head(cap)
        )
        return out.drop(columns=["_cap_u", "_cap_part"])

    return (
        ds.map_batches(_precap, batch_format="pyarrow")
        .groupby("_cap_part")
        .map_groups(_finish, batch_format="pandas")
    )


def _distinct_shingles(
    ds: "ray.data.Dataset", text_col: str, k: int
) -> np.ndarray:
    """Driver-side sorted distinct shingle hashes of a SMALL dataset.

    Each block contributes one binary blob of its unique hashes (bounded
    by the block's text volume); the driver unions the blobs. Intended for
    eval/benchmark corpora — callers must not feed the training corpus in.
    """

    def _blob(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hashes, ranges, empty = _word_hashes_batch(texts)
        per_doc = [
            np.zeros(1, dtype=np.uint64) if empty[i] else _fold_kgrams(hashes[s:e], k)
            for i, (s, e) in enumerate(ranges)
        ]
        blob = np.unique(np.concatenate(per_doc)) if per_doc else np.zeros(0, np.uint64)
        return pa.table({"blob": pa.array([blob.tobytes()], type=pa.binary())})

    blobs = ds.map_batches(_blob, batch_format="pyarrow").take_all()
    if not blobs:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.concatenate([np.frombuffer(b["blob"], dtype=np.uint64) for b in blobs])
    )


def remove_boilerplate_lines(
    docs: "ray.data.Dataset",
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 16,
) -> "ray.data.Dataset":
    """C4-style line-level dedup: drop every line occurring ≥ ``min_count``
    times across the corpus (boilerplate headers/footers/nav), keeping the
    remaining lines of each document in order.

    → (id_col, text_col cleaned, n_removed). Two passes over the corpus:

    1. **Count**: each block emits its local (line_hash, n) counts (map-side
       combiner — one row per distinct line per block, never per
       occurrence), a coarse-partitioned sum keeps hashes with total ≥
       min_count. The frequent set is collected to the driver and
       broadcast: boilerplate is by definition high-count/low-distinct, so
       the set is small relative to the corpus (at extreme scale swap the
       exact set for a Bloom bitmap — the ``ngram_jaccard_verify`` pattern
       — at the cost of a false-positive line-drop rate).
    2. **Scrub**: pure map — split, hash (same ``pd.util.hash_array`` as
       the count pass), drop lines whose hash is in the broadcast sorted
       array, re-join with ``\\n``.
    """

    def _count(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        lines = [ln for t in texts for ln in (t or "").split("\n")]
        if not lines:
            return pa.table({"line_hash": pa.array([], type=pa.uint64()),
                             "n": pa.array([], type=pa.int64()),
                             "part": pa.array([], type=pa.int64())})
        h = pd.util.hash_array(np.asarray(lines, dtype=object), categorize=False)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "line_hash": pa.array(uniq),
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array((uniq % np.uint64(n_parts)).astype(np.int64)),
            }
        )

    def _freq(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("line_hash", sort=False)["n"].sum()
        agg = agg[agg >= min_count]
        return pd.DataFrame({"line_hash": agg.index.to_numpy(dtype=np.uint64)})

    freq_rows = (
        docs.map_batches(_count, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_freq, batch_format="pandas")
        .take_all()
    )
    freq = np.sort(np.array([r["line_hash"] for r in freq_rows], dtype=np.uint64))
    freq_ref = ray.put(freq)

    def _scrub(batch: pa.Table) -> pa.Table:
        bad = ray.get(freq_ref)
        ids = batch[id_col]
        out_text, out_removed = [], []
        for t in batch[text_col].to_pylist():
            lines = (t or "").split("\n")
            if len(bad):
                h = pd.util.hash_array(np.asarray(lines, dtype=object), categorize=False)
                pos = np.minimum(np.searchsorted(bad, h), len(bad) - 1)
                keep = bad[pos] != h
            else:
                keep = np.ones(len(lines), dtype=bool)
            out_text.append("\n".join([ln for ln, k in zip(lines, keep) if k]))
            out_removed.append(int((~keep).sum()))
        return pa.table(
            {
                id_col: ids,
                text_col: pa.array(out_text, type=pa.string()),
                "n_removed": pa.array(np.asarray(out_removed, dtype=np.int64)),
            }
        )

    return docs.map_batches(_scrub, batch_format="pyarrow")


def decontaminate(
    train: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """→ (id_col, n_overlap): training docs sharing ≥1 word-``k``-shingle
    with the eval corpus, with the count of distinct overlapping shingles.

    Pure map over the training corpus against a broadcast sorted hash
    array; documents shorter than ``k`` words contribute one whole-text
    shingle (same fallback as the MinHash kernel / Jaccard SQL oracle).
    """
    eval_hashes = _distinct_shingles(eval_ds, text_col, k)
    eval_ref = ray.put(eval_hashes)

    def _probe(batch: pa.Table) -> pa.Table:
        ev = ray.get(eval_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hashes, ranges, empty = _word_hashes_batch(texts)
        out_ids, out_n = [], []
        for i, (s, e) in enumerate(ranges):
            if not len(ev):
                break
            sh = np.zeros(1, dtype=np.uint64) if empty[i] else _fold_kgrams(hashes[s:e], k)
            pos = np.minimum(np.searchsorted(ev, sh), len(ev) - 1)
            n = int((ev[pos] == sh).sum())
            if n:
                out_ids.append(ids[i])
                out_n.append(n)
        return pa.table(
            {
                id_col: pa.array(out_ids, type=batch[id_col].type),
                "n_overlap": pa.array(np.asarray(out_n, dtype=np.int64)),
            }
        )

    return train.map_batches(_probe, batch_format="pyarrow")


def normalize_text(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Canonical text normalization (the first stage of every web-corpus
    pipeline): NFC unicode normalization → lowercase → collapse
    whitespace runs to one space → strip. Pure map, zero shuffle; one
    vectorized pandas ``.str`` chain per batch (no per-row Python).

    The whitespace class is written explicitly (``[ \\t\\n\\r\\f\\v]+``)
    so Python ``re`` and SQL RE2 agree byte-for-byte (Python's ``\\s``
    also matches unicode spaces; RE2's does not). SQL mirror:
    ``trim(regexp_replace(lower(nfc_normalize(text)), '[ \\t\\n\\r\\f\\v]+',
    ' ', 'g'))``.
    """
    out = out_col or text_col

    def _norm(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().fillna("")
        s = (
            s.str.normalize("NFC")
            .str.lower()
            .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
            # explicit ASCII strip class: pandas .str.strip() with no arg
            # strips ALL unicode whitespace (NBSP,  , …) while the SQL
            # mirror's trim() strips only spaces — the collapse above has
            # already reduced edge whitespace to single spaces, so a
            # space-only strip keeps Python and DuckDB byte-identical
            .str.strip(" ")
        )
        arr = pa.Array.from_pandas(s, type=pa.string())
        if out in batch.column_names:
            i = batch.column_names.index(out)
            return batch.set_column(i, out, arr)
        return batch.append_column(out, arr)

    return docs.map_batches(_norm, batch_format="pyarrow")
