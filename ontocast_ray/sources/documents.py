"""Document sources: file crawling, format dispatch, payload → text conversion.

Ray-Data-first restructuring of the reference's file ingestion
(/root/reference/ontocast/cli/util.py:10-39 + agent/convert_document.py:17-60):

- ``crawl_directory``: recursive suffix-filtered listing, sorted (S1);
- ``convert_payload``: extension dispatch — .json payloads use the
  ``{"text": ...}`` convention (falling back to json_to_md for structured
  JSON), .txt/.md pass through, .pdf/.ppt/.pptx go to the converter
  (docling in the reference — stubbed here behind an import-try since the
  container has no docling; the dispatch, schema and error paths are real);
- ``read_documents_from_files``: ray.data.read_binary_files → doc rows
  (doc_id = file path, text) via a stateless ``map_batches`` task.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Iterable

import pyarrow as pa

from ontocast_ray.functions.json_md import json_to_md

TEXT_SUFFIXES = {".txt", ".md", ".json"}
CONVERT_SUFFIXES = {".pdf", ".ppt", ".pptx"}  # ref converter.py:19-59
SUPPORTED_SUFFIXES = TEXT_SUFFIXES | CONVERT_SUFFIXES


def crawl_directory(
    input_path: str, suffixes: Iterable[str] = SUPPORTED_SUFFIXES, prefix: str = ""
) -> list[str]:
    """Recursive, sorted file listing filtered by suffix/prefix (ref cli/util.py:10-26)."""
    out = []
    for root, _dirs, files in os.walk(input_path):
        for name in files:
            p = Path(root) / name
            if p.suffix.lower() in set(suffixes) and p.name.startswith(prefix):
                out.append(str(p))
    return sorted(out)


class ConverterUnavailable(NotImplementedError):
    pass


def _convert_rich_document(payload: bytes, suffix: str) -> str:
    """PDF/PPT → markdown. The reference uses docling layout models
    (converter.py:19-59); not present in this container — the call site and
    error path are real, the decode is stubbed."""
    try:
        import docling  # noqa: F401
    except ImportError as exc:
        raise ConverterUnavailable(
            f"{suffix} conversion requires docling (not installed); "
            "plug DocumentConverter here"
        ) from exc
    raise ConverterUnavailable("docling present but converter wiring not implemented")


def convert_payload(payload: bytes, path: str) -> tuple[str, str]:
    """→ (text, status). status: 'success' | 'failed:<reason>'."""
    suffix = Path(path).suffix.lower()
    try:
        if suffix == ".json":
            data = json.loads(payload.decode("utf-8"))
            if isinstance(data, dict) and isinstance(data.get("text"), str):
                return data["text"], "success"  # ref convert_document.py:48-56
            return json_to_md(data), "success"
        if suffix in (".txt", ".md"):
            return payload.decode("utf-8", "replace"), "success"
        if suffix in CONVERT_SUFFIXES:
            return _convert_rich_document(payload, suffix), "success"
        return "", f"failed:unsupported extension {suffix}"  # ref :57-60
    except ConverterUnavailable as exc:
        return "", f"failed:{exc}"
    except Exception as exc:  # malformed payloads are recorded, not fatal
        return "", f"failed:{type(exc).__name__}:{exc}"


def _convert_batch(batch: pa.Table) -> pa.Table:
    paths = batch["path"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    texts, statuses = [], []
    for path, payload in zip(paths, payloads):
        text, status = convert_payload(payload or b"", path)
        texts.append(text)
        statuses.append(status)
    return pa.table(
        {
            "doc_id": pa.array(paths, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "convert_status": pa.array(statuses, type=pa.string()),
        }
    )


def read_documents_from_files(input_path: str, **read_kwargs):
    """Directory of raw files → Dataset(doc_id, text, convert_status)."""
    import ray.data

    paths = crawl_directory(input_path)
    ds = ray.data.read_binary_files(paths, include_paths=True, **read_kwargs)
    return ds.map_batches(_convert_batch, batch_format="pyarrow")
