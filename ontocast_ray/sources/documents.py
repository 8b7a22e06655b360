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


def default_docling_factory():
    """Build the docling converter (ref converter.py:30-40: DocumentConverter
    constructed ONCE — it loads layout models; per-payload construction would
    reload them). Raises ConverterUnavailable when the library is absent."""
    try:
        from docling.document_converter import DocumentConverter
    except ImportError as exc:
        raise ConverterUnavailable(
            "pdf/ppt conversion requires docling (not installed)"
        ) from exc
    return DocumentConverter()


# one converter instance per worker process (model load happens once even
# under task-based map_batches, mirroring an actor __init__)
_CONVERTER_CACHE: dict[int, object] = {}


def _get_converter(converter_factory=None):
    factory = converter_factory or default_docling_factory
    key = id(factory)
    cached = _CONVERTER_CACHE.get(key)
    # the cached entry HOLDS the factory: its id cannot be recycled by the
    # allocator while cached, so an id hit is a true identity hit
    if cached is None or cached[0] is not factory:
        _CONVERTER_CACHE[key] = (factory, factory())
    return _CONVERTER_CACHE[key][1]


def _convert_rich_document(payload: bytes, suffix: str, converter_factory=None) -> str:
    """PDF/PPT → markdown via the docling converter (ref converter.py:42-59:
    bytes → DocumentStream → convert → export_to_markdown)."""
    converter = _get_converter(converter_factory)
    import io

    try:
        from docling.datamodel.base_models import DocumentStream

        stream = DocumentStream(name=f"doc{suffix}", stream=io.BytesIO(payload))
    except ImportError:
        # injected converters (tests / alternative backends) take raw bytes
        stream = payload
    result = converter.convert(stream)
    return result.document.export_to_markdown()


def convert_payload(payload: bytes, path: str, converter_factory=None) -> tuple[str, str]:
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
            return _convert_rich_document(payload, suffix, converter_factory), "success"
        return "", f"failed:unsupported extension {suffix}"  # ref :57-60
    except ConverterUnavailable as exc:
        return "", f"failed:{exc}"
    except Exception as exc:  # malformed payloads are recorded, not fatal
        return "", f"failed:{type(exc).__name__}:{exc}"


def _convert_batch(batch: pa.Table, converter_factory=None) -> pa.Table:
    paths = batch["path"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    texts, statuses = [], []
    for path, payload in zip(paths, payloads):
        text, status = convert_payload(payload or b"", path, converter_factory)
        texts.append(text)
        statuses.append(status)
    return pa.table(
        {
            "doc_id": pa.array(paths, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "convert_status": pa.array(statuses, type=pa.string()),
        }
    )


def read_documents_from_files(
    input_path: str,
    converter_factory=None,
    suffixes: Iterable[str] = SUPPORTED_SUFFIXES,
    prefix: str = "",
    **read_kwargs,
):
    """Directory of raw files → Dataset(doc_id, text, convert_status).

    ``converter_factory`` overrides the docling backend (tests inject a fake;
    the factory runs once per worker — see _get_converter); ``suffixes`` /
    ``prefix`` restrict the crawl so unrelated files never enter the read."""
    import ray.data

    paths = crawl_directory(input_path, suffixes=suffixes, prefix=prefix)
    ds = ray.data.read_binary_files(paths, include_paths=True, **read_kwargs)
    return ds.map_batches(
        _convert_batch,
        fn_kwargs={"converter_factory": converter_factory},
        batch_format="pyarrow",
    )
