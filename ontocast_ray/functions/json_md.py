"""JSON → Markdown flattener.

Port of the reference's ``json_to_md`` renderer
(/root/reference/ontocast/cli/split_chunks.py:15-107): nested dicts become
headed sections (## at depth 0, deeper = more #s), lists become bullet
lists, scalars render inline; keys are title-cased with underscores/dashes
expanded. Used when a document payload arrives as structured JSON rather
than prose, before chunking.
"""

from __future__ import annotations

from typing import Any


def _format_key(key: str) -> str:
    return str(key).replace("_", " ").replace("-", " ").strip().title()


def _format_value(value: Any) -> str:
    if value is None:
        return "—"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    text = str(value).strip()
    # escape markdown control characters in scalar values
    for ch in ("*", "_", "`", "#"):
        text = text.replace(ch, "\\" + ch)
    return text


def _handle_list(items: list, depth: int) -> str:
    lines = []
    for item in items:
        if isinstance(item, dict):
            lines.append(json_to_md(item, title=None, depth=depth + 1))
        elif isinstance(item, list):
            lines.append(_handle_list(item, depth + 1))
        else:
            lines.append(f"- {_format_value(item)}")
    return "\n".join(lines)


def json_to_md(data: Any, title: str | None = None, depth: int = 0) -> str:
    """Render arbitrary nested JSON as headed Markdown."""
    lines: list[str] = []
    if title:
        lines.append(f"{'#' * (depth + 2)} {_format_key(title)}\n")
    if isinstance(data, dict):
        for key, value in data.items():
            if isinstance(value, dict):
                lines.append(json_to_md(value, title=key, depth=depth + 1))
            elif isinstance(value, list):
                lines.append(f"{'#' * (depth + 3)} {_format_key(key)}\n")
                lines.append(_handle_list(value, depth))
            else:
                lines.append(f"**{_format_key(key)}**: {_format_value(value)}\n")
    elif isinstance(data, list):
        lines.append(_handle_list(data, depth))
    else:
        lines.append(_format_value(data))
    return "\n".join(lines)
