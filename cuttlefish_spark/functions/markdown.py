"""Markdown -> HTML scalar function.

Parity: /root/reference/private/workers/facebook.rkt:30-32 renders the
event description from markdown and wraps it in
`<div class="event-api-content">`.

This is the engine's one genuinely-Python scalar UDF (SURVEY.md §4
"custom Spark work" item 2), so it is a vectorized `pandas_udf`: Arrow
batches in/out, one Python call per ~10k rows, not per row. If the
`markdown` package is importable it renders full CommonMark-ish
markdown; otherwise a deterministic minimal subset (headings, bold,
emphasis, links, paragraphs) keeps behavior reproducible in this
container.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # pragma: no cover - depends on container contents
    import markdown as _markdown_lib
except ImportError:
    _markdown_lib = None

_WRAPPER = '<div class="event-api-content">{}</div>'


def _render_minimal(text: str) -> str:
    """Deterministic markdown subset: #/## headings, **bold**, *em*,
    [text](url), blank-line paragraphs."""
    blocks = []
    for block in re.split(r"\n\s*\n", text.strip()):
        block = block.strip()
        if not block:
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", block)
        if m:
            level = len(m.group(1))
            blocks.append(f"<h{level}>{m.group(2).strip()}</h{level}>")
            continue
        html = re.sub(r"\*\*(.+?)\*\*", r"<strong>\1</strong>", block)
        html = re.sub(r"(?<!\*)\*([^*]+)\*(?!\*)", r"<em>\1</em>", html)
        html = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", r'<a href="\2">\1</a>', html)
        blocks.append(f"<p>{html}</p>")
    return "\n".join(blocks)


def render_markdown(text: str | None) -> str | None:
    if text is None:
        return None
    body = _markdown_lib.markdown(text) if _markdown_lib else _render_minimal(text)
    return _WRAPPER.format(body)


@pandas_udf(StringType())
def markdown_to_html(texts: pd.Series) -> pd.Series:
    return texts.map(render_markdown)
