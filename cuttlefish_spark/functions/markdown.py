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


def render_markdown_minimal(text: str | None) -> str | None:
    """render_markdown pinned to the committed minimal renderer,
    regardless of whether the optional `markdown` package is importable.
    The `markdown_html` query's golden md5 table was generated from the
    minimal renderer; routing the query through this function keeps the
    golden contract independent of container contents (r6 ADVICE item 1
    — previously the goldens would all fail, with no hint why, if the
    lib ever appeared in the driver image)."""
    if text is None:
        return None
    return _WRAPPER.format(_render_minimal(text))


@pandas_udf(StringType())
def markdown_to_html_minimal(texts: pd.Series) -> pd.Series:
    return texts.map(render_markdown_minimal)


# Committed markdown fixture corpus for the `markdown_html` query — one
# doc per renderer branch (headings 1/6, bold, em, bold+em interleave,
# links, multi-paragraph, no-markdown, unicode, unterminated markers,
# whitespace-only, NULL, heading-not-at-block-start). The query renders
# these and the oracle pins the committed golden md5 per doc, making the
# one formerly rows-only query hash-verified end to end (driver VERDICT
# r5 item 2). Goldens were generated from the verified renderer output
# and reviewed against the minimal-renderer spec by hand.
MD_FIXTURE: list[tuple[int, str | None]] = [
    (1, "# Release Notes\n\nVersion **2.0** is *out* today."),
    (2, "Plain paragraph with [a link](https://example.com/x?a=1&b=2) inline."),
    (3, "## Sub *head*\n\nFirst para.\n\nSecond **para** here."),
    (4, ""),
    (5, None),
    (6, "###### deep heading\n\n*em* **strong** ***both*** *a*b* edge"),
    (7, "No markdown at all, just text."),
    (8, "### Café résumé — naïve\n\nUnicode **café** body."),
    (9, "**unterminated bold\n\n*stray star"),
    (10, "[text](url) at start and [two](u2) links [three](u3)."),
    (11, "   \n\n   "),
    (12, "# H1\n## H2\n\nheading only at block start"),
]
