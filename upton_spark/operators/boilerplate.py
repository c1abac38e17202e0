"""Main-content extraction (boilerplate removal) over crawled HTML.

The LLM-pipeline stage the reference never needed (upton's extraction is
user-CSS-driven, lib/upton.rb:281-288; a training-data pipeline has no
per-site CSS and must find the content itself): a jusText-style
(Pomikálek 2011; trafilatura and CCNet solve the same problem — all
public) text/link-density classifier over block-level DOM segments.
Navigation, footers, and "related links" rails are link-dense and short;
article prose is long and link-sparse — a density rule needs no
site-specific selectors and no language model.

Rule, per LEAF block element (a block-level tag with no block-level
descendant — nested wrappers delegate to their inner blocks):

  kept  iff  n_chars >= min_chars  AND  link_density <= max_link_density

where text is whitespace-normalized, ``link_density`` = chars inside
``<a>`` descendants / total chars, and script/style/template subtrees are
never counted (the stdlib parser yields their raw contents as text).
Text outside any block tag (rare in real pages) is not classified —
documented approximation, same as jusText's paragraph segmentation.

Scale shape: one Arrow-batched ``mapInPandas`` stage over the pages scan
(the html column never leaves the executor), map-only — no shuffle; the
per-url aggregate is a plain groupBy. The classifier is a pure function
(``content_blocks``) shared verbatim by the Spark UDF, the pytest goldens,
and the generated DuckDB oracle (bake-the-constants pattern).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from upton_spark.html.dom import Element, decode_html_bytes, parse_html

BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 td th blockquote pre article section "
    "aside header footer nav main figcaption dd dt".split()
)
SKIP_TAGS = frozenset("script style noscript template head title svg".split())

DEFAULT_MIN_CHARS = 25
DEFAULT_MAX_LINK_DENSITY = 0.33


def _has_block_descendant(el: Element) -> bool:
    for child in el.children:
        if isinstance(child, Element):
            if child.tag in BLOCK_TAGS or _has_block_descendant(child):
                return True
    return False


def _gather(el: Element, in_link: bool, parts: list, link_parts: list) -> None:
    for child in el.children:
        if isinstance(child, str):
            parts.append(child)
            if in_link:
                link_parts.append(child)
        elif child.tag in SKIP_TAGS:
            continue
        else:
            _gather(child, in_link or child.tag == "a", parts, link_parts)


def content_blocks(
    html_text: str,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> list[tuple[int, str, str, int, int, bool]]:
    """(block_index, tag, text, n_chars, link_density_micro, kept) per
    leaf block, document order. ``link_density_micro`` is an exact integer
    (round(density * 1e6)) so downstream comparisons never touch
    cross-engine float formatting. Pure function — shared by the Spark
    UDF, tests, and oracle generation."""
    root = parse_html(html_text)
    out = []
    idx = 0
    for el in root.iter_self_and_elements():
        if el.tag not in BLOCK_TAGS or _has_block_descendant(el):
            continue
        # skip blocks inside script/style-ish subtrees (defensive; the
        # parser rarely nests blocks there)
        anc, skip = el.parent, False
        while anc is not None:
            if anc.tag in SKIP_TAGS:
                skip = True
                break
            anc = anc.parent
        if skip:
            continue
        parts: list[str] = []
        link_parts: list[str] = []
        _gather(el, el.tag == "a", parts, link_parts)
        text = " ".join("".join(parts).split())
        n = len(text)
        link_n = len(" ".join("".join(link_parts).split()))
        micro = 0 if n == 0 else int(round(link_n / n * 1_000_000))
        kept = n >= min_chars and (n == 0 or link_n / n <= max_link_density)
        out.append((idx, el.tag, text, n, micro, kept))
        idx += 1
    return out


def main_content(
    html_text: str,
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> str:
    """Kept blocks joined with newlines — the training-text view."""
    return "\n".join(
        b[2]
        for b in content_blocks(html_text, min_chars, max_link_density)
        if b[5]
    )


_BLOCK_SCHEMA = (
    "url string, block_index int, tag string, text string, n_chars int, "
    "link_density_micro long, kept boolean"
)


def content_block_stats(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """One row per leaf block per page: the classifier's full evidence
    (tag, text, density, verdict). Arrow-batched mapInPandas over the
    (url, html) projection — constant memory per task, html never
    collected."""
    cols = pages.select(F.col(url_col).alias("url"), F.col(html_col).alias("_html"))

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "url", "block_index", "tag", "text", "n_chars",
                "link_density_micro", "kept",
            )}
            for url, payload in zip(pdf["url"], pdf["_html"]):
                if payload is None:
                    continue
                text = (
                    decode_html_bytes(bytes(payload))
                    if isinstance(payload, (bytes, bytearray, memoryview))
                    else str(payload)
                )
                for (i, tag, btext, n, micro, kept) in content_blocks(
                    text, min_chars, max_link_density
                ):
                    rows["url"].append(url)
                    rows["block_index"].append(i)
                    rows["tag"].append(tag)
                    rows["text"].append(btext)
                    rows["n_chars"].append(n)
                    rows["link_density_micro"].append(micro)
                    rows["kept"].append(kept)
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, schema=_BLOCK_SCHEMA)


def extract_main_content(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_chars: int = DEFAULT_MIN_CHARS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """(url, content, n_blocks, n_kept) per page — kept blocks newline-
    joined in document order. Built on content_block_stats (one Arrow
    stage) + a per-url groupBy; content order is pinned by block_index
    inside the aggregation (sort_array over (index, text) structs), so the
    result is partitioning-independent."""
    blocks = content_block_stats(
        pages, html_col, url_col, min_chars, max_link_density
    )
    kept_struct = F.when(
        F.col("kept"), F.struct(F.col("block_index"), F.col("text"))
    )
    return (
        blocks.groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["text"],
                ),
                "\n",
            ).alias("content"),
        )
        .select("url", "content", "n_blocks", "n_kept")
    )
