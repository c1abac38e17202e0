"""Fast HTML tokenizer: a compiled-regex scanner feeding the same tree
builder as the stdlib path.

``html.parser``'s char-by-char ``goahead`` loop (plus ``updatepos``
bookkeeping) is ~70% of extraction cost at 150KB/page. This scanner emits
the same event stream — starttag/endtag/data with entity-decoded text,
lowercased names, raw ``script``/``style`` bodies — from a handful of
compiled regexes, calling the *identical* ``_TreeBuilder`` callbacks so
tree-construction semantics (implied end tags, void elements, stray ends)
are shared by construction, not duplicated.

Used by :func:`upton_spark.html.dom.parse_html` by default with automatic
fallback to the stdlib parser on any scanner error; comparative goldens in
tests/test_fast_html.py assert byte-identical extraction against the
stdlib path over the reference fixture corpus and synthetic pages.
Reference semantics under test: Nokogiri ``.text``/``[]`` behavior per
/root/reference/spec/upton_spec.rb:14-40 and spec/unit/parsing_spec.rb.
"""

from __future__ import annotations

import re
from html import unescape

# Tag-open events. Attribute blob: anything up to the closing '>' that is
# not a naked '>', with quoted sections allowed to contain '>'.
_EVENT_RE = re.compile(
    r"""<(?:
        !--(?P<comment>.*?)--\s*>
      | (?P<decl>![^>]*)>
      | \?(?P<pi>[^>]*)>
      | /\s*(?P<end>[a-zA-Z][^\s>]*)\s*>
      | (?P<start>[a-zA-Z][^\s/>]*)(?P<attrs>(?:"[^"]*"|'[^']*'|[^>])*?)(?P<selfclose>/?)>
    )""",
    re.S | re.X,
)

_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?"""
)

# html.parser CDATA_CONTENT_ELEMENTS: bodies are raw text (no entity
# decoding, no tag recognition) until the matching close tag.
_RAW_TEXT = ("script", "style")


def _parse_attrs(blob: str) -> list[tuple[str, str | None]]:
    out = []
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        if m.group(2) is not None:
            value: str | None = m.group(2)
        elif m.group(3) is not None:
            value = m.group(3)
        elif m.group(4):
            value = m.group(4)
        else:
            value = None
        if value is not None and "&" in value:
            value = unescape(value)
        out.append((name, value))
    return out


def feed_events(builder, text: str) -> None:
    """Scan ``text`` and drive ``builder``'s handle_* callbacks (the same
    interface HTMLParser drives).

    If the builder exposes ``wants_data()`` (the streaming matcher does),
    text segments are only sliced/entity-decoded while it returns True —
    for a selective selector that skips copying ~the whole page."""
    pos = 0
    n = len(text)
    lower = None  # lazily lowered copy for raw-text close-tag search
    find = text.find
    wants_data = getattr(builder, "wants_data", None)
    wants_attrs = getattr(builder, "wants_attrs", None)
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            if wants_data is None or wants_data():
                data = text[pos:]
                if data:
                    builder.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos and (wants_data is None or wants_data()):
            data = text[pos:lt]
            builder.handle_data(unescape(data) if "&" in data else data)
        m = _EVENT_RE.match(text, lt)
        if m is None:
            # stray '<' that opens no markup: literal text (html.parser
            # emits it with following chars; '.text' only concatenates, so
            # chunking differences are invisible)
            builder.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        start, attr_blob, selfclose, end = m.group("start", "attrs", "selfclose", "end")
        if start is not None:
            tag = start.lower()
            if selfclose and attr_blob and not attr_blob[-1].isspace() and attr_blob[-1] not in "\"'":
                # HTML5: '/' inside an UNQUOTED attribute value is part of the
                # value, not a self-close marker ('<a href=http://x/>' has
                # href 'http://x/'). Only when the last attr match of
                # blob+'/' consumes the slash as an unquoted value does the
                # slash belong to the value (matches stdlib html.parser and
                # Nokogiri). '<br foo/>' stays self-closing: a bare name
                # cannot absorb '/'.
                ext = attr_blob + "/"
                last_m = None
                for last_m in _ATTR_RE.finditer(ext):
                    pass
                if last_m is not None and last_m.end() == len(ext) and last_m.group(4):
                    attr_blob = ext
                    selfclose = ""
            if (
                attr_blob
                and not attr_blob.isspace()
                and (wants_attrs is None or wants_attrs(tag))
            ):
                attrs = _parse_attrs(attr_blob)
            else:
                attrs = []
            if selfclose:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                if tag in _RAW_TEXT:
                    if lower is None:
                        lower = text.lower()
                    close = lower.find("</" + tag, pos)
                    if close < 0:
                        if wants_data is None or wants_data():
                            builder.handle_data(text[pos:])
                        builder.handle_endtag(tag)
                        break
                    if wants_data is None or wants_data():
                        builder.handle_data(text[pos:close])  # raw, undecoded
                    gt = find(">", close)
                    pos = n if gt < 0 else gt + 1
                    builder.handle_endtag(tag)
            continue
        if end is not None:
            builder.handle_endtag(end.lower())
        # comments / declarations / processing instructions: dropped, same
        # as the stdlib builder (no .text contribution)
