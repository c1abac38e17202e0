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

import html.parser as _hp
import re
from html import unescape

# Non-start-tag events (comments, declarations, PIs, end tags, bogus end
# tags). Start tags are scanned with html.parser's OWN compiled tolerant
# regexes below, so tag extents, attribute values, junk recovery, and
# incomplete-tag buffering are stdlib-identical by construction (the
# hypothesis equivalence fuzzer in tests/test_fast_html.py holds the line).
_EVENT_RE = re.compile(
    r"""<(?:
        !--(?P<comment>.*?)--\s*>
      | (?P<decl>![^>]*)>
      | \?(?P<pi>[^>]*)>
    )""",
    re.S | re.X,
)

# strict end tag (CPython endtagfind); failures fall back to
# tagfind_tolerant + skip-to-'>' / bogus comment, exactly like parse_endtag
_ENDTAG_STRICT = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")

# stdlib html.parser's start-tag machinery (CPython parse_starttag /
# check_for_whole_start_tag semantics, driven by the same module regexes).
# These module-level regexes are undocumented internals — guard with getattr
# and fall back to vendored copies (verbatim from the public CPython 3.11
# html/parser.py source) so a future rename can't break import, and the
# fuzzers in tests/test_fast_html.py still hold the equivalence line.
_VENDORED_LOCATE_START = re.compile(
    r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""",
    re.VERBOSE,
)
_VENDORED_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_VENDORED_ATTRFIND = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
)
_LOCATE_START = getattr(_hp, "locatestarttagend_tolerant", _VENDORED_LOCATE_START)
_TAGFIND = getattr(_hp, "tagfind_tolerant", _VENDORED_TAGFIND)
_ATTRFIND = getattr(_hp, "attrfind_tolerant", _VENDORED_ATTRFIND)
_NEXT_OK = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"

# html.parser CDATA_CONTENT_ELEMENTS: bodies are raw text (no entity
# decoding, no tag recognition) until the matching close tag.
_RAW_TEXT = ("script", "style")


def _parse_attrs(
    text: str, k: int, j: int, keep: bool
) -> tuple[list[tuple[str, str | None]], int]:
    """CPython parse_starttag's attr loop verbatim over text[k:j]:
    attrfind_tolerant per attribute, quoted values stripped, '=' with empty
    unquoted value is '', bare names are None, entities unescaped. Returns
    (attrs, k): ``k`` is where the loop stopped — the startend/junk decision
    needs it even when ``keep`` is False (attrs not wanted)."""
    attrs: list[tuple[str, str | None]] = []
    while k < j:
        m = _ATTRFIND.match(text, k)
        if not m:
            break
        if keep:
            attrname, rest, attrvalue = m.group(1, 2, 3)
            if not rest:
                attrvalue = None
            elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
                attrvalue = attrvalue[1:-1]
            if attrvalue and "&" in attrvalue:
                attrvalue = unescape(attrvalue)
            attrs.append((attrname.lower(), attrvalue))
        k = m.end()
    return attrs, k


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
        c = text[lt + 1 : lt + 2]
        if c == "/":
            # end tag: CPython parse_endtag's exact cascade. With no '>'
            # anywhere after, parse_endtag reports incomplete and goahead's
            # recovery turns the rest into text.
            if find(">", lt + 1) < 0:
                if wants_data is None or wants_data():
                    builder.handle_data("<")
                pos = lt + 1
                continue
            m2 = _ENDTAG_STRICT.match(text, lt)
            if m2:
                builder.handle_endtag(m2.group(1).lower())
                pos = m2.end()
                continue
            if text.startswith("</>", lt):
                pos = lt + 3
                continue
            nm = _TAGFIND.match(text, lt + 2)
            if nm:
                # junk between the name and '>' is consumed and ignored
                gt = find(">", nm.end())
                builder.handle_endtag(nm.group(1).lower())
                pos = n if gt < 0 else gt + 1
                continue
            # bogus comment: dropped through the next '>'
            gt = find(">", lt + 2)
            if gt >= 0:
                pos = gt + 1
                continue
            # incomplete bogus comment at EOF: goahead recovery ('<' as
            # data, remainder re-enters as plain text)
            if wants_data is None or wants_data():
                builder.handle_data("<")
            pos = lt + 1
            continue
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            # start tag: stdlib-identical scan (CPython parse_starttag +
            # check_for_whole_start_tag, using html.parser's own regexes)
            j = _LOCATE_START.match(text, lt).end()
            nxt = text[j : j + 1]
            if nxt == ">":
                endpos = j + 1
                startend = False
            elif nxt == "/" and text.startswith("/>", j):
                endpos = j + 2
                startend = True
            elif nxt == "" or nxt in _NEXT_OK or nxt == "/":
                # stdlib cannot complete the tag here (-1 from
                # check_for_whole_start_tag); its close()-time recovery
                # emits RAW character data through the next '>' (else to
                # the next '<', else to EOF) and resumes parsing after it
                k2 = find(">", lt + 1)
                if k2 >= 0:
                    k2 += 1
                else:
                    k2 = find("<", lt + 1)
                    if k2 < 0:
                        # nothing tag-like left: '<' as raw data, the rest
                        # re-enters the loop as plain text (which unescapes)
                        if wants_data is None or wants_data():
                            builder.handle_data("<")
                        pos = lt + 1
                        continue
                if wants_data is None or wants_data():
                    # unlike parse_starttag's junk branches (raw), goahead's
                    # recovery unescapes under convert_charrefs
                    d = text[lt:k2]
                    builder.handle_data(unescape(d) if "&" in d else d)
                pos = k2
                continue
            else:
                # junk where the tag should end: stdlib emits the scanned
                # span as RAW data and resumes after it
                if wants_data is None or wants_data():
                    builder.handle_data(text[lt:j])
                pos = j if j > lt else lt + 1
                continue
            tm = _TAGFIND.match(text, lt + 1)
            tag = tm.group(1).lower()
            attrs, ak = _parse_attrs(
                text, tm.end(), j, wants_attrs is None or wants_attrs(tag)
            )
            leftover = text[ak:endpos].strip()
            if leftover == "/>":
                startend = True
            elif leftover != ">":
                # junk between attributes and the tag end (e.g. commas after
                # values): stdlib's parse_starttag error branch emits the
                # whole span as RAW data and resumes after it
                if wants_data is None or wants_data():
                    builder.handle_data(text[lt:endpos])
                pos = endpos
                continue
            pos = endpos
            if startend:
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
        m = _EVENT_RE.match(text, lt)
        if m is None:
            # stray '<' that opens no markup: literal text (html.parser
            # emits it with following chars; '.text' only concatenates, so
            # chunking differences are invisible)
            builder.handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        # comments / declarations / processing instructions: dropped, same
        # as the stdlib builder (no .text contribution)
