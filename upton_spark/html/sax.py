"""Streaming (SAX) CSS matching — selector pushdown into the tokenizer.

For the crawl's hot path (``extract_text`` / ``extract_links`` /
``extract_list`` with compound selectors joined by descendant/child
combinators — every selector in the reference goldens), building a DOM is
wasted work: ~600 Element allocations per 150KB page feed the collector and
saturate memory bandwidth at high core counts. This module matches the
selector *during* tokenization with an NFA over selector steps and a stack
of open elements, allocating only for matched subtrees.

Semantics are kept identical to the DOM path (same tokenizer, same
implied-end/void-element rules as dom._TreeBuilder, text assembled exactly
as extract.text_of); tests/test_fast_html.py + test_sax_stream.py assert
byte-identical output across the reference fixture corpus, synthetic pages,
and quirky markup. Unsupported selector shapes (sibling combinators,
pseudos, XPath, comma groups with unsupported members) return ``None`` and
the caller falls back to the DOM engine — never a behavior change.
"""

from __future__ import annotations

from html import unescape

from upton_spark.html import fast
from upton_spark.html.dom import VOID_ELEMENTS, _BLOCK_CLOSES_P, _CLOSE_ON_START
from upton_spark.html.selector import _Compound, _parse_selector


def _compile_css(selector: str):
    """Selector → list of groups; each group is (combinators, compounds)
    with combinators[i] in {'', ' ', '>'}; None if unsupported here."""
    try:
        groups = _parse_selector(selector)
    except ValueError:
        return None
    compiled = []
    for group in groups:
        combs: list[str] = []
        comps: list[_Compound] = []
        for comb, compound in group:
            if comb not in ("", " ", ">"):
                return None  # sibling combinators need sibling state
            if compound.pseudos:
                return None
            combs.append(comb)
            comps.append(compound)
        compiled.append((combs, comps))
    return compiled


def _matches(compound: _Compound, tag: str, attrs: dict[str, str | None]) -> bool:
    if compound.tag is not None and compound.tag != tag:
        return False
    if compound.id is not None and attrs.get("id") != compound.id:
        return False
    if compound.classes:
        cls = (attrs.get("class") or "").split()
        for c in compound.classes:
            if c not in cls:
                return False
    for name, op, value in compound.attrs:
        if name not in attrs:
            return False
        actual = attrs.get(name)
        if op is None:
            continue
        if actual is None:
            return False
        if op == "=":
            ok = actual == value
        elif op == "~=":
            ok = value in actual.split()
        elif op == "^=":
            ok = bool(value) and actual.startswith(value)
        elif op == "$=":
            ok = bool(value) and actual.endswith(value)
        elif op == "*=":
            ok = bool(value) and value in actual
        elif op == "|=":
            ok = actual == value or actual.startswith(f"{value}-")
        else:
            ok = False
        if not ok:
            return False
    return True


_EMPTY: frozenset = frozenset()
_NO_ATTRS: dict = {}


class _StreamMatcher:
    """Tokenizer-callback object (same interface dom._TreeBuilder exposes)
    that runs the selector NFA and captures matched subtrees.

    Per open element we keep (tag, active, matched_here, fired):
      active       — step indices whose prefix is matched by this element or
                     an ancestor, available to descendants (' ' combinator)
      matched_here — steps matched AT this element (feeds '>' to children)
    Stack maintenance mirrors dom._TreeBuilder exactly (implied ends, void
    elements, stray end tags) so document structure agrees with the DOM
    engine by construction.
    """

    __slots__ = (
        "groups", "want_text", "stack", "captures", "results", "hrefs",
        "_empty_matched", "_attr_tags",
    )

    def __init__(self, groups, want_text: bool):
        self.groups = groups  # list of (combs, comps)
        self.want_text = want_text
        # tags that can start some compound (None = tagless compound like
        # '#id' or '*', so every tag needs its attributes parsed); other
        # tags can never match, so their attribute blobs are never read
        tags: set[str] | None = set()
        for _, comps in groups:
            for comp in comps:
                if comp.tag is None:
                    tags = None
                    break
                tags.add(comp.tag)
            if tags is None:
                break
        self._attr_tags = tags
        self._empty_matched = tuple(_EMPTY for _ in groups)
        # stack rows: (tag, per-group active sets, per-group matched sets)
        self.stack: list[tuple] = [("#document", self._empty_matched, self._empty_matched)]
        self.captures: list[list] = []  # [order_idx, depth, parts]
        self.results: list[tuple[int, object]] = []  # (order, text|href)
        self.hrefs: list[str | None] = []

    # -- structural helpers mirroring _TreeBuilder ------------------------
    def _implied_end(self, tag: str) -> None:
        closes = _CLOSE_ON_START.get(tag)
        if closes:
            while len(self.stack) > 1 and self.stack[-1][0] in closes:
                self._pop()
        if tag in _BLOCK_CLOSES_P:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i][0]
                if t == "p":
                    while len(self.stack) > i:
                        self._pop()
                    break
                if t in ("td", "th", "table", "caption"):
                    break

    def _pop(self) -> None:
        self.stack.pop()
        depth = len(self.stack)
        while self.captures and self.captures[-1][1] > depth:
            order, _, parts = self.captures.pop()
            self.results.append((order, "".join(parts)))

    # -- tokenizer callbacks ---------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._implied_end(tag)
        if attrs:
            attr_dict: dict[str, str | None] = {}
            for name, value in attrs:
                if name not in attr_dict:
                    attr_dict[name] = value
        else:
            attr_dict = _NO_ATTRS
        parent = self.stack[-1]
        anc_active, par_matched = parent[1], parent[2]
        new_active = None  # lazily diverge from parent's tuples
        new_matched = None
        fired = False
        for gi, (combs, comps) in enumerate(self.groups):
            last = len(comps) - 1
            active = anc_active[gi]
            matched_parent = par_matched[gi]
            cand = {0} if combs[0] == "" else set()
            for i in active:
                if i < last and combs[i + 1] == " ":
                    cand.add(i + 1)
            for i in matched_parent:
                if i < last and combs[i + 1] == ">":
                    cand.add(i + 1)
            here = frozenset(j for j in cand if _matches(comps[j], tag, attr_dict)) if cand else _EMPTY
            if here:
                if last in here:
                    fired = True
                if new_matched is None:
                    new_matched = list(par_matched)
                    new_active = list(anc_active)
                new_matched[gi] = here
                new_active[gi] = active | here
        if new_matched is None:
            # common case: nothing matched here — children see the same
            # active sets and an all-empty matched tuple (no allocation)
            row_matched = self._empty_matched
            row_active = anc_active
        else:
            for gi in range(len(self.groups)):
                if new_matched[gi] is par_matched[gi]:
                    new_matched[gi] = _EMPTY
            row_matched = tuple(new_matched)
            row_active = tuple(new_active)
        if fired:
            order = len(self.results) + len(self.captures)
            if self.want_text:
                if tag in VOID_ELEMENTS:
                    self.results.append((order, ""))
                else:
                    self.captures.append([order, len(self.stack) + 1, []])
            else:
                self.results.append((order, attr_dict.get("href")))
        if tag not in VOID_ELEMENTS:
            self.stack.append((tag, row_active, row_matched))

    def handle_startendtag(self, tag, attrs):
        self._implied_end(tag)
        attr_dict: dict[str, str | None] = {}
        for name, value in attrs:
            if name not in attr_dict:
                attr_dict[name] = value
        _, anc_active, par_matched = self.stack[-1]
        for gi, (combs, comps) in enumerate(self.groups):
            last = len(comps) - 1
            cand = {0} if combs[0] == "" else set()
            for i in anc_active[gi]:
                if i < last and combs[i + 1] == " ":
                    cand.add(i + 1)
            for i in par_matched[gi]:
                if i < last and combs[i + 1] == ">":
                    cand.add(i + 1)
            if any(j == last and _matches(comps[j], tag, attr_dict) for j in cand):
                order = len(self.results) + len(self.captures)
                self.results.append((order, "" if self.want_text else attr_dict.get("href")))
                break

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i][0] == tag:
                while len(self.stack) > i:
                    self._pop()
                return

    def wants_data(self) -> bool:
        """Tokenizer hint: only slice/decode text while a capture is open."""
        return bool(self.captures) if self.want_text else False

    def wants_attrs(self, tag: str) -> bool:
        """Tokenizer hint: attribute blobs are only parsed for tags that can
        start some compound — a tag outside every compound can never match,
        and its attributes are never otherwise read."""
        return self._attr_tags is None or tag in self._attr_tags

    def handle_data(self, data):
        if self.captures and data:
            for cap in self.captures:
                cap[2].append(data)

    def finish(self):
        while self.captures:
            order, _, parts = self.captures.pop()
            self.results.append((order, "".join(parts)))
        self.results.sort(key=lambda r: r[0])
        return [v for _, v in self.results]


def _run(html: str, selector: str, want_text: bool):
    if not selector or selector.lstrip().startswith(("/", "(", ".//")):
        return None  # XPath family → DOM engine
    groups = _compile_css(selector)
    if groups is None:
        return None
    matcher = _StreamMatcher(groups, want_text)
    fast.feed_events(matcher, html or "")
    return matcher.finish()


def stream_texts(html: str, selector: str) -> list[str] | None:
    """One text per matched element (document order), or None if the
    selector needs the DOM engine."""
    return _run(html, selector, want_text=True)


def stream_hrefs(html: str, selector: str) -> list[str | None] | None:
    """href attribute per matched element, or None if unsupported."""
    return _run(html, selector, want_text=False)
