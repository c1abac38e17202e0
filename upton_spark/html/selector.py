"""CSS-selector subset + micro-XPath engine over :mod:`upton_spark.html.dom`.

Covers the selector shapes the reference exercises (SURVEY.md §7.5):
CSS compounds (``tag``, ``#id``, ``.class``, ``[attr]``, ``[attr=v]`` and
friends) with descendant/child/sibling combinators and comma groups, plus the
XPath fragment family used by the table golden:
``//tag[contains(concat(" ", normalize-space(@class), " "), " cls ")][2]``.

``search()`` auto-detects CSS vs XPath the way Nokogiri's ``search`` does
(reference lib/upton.rb:282, lib/upton/utils.rb:24-27,38). Results are in
document order, deduplicated, with positional XPath predicates applied per
context node (proper XPath semantics for ``//x[p][n]``).
"""

from __future__ import annotations

import re

from upton_spark.html.dom import Element

# --------------------------------------------------------------------------
# CSS
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comb>[>+~])
  | (?P<comma>,)
  | (?P<hash>\#[\w\-]+)
  | (?P<class>\.[\w\-]+)
  | (?P<attr>\[\s*[\w\-]+\s*(?:[~^$*|]?=\s*(?:"[^"]*"|'[^']*'|[^\]\s]+))?\s*\])
  | (?P<pseudo>:[\w\-]+(?:\([^)]*\))?)
  | (?P<tag>\*|[\w\-]+)
""",
    re.X,
)

_ATTR_RE = re.compile(
    r"""\[\s*(?P<name>[\w\-]+)\s*(?:(?P<op>[~^$*|]?=)\s*(?P<val>"[^"]*"|'[^']*'|[^\]\s]+))?\s*\]"""
)


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self):
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None]] = []  # (name, op, value)
        self.pseudos: list[str] = []


def _parse_selector(selector: str) -> list[list[tuple[str, _Compound]]]:
    """Parse into groups; each group is [(combinator, compound), ...] where
    combinator is one of '' (first), ' ', '>', '+', '~'."""
    groups: list[list[tuple[str, _Compound]]] = []
    current: list[tuple[str, _Compound]] = []
    pending_comb = ""
    compound: _Compound | None = None
    pos = 0
    s = selector.strip()
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            raise ValueError(f"unsupported CSS selector syntax at {s[pos:]!r} in {selector!r}")
        pos = m.end()
        kind = m.lastgroup
        tok = m.group()
        if kind == "comma":
            if compound is not None:
                current.append((pending_comb, compound))
            if current:
                groups.append(current)
            current, compound, pending_comb = [], None, ""
            continue
        if kind == "ws":
            if compound is not None:
                current.append((pending_comb, compound))
                compound, pending_comb = None, " "
            continue
        if kind == "comb":
            if compound is not None:
                current.append((pending_comb, compound))
                compound = None
            pending_comb = tok
            continue
        if compound is None:
            compound = _Compound()
        if kind == "tag":
            compound.tag = None if tok == "*" else tok.lower()
        elif kind == "hash":
            compound.id = tok[1:]
        elif kind == "class":
            compound.classes.append(tok[1:])
        elif kind == "attr":
            am = _ATTR_RE.match(tok)
            if not am:
                raise ValueError(f"bad attribute selector {tok!r}")
            val = am.group("val")
            if val and val[0] in "\"'":
                val = val[1:-1]
            compound.attrs.append((am.group("name").lower(), am.group("op"), val))
        elif kind == "pseudo":
            compound.pseudos.append(tok[1:])
    if compound is not None:
        current.append((pending_comb, compound))
    if current:
        groups.append(current)
    if not groups:
        raise ValueError(f"empty selector {selector!r}")
    return groups


def _match_attr(el: Element, name: str, op: str | None, value: str | None) -> bool:
    actual = el.get(name)
    if op is None:
        return name in el.attrs
    if actual is None:
        return False
    if op == "=":
        return actual == value
    if op == "~=":
        return value in actual.split()
    if op == "^=":
        return bool(value) and actual.startswith(value)
    if op == "$=":
        return bool(value) and actual.endswith(value)
    if op == "*=":
        return bool(value) and value in actual
    if op == "|=":
        return actual == value or actual.startswith(f"{value}-")
    return False


def _element_children(parent: Element) -> list[Element]:
    return [c for c in parent.children if isinstance(c, Element)]


def _match_pseudo(el: Element, pseudo: str) -> bool:
    if pseudo in ("first-child", "last-child", "only-child") or pseudo.startswith("nth-child"):
        parent = el.parent
        siblings = _element_children(parent) if parent is not None else [el]
        idx = siblings.index(el)
        if pseudo == "first-child":
            return idx == 0
        if pseudo == "last-child":
            return idx == len(siblings) - 1
        if pseudo == "only-child":
            return len(siblings) == 1
        arg = pseudo[pseudo.index("(") + 1 : -1].strip()
        if arg.isdigit():
            return idx + 1 == int(arg)
        if arg == "odd":
            return idx % 2 == 0
        if arg == "even":
            return idx % 2 == 1
        raise ValueError(f"unsupported :nth-child argument {arg!r}")
    raise ValueError(f"unsupported pseudo-class :{pseudo}")


def _match_compound(el: Element, c: _Compound) -> bool:
    if c.tag is not None and el.tag != c.tag:
        return False
    if c.id is not None and el.get("id") != c.id:
        return False
    if c.classes:
        have = el.classes()
        if any(cls not in have for cls in c.classes):
            return False
    for name, op, value in c.attrs:
        if not _match_attr(el, name, op, value):
            return False
    for pseudo in c.pseudos:
        if not _match_pseudo(el, pseudo):
            return False
    return True


def _prev_element_siblings(el: Element) -> list[Element]:
    if el.parent is None:
        return []
    sibs = _element_children(el.parent)
    return sibs[: sibs.index(el)]


def _matches_chain(el: Element, chain: list[tuple[str, _Compound]], idx: int, scope: Element) -> bool:
    """Right-to-left match of chain[:idx+1] ending at ``el``; ancestor walks
    stop at ``scope`` (NodeSet-relative search semantics)."""
    comb, compound = chain[idx]
    if not _match_compound(el, compound):
        return False
    if idx == 0:
        return True
    if comb in ("", " "):
        # scope-relative search (Nokogiri turns "x y" into ".//x//y"): the
        # ancestor satisfying the earlier compound must itself live inside
        # the scope subtree, scope excluded.
        anc = el.parent
        while anc is not None and anc is not scope:
            if _matches_chain(anc, chain, idx - 1, scope):
                return True
            anc = anc.parent
        return False
    if comb == ">":
        parent = el.parent
        if parent is None or parent is scope:
            return False
        return _matches_chain(parent, chain, idx - 1, scope)
    if comb == "+":
        prev = _prev_element_siblings(el)
        return bool(prev) and _matches_chain(prev[-1], chain, idx - 1, scope)
    if comb == "~":
        return any(_matches_chain(p, chain, idx - 1, scope) for p in _prev_element_siblings(el))
    raise ValueError(f"unsupported combinator {comb!r}")


def css_select(scope: Element, selector: str) -> list[Element]:
    """All descendant elements of ``scope`` matching ``selector``, in
    document order."""
    groups = _parse_selector(selector)
    out: list[Element] = []
    seen: set[int] = set()
    for el in scope.iter_elements():
        for chain in groups:
            if _matches_chain(el, chain, len(chain) - 1, scope):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
                break
    return out


def css_select_many(scopes: list[Element], selector: str) -> list[Element]:
    """NodeSet#search semantics: union over per-node subtree searches,
    document order, deduplicated."""
    out: list[Element] = []
    seen: set[int] = set()
    for scope in scopes:
        for el in css_select(scope, selector):
            if id(el) not in seen:
                seen.add(id(el))
                out.append(el)
    return out


# --------------------------------------------------------------------------
# micro-XPath
# --------------------------------------------------------------------------

_XPATH_STEP = re.compile(r"(//|/)([\w\-]+|\*)((?:\[[^\[\]]*\])*)")


def _parse_xpath(expr: str) -> list[tuple[str, str, list[str]]]:
    expr = expr.strip()
    if expr.startswith("."):
        expr = expr[1:]
    steps: list[tuple[str, str, list[str]]] = []
    pos = 0
    while pos < len(expr):
        m = _XPATH_STEP.match(expr, pos)
        if not m:
            raise ValueError(f"unsupported XPath syntax at {expr[pos:]!r} in {expr!r}")
        pos = m.end()
        preds = re.findall(r"\[([^\[\]]*)\]", m.group(3))
        steps.append((m.group(1), m.group(2).lower(), preds))
    if not steps:
        raise ValueError(f"empty XPath {expr!r}")
    return steps


def _normalize_space(s: str) -> str:
    return " ".join(s.split())


def _xpath_string(expr: str, el: Element) -> str:
    expr = expr.strip()
    if expr.startswith(("'", '"')):
        return expr[1:-1]
    if expr.startswith("@"):
        return el.get(expr[1:].strip()) or ""
    if expr.startswith("normalize-space(") and expr.endswith(")"):
        return _normalize_space(_xpath_string(expr[len("normalize-space(") : -1], el))
    if expr.startswith("concat(") and expr.endswith(")"):
        return "".join(_xpath_string(a, el) for a in _split_args(expr[len("concat(") : -1]))
    raise ValueError(f"unsupported XPath string expression {expr!r}")


def _split_args(s: str) -> list[str]:
    """Split on top-level commas (respecting quotes and parens)."""
    args, depth, start, quote = [], 0, 0, None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(s[start:i])
            start = i + 1
    args.append(s[start:])
    return [a for a in (arg.strip() for arg in args) if a]


def _eval_pred(pred: str, el: Element, position: int) -> bool:
    pred = pred.strip()
    if re.fullmatch(r"\d+", pred):
        return position == int(pred)
    if pred.startswith("contains(") and pred.endswith(")"):
        args = _split_args(pred[len("contains(") : -1])
        if len(args) != 2:
            raise ValueError(f"contains() needs 2 args: {pred!r}")
        return _xpath_string(args[1], el) in _xpath_string(args[0], el)
    if pred.startswith("@"):
        m = re.fullmatch(r"@([\w\-]+)\s*=\s*('[^']*'|\"[^\"]*\")", pred)
        if m:
            return (el.get(m.group(1)) or "") == m.group(2)[1:-1]
        m = re.fullmatch(r"@([\w\-]+)", pred)
        if m:
            return m.group(1) in el.attrs
    raise ValueError(f"unsupported XPath predicate {pred!r}")


def _apply_preds(cands: list[Element], preds: list[str]) -> list[Element]:
    for pred in preds:
        cands = [el for pos, el in enumerate(cands, 1) if _eval_pred(pred, el, pos)]
    return cands


def xpath_select(root: Element, expr: str) -> list[Element]:
    """Evaluate the supported XPath subset; positional predicates are applied
    per context node (so ``//table[p][2]`` = 2nd matching table *among its
    parent's children*, true XPath semantics)."""
    contexts: list[Element] = [root]
    for axis, tag, preds in _parse_xpath(expr):
        results: list[Element] = []
        seen: set[int] = set()
        for ctx in contexts:
            parents = ctx.iter_self_and_elements() if axis == "//" else [ctx]
            for parent in parents:
                cands = [
                    c
                    for c in parent.children
                    if isinstance(c, Element) and (tag == "*" or c.tag == tag)
                ]
                for el in _apply_preds(cands, preds):
                    if id(el) not in seen:
                        seen.add(id(el))
                        results.append(el)
        contexts = results
    return contexts


# --------------------------------------------------------------------------
# Nokogiri-style dispatcher
# --------------------------------------------------------------------------


def search(scope: Element, selector: str) -> list[Element]:
    """CSS-or-XPath auto-detect, like Nokogiri ``Node#search``
    (lib/upton.rb:282 passes either kind)."""
    s = selector.strip()
    if s.startswith(("/", "./", "(")):
        return xpath_select(scope, s)
    return css_select(scope, s)
