"""Byte-level BPE tokenizer — the real token-budget unit for the
training-data operators (chunking, packing, token stats bin by what a
trainer bins by: BPE ids, not whitespace words).

Implemented from the PUBLIC algorithm descriptions only: byte-pair
encoding merge training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") with GPT-2's byte-level
base alphabet (Radford et al. 2019: every UTF-8 byte is a base symbol,
remapped to printable unicode so merges operate on strings). No external
merges file is shipped with this container, so the vendored merges table
is TRAINED HERE, deterministically, from the embedded seed corpus below —
``scripts/gen_bpe_merges.py`` regenerates it and
``test_vendored_merges_match_retraining`` pins drift, the same vendoring
contract as the stdlib HTML regexes (html/fast.py).

Deviation from GPT-2, documented: the pre-tokenizer regex uses ASCII
letter/digit classes (``[A-Za-z]``/``[0-9]``) because CPython ``re`` has
no ``\\p{L}``/``\\p{N}``; non-ASCII text still tokenizes (as byte-level
"other" runs), just with fewer merge opportunities.

Scale shape: the tokenizer is pure per-row Python → it runs as an
Arrow-batched pandas UDF with a per-worker memoized encoder (module-level
cache, built once per executor from the broadcast-free vendored table —
the merges ship inside the package, nothing transits the driver).
"""

from __future__ import annotations

import re
from functools import lru_cache

# GPT-2-style pre-tokenizer (ASCII approximation — see module docstring):
# contraction suffixes, space-prefixed letter runs, digit runs, punctuation
# runs, then whitespace (trailing-run lookahead keeps one space attached to
# the following word, like the original pattern).
PRETOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+(?!\S)|\s+"
)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map (public algorithm):
    printable latin-1 bytes map to themselves, every other byte value b is
    assigned the codepoint 256+n in first-gap order — so any byte string
    becomes a string of 256 distinct characters merges can pair over."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    mapping = {b: chr(b) for b in keep}
    n = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


def _word_to_units(word: str) -> tuple[str, ...]:
    b2u = bytes_to_unicode()
    return tuple(b2u[b] for b in word.encode("utf-8"))


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training: repeatedly merge the most frequent adjacent
    symbol pair across the (pre-tokenized, byte-mapped) word-frequency
    table. Ties break lexicographically — full determinism, so the
    vendored table is reproducible from the seed corpus alone."""
    vocab: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in PRETOKEN_RE.findall(t):
            units = _word_to_units(w)
            if units:
                vocab[units] = vocab.get(units, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for units, freq in vocab.items():
            for a, b in zip(units, units[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for units, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == best[0] and units[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


class BPETokenizer:
    """Greedy lowest-rank pair merging (the standard BPE apply loop) over
    the byte-mapped pre-tokens; ids index [256 base byte symbols] +
    [merged symbols in merge order]."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        b2u = bytes_to_unicode()
        self.vocab: dict[str, int] = {}
        for b in range(256):  # base alphabet in byte order
            self.vocab[b2u[b]] = b
        for a, b in self.merges:
            self.vocab[a + b] = len(self.vocab)
        # word -> ids memo, BOUNDED: webtext's pre-token vocabulary is
        # unbounded (urls, ids, numbers), and the tokenizer lives for the
        # whole executor worker (vendored_tokenizer is process-cached), so
        # an uncapped memo grows RSS until the worker dies. Full clear on
        # overflow — the hot head (common words) repopulates in one batch.
        self._word_cache: dict[str, list[int]] = {}
        self._word_cache_cap = 1 << 18

    def _encode_word(self, word: str) -> list[int]:
        ids = self._word_cache.get(word)
        if ids is not None:
            return ids
        units = list(_word_to_units(word))
        while len(units) > 1:
            best_rank, best_i = None, -1
            for i in range(len(units) - 1):
                r = self.ranks.get((units[i], units[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            units[best_i : best_i + 2] = [units[best_i] + units[best_i + 1]]
        ids = [self.vocab[u] for u in units]
        if len(self._word_cache) >= self._word_cache_cap:
            self._word_cache.clear()
        self._word_cache[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in PRETOKEN_RE.findall(text or ""):
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids: list[int]) -> str:
        inv = {v: k for k, v in self.vocab.items()}
        u2b = {u: b for b, u in bytes_to_unicode().items()}
        s = "".join(inv[i] for i in ids)
        return bytes(u2b[ch] for ch in s).decode("utf-8", errors="replace")


# Embedded seed corpus the vendored merges are trained from — self-authored
# webtext-flavored English (crawl/report/product/forum registers), so common
# function words, suffixes, and digit/punctuation shapes earn merges. The
# table below is train_bpe(SEED_CORPUS, 384); scripts/gen_bpe_merges.py
# regenerates it and the drift test re-derives it.
SEED_CORPUS = [
    "The city council voted on Tuesday to approve the new budget, which "
    "includes funding for schools, roads, and public safety programs. "
    "Officials said the decision followed months of public hearings and "
    "community meetings across the district.",
    "Researchers reported that the study, published this week, found a "
    "significant increase in response rates when participants were given "
    "clear instructions. The results suggest that better training data "
    "leads to better models, the authors wrote.",
    "Sign in to your account to continue reading. Subscribe today for "
    "unlimited access to breaking news, investigations, and analysis from "
    "our newsroom. Cancel anytime in your settings page.",
    "The server returned an unexpected error while processing the request. "
    "Please check your network connection and try again later. If the "
    "problem persists, contact support with the error code 50234.",
    "In the second quarter, revenue increased 12 percent to 4.8 million, "
    "driven by strong demand for the company's cloud products. Shares rose "
    "3 percent in early trading on Thursday morning.",
    "How do I install the package on Windows 11? I tried running the "
    "installer twice but it fails with exit code 2. Any help would be "
    "appreciated — thanks in advance! Edit: solved, it was a permissions "
    "issue in the download folder.",
    "Preheat the oven to 350 degrees. Mix the flour, sugar, and butter in "
    "a large bowl until smooth, then fold in the chocolate chips. Bake for "
    "25 minutes or until golden brown around the edges.",
    "The committee was scraping together reports from hundreds of county "
    "websites, downloading thousands of documents every night. Their "
    "crawler respected robots rules and waited thirty seconds between "
    "requests to the same host.",
]

# train_bpe(SEED_CORPUS, 384) — regenerate with scripts/gen_bpe_merges.py
from upton_spark.functions._bpe_merges import VENDORED_MERGES  # noqa: E402


@lru_cache(maxsize=1)
def vendored_tokenizer() -> BPETokenizer:
    """Per-process memoized tokenizer over the vendored merges — built once
    per executor worker (the pandas-UDF hot path calls this per batch)."""
    return BPETokenizer(VENDORED_MERGES)
