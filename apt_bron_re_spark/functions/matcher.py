"""Multi-pattern dictionary matcher — the rebuild's Aho-Corasick equivalent.

The reference scans each document once with a compiled
``ahocorasick.Automaton`` and then applies two filters
(src/nodes_extraction/basic.py:114-148, M1 in SURVEY.md):

  1. *word-boundary*: the char before the match start and after the match
     end must both be non-alphanumeric (``str.isalnum``), else the hit is a
     partial-word match and is dropped (basic.py:126-129);
  2. *first-occurrence-per-variant*: only the earliest (in end-index scan
     order) boundary-passing occurrence of each variant string is kept
     (basic.py:124-131).

``pyahocorasick`` is a C extension and is not available here, so the rebuild
uses an exactly-equivalent **token-span hash join**: because every surviving
match must start and end at alphanumeric-run boundaries, the set of candidate
match positions is precisely the set of (token_i_start, token_j_end) spans.
We tokenize once with a C-speed regex, then probe a hash dict with the raw
substring of every span up to the maximum pattern width.  This yields the
identical hit set to automaton-scan + boundary-filter, with O(tokens x
max_span) dict probes instead of O(chars) automaton steps — and it is easy
to vectorize inside an Arrow batch.

Patterns that *begin or end with a non-alphanumeric character* (e.g. "c++",
".net" after variant lowering) cannot be enumerated by token spans; those few
fall back to C-speed ``str.find`` scans with the same boundary test.

Scale note: the matcher object is built once on the driver from the
broadcast catalog and shipped to executors inside the pandas-UDF closure
(equivalently ``sc.broadcast``); per-batch cost is pure dict probing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Maximal runs of alphanumeric characters.  ``[^\W_]`` is "word char minus
# underscore", which matches ``str.isalnum`` for all Unicode letter and
# decimal-digit characters (the reference's boundary test, basic.py:127-129).
# Divergence: category Nl/No characters (e.g. Roman numerals) are isalnum()
# but not ``\w``; they do not occur in the catalogs or corpus.
TOKEN_RE = re.compile(r"[^\W_]+")


@dataclass(frozen=True)
class Match:
    """One surviving dictionary hit."""
    start: int      # char offset of the match start (reference "index")
    end: int        # char offset one past the match end
    pattern: str    # the variant string that matched


class MultiPatternMatcher:
    """Matches a fixed set of lowercase patterns against lowercased text.

    Equivalent to ``automaton.iter(text.lower())`` + word-boundary filter +
    earliest-occurrence-per-pattern (reference basic.py:114-148).
    """

    def __init__(self, patterns) -> None:
        # First-token index: first alnum run -> {width -> pattern set}.
        # The scan then costs ONE dict probe per document token, plus
        # slice+probe only where a token actually begins some pattern.
        self._by_first: dict[str, dict[int, set[str]]] = {}
        self._irregular: list[str] = []
        for pat in set(patterns):
            if not pat:
                continue
            runs = TOKEN_RE.findall(pat)
            regular = (
                bool(runs)
                and TOKEN_RE.match(pat) is not None
                and _ends_with_token(pat)
            )
            if regular:
                (self._by_first.setdefault(runs[0], {})
                 .setdefault(len(runs), set()).add(pat))
            else:
                self._irregular.append(pat)

    @staticmethod
    def tokenize(text_lower: str) -> tuple[list[tuple[int, int]], list[str]]:
        """(spans, strings) of the alnum runs — precompute once per doc and
        share across matchers."""
        spans, strs = [], []
        for m in TOKEN_RE.finditer(text_lower):
            spans.append((m.start(), m.end()))
            strs.append(m.group())
        return spans, strs

    def _scan(self, text_lower, tokens, tok_strs, emit):
        if tokens is None:
            tokens, tok_strs = self.tokenize(text_lower)
        elif tok_strs is None:
            tok_strs = [text_lower[s:e] for s, e in tokens]
        by_first = self._by_first
        n_tok = len(tokens)
        for i, tstr in enumerate(tok_strs):
            cands = by_first.get(tstr)
            if cands is None:
                continue
            s = tokens[i][0]
            for width, pats in cands.items():
                j = i + width - 1
                if j >= n_tok:
                    continue
                e = tokens[j][1]
                sub = text_lower[s:e]
                if sub in pats:
                    emit(sub, s, e)

    def find(self, text_lower: str,
             tokens: list[tuple[int, int]] | None = None,
             tok_strs: list[str] | None = None) -> list[Match]:
        """All boundary-passing earliest occurrences, ordered by end offset.

        ``text_lower`` must already be lowercased (the caller owns the
        ``text.lower()`` — reference basic.py:120).
        """
        best: dict[str, int] = {}  # pattern -> earliest start

        def emit(pat, s, e):
            # i ascends, so the first emit per pattern is the earliest
            if pat not in best:
                best[pat] = s

        self._scan(text_lower, tokens, tok_strs, emit)
        for pat in self._irregular:
            pos = _find_with_boundaries(text_lower, pat)
            if pos >= 0:
                prev = best.get(pat)
                if prev is None or pos < prev:
                    best[pat] = pos
        out = [Match(s, s + len(p), p) for p, s in best.items()]
        # Reference hits arrive in automaton end-index order (basic.py:124);
        # tie-break on pattern for determinism.
        out.sort(key=lambda m: (m.end, m.pattern))
        return out

    def find_all_occurrences(self, text_lower: str,
                             tokens: list[tuple[int, int]] | None = None,
                             tok_strs: list[str] | None = None
                             ) -> list[Match]:
        """Every boundary-passing occurrence (used by the cpe_versioned
        context filter, which examines each occurrence — basic.py:209-224)."""
        hits: list[Match] = []
        self._scan(text_lower, tokens, tok_strs,
                   lambda pat, s, e: hits.append(Match(s, e, pat)))
        for pat in self._irregular:
            start = 0
            while True:
                pos = text_lower.find(pat, start)
                if pos < 0:
                    break
                if _boundaries_ok(text_lower, pos, pos + len(pat)):
                    hits.append(Match(pos, pos + len(pat), pat))
                start = pos + 1
        hits.sort(key=lambda m: (m.end, m.pattern))
        return hits


def _ends_with_token(pat: str) -> bool:
    last = None
    for m in TOKEN_RE.finditer(pat):
        last = m
    return last is not None and last.end() == len(pat)


def _boundaries_ok(text: str, start: int, end: int) -> bool:
    """The reference's partial-word guard (basic.py:126-129)."""
    before = text[start - 1] if start > 0 else " "
    after = text[end] if end < len(text) else " "
    return not before.isalnum() and not after.isalnum()


def _find_with_boundaries(text: str, pat: str) -> int:
    """Earliest boundary-passing occurrence of ``pat``, or -1."""
    start = 0
    while True:
        pos = text.find(pat, start)
        if pos < 0:
            return -1
        if _boundaries_ok(text, pos, pos + len(pat)):
            return pos
        start = pos + 1
