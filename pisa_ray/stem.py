"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) — implemented directly from the published
algorithm description; no code consulted.

Exposed as the build-time analyzers ``"porter"`` (simple tokenization
+ stemming) and ``"code_porter"`` (code-aware identifier splitting +
stemming) so "running"/"runs"/"run" share one posting list — the
classic recall lever real engines (PISA, Lucene) offer. Stemming is a
pure per-token function, so the vectorized path stems each batch's
DICTIONARY (unique tokens, ≪ occurrences) and gathers — plus a
per-process memo, since vocabularies repeat heavily across batches.

The token alphabet here is [a-z0-9]+ (analyzer output); digits take
the consonant branch of the vowel test, which keeps the function total
and deterministic on identifiers like ``sha256``.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    """Consonant test per the paper: a,e,i,o,u are vowels; y is a
    vowel iff preceded by a consonant."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]: the number of VC transitions."""
    m = 0
    i, n = 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final consonant is not w, x or y."""
    n = len(w)
    return (
        n >= 3
        and _is_cons(w, n - 3)
        and not _is_cons(w, n - 2)
        and _is_cons(w, n - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) pairs, longest-match-first within each step
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, hit = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, hit = w[:-3], True
        if hit:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    best = None
    for suf, rep in _STEP2:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is not None:
        stem = w[: -len(best[0])]
        if _measure(stem) > 0:
            w = stem + best[1]

    # step 3
    best = None
    for suf, rep in _STEP3:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is not None:
        stem = w[: -len(best[0])]
        if _measure(stem) > 0:
            w = stem + best[1]

    # step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: -len(best)]
        if _measure(stem) > 1 and (
            best != "ion" or (stem and stem[-1] in "st")
        ):
            w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # step 5b
    if (
        w.endswith("ll")
        and _measure(w) > 1
    ):
        w = w[:-1]

    return w


# per-process memo: vocabularies repeat across batches; bound it so a
# pathological corpus (random strings) cannot grow without limit
_MEMO: dict[str, str] = {}
_MEMO_CAP = 1 << 20


def stem_tokens(vocab: list[str]) -> list[str]:
    """Stem a token dictionary (unique tokens) with memoization."""
    out = []
    memo = _MEMO
    for t in vocab:
        s = memo.get(t)
        if s is None:
            s = porter_stem(t)
            if len(memo) < _MEMO_CAP:
                memo[t] = s
        out.append(s)
    return out
