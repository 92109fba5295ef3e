"""Compact Porter stemmer (Porter 1980, public algorithm).

Capability analog of the reference's stemmer
(reference: src/main/scala/context/PorterStemmer.scala:11-229) used by its
tokenizer before building word statistics; written from the published
algorithm description, not from the reference code.
"""

from __future__ import annotations

import re
from functools import lru_cache

_VOWELS = set("aeiou")
_DIGIT_RE = re.compile(r"[0-9]")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences (the 'm' of the Porter paper)."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word


def _by_last(rules):
    """Group an ordered suffix-rule table by the suffix's final char."""
    out: dict[str, list] = {}
    for rule in rules:
        suf = rule[0] if isinstance(rule, tuple) else rule
        out.setdefault(suf[-1], []).append(rule)
    return {k: tuple(v) for k, v in out.items()}


_STEP2 = _by_last((
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
))
_STEP3 = _by_last((
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
))
_STEP4 = _by_last((
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
))


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:  # noqa: C901 - the algorithm is a case table
    if len(word) <= 2:
        return word
    # tokens with digits (ids, hashes, hex blobs) are not English words:
    # return them unchanged.  Porter's suffix rules would mangle e.g. a
    # hex id ending in "es", and the rule cascade dominates featurize CPU
    # on id-heavy corpora (measured 2.1 s of a 4.9 s batch).
    if _DIGIT_RE.search(word):
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Steps 2-4 dispatch on the word's LAST CHARACTER: a suffix whose
    # final char differs from w[-1] can never match, so scanning only the
    # matching group preserves the exact first-match-wins semantics of the
    # full ordered table while skipping ~90% of endswith calls (the rule
    # cascade dominated featurize CPU on large random vocabularies).

    # Step 2
    for suf, repl in _STEP2.get(w[-1], ()):
        out = _replace(w, suf, repl, 0)
        if out is not None:
            w = out
            break

    # Step 3
    for suf, repl in _STEP3.get(w[-1], ()):
        out = _replace(w, suf, repl, 0)
        if out is not None:
            w = out
            break

    # Step 4 ("ion" has the extra preceding-s/t condition)
    matched4 = False
    for suf in _STEP4.get(w[-1], ()):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                w = stem
            matched4 = True
            break
    if not matched4:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            stem = w[:-3]
            if _measure(stem) > 1:
                w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
