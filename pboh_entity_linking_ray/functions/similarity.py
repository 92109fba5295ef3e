"""String / set similarity kernels for pair scoring.

north_star requires batched Jaro-Winkler + token-Jaccard alongside the
PBoH-style log-odds.  Trigram Jaccard mirrors the reference's fuzzy
mention matcher (reference: src/main/scala/index/
MentionEntitiesFrequencyIndex.scala:82-119 — Porter-stemmed char-trigram
similarity with boundary markers).
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = np.zeros(l1, dtype=bool)
    m2 = np.zeros(l2, dtype=bool)
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    jscore = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return jscore + prefix * p * (1.0 - jscore)


def jaro_winkler_batch(a: list[str], b: list[str]) -> np.ndarray:
    return np.array([jaro_winkler(x, y) for x, y in zip(a, b)], dtype=np.float64)


def token_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique arrays."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def char_trigrams(s: str) -> set[str]:
    """Char trigrams with start/end boundary markers (reference uses
    '$$$'/'###' padding, MentionEntitiesFrequencyIndex.scala:82-97)."""
    padded = "^^" + s + "$$"
    return {padded[i : i + 3] for i in range(len(padded) - 2)}


def trigram_similarity(s1: str, s2: str) -> float:
    if not s1 or not s2:
        return 0.0
    t1, t2 = char_trigrams(s1), char_trigrams(s2)
    if not t1 or not t2:
        return 0.0
    return len(t1 & t2) / len(t1 | t2)
