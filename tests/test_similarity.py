import numpy as np
import pytest

from pboh_entity_linking_ray.functions.similarity import (
    jaro,
    jaro_winkler,
    token_jaccard,
    trigram_similarity,
)


def test_jaro_winkler_known_values():
    # canonical textbook values
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro("CRATE", "TRACE") == pytest.approx(0.7333, abs=1e-3)


def test_jw_symmetry():
    assert jaro_winkler("kitten", "sitting") == jaro_winkler("sitting", "kitten")


def test_token_jaccard():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([2, 3, 4], dtype=np.uint64)
    assert token_jaccard(a, b) == pytest.approx(0.5)
    assert token_jaccard(a, a) == 1.0
    assert token_jaccard(np.array([], dtype=np.uint64), a) == 0.0


def test_trigram_similarity():
    assert trigram_similarity("hello", "hello") == 1.0
    assert 0 < trigram_similarity("hello", "hallo") < 1.0
    assert trigram_similarity("", "") == 0.0
