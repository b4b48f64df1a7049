"""Deterministic stub-embedder tests (replaces SBERT, reference
embeddings.py:7-9): determinism, normalization, similarity ordering, and
the SIM_THRESHOLD=0.8 straddle needed by the linking θ-join (L4)."""

import numpy as np

from apt_bron_re_spark.config import EMBED_DIM, SIM_THRESHOLD
from apt_bron_re_spark.functions.embedder import cosine_matrix, embed, embed_batch


def test_deterministic_and_normalized():
    a = embed("Obsidian Tiger")
    b = embed("Obsidian Tiger")
    assert np.array_equal(a, b)
    assert a.shape == (EMBED_DIM,)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5


def test_similar_strings_closer_than_dissimilar():
    base = embed("obsidian tiger")
    typo = embed("obsidian tigr")
    other = embed("quiet lynx")
    assert float(base @ typo) > float(base @ other)


def test_threshold_straddle():
    # The linking fixture relies on these: a typo clears 0.8, an unrelated
    # string does not.
    assert float(embed("obsidian tiger") @ embed("obsidian tigr")) >= SIM_THRESHOLD
    assert float(embed("obsidian tiger") @ embed("raccoon stealer")) < SIM_THRESHOLD
    assert float(embed("crimson mantis") @ embed("crimson mantiss")) >= SIM_THRESHOLD


def test_batch_matches_single():
    texts = ["a", "bb", "obsidian tiger"]
    mat = embed_batch(texts)
    assert mat.shape == (3, EMBED_DIM)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], embed(t))


def test_cosine_matrix_shape():
    a = embed_batch(["x", "y"])
    b = embed_batch(["x", "y", "z"])
    sims = cosine_matrix(a, b)
    assert sims.shape == (2, 3)
    assert abs(float(sims[0, 0]) - 1.0) < 1e-5
