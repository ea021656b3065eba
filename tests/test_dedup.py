"""Dedup operator tests: crafted near-duplicates must be found; unrelated
text must not pair up."""

import numpy as np
import pytest

import ray.data as rd

from language_identification_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    embedding_dup_pairs,
    hamming64,
    jaccard,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
    stable_hash64,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden every morning"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit → high jaccard
FAR = "completely different content about databases indexes and query planners running on clusters"


def test_stable_hash_is_stable():
    assert stable_hash64("abc") == stable_hash64("abc")
    assert stable_hash64("abc") != stable_hash64("abd")


def test_shingles_and_jaccard():
    a, b = word_shingles(BASE), word_shingles(NEAR)
    assert 0.7 < jaccard(a, b) < 1.0
    assert jaccard(word_shingles(BASE), word_shingles(FAR)) < 0.05
    assert jaccard(set(), set()) == 1.0


def test_minhash_estimates_jaccard():
    mh = MinHasher(128)
    a, b = word_shingles(BASE), word_shingles(NEAR)
    est = mh.est_jaccard(mh.signature(a), mh.signature(b))
    assert abs(est - jaccard(a, b)) < 0.15


def test_minhash_deterministic():
    a = MinHasher(64).signature(word_shingles(BASE))
    b = MinHasher(64).signature(word_shingles(BASE))
    assert (a == b).all()


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    rows = [
        {"doc_id": 0, "lang": "en", "text": BASE},
        {"doc_id": 1, "lang": "en", "text": NEAR},
        {"doc_id": 2, "lang": "en", "text": FAR},
        {"doc_id": 3, "lang": "en", "text": BASE},  # exact dup of 0
        {"doc_id": 4, "lang": "de", "text": BASE},  # same text, other block
    ]
    return rd.from_items(rows)


def test_minhash_lsh_pairs_finds_dups(dup_ds):
    pairs = minhash_lsh_pairs(dup_ds, threshold=0.7).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 3) in found  # exact dup
    assert (0, 1) in found  # near dup
    assert (0, 2) not in found and (1, 2) not in found  # unrelated


def test_simhash_pairs_finds_dups(dup_ds):
    pairs = simhash_pairs(dup_ds, max_hamming=3).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 3) in found
    assert (0, 2) not in found


def test_simhash_properties():
    sh = SimHasher()
    assert sh.simhash(BASE) == sh.simhash(BASE)
    assert hamming64(sh.simhash(BASE), sh.simhash(NEAR)) <= 6
    assert hamming64(sh.simhash(BASE), sh.simhash(FAR)) > 10
    assert sh.simhash("") == 0


def test_jaccard_pairs_blocked(dup_ds):
    pairs = jaccard_pairs(dup_ds, threshold=0.9).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 3) in found
    # doc 4 is in block 'de' → never paired with block 'en' twins
    assert not any(4 in p for p in found)


def test_embedding_dup_pairs(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 0, "label": 0, "embedding": base.tolist()},
        {"vec_id": 1, "label": 0, "embedding": (base + rng.standard_normal(16) * 0.01).tolist()},
        {"vec_id": 2, "label": 0, "embedding": rng.standard_normal(16).tolist()},
        {"vec_id": 3, "label": 1, "embedding": base.tolist()},  # other block
    ]
    pairs = embedding_dup_pairs(rd.from_items(rows), threshold=0.95).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["vec_a"], pairs["vec_b"])}
    assert found == {(0, 1)}
