"""Train the hashed char-trigram Naive Bayes language-ID model.

Builds ``language_identification_ray/state/assets/langid_ngram.npz`` from the
in-repo seed corpus + stopword inventories (state/seed_corpus.py,
state/stopwords.py).  Deterministic — no randomness, no external data.

Model: for each language L, count hashed char trigrams over the lowercased,
whitespace-normalized training text (stopwords appended ×3 — they are the
highest-value features for same-script discrimination), then
log P(bucket | L) with Lidstone smoothing.  Matrix shape
[n_langs, HASH_BUCKETS] float32 ≈ 6.5 MB — small enough to load per actor.

Run: ``python scripts/train_langid.py``
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from language_identification_ray.stages.langid import HASH_BUCKETS, ngram_hashes  # noqa: E402
from language_identification_ray.state.scripts import load_lower_table  # noqa: E402
from language_identification_ray.state.seed_corpus import SEED_SENTENCES  # noqa: E402
from language_identification_ray.state.stopwords import STOPWORDS  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "language_identification_ray" / "state" / "assets" / "langid_ngram.npz"

ALPHA = 0.5  # Lidstone smoothing


def training_text(lang: str) -> str:
    parts = list(SEED_SENTENCES.get(lang, []))
    stop = sorted(STOPWORDS.get(lang, ()))
    parts.extend([" ".join(stop)] * 3)
    return " ".join(p.strip().lower() for p in parts if p.strip())


def main() -> None:
    lower = load_lower_table()
    langs = sorted(set(SEED_SENTENCES) | set(STOPWORDS))
    matrix = np.zeros((len(langs), HASH_BUCKETS), dtype=np.float64)
    for i, lang in enumerate(langs):
        text = " " + training_text(lang) + " "
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        hashes = ngram_hashes(lower[cps])
        counts = np.bincount(hashes, minlength=HASH_BUCKETS).astype(np.float64)
        total = counts.sum()
        matrix[i] = np.log((counts + ALPHA) / (total + ALPHA * HASH_BUCKETS))
    np.savez_compressed(
        OUT,
        langs=np.array(langs, dtype="U8"),
        matrix=matrix.astype(np.float32),
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes) for {len(langs)} languages: {langs}")


if __name__ == "__main__":
    main()
