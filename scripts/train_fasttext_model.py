"""Train the in-repo fastText-FORMAT language-ID model.

Builds ``language_identification_ray/state/assets/langid_ft_mini.bin`` —
a genuine fastText supervised binary (dense, softmax loss, char-subword
features like lid.176: minn=2 maxn=4) trained with the published
supervised update rule (hidden = mean of input rows; per-row softmax
gradient with the pre-update output rows feeding the input gradient,
normalized by the feature count) over the in-repo seed corpus.  A real
fastText binary loads the produced file; the engine loads it with
``functions/fasttext_format.py`` (no wheel needed).

Deterministic — fixed PCG64 seed, no external data.
Run: ``python scripts/train_fasttext_model.py``
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from language_identification_ray.functions.fasttext_format import (  # noqa: E402
    EOS, FastTextArgs, FastTextModel, new_dense_model,
)
from language_identification_ray.state.seed_corpus import SEED_SENTENCES  # noqa: E402
from language_identification_ray.state.stopwords import STOPWORDS  # noqa: E402

OUT = (Path(__file__).resolve().parents[1] / "language_identification_ray"
       / "state" / "assets" / "langid_ft_mini.bin")

DIM = 16
BUCKET = 20000
EPOCHS = 100
LR = 1.0


def build_corpus():
    """(text, lang) training lines: seed sentences plus stopword runs
    (the highest-value same-script discriminators, same recipe as the
    NB trainer)."""
    lines = []
    for lang in sorted(SEED_SENTENCES):
        for s in SEED_SENTENCES[lang]:
            s = " ".join(s.lower().split())
            if s:
                lines.append((s, lang))
        stop = sorted(STOPWORDS.get(lang, ()))
        for i in range(0, len(stop), 8):
            chunk = " ".join(stop[i:i + 8])
            if chunk:
                lines.append((chunk, lang))
    return lines


def main() -> None:
    lines = build_corpus()
    counts: Counter = Counter()
    label_counts: Counter = Counter()
    ntokens = 0
    for text, lang in lines:
        toks = text.encode("utf-8").split()
        for t in toks:
            counts[t] += 1
        counts[EOS] += 1
        label_counts[b"__label__" + lang.encode()] += 1
        ntokens += len(toks) + 2  # + EOS + label, like dict ntokens_

    # Dictionary::threshold order: words first, count desc (det. tie-break)
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    labels = sorted(label_counts.items(), key=lambda kv: (-kv[1], kv[0]))

    rng = np.random.default_rng(20260821)
    args = FastTextArgs(dim=DIM, epoch=EPOCHS, min_count=1, bucket=BUCKET,
                        minn=2, maxn=4, word_ngrams=1)
    model = new_dense_model(args, vocab, labels, ntokens, rng)

    lab2id = {l.decode().replace("__label__", ""): i
              for i, (l, _) in enumerate(labels)}
    feats = [model.input_ids(text) for text, _ in lines]
    targets = np.asarray([lab2id[lang] for _, lang in lines])

    wi, wo = model.input.data, model.output.data
    n = len(lines)
    order = np.arange(n)
    seen = 0
    total = EPOCHS * n
    for _epoch in range(EPOCHS):
        rng.shuffle(order)
        for li in order:
            ids = feats[li]
            if len(ids) == 0:
                seen += 1
                continue
            lr = np.float32(LR * (1.0 - seen / total))
            h = wi[ids].sum(axis=0, dtype=np.float32) / np.float32(len(ids))
            scores = wo @ h
            scores -= scores.max()
            p = np.exp(scores, dtype=np.float32)
            p /= p.sum()
            alpha = -lr * p
            alpha[targets[li]] += lr
            grad_h = alpha @ wo  # pre-update rows, like fastText
            wo += alpha[:, None] * h[None, :]
            # add.at: repeated feature ids (a word twice in a line, or two
            # subwords sharing a bucket) must each receive the gradient —
            # fancy-index += silently collapses duplicates to one add
            np.add.at(wi, ids, grad_h / np.float32(len(ids)))
            seen += 1

    # self-consistency report
    correct = sum(
        1 for (text, lang) in lines
        if (pred := model.predict(text, k=1)) and pred[0][0] == lang
    )
    print(f"train top-1 self-accuracy: {correct}/{n} = {correct / n:.3f}")
    model.save(str(OUT))
    print(f"wrote {OUT} ({OUT.stat().st_size / 1e6:.2f} MB, "
          f"{model.nwords} words, {model.nlabels} labels)")


if __name__ == "__main__":
    main()
