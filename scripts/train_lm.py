"""Train the in-repo English KN LM asset from the seed corpus (deterministic).

Run: ``python scripts/train_lm.py``  → state/assets/kn_en.json
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from language_identification_ray.functions.kneser_ney import train  # noqa: E402
from language_identification_ray.pipelines.lm_train import save_model  # noqa: E402
from language_identification_ray.state.seed_corpus import SEED_SENTENCES  # noqa: E402

ASSETS = Path(__file__).resolve().parents[1] / "language_identification_ray" / "state" / "assets"


def main() -> None:
    # one model per seed language (kn_<lang>.json); en is also the default
    for lang, sentences in sorted(SEED_SENTENCES.items()):
        model = train(sentences, order=3)
        out = ASSETS / f"kn_{lang}.json"
        save_model(model, str(out))
        print(f"wrote {out} ({out.stat().st_size} bytes)")
    en = ASSETS / "kn_en.json"
    from language_identification_ray.pipelines.lm_train import load_model
    model = load_model(str(en))
    sample_good = model.perplexity("the weather has been very cold this winter")
    sample_bad = model.perplexity("xqzv jkwp zzyx qqqq wvvk")
    print(f"ppl(good)={sample_good:.1f} ppl(gibberish)={sample_bad:.1f}")
    assert sample_good < sample_bad


if __name__ == "__main__":
    main()
