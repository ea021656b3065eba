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

OUT = Path(__file__).resolve().parents[1] / "language_identification_ray" / "state" / "assets" / "kn_en.json"


def main() -> None:
    model = train(SEED_SENTENCES["en"], order=3)
    save_model(model, str(OUT))
    sample_good = model.perplexity("the weather has been very cold this winter")
    sample_bad = model.perplexity("xqzv jkwp zzyx qqqq wvvk")
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes); ppl(good)={sample_good:.1f} ppl(gibberish)={sample_bad:.1f}")
    assert sample_good < sample_bad


if __name__ == "__main__":
    main()
