"""North-rule acceptance: F1 >= 0.99 keep/drop vs oracle labels, and
byte-identical scrubbed text per url.

The oracle (`language_identification_ray/reference_oracle.py`) is an
independent, naive per-row re-implementation of the pipeline semantics —
the differential pattern the reference uses for its EMD implementations
(reference ``dictionary_langid/datatypes.py:337-341``).  FIXTURES.md F2.
"""

import pytest

from language_identification_ray import reference_oracle as oracle


@pytest.fixture(scope="module")
def flagship_vs_oracle(ray_session, sf_dir):
    import ray.data as rd  # noqa: F401

    from language_identification_ray.pipelines.quality_filter import run
    from language_identification_ray.sources.pages import synthesize_pages
    from language_identification_ray.stages.decode import decode_extract_batch

    engine = run(sf_dir).to_pandas().sort_values("url").reset_index(drop=True)

    # oracle input: the decoded/extracted text per url (decode has its own
    # golden-bytes unit tests) + the engine's detected (lang, lang_conf)
    decoded = (
        synthesize_pages(sf_dir)
        .map_batches(decode_extract_batch, batch_format="pyarrow")
        .to_pandas()[["url", "text"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (decoded["url"] == engine["url"]).all()
    expected = oracle.pipeline_rows(
        decoded["url"], decoded["text"], engine["lang"], engine["lang_conf"]
    )
    return engine, expected


def test_keep_f1_at_least_099(flagship_vs_oracle):
    engine, expected = flagship_vs_oracle
    f1 = oracle.f1_keep([r["keep"] for r in expected], engine["keep"].tolist())
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} < 0.99"


def test_drop_reasons_match(flagship_vs_oracle):
    engine, expected = flagship_vs_oracle
    mismatches = [
        (u, e, a)
        for u, e, a in zip(
            engine["url"], (r["drop_reason"] for r in expected), engine["drop_reason"]
        )
        if e != a
    ]
    # drop_reason is stricter than F1; allow nothing at fixture scale
    assert not mismatches, mismatches[:5]


def test_scrubbed_text_byte_identical(flagship_vs_oracle):
    engine, expected = flagship_vs_oracle
    exp = [r["scrubbed_text"] for r in expected]
    act = engine["scrubbed_text"].tolist()
    bad = [(e, a) for e, a in zip(exp, act) if e.encode() != a.encode()]
    assert not bad, f"{len(bad)} scrubbed_text mismatches; first: {bad[0]!r}"


def test_pii_counts_match(flagship_vs_oracle):
    engine, expected = flagship_vs_oracle
    for col in ["pii_emails", "pii_phones", "pii_ssns", "pii_slurs"]:
        exp = [r[col] for r in expected]
        assert engine[col].astype(int).tolist() == exp, col


def test_quality_stats_match(flagship_vs_oracle):
    engine, expected = flagship_vs_oracle
    for col in ["q_n_words", "q_stopword_hits", "q_n_sentences"]:
        exp = [r[col] for r in expected]
        assert engine[col].astype(int).tolist() == exp, col
    for col in ["q_mean_word_len", "q_symbol_word_ratio", "q_digit_ratio",
                "q_dup_ngram_frac", "q_max_line_frac"]:
        exp = [r[col] for r in expected]
        act = engine[col].tolist()
        assert all(abs(e - a) < 1e-9 for e, a in zip(exp, act)), col
