"""Scrubber unit tests (PII regexes + repeated-sequence clamp)."""

import pyarrow as pa

from language_identification_ray.stages.scrub import Scrubber


def scrub(text, **kw):
    return Scrubber(**kw).scrub_one(text)


def test_email():
    out, e, p, s, sl = scrub("mail a.b+c@foo-bar.example.co.uk now")
    assert out == "mail <EMAIL> now" and e == 1


def test_phone_variants():
    for t in ["+1 (555) 010-4003", "555-010-4003", "(555) 010 4003", "+44 555.010.4003"]:
        out, e, p, s, sl = scrub(f"call {t} now")
        assert out == "call <PHONE> now", t
        assert p == 1


def test_ssn_not_phone():
    out, e, p, s, sl = scrub("ssn 123-45-6789 end")
    assert out == "ssn <SSN> end" and s == 1 and p == 0


def test_plain_numbers_untouched():
    out, e, p, s, sl = scrub("in 2024 there were 42 items priced 3.50")
    assert out == "in 2024 there were 42 items priced 3.50"
    assert (e, p, s) == (0, 0, 0)


def test_slur_lexicon():
    out, e, p, s, sl = scrub("you badslur1 and BadSlur2!", slur_lexicon=["badslur1", "badslur2"])
    assert out == "you <SLUR> and <SLUR>!" and sl == 2


def test_repeat_clamp():
    # reference README.md:149-153 design note: ≤5 reps of a 1-4 char pattern
    out, *_ = scrub("ha" * 30)
    assert out == "ha" * 5
    out, *_ = scrub("abcd" * 10)
    assert out == "abcd" * 5
    out, *_ = scrub("normal text stays")
    assert out == "normal text stays"


def test_batch_call():
    t = pa.table({"text": ["a@b.co", "clean"]})
    out = Scrubber()(t)
    assert out["scrubbed_text"].to_pylist() == ["<EMAIL>", "clean"]
    assert out["pii_emails"].to_pylist() == [1, 0]
    assert out["pii_phones"].type == pa.int32()
