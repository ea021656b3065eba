"""Tests: CharSet algebra (D1), transliteration (M13), CSV sources +
per-lang demux (S3-S5)."""

import re

import pytest

from language_identification_ray.functions.charset import CharSet, script_charset
from language_identification_ray.functions.translit import (
    deseret_phoneme_table,
    make_translit_table,
    transliterate,
    transliterate_batch,
)


# -- CharSet ---------------------------------------------------------------


def test_charset_ranges_roundtrip():
    cs = CharSet.from_ranges([(65, 67), (97, 97)])  # A-C, a
    assert sorted(cs) == ["A", "B", "C", "a"]
    assert cs.ranges == [(65, 67), (97, 97)]
    assert CharSet.from_ranges(cs.ranges) == cs


def test_charset_algebra():
    a = CharSet.from_string("abcd")
    b = CharSet.from_string("cdef")
    assert sorted(a | b) == list("abcdef")
    assert sorted(a & b) == list("cd")
    assert sorted(a - b) == list("ab")
    assert sorted(a ^ b) == list("abef")
    assert (a & b).issubset(a)
    assert a.union(b).issuperset(b)
    assert CharSet("xy").isdisjoint(a)


def test_charset_regex():
    cs = CharSet.from_string("abc-]")
    rx = cs.compile()
    for ch in "abc-]":
        assert rx.fullmatch(ch), ch
    assert not rx.match("d")
    # empty set matches nothing
    assert re.compile(CharSet().to_regex()).match("a") is None


def test_charset_validation():
    with pytest.raises(ValueError):
        CharSet(["ab"])
    with pytest.raises(ValueError):
        CharSet.from_ranges([(5, 3)])


def test_script_charset_matches_tables():
    latin = script_charset("Latin")
    assert "A" in latin and "z" in latin
    assert "Ж" not in latin


# -- transliteration -------------------------------------------------------


def test_deseret_phonemes():
    table = deseret_phoneme_table()
    assert len(table) == 80
    # 𐐔𐐯𐑅𐐨𐑉𐐯𐐻 'Deseret' begins with capital DEE U+10414
    assert table[0x10414] == "D"
    assert table[0x10428 + 0] == "ee"  # small long I
    text = "\U00010414\U00010447\U00010445"  # D s(?) sounds
    out = transliterate(text, table)
    assert out.startswith("D")
    assert "\U00010414" not in out


def test_make_translit_table_and_batch(ray_session):
    import pyarrow as pa

    table = make_translit_table({"ä": "ae", "ö": "oe"})
    assert transliterate("schön wäre es", table) == "schoen waere es"
    batch = pa.table({"text": ["schön", None, "wäre"]})
    out = transliterate_batch(batch, table)
    assert out["text"].to_pylist() == ["schoen", "", "waere"]
    with pytest.raises(ValueError):
        make_translit_table({"ab": "x"})


# -- CSV sources + demux ---------------------------------------------------


@pytest.fixture()
def term_csv(tmp_path):
    p = tmp_path / "en-ms.csv"
    p.write_text("term,definition\ncat,kucing\ndog,anjing\nhouse,rumah\n")
    return str(p)


def test_read_term_pairs_and_dictionary(ray_session, term_csv):
    from language_identification_ray.sources.csv_assets import (
        build_dictionary_from_csv,
        read_term_pairs,
    )

    ds = read_term_pairs(term_csv)
    rows = ds.to_pandas()
    assert sorted(rows["term"]) == ["cat", "dog", "house"]

    d = build_dictionary_from_csv(term_csv, "en", "ms")
    hits = d.lookup_terms("cat")
    assert hits and hits[0][1] == "kucing"


def test_ngram_csv_demux(ray_session, tmp_path):
    import ray.data as rd

    from language_identification_ray.sources.csv_assets import (
        read_ngram_counts,
        split_by_lang,
    )

    src = tmp_path / "ngrams.csv"
    src.write_text(
        "lang,word,count\nen,the,100\nms,yang,50\nen,and,80\nxx,zz,1\n"
    )
    ds = read_ngram_counts(str(src))
    out = tmp_path / "bylang"
    split_by_lang(ds, str(out), known_langs=["en", "ms"])
    back = rd.read_parquet(str(out)).to_pandas()
    assert set(back["lang"]) == {"en", "ms"}  # xx filtered
    assert len(back) == 3
    en_dir = list(out.glob("lang=en/*.parquet"))
    assert en_dir, "partitioned layout missing"
