"""CSV asset sources + the per-language demux sink (SURVEY §2.1 S3-S5).

The reference's data prep reads bilingual term CSVs
(``dictionaries/make_wordlist_prodict.ipynb`` cell 1: ``pd.read_csv`` of
``[lang] X-Y.csv`` prodict/freedict files) and streams GDELT n-gram master
CSVs row by row (``datasets/split-ngram-langs.ipynb`` cells 1,3), demuxing
to one output file per language via a lazily-opened file dict.  Here:

  * ``read_term_pairs``       — ``ray.data.read_csv`` of (term, definition)
  * ``build_dictionary_from_csv`` — small-asset collect → BilingualDictionary
    (broadcast-side state for the dictionary-langid actor stage)
  * ``read_ngram_counts``     — GDELT-style (lang, word, count) CSVs
  * ``split_by_lang``         — the demux sink as a *partitioned parquet
    write* (``partition_cols=['lang']``): same semantics, no open-file dict,
    resumable and parallel at any scale
"""

from __future__ import annotations

from typing import List, Optional

import ray.data as rd

from language_identification_ray.state.dictionary import BilingualDictionary


def read_term_pairs(
    path: str, term_col: str = "term", def_col: str = "definition"
) -> "rd.Dataset":
    """(term, definition) rows from a bilingual CSV (S3)."""
    ds = rd.read_csv(path)
    return ds.map_batches(
        lambda t: t.select([term_col, def_col]).rename_columns(["term", "definition"]),
        batch_format="pyarrow",
    )


def build_dictionary_from_csv(
    path: str,
    term_language: str,
    definition_language: str,
    term_col: str = "term",
    def_col: str = "definition",
    max_entries: int = 1_000_000,
) -> BilingualDictionary:
    """Collect a (small) term CSV into a BilingualDictionary.

    Dictionaries are broadcast-side assets (SURVEY §2.4 J2): build once on
    the driver (or in an actor ``__init__``), ship via closure/``ray.put``.
    ``max_entries`` guards against accidentally collecting a huge table."""
    ds = read_term_pairs(path, term_col, def_col).limit(max_entries)
    d = BilingualDictionary(term_language, definition_language)
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for term, definition in zip(
            batch["term"].to_pylist(), batch["definition"].to_pylist()
        ):
            if term and definition:
                d.add_entry(str(term), str(definition))
    return d


def read_ngram_counts(
    paths, lang_col: str = "lang", word_col: str = "word", count_col: str = "count"
) -> "rd.Dataset":
    """GDELT-style n-gram count CSVs → (lang, word, count) Dataset (S4)."""
    ds = rd.read_csv(paths)

    def project(t):
        t = t.select([lang_col, word_col, count_col])
        return t.rename_columns(["lang", "word", "count"])

    return ds.map_batches(project, batch_format="pyarrow")


def split_by_lang(
    ds: "rd.Dataset",
    out_dir: str,
    known_langs: Optional[List[str]] = None,
) -> None:
    """Demux rows to one directory per language (S5).

    The reference appends to one lazily-opened CSV per language inside a
    single process; the Ray-native equivalent is a partitioned parquet
    write — identical layout semantics (`lang=xx/` per language), parallel
    writers, idempotent re-runs.  Unknown langs are dropped (the reference
    filters them the same way, ``split-ngram-langs.ipynb`` cell 1)."""
    if known_langs is not None:
        import pyarrow as pa
        import pyarrow.compute as pc

        # vectorized Arrow membership filter — a per-row Python lambda
        # costs one interpreter call per row on a GDELT-scale demux
        allowed = pa.array(sorted(set(known_langs)), pa.string())
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t["lang"], value_set=allowed)),
            batch_format="pyarrow",
        )
    ds.write_parquet(out_dir, partition_cols=["lang"])
