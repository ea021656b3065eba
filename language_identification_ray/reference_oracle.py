"""Single-process reference-semantics oracle for the flagship pipeline.

This module re-derives, **per row and in plain Python**, the keep/drop
decision and scrubbed text that the vectorized Ray stages compute in batch —
the differential-testing pattern the reference itself uses for its fast/slow
EMD implementations (reference ``dictionary_langid/datatypes.py:337-341``:
two independent implementations cross-checked on every call).

The FIXTURES.md F2 golden labels are produced by this oracle; the F1 >= 0.99
keep/drop criterion and the byte-identical ``scrubbed_text``-per-url
invariant (north_rule) are asserted against it in
``tests/test_reference_oracle.py``.

Independence notes:
  * character classification goes through ``unicodedata.category`` directly
    (the reference's own definition, ``tokenizer.py:148-178``) — NOT the
    precomputed chartables the vectorized tokenizer gathers from;
  * quality stats are a naive per-character / per-word loop, not the
    batch-joined numpy pass of ``stages/quality.py``;
  * keep/drop is a plain if-chain, not boolean masks.

The PII/scrub regex *patterns* are imported from ``stages/scrub.py`` — the
patterns are the spec — but counting and substitution are applied
independently here (findall-then-sub vs. the stage's counter closures).

Language detection is shared state, not re-derived: the detector model is
differentially tested by its own agreement harness
(``pipelines/agreement.py``), so the oracle consumes the engine's detected
``(lang, lang_conf)`` exactly as the FIXTURES.md F2 schema specifies.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from typing import Dict, List, Optional, Sequence

from language_identification_ray.stages.scrub import (
    DEFAULT_SLUR_LEXICON,
    EMAIL_TOKEN,
    PHONE_TOKEN,
    RE_EMAIL,
    RE_PHONE,
    RE_REPEAT,
    RE_SSN,
    SLUR_TOKEN,
    SSN_TOKEN,
)
from language_identification_ray.state.stopwords import STOPWORDS

# reference tokenizer.py:148-178 category sets (same spec as gen_chartables)
_WORD_CATS = frozenset({"Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me"})
_DIGIT_CATS = frozenset({"Nd", "Nl", "No"})
_UNPRINTABLE_CATS = frozenset({"Cc", "Cf", "Cs", "Cn"})
_SPACE_CHARS = frozenset(" \t\n\r\v\f\x1c\x1d\x1e\x1f\x85\xa0")
_SENTENCE_ENDERS = (".", "!", "?", "…", "。", "！", "？")

_STOP_UNION = frozenset().union(*STOPWORDS.values())


def char_class(ch: str) -> str:
    """'space' | 'word' | 'digit' | 'unprintable' | 'punct' via unicodedata."""
    cat = unicodedata.category(ch)
    if ch in _SPACE_CHARS or cat in ("Zs", "Zl", "Zp"):
        return "space"
    if cat in _WORD_CATS:
        return "word"
    if cat in _DIGIT_CATS:
        return "digit"
    if cat in _UNPRINTABLE_CATS:
        return "unprintable"
    return "punct"


def words(text: str) -> List[str]:
    """Maximal runs of word-class chars — naive per-char accumulation."""
    out: List[str] = []
    cur: List[str] = []
    for ch in text:
        if char_class(ch) == "word":
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def quality_stats(text: str, lang: Optional[str]) -> Dict[str, float]:
    """Per-document q_* stats, computed the slow/obvious way."""
    ws = words(text)
    n_words = len(ws)
    n_chars = len(text)
    counts = Counter(char_class(ch) for ch in text)
    non_space = n_chars - counts["space"]

    lowered = [w.lower() for w in ws]
    stop = STOPWORDS.get(lang) or _STOP_UNION
    stopword_known = bool(STOPWORDS.get(lang))
    hits = sum(1 for w in lowered if w in stop)

    dup_frac = 0.0
    if len(lowered) >= 3:
        grams = Counter(zip(lowered, lowered[1:], lowered[2:]))
        total = len(lowered) - 2
        dup_frac = (total - len(grams)) / total

    n_sentences = 0
    if text:
        # run-based, decimal-guarded — mirrors the engine's documented
        # definition (naively, with its own regexes)
        stripped = re.sub(r"(?<=\d)\.(?=\d)", "", text)
        runs = re.findall("[" + re.escape("".join(_SENTENCE_ENDERS)) + "]+", stripped)
        n_sentences = max(len(runs), 1 if n_words else 0)
    if not text:
        max_line_frac = 0.0
    elif "\n" in text:
        max_line_frac = max(len(line) for line in text.split("\n")) / n_chars
    else:
        max_line_frac = 1.0 if n_chars else 0.0

    return {
        "q_n_words": n_words,
        "q_n_chars": n_chars,
        "q_n_sentences": n_sentences,
        "q_mean_word_len": (sum(len(w) for w in ws) / n_words) if n_words else 0.0,
        "q_symbol_word_ratio": (counts["punct"] / n_words) if n_words else 0.0,
        "q_digit_ratio": (counts["digit"] / non_space) if non_space > 0 else 0.0,
        "q_stopword_hits": hits,
        "q_stopword_ratio": (hits / n_words) if n_words else 0.0,
        "q_stopword_known": stopword_known,
        "q_max_line_frac": max_line_frac,
        "q_dup_ngram_frac": dup_frac,
    }


def scrub(text: str, slur_lexicon: Optional[Sequence[str]] = None) -> Dict[str, object]:
    """Independent application of the scrub spec: count with findall, then
    substitute; same pass order as the stage (email → ssn → phone → slur →
    repeat clamp)."""
    import re

    lex = list(slur_lexicon) if slur_lexicon is not None else list(DEFAULT_SLUR_LEXICON)
    re_slur = (
        re.compile(
            r"\b(?:" + "|".join(re.escape(w) for w in sorted(lex, key=len, reverse=True)) + r")\b",
            flags=re.I | re.U,
        )
        if lex
        else None
    )

    emails = len(RE_EMAIL.findall(text))
    text = RE_EMAIL.sub(EMAIL_TOKEN, text)
    ssns = len(RE_SSN.findall(text))
    text = RE_SSN.sub(SSN_TOKEN, text)
    phones = len(RE_PHONE.findall(text))
    text = RE_PHONE.sub(PHONE_TOKEN, text)
    slurs = 0
    if re_slur is not None:
        slurs = len(re_slur.findall(text))
        text = re_slur.sub(SLUR_TOKEN, text)
    text = RE_REPEAT.sub(lambda m: m.group(1) * 5, text)
    return {
        "scrubbed_text": text,
        "pii_emails": emails,
        "pii_phones": phones,
        "pii_ssns": ssns,
        "pii_slurs": slurs,
    }


def keep_drop(row: Dict[str, object]) -> Dict[str, object]:
    """Plain if-chain over the rule thresholds (stages/rules.py spec order);
    first failing rule wins."""
    r = row
    if r["q_n_words"] == 0:
        reason = "empty"
    elif r["q_n_words"] < 5:
        reason = "too_short"
    elif r["q_mean_word_len"] < 2.0 or r["q_mean_word_len"] > 12.0:
        reason = "mean_word_len"
    elif r["q_symbol_word_ratio"] > 1.5:
        reason = "symbol_ratio"
    elif r["q_digit_ratio"] > 0.3:
        reason = "digit_ratio"
    elif r["q_dup_ngram_frac"] > 0.30:
        reason = "repetition"
    elif r["q_stopword_hits"] < 1 and r["q_n_words"] >= 20 and r["q_stopword_known"]:
        # no-stopword-table languages never hit: unsupported, not gibberish
        reason = "stopword"
    elif r["lang_conf"] < 0.20:
        reason = "low_lang_conf"
    elif int(r["pii_slurs"]) >= 3:
        reason = "toxicity"
    elif "perplexity" in r and r["perplexity"] is not None and r["perplexity"] > 1.0e5:
        reason = "perplexity"
    else:
        reason = ""
    return {"keep": reason == "", "drop_reason": reason}


def pipeline_rows(
    urls: Sequence[str],
    texts: Sequence[str],
    langs: Sequence[str],
    confs: Sequence[float],
    slur_lexicon: Optional[Sequence[str]] = None,
) -> List[Dict[str, object]]:
    """Oracle output rows (FIXTURES.md F2 golden table) given decoded texts
    and detected languages."""
    out = []
    for url, text, lang, conf in zip(urls, texts, langs, confs):
        row: Dict[str, object] = {"url": url, "lang": lang, "lang_conf": float(conf)}
        row.update(quality_stats(text or "", lang))
        row.update(scrub(text or "", slur_lexicon))
        row.update(keep_drop(row))
        out.append(row)
    return out


def f1_keep(expected: Sequence[bool], actual: Sequence[bool]) -> float:
    """F1 of the keep decision (keep=positive class)."""
    tp = sum(1 for e, a in zip(expected, actual) if e and a)
    fp = sum(1 for e, a in zip(expected, actual) if not e and a)
    fn = sum(1 for e, a in zip(expected, actual) if e and not a)
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)
