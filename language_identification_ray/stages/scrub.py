"""PII / toxicity scrub stage.

Compiled-regex scrubber per the north_star spec (emails, phone numbers,
SSN-shaped ids, a slur lexicon) plus the repeated-sequence clamp the
reference specifies as a design note but never implemented (reference
README.md:149-153: clamp repeating patterns of length 1-4 to ≤5 reps).

Emits ``scrubbed_text`` and flat ``pii_*`` count columns.  Regexes are
compiled once per actor in ``__init__``; bodies are plain ``re.sub`` per row
(regex work is C-level; the rows loop is the cheap part).

The slur lexicon here is a neutral PLACEHOLDER list (the engine's real
deployment would broadcast a curated lexicon object via ``ray.put``); the
plumbing — counting + masking + the drop rule — is real and tested.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import pyarrow as pa

from language_identification_ray.stages.langid import set_or_append

RE_EMAIL = re.compile(r"[\w.+-]+@[\w-]+(?:\.[\w-]+)+", flags=re.U)
# international-ish phone: optional +CC, 3 groups of digits with separators
RE_PHONE = re.compile(r"(?<!\d)(?:\+?\d{1,3}[-.\s])?(?:\(?\d{3}\)?[-.\s])\d{3}[-.\s]\d{4}(?!\d)")
RE_SSN = re.compile(r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)")
# reference README.md:149-153 design note: clamp repeats of 1-4 char patterns
RE_REPEAT = re.compile(r"(.{1,4}?)\1{4,}", flags=re.S)

DEFAULT_SLUR_LEXICON: tuple = ("badslur1", "badslur2", "badslur3")

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
SSN_TOKEN = "<SSN>"
SLUR_TOKEN = "<SLUR>"


class Scrubber:
    """``ds.map_batches(Scrubber, batch_format="pyarrow", concurrency=N)``"""

    def __init__(self, text_column: str = "text", slur_lexicon: Optional[Sequence[str]] = None):
        self.text_column = text_column
        lex = list(slur_lexicon) if slur_lexicon is not None else list(DEFAULT_SLUR_LEXICON)
        self.re_slur = (
            re.compile(r"\b(?:" + "|".join(re.escape(w) for w in sorted(lex, key=len, reverse=True)) + r")\b", flags=re.I | re.U)
            if lex
            else None
        )

    def scrub_one(self, text: str) -> tuple[str, int, int, int, int]:
        emails = phones = ssns = slurs = 0

        def _email(m):
            nonlocal emails
            emails += 1
            return EMAIL_TOKEN

        def _ssn(m):
            nonlocal ssns
            ssns += 1
            return SSN_TOKEN

        def _phone(m):
            nonlocal phones
            phones += 1
            return PHONE_TOKEN

        text = RE_EMAIL.sub(_email, text)
        text = RE_SSN.sub(_ssn, text)  # SSN before phone: xxx-xx-xxxx ⊄ phone shapes
        text = RE_PHONE.sub(_phone, text)
        if self.re_slur is not None:

            def _slur(m):
                nonlocal slurs
                slurs += 1
                return SLUR_TOKEN

            text = self.re_slur.sub(_slur, text)
        text = RE_REPEAT.sub(lambda m: m.group(1) * 5, text)
        return text, emails, phones, ssns, slurs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_column].to_pylist()]
        scrubbed, emails, phones, ssns, slurs = [], [], [], [], []
        for t in texts:
            s, e, p, n, sl = self.scrub_one(t)
            scrubbed.append(s)
            emails.append(e)
            phones.append(p)
            ssns.append(n)
            slurs.append(sl)
        for name, arr, typ in [
            ("scrubbed_text", scrubbed, pa.string()),
            ("pii_emails", emails, pa.int32()),
            ("pii_phones", phones, pa.int32()),
            ("pii_ssns", ssns, pa.int32()),
            ("pii_slurs", slurs, pa.int32()),
        ]:
            batch = set_or_append(batch, name, pa.array(arr, typ))
        return batch
