"""Golden parity: English NSW normalization vs the executed reference.

``/root/reference/src/genie_tts/G2P/English/Normalization.py`` depends
only on the stdlib, so it runs directly as the oracle: our
``normalize_english`` must match its ``normalize`` byte-for-byte across
every NSW class (currency incl. million/billion suffixes, phone numbers,
romans, decades, scores, dimensions, dates, times, ordinals incl. the
reference's suffix-concatenation quirk, measurements, fractions,
decimals, alphanumerics, acronyms, years, domains, abbreviations)."""
import importlib.util
from pathlib import Path

import pytest

REF = Path("/root/reference/src/genie_tts/G2P/English/Normalization.py")

if not REF.is_file():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_normalize():
    spec = importlib.util.spec_from_file_location("ref_en_norm", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.normalize


CASES = [
    # numbers / years
    "I have 3 cats and 21 dogs.", "0", "7", "100", "345", "1000", "9999",
    "He was born in 1999.", "The year 2005 was great.", "In 1900 nothing.",
    "2024 brings change.", "It costs 1234567 total.", "minus -42 degrees",
    "1,234,567 people",
    # ordinals (both forms, incl. the reference suffix quirk)
    "the 1st time", "my 2nd try", "the 3rd day", "the 21st century",
    "the 4th of July", "12. item on the list",
    # currency
    "$5", "$5.50 please", "£1", "€0.99", "$1.00", "it costs 10$ here",
    "$3 million deal", "£2.5 billion fund", "$0.01",
    # time
    "at 3:30 pm", "by 12:00", "around 9:05 a.m.", "meet at 23:45",
    "race time 1:23:45", "0:30 am start",
    # phone numbers
    "call 555-123-4567 now", "dial 555-0199", "+1-555-123-4567 works",
    # romans / decades / scores / dimensions
    "Chapter IV begins", "Henry VIII ruled", "the 1990s were wild",
    "the 2010s too", "we won 3-2 yesterday", "a 3x4 rug",
    "a 2x3x4 box", "Rocky II was fine",
    # dates
    "on 1/5/2024 we met", "due 12/31/99", "born 3/15/85",
    # measurements
    "run 5 km today", "add 2 tbsp sugar", "it is 30°C outside",
    "1 m tall", "2.5 kg of rice", "60 km/h limit", "going 70 mph",
    "1/2 tsp salt", "wait 10 min",
    # fractions / decimals
    "1/2 of it", "3/4 done", "2/3 majority", "pi is 3.14159",
    "0.5 ratio",
    # alphanumerics / acronyms
    "the B2 bomber", "room 4F", "NASA launched it", "the CPU and GPU",
    "model T5X rocks",
    # domains / at / abbreviations
    "visit example.com now", "email me @ work", "Mr. Smith met Dr. Jones",
    "Prof. Lee from Acme Co. and Beta Ltd.", "e.g. this and i.e. that",
    # mixed sentences
    "Mr. Smith paid $1,250.50 on 1/5/2024 at 3:30 pm for 2 kg of coffee.",
    "The 2nd race ended 3-2 after 1:23:45 in the 1980s.",
    "Call +1-555-123-4567 or visit test.org for the 1st edition, $9.99.",
]


def test_case_count():
    assert len(CASES) >= 60


@pytest.mark.parametrize("text", CASES)
def test_golden_vs_reference(ref_normalize, text):
    from genie_tts_tpu.frontend.normalize_en import normalize_english

    assert normalize_english(text) == ref_normalize(text), text
