# -*- coding: utf-8 -*-
"""Pitch-accent prosody in the offline Japanese fallback.

The reference always emits accent marks from OpenJTalk full-context
labels (``/root/reference/src/genie_tts/G2P/Japanese/JapaneseG2P.py:64-100``).
Without pyopenjtalk the fallback now emits the same mark inventory
(``[`` rise, ``]`` fall, ``#`` phrase boundary) from per-word accent
types bundled in data/ja_readings.json.

The emission logic is verified against the HTS-label parser
(``labels_to_prosody``) as an in-repo oracle: for the same
(morae, accent-type) input, the fallback emitter and the label path must
produce identical mark placement.
"""
import pytest

from genie_tts_tpu.frontend.g2p_ja import (
    _emit_prosody, _kanji_to_kana_spans, japanese_to_phone_strs,
    kana_to_phones, labels_to_prosody,
)
from tests.test_g2p_ja_kanji import _label, _word_labels

MARKS = {"[", "]", "#", "^", "$", "?", "_"}


def _oracle(phrases):
    """labels_to_prosody on synthetic labels for a list of
    (morae, accent) phrases, with the ^ head and $ tail stripped."""
    labs = [_label("sil")]
    for morae, accent in phrases:
        labs += _word_labels(morae, accent=accent)
    labs += [_label("sil", q=0)]
    return labels_to_prosody(labs)[1:-1]


def _fallback(phrases):
    """_emit_prosody on the equivalent mora/span input."""
    morae, spans, idx = [], [], 0
    for ms, accent in phrases:
        spans.append((idx, accent))
        for phones in ms:
            morae.append((idx, list(phones)))
            idx += 1
    return _emit_prosody(morae, spans)


AME = [("a",), ("m", "e")]                      # 2 morae
KONNICHIWA = [("k", "o"), ("N",), ("n", "i"), ("ch", "i"), ("w", "a")]
TOSHOKAN = [("t", "o"), ("sh", "o"), ("k", "a"), ("N",)]


@pytest.mark.parametrize("morae,accent", [
    (AME, 0), (AME, 1), (AME, 2),               # heiban/atamadaka/odaka
    (KONNICHIWA, 0), (KONNICHIWA, 1), (KONNICHIWA, 3), (KONNICHIWA, 5),
    (TOSHOKAN, 2),                               # nakadaka
    ([("a",)], 0), ([("a",)], 1),                # one-mora phrases
])
def test_single_phrase_matches_label_oracle(morae, accent):
    assert _fallback([(morae, accent)]) == _oracle([(morae, accent)])


@pytest.mark.parametrize("phrases", [
    [(AME, 1), (TOSHOKAN, 2)],
    [(KONNICHIWA, 0), (AME, 2), ([("a",)], 1)],
    [(AME, 0), (AME, 0)],
])
def test_multi_phrase_matches_label_oracle(phrases):
    assert _fallback(phrases) == _oracle(phrases)


def test_none_accent_defaults_heiban():
    assert _fallback([(AME, None)]) == _oracle([(AME, 0)])


def test_accent_beyond_phrase_never_falls():
    # clamp: a nucleus past the phrase end emits no ] (only the rise)
    out = _fallback([(AME, 5)])
    assert "]" not in out and out == ["a", "[", "m", "e"]


class TestEndToEnd:
    def test_atamadaka_word(self):
        # 雨 (accent 1) + particle: fall right after the first mora
        assert japanese_to_phone_strs("雨が降る。", use_openjtalk=False) == \
            ["a", "]", "m", "e", "g", "a", "#", "f", "u", "]", "r", "u", "."]

    def test_odaka_word_falls_on_particle(self):
        # 花 (accent 2, odaka): the fall only surfaces before the particle
        out = japanese_to_phone_strs("花が。", use_openjtalk=False)
        assert out == ["h", "a", "[", "n", "a", "]", "g", "a", "."]

    def test_heiban_word_rises_only(self):
        out = japanese_to_phone_strs("水を飲む。", use_openjtalk=False)
        assert out[:5] == ["m", "i", "[", "z", "u"]
        assert out.count("]") == 1              # only 飲む (accent 1) falls

    def test_phrase_boundary_between_content_words(self):
        out = japanese_to_phone_strs("図書館で本を読む。", use_openjtalk=False)
        assert out.count("#") == 2

    def test_kana_only_gets_default_rise(self):
        out = kana_to_phones("こんにちは", prosody=True)
        assert out == ["k", "o", "[", "N", "n", "i", "ch", "i", "w", "a"]

    def test_raw_transliteration_unchanged(self):
        # prosody=False keeps the historical mark-free contract
        assert kana_to_phones("こんにちは") == \
            ["k", "o", "N", "n", "i", "ch", "i", "w", "a"]

    def test_spans_particles_extend_phrase(self):
        kana, spans = _kanji_to_kana_spans("天気がいいから")
        assert kana == "てんきがいいから"
        assert spans == [(0, 1)]                # 天気 accent 1, rest attached

    def test_char_fallback_does_not_open_phrase(self):
        # 電話 is a word match; 局 is a per-char reading -> same phrase
        _, spans = _kanji_to_kana_spans("電話局")
        assert len(spans) == 1

    def test_marks_are_valid_symbols(self):
        from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
        ids = japanese_to_phones("明日、図書館で新しい本を読む。")
        assert all(0 <= i < 732 for i in ids)


def test_corpus_hit_rate():
    """Lexicon coverage on the everyday-JA corpus stays a number, not a
    claim (scripts/ja_lexicon_hitrate.py): every corpus sentence must
    synthesize offline, and most word matches must carry accent types."""
    from pathlib import Path
    corpus = (Path(__file__).parent / "data" / "ja_corpus.txt") \
        .read_text(encoding="utf-8").splitlines()
    corpus = [s.strip() for s in corpus if s.strip()]
    assert len(corpus) >= 100
    spans_total = spans_accented = 0
    for sent in corpus:
        japanese_to_phone_strs(sent, use_openjtalk=False)  # must not raise
        kana, spans = _kanji_to_kana_spans(sent)
        spans_total += len(spans)
        spans_accented += sum(1 for _, a in spans if a is not None)
    assert spans_accented / spans_total >= 0.6
