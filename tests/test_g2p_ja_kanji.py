"""Japanese G2P: offline kanji readings + full-context-label prosody.

Two capabilities the reference gets from pyopenjtalk
(``/root/reference/src/genie_tts/G2P/Japanese/JapaneseG2P.py:64-150``),
validated here WITHOUT it in the image:

* the bundled reading lexicon (data/ja_readings.json) lets arbitrary
  everyday kanji text synthesize offline (longest-match words, char
  fallbacks, particle heuristics, the 々 iteration mark);
* the 279-line HTS-label prosody parser (labels_to_prosody) is exercised
  against hand-constructed full-context labels covering every prosody
  mark it can emit (^ $ ? _ # [ ]).
"""
import numpy as np
import pytest

from genie_tts_tpu.frontend.g2p_ja import (
    UnreadableJapaneseError, japanese_to_phone_strs, japanese_to_phones,
    kanji_to_kana, labels_to_prosody,
)


# ---------------------------------------------------------------------------
# kanji -> kana lexicon
# ---------------------------------------------------------------------------

def test_kanji_word_readings():
    assert kanji_to_kana("今日") == "きょう"
    assert kanji_to_kana("図書館") == "としょかん"
    # word + char fallback composition: 電話 (word) + 局 (char, ON)
    assert kanji_to_kana("電話局") == "でんわきょく"


def test_kanji_longest_match_wins():
    # 日本語 must match as one word, not 日本 + 語
    assert kanji_to_kana("日本語") == "にほんご"
    assert kanji_to_kana("誕生日") == "たんじょうび"


def test_particle_heuristics():
    # は after a kanji noun reads わ; へ reads え
    assert kanji_to_kana("今日はいい") == "きょうわいい"
    assert kanji_to_kana("東京へ") == "とうきょうえ"
    # は inside kana stays untouched here (kana_to_phones handles lexical
    # exceptions like こんにちは separately)
    assert kanji_to_kana("はな") == "はな"


def test_iteration_mark():
    assert kanji_to_kana("人々") == "ひとびと"   # word entry
    assert kanji_to_kana("山々") == "やまやま"   # char reading repeated


def test_kanji_sentence_to_phones():
    """A natural kanji sentence produces the same phones as its spoken
    kana transcription. Accent marks differ by construction: the kanji
    path knows word boundaries + accent types from the lexicon, while a
    bare kana run is one default-heiban phrase — so compare with marks
    stripped, then assert the kanji path carries real accent shape."""
    marks = {"[", "]", "#"}
    got = japanese_to_phone_strs("今日はいい天気ですね。")
    want = japanese_to_phone_strs("きょうわいいてんきですね。")
    assert [p for p in got if p not in marks] == \
        [p for p in want if p not in marks]
    assert "]" in got                  # 今日/天気 are accented (type 1)
    ids = japanese_to_phones("明日、公園へ行きます。")
    assert len(ids) > 5
    assert all(isinstance(i, (int, np.integer)) for i in ids)


def test_unknown_kanji_raises_loudly():
    with pytest.raises(UnreadableJapaneseError) as ei:
        kanji_to_kana("鸞")
    assert "鸞" in str(ei.value)


@pytest.mark.slow
def test_kanji_e2e_synthesis():
    """Kanji text synthesizes end-to-end offline (tiny random model)."""
    import jax.numpy as jnp

    from genie_tts_tpu.config import SoVITSConfig, T2SConfig
    from genie_tts_tpu.runtime.engine import (
        TTSEngine, make_random_character, make_random_reference,
    )

    tcfg = T2SConfig(embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
                     ssl_dim=8, max_decode_steps=16)
    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
        gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)
    engine = TTSEngine()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, engine, ref_seconds=0.2)
    phones = np.asarray(japanese_to_phones("天気がいいから、散歩しましょう。"),
                        np.int32) % tcfg.phoneme_vocab
    bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
    audio = engine.synthesize_utterance(char, ref, phones, bert, seed=0,
                                        min_steps=8, max_steps=12)
    assert len(audio) > 0 and np.isfinite(audio).all()


# ---------------------------------------------------------------------------
# HTS full-context-label prosody parser fixtures
# ---------------------------------------------------------------------------

def _label(ph, a1="xx", a2="xx", a3="xx", f1="xx", acc="xx", q="xx"):
    """One full-context label with the fields labels_to_prosody reads
    (phone, /A:a1+a2+a3, /F:f1_, E-field !q_) laid out per the HTS
    Japanese label spec; everything else is xx-padding."""
    return (f"xx^xx-{ph}+xx=xx/A:{a1}+{a2}+{a3}"
            f"/B:xx-xx_xx/C:xx_xx+xx/D:xx+xx_xx/E:xx_xx!{q}_xx-xx"
            f"/F:{f1}_{acc}#xx_xx@xx_xx|xx_xx/G:xx_xx%xx_xx_xx"
            f"/H:xx_xx/I:xx-xx@xx+xx&xx-xx|xx+xx/J:xx_xx/K:xx+xx-xx")


def _word_labels(morae, accent, q=0, f1=None):
    """Labels for one accent phrase. ``morae``: list of phone tuples."""
    f1 = f1 or len(morae)
    labs = []
    for m, phones in enumerate(morae, start=1):
        a1 = m - accent if accent > 0 else m   # a1==0 marks the nucleus
        for ph in phones:
            labs.append(_label(ph, a1=a1, a2=m, a3=len(morae) - m + 1,
                               f1=f1, acc=accent))
    return labs


def test_prosody_heiban_rise():
    """Accent-0 (heiban) word: pitch rise [ after the first mora.
    こんにちは -> ^ k o [ N n i ch i w a $"""
    labs = ([_label("sil")]
            + _word_labels([("k", "o"), ("N",), ("n", "i"), ("ch", "i"),
                            ("w", "a")], accent=0)
            + [_label("sil", q=0)])
    assert labels_to_prosody(labs) == [
        "^", "k", "o", "[", "N", "n", "i", "ch", "i", "w", "a", "$"]


def test_prosody_accent_fall():
    """Accent-1 (atamadaka) word: pitch fall ] after the nucleus mora.
    あめ (rain) -> ^ a ] m e $"""
    labs = ([_label("sil")]
            + _word_labels([("a",), ("m", "e")], accent=1)
            + [_label("sil", q=0)])
    assert labels_to_prosody(labs) == ["^", "a", "]", "m", "e", "$"]


def test_prosody_question_mark():
    labs = ([_label("sil")]
            + _word_labels([("a",), ("m", "e")], accent=1)
            + [_label("sil", q=1)])
    assert labels_to_prosody(labs)[-1] == "?"


def test_prosody_pause_and_phrase_boundary():
    """Two accent phrases: # at the vowel ending phrase one; _ for pau."""
    p1 = _word_labels([("a",), ("m", "e")], accent=1)
    p2 = _word_labels([("k", "a"), ("s", "a")], accent=0)
    labs = [_label("sil")] + p1 + p2 + [_label("sil", q=0)]
    out = labels_to_prosody(labs)
    # phrase-final vowel e (a3==1) followed by a label with a2==1 -> #
    assert out == ["^", "a", "]", "m", "e", "#", "k", "a", "[", "s", "a",
                   "$"]

    labs_pau = [_label("sil")] + p1 + [_label("pau")] + p2 + [
        _label("sil", q=0)]
    out = labels_to_prosody(labs_pau)
    # the pau replaces the # boundary mark and sits between the phrases
    assert "_" in out and "#" not in out
    assert out[out.index("_") - 1] == "e"
    assert out[out.index("_") + 1] == "k"


def test_prosody_vowel_uppercase_devoicing():
    """Devoiced vowels (upper-case in labels) are lowered."""
    labs = ([_label("sil")]
            + _word_labels([("k", "I"), ("t", "a")], accent=0)
            + [_label("sil", q=0)])
    out = labels_to_prosody(labs)
    assert "i" in out and "I" not in out
