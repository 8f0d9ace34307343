"""Frontend unit tests: symbols, splitter, language, Japanese G2P."""
from genie_tts_tpu.frontend.symbols import (
    symbols_v2, symbol_to_id_v2, phones_to_ids, vocab_size, PAD_SYMBOL,
)
from genie_tts_tpu.frontend.splitter import TextSplitter, effective_len, split_text
from genie_tts_tpu.frontend.language import normalize_language, require_supported
from genie_tts_tpu.frontend.g2p_ja import (
    japanese_to_phone_strs, japanese_to_phones, kana_to_phones, normalize_ja,
)
import pytest


class TestSymbols:
    def test_vocab_size(self):
        assert vocab_size() == 732
        assert len(symbols_v2()) == 732

    def test_pad_is_present(self):
        assert PAD_SYMBOL in symbol_to_id_v2()

    def test_known_symbols(self):
        table = symbol_to_id_v2()
        for s in ["a", "i", "u", "e", "o", "N", "cl", "ky", "sh", "ch", "ts",
                  "AH0", "zh", "ang1", ".", "!", "?", "…", "[", "]"]:
            assert s in table, s

    def test_ids_are_dense_and_ordered(self):
        table = symbol_to_id_v2()
        assert sorted(table.values()) == list(range(732))

    def test_phones_to_ids_drops_unknown(self):
        ids = phones_to_ids(["a", "NOT_A_SYMBOL", "i"])
        assert len(ids) == 2


class TestSplitter:
    def test_effective_len_skips_puncts(self):
        assert effective_len("你好......") == 4
        assert effective_len("abc") == 3
        assert effective_len("。。。") == 0

    def test_simple_terminator_split(self):
        s = TextSplitter()
        out = s.split("こんにちは。元気ですか？はい。")
        assert out == ["こんにちは。", "元気ですか？", "はい。"]

    def test_short_sentence_merges_forward(self):
        s = TextSplitter(min_len=5)
        # "ab." has effective length 2 < 5 so it merges into the next chunk
        out = s.split("ab.こんにちは。")
        assert out == ["ab.こんにちは。"]

    def test_separator_respects_max_len(self):
        s = TextSplitter(max_len=8)
        out = s.split("あいう、えおか、きくけ。")
        assert out[0] == "あいう、えおか、"

    def test_trailing_text_flushed(self):
        out = split_text("こんにちは。じゃあまた")
        assert out[-1] == "じゃあまた"

    def test_trailing_punct_merged_to_prev(self):
        s = TextSplitter()
        out = s.split("こんにちは。、、")
        assert out == ["こんにちは。、、"]

    def test_empty(self):
        assert split_text("") == []

    def test_newlines_removed(self):
        out = split_text("こんにち\nは。")
        assert out == ["こんにちは。"]


class TestLanguage:
    @pytest.mark.parametrize("alias,canon", [
        ("ja", "Japanese"), ("jp", "Japanese"), ("JAPANESE", "Japanese"),
        ("en-US", "English"), ("zh-CN", "Chinese"),
        ("hybrid", "Hybrid-Chinese-English"),
    ])
    def test_aliases(self, alias, canon):
        assert normalize_language(alias) == canon

    def test_require_supported_rejects(self):
        with pytest.raises(ValueError):
            require_supported("klingon")

    def test_require_supported_no_hybrid(self):
        with pytest.raises(ValueError):
            require_supported("hybrid", allow_hybrid=False)


class TestJapaneseG2P:
    def test_normalize(self):
        assert "パーセント" in normalize_ja("50%")
        assert normalize_ja("えっ!!!!") == "えっ!"

    def test_kana_basic(self):
        assert kana_to_phones("こんにちは") == \
            ["k", "o", "N", "n", "i", "ch", "i", "w", "a"]

    def test_kana_katakana(self):
        assert kana_to_phones("コーヒー") == ["k", "o", "o", "h", "i", "i"]

    def test_kana_sokuon_yoon(self):
        assert kana_to_phones("きょっと") == ["ky", "o", "cl", "t", "o"]

    def test_kana_foreign_digraph(self):
        assert kana_to_phones("ファ") == ["f", "a"]

    def test_full_pipeline_punctuation(self):
        phones = japanese_to_phone_strs("こんにちは。", use_openjtalk=False)
        assert phones[-1] == "."
        assert phones[0] == "k"

    def test_ids_all_valid(self):
        # kana only: kanji without pyopenjtalk raises (see
        # test_audio_formats.TestKanjiFailureSurface)
        ids = japanese_to_phones("こんにちは、げんき？")
        assert len(ids) > 0
        assert all(0 <= i < 732 for i in ids)

    def test_empty(self):
        assert japanese_to_phone_strs("") == []
