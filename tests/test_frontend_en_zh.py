"""English + Chinese frontend tests."""
import numpy as np
import pytest

from genie_tts_tpu.frontend.normalize_en import (
    normalize_english, number_to_words, ordinal_to_words, year_to_words,
)
from genie_tts_tpu.frontend.g2p_en import (
    english_to_phone_strs, english_to_phones, rule_g2p,
)
from genie_tts_tpu.frontend.normalize_zh import (
    normalize_chinese, number_to_hanzi, digits_to_hanzi,
)
from genie_tts_tpu.frontend.tone_sandhi import (
    apply_sandhi, bu_sandhi, three_sandhi, yi_sandhi,
)
from genie_tts_tpu.frontend.g2p_zh import (
    chinese_to_phones, merge_erhua, pinyin_to_symbols,
)
from genie_tts_tpu.frontend.dispatcher import get_phones_and_bert, split_zh_en


class TestEnglishNorm:
    @pytest.mark.parametrize("n,w", [
        (0, "zero"), (5, "five"), (13, "thirteen"), (21, "twenty one"),
        (100, "one hundred"), (345, "three hundred forty five"),
        (1000, "one thousand"), (1000000, "one million"),
    ])
    def test_numbers(self, n, w):
        assert number_to_words(n) == w

    def test_ordinals(self):
        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(23) == "twenty third"
        assert ordinal_to_words(30) == "thirtieth"

    def test_years(self):
        assert year_to_words(1999) == "nineteen ninety nine"
        assert year_to_words(1900) == "nineteen hundred"
        assert year_to_words(2005) == "two thousand five"

    def test_currency(self):
        out = normalize_english("$5.50 please")
        assert "five dollars" in out and "fifty cents" in out

    def test_time_percent(self):
        assert "three thirty" in normalize_english("at 3:30 pm")
        assert "fifty percent" in normalize_english("50% off")


class TestEnglishG2P:
    def test_rule_g2p_basic(self):
        assert rule_g2p("cat") == ["K", "AE1", "T"]
        assert rule_g2p("ship")[0] == "SH"
        assert rule_g2p("make")[1] == "EY1"  # magic-e

    def test_phones_valid_ids(self):
        ids = english_to_phones("Hello world, this is a test.")
        assert len(ids) > 0
        assert all(0 <= i < 732 for i in ids)

    def test_punctuation_kept(self):
        phones = english_to_phone_strs("Stop. Now!")
        assert "." in phones and "!" in phones

    def test_nation_rule(self):
        assert rule_g2p("nation")[-3:] == ["SH", "AH0", "N"]


class TestChineseNorm:
    @pytest.mark.parametrize("n,h", [
        (0, "零"), (7, "七"), (10, "十"), (14, "十四"), (20, "二十"),
        (105, "一百零五"), (1234, "一千二百三十四"), (10000, "一万"),
        (100000001, "一亿零一"),
    ])
    def test_number(self, n, h):
        assert number_to_hanzi(n) == h

    def test_digits(self):
        assert digits_to_hanzi("110") == "幺幺零"

    def test_sentence(self):
        out = normalize_chinese("今天是2024年1月5日，气温25度。")
        assert "二零二四年" in out
        assert "一月" in out and "五日" in out
        assert "二十五度" in out
        assert out.endswith(".")

    def test_percent_time(self):
        assert "百分之五十" in normalize_chinese("涨了50%")
        # reference reads :30 as 半 (chronology.py replace_time)
        assert "三点半" in normalize_chinese("现在3:30")


class TestToneSandhi:
    def test_bu(self):
        assert bu_sandhi("不是", ["bu4", "shi4"]) == ["bu2", "shi4"]
        assert bu_sandhi("不好", ["bu4", "hao3"]) == ["bu4", "hao3"]
        assert bu_sandhi("好不好", ["hao3", "bu4", "hao3"])[1] == "bu5"

    def test_yi(self):
        assert yi_sandhi("一个", ["yi1", "ge4"]) == ["yi2", "ge4"]
        assert yi_sandhi("一天", ["yi1", "tian1"]) == ["yi4", "tian1"]
        assert yi_sandhi("第一", ["di4", "yi1"]) == ["di4", "yi1"]

    def test_third_tone(self):
        assert three_sandhi("你好", ["ni3", "hao3"]) == ["ni2", "hao3"]
        assert three_sandhi("好", ["hao3"]) == ["hao3"]

    def test_cross_word_third(self):
        # pre-merge joins the two tone-3 monosyllables into one word
        out = apply_sandhi([("小", ["xiao3"]), ("狗", ["gou3"])])
        assert out[0] == ("小狗", ["xiao2", "gou3"])


class TestChineseG2P:
    @pytest.mark.parametrize("py,syms", [
        ("zhong1", ["zh", "ong1"]), ("a4", ["AA", "a4"]), ("e2", ["EE", "e2"]),
        ("ou1", ["OO", "ou1"]), ("yu2", ["y", "v2"]), ("yue4", ["y", "ve4"]),
        ("zi4", ["z", "i04"]), ("zhi1", ["zh", "ir1"]), ("ye3", ["y", "E3"]),
        ("lv4", ["l", "v4"]), ("ju2", ["j", "v2"]), ("er2", ["EE", "er2"]),
        ("hao3", ["h", "ao3"]), ("nin2", ["n", "in2"]),
    ])
    def test_pinyin_to_symbols(self, py, syms):
        assert pinyin_to_symbols(py) == syms

    def test_erhua(self):
        # reference semantics: 花儿 is in the non-erhua lexicon -> unchanged
        assert merge_erhua("花儿", ["hua1", "er5"]) == ("花儿", ["hua1", "er5"])
        assert merge_erhua("儿子", ["er2", "zi3"])[0] == "儿子"

    def test_full_pipeline(self):
        norm, pinyins, ids, word2ph = chinese_to_phones("你好，世界。")
        assert len(ids) == sum(word2ph)
        assert len(word2ph) == len(norm)
        assert all(0 <= i < 732 for i in ids)
        # sandhi applied: 你好 -> ni2 hao3
        assert pinyins[0] == "ni2"

    def test_polyphone_word(self):
        _, pinyins, _, _ = chinese_to_phones("银行")
        assert pinyins == ["yin2", "hang2"]


class TestDispatcher:
    def test_split_zh_en(self):
        parts = split_zh_en("我用Python写代码")
        assert parts == [("Chinese", "我用"), ("English", "Python"),
                         ("Chinese", "写代码")]

    def test_hybrid(self):
        ids, bert = get_phones_and_bert("你好hello", "hybrid")
        assert len(ids) > 0
        assert bert.shape == (len(ids), 1024)

    def test_japanese(self):
        ids, bert = get_phones_and_bert("こんにちは。", "ja")
        assert len(ids) > 0 and bert.shape[0] == len(ids)


class TestHomographs:
    def test_verb_context(self):
        from genie_tts_tpu.frontend.g2p_en import word_to_phones
        assert word_to_phones("record", prev="to") == \
            ["R", "IH0", "K", "AO1", "R", "D"]

    def test_noun_context(self):
        from genie_tts_tpu.frontend.g2p_en import word_to_phones
        assert word_to_phones("record", prev="the") == \
            ["R", "EH1", "K", "ER0", "D"]

    def test_sentence_integration(self):
        from genie_tts_tpu.frontend.g2p_en import english_to_phone_strs
        a = english_to_phone_strs("I will record it.")
        b = english_to_phone_strs("Play the record.")
        # stressed vowel differs between verb and noun readings
        assert "AO1" in a and "EH1" in b


class TestSplitterProperties:
    def test_content_preserved(self):
        from genie_tts_tpu.frontend.splitter import TextSplitter
        text = "これはテストです。次の文、そして三つ目！最後はこれ。"
        out = TextSplitter().split(text)
        assert "".join(out) == text

    def test_no_empty_sentences(self):
        from genie_tts_tpu.frontend.splitter import TextSplitter
        for text in ["。。。あ。", "a.b.c.dddddd.", "、、、短い。x"]:
            for s in TextSplitter().split(text):
                assert s.strip()


class TestTradSimp:
    def test_conversion(self):
        from genie_tts_tpu.frontend.normalize_zh import traditional_to_simplified
        assert traditional_to_simplified("學習中國話") == "学习中国话"

    def test_in_pipeline(self):
        out = normalize_chinese("我說了3個問題。")
        assert "说" in out and "三个" in out and "问题" in out
