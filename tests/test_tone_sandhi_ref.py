"""Tone-sandhi + erhua + polyphone golden tests, hand-traced from the
reference rule set (``/root/reference/src/genie_tts/G2P/Chinese/
ToneSandhi.py`` / ``Erhua.py`` / ``CorrectPronunciation.py``)."""
import pytest

from genie_tts_tpu.frontend.tone_sandhi import (
    MUST_NEURAL, MUST_NOT_NEURAL, _merge_bu, _merge_er, _merge_reduplication,
    _merge_yi, bu_sandhi, modified_tone, neural_sandhi, pre_merge,
    three_sandhi, yi_sandhi,
)

SPLITS = {
    "纸老虎": ["纸", "老虎"],
    "蒙古包": ["蒙古", "包"],
    "所有人": ["所有", "人"],
}


def split_fn(word):
    return SPLITS.get(word, [word[:1], word[1:]])


class TestLexicons:
    def test_sizes(self):
        # the reference ships ~430 neutral-tone words and 40 exceptions
        assert len(MUST_NEURAL) > 400
        assert len(MUST_NOT_NEURAL) == 40

    def test_membership(self):
        assert "豆腐" in MUST_NEURAL and "石头" in MUST_NEURAL
        assert "男子" in MUST_NOT_NEURAL


class TestBu:
    def test_before_tone4(self):
        assert bu_sandhi("不是", ["bu4", "shi4"]) == ["bu2", "shi4"]

    def test_before_tone3_unchanged(self):
        assert bu_sandhi("不好", ["bu4", "hao3"]) == ["bu4", "hao3"]

    def test_x_bu_x_neutral(self):
        assert bu_sandhi("看不懂", ["kan4", "bu4", "dong3"])[1] == "bu5"


class TestYi:
    def test_before_tone4(self):
        assert yi_sandhi("一段", ["yi1", "duan4"]) == ["yi2", "duan4"]

    def test_before_tone1(self):
        assert yi_sandhi("一天", ["yi1", "tian1"]) == ["yi4", "tian1"]

    def test_ordinal(self):
        assert yi_sandhi("第一", ["di4", "yi1"]) == ["di4", "yi1"]

    def test_reduplication(self):
        assert yi_sandhi("看一看", ["kan4", "yi1", "kan4"])[1] == "yi5"

    def test_digit_sequence_unchanged(self):
        assert yi_sandhi("二一零", ["er4", "yi1", "ling2"])[1] == "yi1"


class TestNeural:
    def test_lexicon_word(self):
        out = neural_sandhi("石头", "n", ["shi2", "tou2"], split_fn)
        assert out == ["shi2", "tou5"]

    def test_must_not(self):
        out = neural_sandhi("男子", "n", ["nan2", "zi3"], split_fn)
        assert out == ["nan2", "zi3"]

    def test_reduplication_nva(self):
        assert neural_sandhi("妈妈", "n", ["ma1", "ma1"], split_fn)[1] == "ma5"
        # 哈哈 escapes the reduplication rule (must-not lexicon) but the
        # final-particle rule (word[-1] in 吧呢哈...) still neutralizes it —
        # reference behavior (ToneSandhi.py:104-106)
        assert neural_sandhi("哈哈", "n", ["ha1", "ha1"], split_fn)[1] == "ha5"

    def test_particles(self):
        assert neural_sandhi("好吧", "y", ["hao3", "ba1"], split_fn)[1] == "ba5"
        assert neural_sandhi("我的", "u", ["wo3", "de2"], split_fn)[1] == "de5"

    def test_men_zi_suffix(self):
        assert neural_sandhi("我们", "r", ["wo3", "men2"], split_fn)[1] == "men5"

    def test_locative(self):
        assert neural_sandhi("家里", "s", ["jia1", "li3"], split_fn)[1] == "li5"

    def test_directional(self):
        assert neural_sandhi("上来", "v", ["shang4", "lai2"], split_fn)[1] == "lai5"

    def test_ge_quantifier(self):
        out = neural_sandhi("三个", "m", ["san1", "ge4"], split_fn)
        assert out[1] == "ge5"
        assert neural_sandhi("个", "q", ["ge4"], split_fn) == ["ge5"]


class TestThree:
    def test_two_syllables(self):
        assert three_sandhi("你好", ["ni3", "hao3"], split_fn) == ["ni2", "hao3"]

    def test_mono_plus_di(self):
        # 纸/老虎: monosyllabic + disyllabic -> second syllable to tone 2
        out = three_sandhi("纸老虎", ["zhi3", "lao3", "hu3"], split_fn)
        assert out == ["zhi3", "lao2", "hu3"]

    def test_di_plus_mono(self):
        out = three_sandhi("蒙古包", ["meng3", "gu3", "bao3"], split_fn)
        assert out == ["meng2", "gu2", "bao3"]

    def test_mixed_three(self):
        # 所有/人: first sub-word all-three -> its first to tone 2
        out = three_sandhi("所有人", ["suo3", "you3", "ren2"], split_fn)
        assert out == ["suo2", "you3", "ren2"]

    def test_idiom_two_plus_two(self):
        out = three_sandhi("岂有此理", ["qi3", "you3", "ci3", "li3"], split_fn)
        assert out == ["qi2", "you3", "ci2", "li3"]


class TestPreMerge:
    def test_merge_bu(self):
        seg = [("听", "v"), ("不", "d"), ("懂", "v")]
        assert _merge_bu(seg) == [("听", "v"), ("不懂", "v")]

    def test_trailing_bu(self):
        assert _merge_bu([("他", "r"), ("不", "d")]) == [("他", "r"), ("不", "d")]

    def test_merge_yi_v_yi_v(self):
        seg = [("看", "v"), ("一", "m"), ("看", "v")]
        assert _merge_yi(seg)[0][0] == "看一看"

    def test_merge_yi_forward(self):
        seg = [("一", "m"), ("天", "n")]
        assert _merge_yi(seg) == [("一天", "m")]

    def test_merge_reduplication(self):
        seg = [("好", "a"), ("好", "a"), ("学", "v")]
        assert _merge_reduplication(seg)[0][0] == "好好"

    def test_merge_er(self):
        seg = [("花", "n"), ("儿", "n")]
        assert _merge_er(seg) == [("花儿", "n")]

    def test_continuous_three_merge(self):
        # 小+狗 both tone-3 -> one word, then three_sandhi fires
        finals = {"小": ["xiao3"], "狗": ["gou3"]}
        seg = pre_merge([("小", "a"), ("狗", "n")],
                        lambda w: sum((finals.get(c, [""]) for c in w), []))
        assert seg == [("小狗", "a")]


class TestModifiedTone:
    def test_full_chain(self):
        out = modified_tone("不是", "d", ["bu4", "shi4"], split_fn)
        assert out == ["bu2", "shi4"]

    def test_yi_ge(self):
        # 一 before tone4 -> yi2; 个 after a numeral -> neutral
        out = modified_tone("一个", "m", ["yi1", "ge4"], split_fn)
        assert out == ["yi2", "ge5"]


class TestErhuaRef:
    def test_not_erhua_word(self):
        from genie_tts_tpu.frontend.g2p_zh import merge_erhua

        _, py = merge_erhua("花儿", ["hua1", "er2"], "n")
        assert py == ["hua1", "er2"]  # 花儿 is lexically non-erhua

    def test_must_erhua(self):
        from genie_tts_tpu.frontend.g2p_zh import merge_erhua

        _, py = merge_erhua("小院儿", ["xiao3", "yuan4", "er2"], "n")
        assert py == ["xiao3", "yuan4", "er4"]  # takes the previous tone

    def test_er1_fix(self):
        from genie_tts_tpu.frontend.g2p_zh import merge_erhua

        _, py = merge_erhua("老汉儿", ["lao3", "han4", "er1"], "n")
        assert py == ["lao3", "han4", "er4"]

    def test_pos_gate(self):
        from genie_tts_tpu.frontend.g2p_zh import merge_erhua

        _, py = merge_erhua("玩儿", ["wan2", "er2"], "a")
        assert py == ["wan2", "er2"]  # adjectives skip erhua merging


class TestPolyphone:
    def test_whole_word(self):
        from genie_tts_tpu.frontend.g2p_zh import correct_pronunciation

        assert correct_pronunciation("银行", ["yin2", "xing2"]) == ["yin2", "hang2"]

    def test_passthrough(self):
        from genie_tts_tpu.frontend.g2p_zh import correct_pronunciation

        assert correct_pronunciation("天空", ["tian1", "kong1"]) == ["tian1", "kong1"]


class TestPipeline:
    def test_nihao(self):
        from genie_tts_tpu.frontend.g2p_zh import chinese_to_phone_data

        norm, pys, phones, word2ph = chinese_to_phone_data("你好。")
        assert norm.startswith("你好")
        assert pys[:2] == ["ni2", "hao3"]  # sandhi applied
        assert len(word2ph) == len(norm)
        assert sum(word2ph) == len(phones)

    def test_numbers_flow_through(self):
        from genie_tts_tpu.frontend.g2p_zh import chinese_to_phone_data

        norm, pys, phones, word2ph = chinese_to_phone_data("我有2个苹果。")
        assert "两" in norm and "个" in norm
        assert len(word2ph) == len(norm)

    def test_word2ph_alignment_long(self):
        from genie_tts_tpu.frontend.g2p_zh import chinese_to_phone_data

        norm, _, phones, word2ph = chinese_to_phone_data(
            "今天是2024年1月5日，气温零下3度，风速5km每小时！")
        assert len(word2ph) == len(norm)
        assert sum(word2ph) == len(phones)
