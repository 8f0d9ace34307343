"""Mandarin tone sandhi: 不 / 一 / neutral tone / third-tone rules.

Capability parity with the reference's ToneSandhi
(``/root/reference/src/genie_tts/G2P/Chinese/ToneSandhi.py:340-349``),
implemented from the standard phonological rules. Operates on
(word, [pinyin...]) pairs where pinyin is "syllable+tone digit".
"""
from __future__ import annotations

from typing import List, Tuple

# particles and suffixes that typically neutralize
_NEUTRAL_PARTICLES = set("的地得了着过吧吗呢啊呀嘛哦喔嘞哇咧么")
_NEUTRAL_SUFFIX_WORDS = {
    "们", "子", "头",  # suffixes neutral in common nouns (approximation)
}


def _tone(p: str) -> int:
    return int(p[-1]) if p and p[-1].isdigit() else 5


def _set_tone(p: str, t: int) -> str:
    return (p[:-1] if p and p[-1].isdigit() else p) + str(t)


def sandhi_bu(word: str, pinyin: List[str], next_word_first_tone: int | None) -> List[str]:
    """不: tone 2 before tone 4; neutral between reduplication (好不好)."""
    out = list(pinyin)
    for i, ch in enumerate(word):
        if ch != "不":
            continue
        # X不X pattern -> neutral
        if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
            out[i] = _set_tone(out[i], 5)
            continue
        nxt_tone = None
        if i + 1 < len(word):
            nxt_tone = _tone(out[i + 1])
        elif next_word_first_tone is not None:
            nxt_tone = next_word_first_tone
        if nxt_tone == 4:
            out[i] = _set_tone(out[i], 2)
    return out


def sandhi_yi(word: str, pinyin: List[str], next_word_first_tone: int | None,
              prev_char: str = "") -> List[str]:
    """一: yi2 before tone 4, yi4 before 1/2/3, neutral in reduplication,
    unchanged in ordinals/numerals (第一, 一九九九)."""
    out = list(pinyin)
    for i, ch in enumerate(word):
        if ch != "一":
            continue
        # reduplication 看一看 -> neutral
        if 0 < i < len(word) - 1 and word[i - 1] == word[i + 1]:
            out[i] = _set_tone(out[i], 5)
            continue
        # ordinal / digit-sequence context: unchanged
        prev = word[i - 1] if i > 0 else prev_char
        neighbors = (word[i - 1] if i else "") + (word[i + 1] if i + 1 < len(word) else "")
        if prev == "第" or any(c in "零一二三四五六七八九十" for c in neighbors):
            continue
        nxt_tone = None
        if i + 1 < len(word):
            nxt_tone = _tone(out[i + 1])
        elif next_word_first_tone is not None:
            nxt_tone = next_word_first_tone
        if nxt_tone == 4:
            out[i] = _set_tone(out[i], 2)
        elif nxt_tone in (1, 2, 3):
            out[i] = _set_tone(out[i], 4)
    return out


def sandhi_neutral(word: str, pinyin: List[str]) -> List[str]:
    out = list(pinyin)
    for i, ch in enumerate(word):
        if i > 0 and ch in _NEUTRAL_PARTICLES and len(word) > 1:
            out[i] = _set_tone(out[i], 5)
    if len(word) >= 2 and word[-1] in _NEUTRAL_SUFFIX_WORDS:
        out[-1] = _set_tone(out[-1], 5)
    # reduplicated kinship/noun: 妈妈, 爸爸, 哥哥 -> second neutral
    if len(word) == 2 and word[0] == word[1]:
        out[1] = _set_tone(out[1], 5)
    return out


def sandhi_third(pinyin: List[str]) -> List[str]:
    """Within a word: in a run of third tones, all but the last become 2."""
    out = list(pinyin)
    i = 0
    n = len(out)
    while i < n:
        if _tone(out[i]) == 3:
            j = i
            while j + 1 < n and _tone(out[j + 1]) == 3:
                j += 1
            for k in range(i, j):
                out[k] = _set_tone(out[k], 2)
            i = j + 1
        else:
            i += 1
    return out


def apply_sandhi(words: List[Tuple[str, List[str]]]) -> List[Tuple[str, List[str]]]:
    """Full sandhi over a segmented sentence: [(word, pinyins)] -> same."""
    result: List[Tuple[str, List[str]]] = []
    for idx, (word, py) in enumerate(words):
        nxt_tone = None
        for w2, p2 in words[idx + 1:]:
            if p2:
                nxt_tone = _tone(p2[0])
                break
        prev_char = words[idx - 1][0][-1] if idx > 0 and words[idx - 1][0] else ""
        py = sandhi_neutral(word, py)
        py = sandhi_bu(word, py, nxt_tone)
        py = sandhi_yi(word, py, nxt_tone, prev_char)
        py = sandhi_third(py)
        result.append((word, py))
    # cross-word third-tone: word ending in 3 followed by word starting with 3
    for i in range(len(result) - 1):
        w, py = result[i]
        nxt_py = None
        for w2, p2 in result[i + 1:]:
            if p2:
                nxt_py = p2[0]
                break
        if py and nxt_py and _tone(py[-1]) == 3 and _tone(nxt_py) == 3:
            py = list(py)
            py[-1] = _set_tone(py[-1], 2)
            result[i] = (w, py)
    return result
