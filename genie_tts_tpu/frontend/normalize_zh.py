"""Chinese text normalization: digits/dates/times/percents -> hanzi,
fullwidth -> halfwidth, punctuation canonicalization.

Capability parity with the reference's TextNormalizer pipeline
(``/root/reference/src/genie_tts/G2P/Chinese/Normalization/``: num.py,
chronology.py, phonecode.py, quantifier.py), implemented independently.
"""
from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_UNITS_SMALL = ["", "十", "百", "千"]
_UNITS_BIG = ["", "万", "亿", "兆"]


def _four_digits(n: int) -> str:
    """0..9999 -> hanzi (no leading 零 handling across groups)."""
    if n == 0:
        return ""
    out = []
    digits = [int(c) for c in str(n)]
    L = len(digits)
    zero_pending = False
    for i, d in enumerate(digits):
        unit = _UNITS_SMALL[L - 1 - i]
        if d == 0:
            zero_pending = True
            continue
        if zero_pending and out:
            out.append("零")
        zero_pending = False
        out.append(_DIGITS[d] + unit)
    return "".join(out)


def number_to_hanzi(n: int) -> str:
    if n < 0:
        return "负" + number_to_hanzi(-n)
    if n == 0:
        return "零"
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    out = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if g == 0:
            continue
        part = _four_digits(g)
        # interior zero between groups: 一亿零三十
        if out and groups[i + 1: ] and g < 1000:
            out.append("零")
        out.append(part + _UNITS_BIG[i])
    s = "".join(out)
    # idiomatic: 一十X -> 十X at the very front
    if s.startswith("一十"):
        s = s[1:]
    return s


def digits_to_hanzi(s: str) -> str:
    """Digit-by-digit reading (phone numbers, IDs); 1 reads 幺."""
    table = {"0": "零", "1": "幺", "2": "二", "3": "三", "4": "四",
             "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(table.get(c, c) for c in s)


def decimal_to_hanzi(whole: str, frac: str) -> str:
    out = number_to_hanzi(int(whole)) if whole else "零"
    if frac:
        out += "点" + "".join(_DIGITS[int(c)] for c in frac)
    return out


_RE_FULLWIDTH = {chr(0xFF01 + i): chr(0x21 + i) for i in range(94)}
_RE_DATE = re.compile(r"(\d{4})年(?:(\d{1,2})月)?(?:(\d{1,2})[日号])?")
_RE_TIME = re.compile(r"(\d{1,2}):(\d{2})(?::(\d{2}))?")
_RE_PERCENT = re.compile(r"(\d+(?:\.\d+)?)%")
_RE_FRACTION = re.compile(r"(\d+)/(\d+)")
_RE_RANGE = re.compile(r"(\d+)[-~](\d+)")
_RE_PHONE = re.compile(r"\b1[3-9]\d{9}\b|\b\d{3,4}-\d{7,8}\b")
_RE_DECIMAL = re.compile(r"(\d+)\.(\d+)")
_RE_NUMBER = re.compile(r"\d+")

_PUNCT_MAP = {
    "，": ",", "。": ".", "！": "!", "？": "?", "；": ",", "：": ",",
    "、": ",", "…": "…", "—": ",", "·": ",",
    "“": "", "”": "", "‘": "", "’": "", "（": ",", "）": ",",
    "《": "", "》": "", "【": "", "】": "", "「": "", "」": "",
}


def _year_digits(y: str) -> str:
    table = {"0": "零", "1": "一", "2": "二", "3": "三", "4": "四",
             "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}
    return "".join(table[c] for c in y)


from functools import lru_cache
from importlib import resources


@lru_cache(maxsize=1)
def _trad2simp() -> dict:
    """Traditional -> simplified map: bundled seed + optional GenieData
    extension (``trad2simp.tsv``: one ``trad TAB simp`` pair per line).
    Role of the reference's char_convert (``Normalization/char_convert.py``)."""
    import json

    with resources.files("genie_tts_tpu.data").joinpath(
            "trad2simp_seed.json").open("r", encoding="utf-8") as f:
        table = json.load(f)
    from ..config import chinese_g2p_dir

    ext = chinese_g2p_dir() / "trad2simp.tsv"
    if ext.exists():
        try:
            for line in ext.read_text(encoding="utf-8").splitlines():
                if "\t" in line:
                    t, s = line.split("\t", 1)
                    table[t] = s.strip()
        except OSError:
            pass
    return table


def traditional_to_simplified(text: str) -> str:
    table = _trad2simp()
    return "".join(table.get(c, c) for c in text)


def normalize_chinese(text: str) -> str:
    text = text.replace("\n", "")
    text = traditional_to_simplified(text)
    # dates: 2024年1月5日
    text = _RE_DATE.sub(
        lambda m: _year_digits(m.group(1)) + "年"
        + (number_to_hanzi(int(m.group(2))) + "月" if m.group(2) else "")
        + (number_to_hanzi(int(m.group(3))) + "日" if m.group(3) else ""),
        text)
    # times 3:30 / 3:05:10
    def _time(m):
        h, mnt, sec = int(m.group(1)), int(m.group(2)), m.group(3)
        out = number_to_hanzi(h) + "点"
        if mnt:
            if mnt < 10:
                out += "零"
            out += number_to_hanzi(mnt) + "分"
        if sec and int(sec):
            out += number_to_hanzi(int(sec)) + "秒"
        return out
    text = _RE_TIME.sub(_time, text)
    text = _RE_PHONE.sub(lambda m: digits_to_hanzi(m.group().replace("-", "")), text)
    text = _RE_PERCENT.sub(
        lambda m: "百分之" + (decimal_to_hanzi(*m.group(1).split("."))
                           if "." in m.group(1) else number_to_hanzi(int(m.group(1)))),
        text)
    text = _RE_FRACTION.sub(
        lambda m: number_to_hanzi(int(m.group(2))) + "分之" + number_to_hanzi(int(m.group(1))),
        text)
    text = _RE_RANGE.sub(
        lambda m: number_to_hanzi(int(m.group(1))) + "到" + number_to_hanzi(int(m.group(2))),
        text)
    text = _RE_DECIMAL.sub(lambda m: decimal_to_hanzi(m.group(1), m.group(2)), text)
    text = _RE_NUMBER.sub(
        lambda m: digits_to_hanzi(m.group()) if len(m.group()) > 8
        else number_to_hanzi(int(m.group())), text)
    # fullwidth alnum -> halfwidth
    text = "".join(_RE_FULLWIDTH.get(c, c) for c in text)
    # punctuation canonicalization
    text = "".join(_PUNCT_MAP.get(c, c) for c in text)
    return text
