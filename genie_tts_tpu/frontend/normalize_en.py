"""English text normalization: expand numbers, currency, ordinals, dates,
times, acronyms into speakable words.

Capability parity with the reference's normalization pipeline
(``/root/reference/src/genie_tts/G2P/English/Normalization.py:258-286``),
implemented independently (no ``inflect`` dependency).
"""
from __future__ import annotations

import re

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
          (10 ** 3, "thousand"), (100, "hundred")]

_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def number_to_words(n: int) -> str:
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("" if r == 0 else " " + _ONES[r])
    for value, name in _SCALE:
        if n >= value:
            head, rest = divmod(n, value)
            out = number_to_words(head) + " " + name
            if rest:
                out += " " + number_to_words(rest)
            return out
    return _ONES[0]


def ordinal_to_words(n: int) -> str:
    words = number_to_words(n)
    parts = words.rsplit(" ", 1)
    last = parts[-1]
    if "-" in last:
        head, tail = last.rsplit("-", 1)
        last = head + "-" + _ordinalize_word(tail)
    else:
        last = _ordinalize_word(last)
    parts[-1] = last
    return " ".join(parts)


def _ordinalize_word(w: str) -> str:
    if w in _ORDINAL_SPECIAL:
        return _ORDINAL_SPECIAL[w]
    if w.endswith("y"):
        return w[:-1] + "ieth"
    if w in ("hundred", "thousand", "million", "billion", "trillion"):
        return w + "th"
    return w + "th"


def digits_to_words(s: str) -> str:
    return " ".join(_ONES[int(c)] if c.isdigit() else c for c in s)


def year_to_words(y: int) -> str:
    if 1000 <= y <= 1999 or 2100 <= y <= 9999:
        head, tail = divmod(y, 100)
        if tail == 0:
            return number_to_words(head) + " hundred"
        if tail < 10:
            return number_to_words(head) + " oh " + number_to_words(tail)
        return number_to_words(head) + " " + number_to_words(tail)
    return number_to_words(y)


def _decimal_words(whole: str, frac: str) -> str:
    out = number_to_words(int(whole)) if whole else "zero"
    if frac:
        out += " point " + digits_to_words(frac)
    return out


_CURRENCY = {"$": ("dollar", "cent"), "£": ("pound", "penny"),
             "€": ("euro", "cent"), "¥": ("yen", "sen")}


def _expand_currency(m: re.Match) -> str:
    sym, whole, frac = m.group(1), m.group(2).replace(",", ""), m.group(3)
    unit, sub = _CURRENCY[sym]
    n = int(whole) if whole else 0
    out = number_to_words(n) + " " + unit + ("s" if n != 1 and unit != "yen" else "")
    if frac:
        c = int(frac)
        if c:
            sub_w = sub + ("s" if c != 1 and sub != "penny" else "")
            if c != 1 and sub == "penny":
                sub_w = "pence"
            out += " and " + number_to_words(c) + " " + sub_w
    return out


def _expand_time(m: re.Match) -> str:
    h, mnt = int(m.group(1)), int(m.group(2))
    suffix = (" " + m.group(3).replace(".", "").lower()) if m.group(3) else ""
    if mnt == 0:
        return number_to_words(h) + " o'clock" + suffix
    if mnt < 10:
        return number_to_words(h) + " oh " + number_to_words(mnt) + suffix
    return number_to_words(h) + " " + number_to_words(mnt) + suffix


_RE_CURRENCY = re.compile(r"([$£€¥])([\d,]+)(?:\.(\d{1,2}))?")
_RE_TIME = re.compile(r"\b(\d{1,2}):(\d{2})\s*([ap]\.?m\.?)?", re.I)
_RE_ORDINAL = re.compile(r"\b(\d+)(st|nd|rd|th)\b", re.I)
_RE_YEAR = re.compile(r"\b(1[1-9]\d\d|20\d\d)s?\b")
_RE_PERCENT = re.compile(r"([\d.]+)\s*%")
_RE_DECIMAL = re.compile(r"\b(\d+)\.(\d+)\b")
_RE_COMMA_NUM = re.compile(r"\b\d{1,3}(,\d{3})+\b")
_RE_NUMBER = re.compile(r"\b\d+\b")
_RE_PHONE_CHUNK = re.compile(r"\b\d{3}-\d{3,4}(-\d{4})?\b")


def normalize_english(text: str) -> str:
    text = text.replace("’", "'").replace("—", " ").replace("–", " ")
    text = _RE_CURRENCY.sub(_expand_currency, text)
    text = _RE_TIME.sub(_expand_time, text)
    text = _RE_PHONE_CHUNK.sub(lambda m: digits_to_words(m.group().replace("-", " ")), text)
    text = _RE_ORDINAL.sub(lambda m: ordinal_to_words(int(m.group(1))), text)
    text = _RE_PERCENT.sub(
        lambda m: (_decimal_words(*m.group(1).split(".")) if "." in m.group(1)
                   else number_to_words(int(m.group(1)))) + " percent", text)
    text = _RE_COMMA_NUM.sub(lambda m: number_to_words(int(m.group().replace(",", ""))), text)
    text = _RE_DECIMAL.sub(lambda m: _decimal_words(m.group(1), m.group(2)), text)

    def _num(m: re.Match) -> str:
        s = m.group()
        n = int(s)
        if _RE_YEAR.fullmatch(s) and len(s) == 4:
            return year_to_words(n)
        if len(s) > 6 or (s[0] == "0" and len(s) > 1):
            return digits_to_words(s)
        return number_to_words(n)

    text = _RE_NUMBER.sub(_num, text)
    return text
