"""Chinese grapheme-to-phoneme conversion.

Capability parity with the reference's Chinese pipeline
(``/root/reference/src/genie_tts/G2P/Chinese/ChineseG2P.py:113-213``):
normalization -> jieba segmentation -> per-word pinyin -> tone sandhi ->
erhua merge -> opencpop-strict initial/final phoneme symbols. Returns
``(norm_text, pinyins, phoneme_ids, word2ph)`` where ``word2ph[i]`` is the
number of phonemes produced by the i-th character of ``norm_text`` (drives
per-phoneme BERT feature repetition, ``GetPhonesAndBert.py:64-76``).

Pinyin sources, in priority order: word-level dictionary (polyphones),
char-level dictionary. Both merge a bundled seed table
(``data/pinyin_seed.json``) with optional full dictionaries from the
GenieData assets (``pinyin_chars.tsv`` / ``pinyin_words.tsv``: token TAB
space-separated pinyins). pypinyin is used when importable.
"""
from __future__ import annotations

import json
import logging
import re
from functools import lru_cache
from importlib import resources
from typing import Dict, List, Tuple

from ..config import chinese_g2p_dir
from .normalize_zh import normalize_chinese
from .symbols import phones_to_ids, symbol_to_id_v2
from .tone_sandhi import apply_sandhi

logger = logging.getLogger(__name__)

try:
    import jieba

    jieba.setLogLevel(logging.WARNING)
    _HAS_JIEBA = True
except Exception:  # pragma: no cover
    jieba = None
    _HAS_JIEBA = False

try:
    import pypinyin  # type: ignore

    _HAS_PYPINYIN = True
except Exception:
    pypinyin = None
    _HAS_PYPINYIN = False

_HANZI_RE = re.compile(r"[一-鿿]")
_PUNCT_KEEP = {".", "!", "?", ",", "…", "-"}

# ---------------------------------------------------------------------------
# Pinyin dictionaries
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _dicts() -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    with resources.files("genie_tts_tpu.data").joinpath("pinyin_seed.json").open(
        "r", encoding="utf-8"
    ) as f:
        seed = json.load(f)
    chars: Dict[str, List[str]] = dict(seed["chars"])
    words: Dict[str, List[str]] = dict(seed["words"])
    root = chinese_g2p_dir()
    for fname, target in (("pinyin_chars.tsv", chars), ("pinyin_words.tsv", words)):
        p = root / fname
        if p.exists():
            try:
                for line in p.read_text(encoding="utf-8").splitlines():
                    if "\t" in line:
                        tok, pys = line.split("\t", 1)
                        target[tok] = pys.split()
            except OSError:
                pass
    return chars, words


_warned_oov = set()


def char_pinyin(ch: str) -> str | None:
    chars, _ = _dicts()
    if ch in chars:
        return chars[ch][0]
    if _HAS_PYPINYIN:
        out = pypinyin.pinyin(ch, style=pypinyin.Style.TONE3, neutral_tone_with_five=True)
        if out and out[0][0] != ch:
            return out[0][0]
    if ch not in _warned_oov and len(_warned_oov) < 20:
        _warned_oov.add(ch)
        logger.warning("no pinyin for %r (provide GenieData pinyin_chars.tsv "
                       "or install pypinyin); skipped", ch)
    return None


def word_pinyins(word: str) -> List[str | None]:
    _, words = _dicts()
    if word in words:
        return list(words[word])
    return [char_pinyin(c) for c in word]


# ---------------------------------------------------------------------------
# Pinyin -> phoneme symbols (opencpop-strict scheme)
# ---------------------------------------------------------------------------

_INITIALS = ["zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l", "g",
             "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w"]

# zero-initial vowels take pseudo-initials AA/EE/OO
_ZERO_INITIAL = {"a": "AA", "e": "EE", "o": "OO"}

# orthographic corrections after 'y'
_Y_FINAL_FIX = {"e": "E", "an": "En"}


def pinyin_to_symbols(py: str) -> List[str]:
    """'zhong1' -> ['zh', 'ong1']; 'a4' -> ['AA', 'a4']; 'yu2' -> ['y','v2']."""
    py = py.strip().lower().replace("ü", "v").replace("u:", "v")
    if not py:
        return []
    tone = "5"
    if py[-1].isdigit():
        tone = py[-1]
        if tone == "0":
            tone = "5"
        py = py[:-1]
    if not py:
        return []
    initial = ""
    for ini in _INITIALS:
        if py.startswith(ini):
            initial = ini
            break
    final = py[len(initial):]
    if not initial:
        head = final[0]
        initial = _ZERO_INITIAL.get(head, "")
        if not initial:
            return []  # not a pinyin syllable
    elif initial in ("j", "q", "x", "y") and final.startswith("u"):
        final = "v" + final[1:]
    if initial == "y":
        final = _Y_FINAL_FIX.get(final, final)
    elif initial in ("z", "c", "s") and final == "i":
        final = "i0"
    elif initial in ("zh", "ch", "sh", "r") and final == "i":
        final = "ir"
    if not final:  # syllabic consonants (hm, ng): skip
        return []
    out = [initial, final + tone]
    table = symbol_to_id_v2()
    if out[1] not in table:
        logger.debug("unknown pinyin final %r from %r", out[1], py)
        return []
    return out


# ---------------------------------------------------------------------------
# Erhua
# ---------------------------------------------------------------------------

# words where 儿 is a content syllable and must NOT merge
_NOT_ERHUA = {
    "儿子", "儿女", "儿孙", "女儿", "男儿", "少儿", "婴儿", "幼儿", "孤儿",
    "胎儿", "新生儿", "婴幼儿", "幼儿园", "托儿所", "儿童", "儿科", "育儿",
}


def merge_erhua(word: str, pinyins: List[str]) -> Tuple[str, List[str]]:
    """Drop a word-final 儿 (er2/er5) unless the word is content-儿."""
    if (len(word) >= 2 and word.endswith("儿") and word not in _NOT_ERHUA
            and pinyins and pinyins[-1] and pinyins[-1][:-1] == "er"):
        return word[:-1], pinyins[:-1]
    return word, pinyins


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def chinese_to_phone_data(text: str):
    """-> (norm_text, pinyins, phone_strs, word2ph)."""
    norm = normalize_chinese(text)
    if _HAS_JIEBA:
        seg = [w for w in jieba.cut(norm) if w.strip()]
    else:  # pragma: no cover
        seg = [c for c in norm if c.strip()]

    # per-word pinyin (None for non-hanzi chars)
    tagged: List[Tuple[str, List[str]]] = []
    for w in seg:
        if _HANZI_RE.search(w):
            w2, py = merge_erhua(w, word_pinyins(w))
            tagged.append((w2, py))
        else:
            tagged.append((w, [None] * len(w)))

    # sandhi over hanzi words only
    sandhied = apply_sandhi(
        [(w, [p for p in py if p]) for w, py in tagged if any(py)])
    s_iter = iter(sandhied)
    final_words: List[Tuple[str, List[str]]] = []
    for w, py in tagged:
        if any(py):
            final_words.append(next(s_iter))
        else:
            final_words.append((w, py))

    norm_text_chars: List[str] = []
    phones: List[str] = []
    word2ph: List[int] = []
    for w, py in final_words:
        if any(py):
            for ch, p in zip(w, py + [None] * (len(w) - len(py))):
                if p is None:
                    continue
                syms = pinyin_to_symbols(p)
                if not syms:
                    continue
                norm_text_chars.append(ch)
                phones.extend(syms)
                word2ph.append(len(syms))
        else:
            for ch in w:
                if ch in _PUNCT_KEEP:
                    norm_text_chars.append(ch)
                    phones.append(ch)
                    word2ph.append(1)
                # other non-hanzi chars dropped (ascii letters handled by
                # the hybrid splitter upstream)
    norm_text = "".join(norm_text_chars)
    pinyins = [p for _, py in final_words for p in py if p]
    return norm_text, pinyins, phones, word2ph


def chinese_to_phones(text: str):
    """-> (norm_text, pinyins, phoneme_ids, word2ph)."""
    norm_text, pinyins, phone_strs, word2ph = chinese_to_phone_data(text)
    ids = phones_to_ids(phone_strs, drop_unknown=True)
    return norm_text, pinyins, ids, word2ph
