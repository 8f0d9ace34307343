# -*- coding: utf-8 -*-
"""Measure the offline Japanese lexicon's coverage on an everyday corpus.

The reference reads arbitrary Japanese via OpenJTalk morphology
(``/root/reference/src/genie_tts/G2P/Japanese/JapaneseG2P.py:64-150``);
our in-image fallback reads kanji through the bundled lexicon
(data/ja_readings.json) and raises on anything outside it. This script
turns "everyday kanji text works" from a claim into numbers:

* sentence hit rate — fraction of corpus sentences that synthesize
  end-to-end (no UnreadableJapaneseError),
* accent coverage — fraction of accent-phrase word matches that carry a
  hand-authored pitch-accent type (the rest synthesize heiban),
* the distinct unreadable kanji, by corpus frequency.

Corpus: tests/data/ja_corpus.txt — ~120 hand-written everyday sentences
(weather, travel, errands, work, school, feelings; written against the
domain, not against the lexicon). The initial corpus run measured 79%
sentences / 84.5% kanji runs, which drove a +390-word (+301-accent)
lexicon batch; numbers printed by this script are the current state.
"""
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genie_tts_tpu.frontend.g2p_ja import (   # noqa: E402
    UnreadableJapaneseError, _is_kanji, _kanji_to_kana_spans,
    _load_readings, japanese_to_phone_strs,
)


def main():
    corpus = (Path(__file__).resolve().parent.parent / "tests" / "data"
              / "ja_corpus.txt").read_text(encoding="utf-8").splitlines()
    corpus = [s.strip() for s in corpus if s.strip()]
    words, chars, _, _ = _load_readings()

    ok, bad_sent = 0, []
    missing = Counter()
    spans_total = spans_accented = 0
    for sent in corpus:
        try:
            japanese_to_phone_strs(sent, use_openjtalk=False)
            ok += 1
            for run in sent.replace("、", "。").split("。"):
                if any(_is_kanji(c) for c in run):
                    _, spans = _kanji_to_kana_spans(run)
                    spans_total += len(spans)
                    spans_accented += sum(
                        1 for _, a in spans if a is not None)
        except UnreadableJapaneseError:
            bad = [c for c in sent if _is_kanji(c)
                   and c not in words and c not in chars]
            missing.update(bad)
            bad_sent.append((sent, "".join(sorted(set(bad)))))

    print(f"sentences: {ok}/{len(corpus)} = {100*ok/len(corpus):.1f}% "
          "synthesize end-to-end")
    print(f"accent coverage: {spans_accented}/{spans_total} = "
          f"{100*spans_accented/max(spans_total,1):.1f}% of word matches "
          "carry an accent type (rest synthesize heiban)")
    if missing:
        print("unreadable kanji (corpus frequency):",
              " ".join(f"{k}x{v}" for k, v in missing.most_common(20)))
    for s, ch in bad_sent:
        print(f"  MISS {ch}: {s}")


if __name__ == "__main__":
    main()
