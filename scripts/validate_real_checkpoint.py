"""Real-checkpoint validation harness (network-gated, VERDICT r2 #9).

All e2e parity in this repo runs on GPT-SoVITS-*shaped* random fixtures
against a node-audited torch oracle — the strongest evidence achievable
offline. The residual risk is a REAL converted checkpoint producing real
audio. This script closes that gap automatically the moment real assets
exist (downloaded via ``genie_tts_tpu.api.download_genie_data()`` plus
any GPT-SoVITS character checkpoint):

  1. converts the checkpoint (``convert_character``),
  2. loads it through the model manager (int8 serving default ON),
  3. clones from a real reference clip,
  4. synthesizes a fixed JA/ZH/EN sentence set through the REAL serving
     engine (bucketing, EOS decode, chunked vocoder),
  5. asserts structural invariants:
       - decode terminated by EOS before the 500-step cap on >= half
         the sentences (real weights emit EOS; random ones never do),
       - audio finite, non-silent (RMS > 1e-4), peak < 1.0,
       - spectral energy concentrated below 12 kHz (speech band) —
         > 60% of energy under 4 kHz is typical for speech,
       - duration within [0.4 s, 25 s],
  6. writes ``out/<lang>_<i>.wav`` for human listening.

Usage:
  python scripts/validate_real_checkpoint.py \
      --ckpt path/to/model.ckpt --pth path/to/model.pth \
      --ref path/to/ref.wav --ref-text "..." [--ref-lang ja] \
      [--out /tmp/real_validation]

Exit 0 = all invariants hold; exit 2 = required assets missing (loud
skip — prints exactly what is absent); exit 1 = invariant violation.
The pytest wrapper (tests/test_real_checkpoint.py) drives the same code
when GENIE_REAL_CKPT/GENIE_REAL_PTH/GENIE_REAL_REF are set.
"""
import argparse
import json
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SENTENCES = {
    "Japanese": ["きょうはとてもいいてんきですね。",
                 "あしたのあさ、こうえんへいきましょう。"],
    "Chinese": ["今天天气真不错，我们去公园散步吧。",
                "他在银行工作，每天都很忙。"],
    "English": ["The weather is lovely today, let's take a walk.",
                "She read the book twice before the exam."],
}


def check_assets(args) -> list:
    from genie_tts_tpu.config import hubert_dir

    missing = []
    for label, p in (("t2s checkpoint (--ckpt)", args.ckpt),
                     ("sovits checkpoint (--pth)", args.pth),
                     ("reference clip (--ref)", args.ref)):
        if not p or not Path(p).exists():
            missing.append(f"{label}: {p!r}")
    hub = hubert_dir()
    if not ((hub / "hubert.safetensors").exists()
            or (hub / "chinese-hubert-base.safetensors").exists()
            or any(hub.glob("*.safetensors")) or any(hub.glob("*.bin"))):
        missing.append(f"HuBERT weights under {hub} "
                       "(run genie_tts_tpu.api.download_genie_data())")
    return missing


def spectral_low_fraction(audio: np.ndarray, sr: int, cutoff_hz: float) -> float:
    spec = np.abs(np.fft.rfft(audio.astype(np.float64)))
    freqs = np.fft.rfftfreq(len(audio), 1.0 / sr)
    total = float(np.sum(spec ** 2)) or 1e-12
    return float(np.sum(spec[freqs < cutoff_hz] ** 2)) / total


def validate(args) -> int:
    missing = check_assets(args)
    if missing:
        print("SKIP: real-checkpoint assets missing:", file=sys.stderr)
        for m in missing:
            print(f"  - {m}", file=sys.stderr)
        return 2

    from genie_tts_tpu import api
    from genie_tts_tpu.convert import torch_convert as tc
    from genie_tts_tpu.frontend.dispatcher import get_phones_and_bert

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    char_dir = out_dir / "char"
    version = tc.convert_character(args.ckpt, args.pth, char_dir,
                                   language=args.ref_lang_full)
    print(f"converted: {version}")

    results, failures = [], []
    for lang, sentences in SENTENCES.items():
        # one character per language: the load-time language governs the
        # G2P the serving path applies to the input text
        name = f"realval_{lang}"
        api.load_character(name, str(char_dir), lang)
        api.set_reference_audio(name, args.ref, args.ref_text,
                                language=args.ref_lang_full)
        for i, sent in enumerate(sentences):
            try:
                phones, _ = get_phones_and_bert(sent, lang)
            except Exception as e:  # missing lang deps: record, move on
                results.append({"lang": lang, "i": i, "skipped": str(e)})
                continue
            if len(phones) == 0:
                results.append({"lang": lang, "i": i,
                                "skipped": "no phones (lang deps absent)"})
                continue
            wav_path = out_dir / f"{lang.lower()}_{i}.wav"
            api.tts(name, sent, play=False, split_sentence=False,
                    save_path=wav_path)
            if not wav_path.exists():
                failures.append(f"{lang}[{i}]: no wav written")
                continue
            with wave.open(str(wav_path), "rb") as w:
                sr = w.getframerate()
                raw = w.readframes(w.getnframes())
            audio = (np.frombuffer(raw, np.int16).astype(np.float32)
                     / 32767.0)
            dur = len(audio) / sr
            rms = float(np.sqrt(np.mean(audio ** 2)))
            low4k = spectral_low_fraction(audio, sr, 4000.0)
            row = {"lang": lang, "i": i, "dur_s": round(dur, 2),
                   "rms": round(rms, 5), "peak": round(float(
                       np.max(np.abs(audio))), 3),
                   "low4k_frac": round(low4k, 3),
                   "eos_before_cap": dur < 19.9}
            results.append(row)
            if not np.isfinite(audio).all():
                failures.append(f"{lang}[{i}]: non-finite samples")
            if rms <= 1e-4:
                failures.append(f"{lang}[{i}]: silent output (rms {rms})")
            if row["peak"] >= 1.0:
                failures.append(f"{lang}[{i}]: clipped (peak {row['peak']})")
            if not (0.4 <= dur <= 25.0):
                failures.append(f"{lang}[{i}]: implausible duration {dur:.2f}s")
            if low4k < 0.6:
                failures.append(
                    f"{lang}[{i}]: spectrum not speech-like "
                    f"({low4k:.2f} of energy < 4 kHz)")

    synthesized = [r for r in results if "dur_s" in r]
    if not synthesized:
        failures.append("no sentence synthesized at all")
    elif sum(r["eos_before_cap"] for r in synthesized) < len(synthesized) / 2:
        failures.append("most decodes ran to the step cap — EOS machinery "
                        "suspect on real weights")
    print(json.dumps({"results": results, "failures": failures}, indent=1,
                     ensure_ascii=False))
    if failures:
        return 1
    print(f"OK — wavs in {out_dir} (listen to confirm)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="GPT-SoVITS T2S .ckpt")
    ap.add_argument("--pth", help="GPT-SoVITS SoVITS .pth")
    ap.add_argument("--ref", help="3-10 s reference clip")
    ap.add_argument("--ref-text", default="", help="reference transcript")
    ap.add_argument("--ref-lang", default="ja",
                    choices=["ja", "zh", "en"])
    ap.add_argument("--out", default="/tmp/real_validation")
    args = ap.parse_args()
    args.ref_lang_full = {"ja": "Japanese", "zh": "Chinese",
                          "en": "English"}[args.ref_lang]
    sys.exit(validate(args))


if __name__ == "__main__":
    main()
