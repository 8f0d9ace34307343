"""Command-line interface: synthesis, conversion, serving.

The reference ships a PySide6 GUI (``Main.py``); on headless TPU hosts the
equivalent operator surface is this CLI plus the HTTP server::

    python -m genie_tts_tpu tts --model DIR --lang ja --ref ref.wav \
        --ref-text "こんにちは" --text "こんにちは。" --out out.wav
    python -m genie_tts_tpu convert --ckpt model.ckpt --pth model.pth --out DIR
    python -m genie_tts_tpu serve --host 0.0.0.0 --port 8000
    python -m genie_tts_tpu download
"""
from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    parser = argparse.ArgumentParser(prog="genie_tts_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("tts", help="synthesize text to a wav file")
    p.add_argument("--model", required=True, help="character checkpoint dir")
    p.add_argument("--lang", default="ja")
    p.add_argument("--ref", required=True, help="reference audio path")
    p.add_argument("--ref-text", required=True, help="reference transcript")
    p.add_argument("--text", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--no-split", action="store_true")

    p = sub.add_parser("convert", help="convert torch checkpoints")
    p.add_argument("--ckpt", required=True, help="T2S .ckpt path")
    p.add_argument("--pth", required=True, help="SoVITS .pth path")
    p.add_argument("--out", required=True, help="output character dir")
    p.add_argument("--lang", default="ja")
    p.add_argument("--version", choices=["v2", "v2ProPlus"], default=None,
                   help="model version (default: auto-detect from keys)")

    p = sub.add_parser("serve", help="start the HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--warmup", metavar="MODEL_DIR", default=None,
                   help="character dir to pre-compile the full bucket "
                        "ladder for before accepting requests")
    p.add_argument("--warmup-lang", default="ja")
    p.add_argument("--warmup-ref", default=None,
                   help="reference wav for warmup (defaults to 5s silence)")
    p.add_argument("--warmup-ref-text", default="こんにちは")

    sub.add_parser("download", help="download shared GenieData assets")

    args = parser.parse_args(argv)

    import genie_tts_tpu as genie

    if args.cmd == "tts":
        genie.load_character("cli", args.model, args.lang)
        genie.set_reference_audio("cli", args.ref, args.ref_text, args.lang)
        genie.tts("cli", args.text, split_sentence=not args.no_split,
                  save_path=args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "convert":
        from genie_tts_tpu.convert.torch_convert import convert_character

        convert_character(args.ckpt, args.pth, args.out, language=args.lang,
                          version=args.version)
        print(f"converted -> {args.out}")
    elif args.cmd == "serve":
        if args.warmup:
            from genie_tts_tpu import api
            from genie_tts_tpu.runtime.engine import make_random_reference

            char = api.model_manager.load_character(
                "warmup", args.warmup, args.warmup_lang)
            if args.warmup_ref:
                api.set_reference_audio("warmup", args.warmup_ref,
                                        args.warmup_ref_text, args.warmup_lang)
                ref = api.reference_audio_cache.get_features(
                    api.engine, char,
                    args.warmup_ref, args.warmup_ref_text, args.warmup_lang,
                    hubert_fn=api._hubert_fn())
            else:
                ref = make_random_reference(char, api.engine, ref_seconds=5.0)
            n = api.engine.warmup(char, ref, sweep=True)
            print(f"warmup: compiled {n} graphs")
        genie.start_server(host=args.host, port=args.port)
    elif args.cmd == "download":
        genie.download_genie_data()
    return 0


if __name__ == "__main__":
    sys.exit(main())
