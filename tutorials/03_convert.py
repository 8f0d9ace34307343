"""Tutorial 3 — converting GPT-SoVITS torch checkpoints (parity with the
reference's ``Tutorial/English/Model Conversion Tutorial``).

Input: the ``.ckpt`` (T2S GPT) and ``.pth`` (SoVITS) files produced by
GPT-SoVITS fine-tuning. Output: a character checkpoint directory with
fp16-on-disk safetensors for the JAX models (V2 or V2ProPlus detected by
the reference's size heuristic).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import genie_tts_tpu as genie

genie.convert_model(
    torch_ckpt_path="finetune_output/my_voice-e15.ckpt",
    torch_pth_path="finetune_output/my_voice_e8_s248.pth",
    output_dir="converted/my_voice",
    language="ja",
)

# The converted directory is immediately loadable:
genie.load_character("my_voice", "converted/my_voice", "ja")
print("converted + loaded")
