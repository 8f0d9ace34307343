"""Tutorial 1 — basic inference (parity with the reference's
``Tutorial/English/Inference Tutorial``).

Prerequisites: a converted character checkpoint directory (see tutorial 3)
and the shared GenieData assets (``genie.download_genie_data()``).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import genie_tts_tpu as genie

# 1. Load a character (a directory of t2s/vits safetensors + config.json).
genie.load_character(
    character_name="mika",
    model_dir="GenieData/CharacterModels/mika/tts_models",
    language="ja",
)

# 2. Register the voice-cloning reference clip (3-10 s recommended).
genie.set_reference_audio(
    character_name="mika",
    audio_path="GenieData/CharacterModels/mika/prompt_wav/normal.wav",
    audio_text="こんにちは、今日はいい天気ですね。",
    language="ja",
)

# 3. Blocking synthesis to a wav file (32 kHz).
genie.tts(
    character_name="mika",
    text="これはテストです。音声合成の品質を確認しています。",
    split_sentence=True,
    save_path="output/mika_test.wav",
)
genie.wait_for_playback_done()
print("done -> output/mika_test.wav")
