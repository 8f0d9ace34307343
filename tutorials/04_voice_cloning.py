"""Tutorial 4 — voice cloning + streaming synthesis.

Demonstrates: V2ProPlus cloning (speaker-verification + prompt encoder),
sentence-level async streaming, and the server's intra-utterance chunk
streaming.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import asyncio

import genie_tts_tpu as genie

# A V2ProPlus character directory additionally contains
# prompt_encoder.safetensors; cloning uses the SV model from GenieData.
genie.load_character("pro", "converted/my_voice_pro", "zh")

# Any 3-10 s clip of the target voice with its transcript:
genie.set_reference_audio(
    "pro", "samples/target_voice.wav",
    "这是一段目标音色的参考音频。", "zh",
)

# Blocking synthesis (sentence-pipelined internally):
genie.tts("pro", "你好，这是用克隆音色合成的句子。今天天气真不错。",
          save_path="output/cloned.wav")


# Async streaming: PCM16 chunks arrive per vocoder chunk (sub-sentence
# latency), suitable for piping into a live audio sink or websocket.
async def stream_demo():
    total = 0
    async for chunk in genie.tts_async("pro", "流式合成的演示。",
                                       split_sentence=True):
        total += len(chunk)
        print(f"chunk: {len(chunk)} bytes (total {total})")

asyncio.run(stream_demo())
