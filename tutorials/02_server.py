"""Tutorial 2 — HTTP streaming server round trip (parity with the
reference's ``Tutorial/English/API Server Tutorial``).

Starts the server in-process, streams ``/tts`` PCM16 chunks over chunked
transfer encoding, and writes them to a wav file.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json
import threading
import urllib.request

from genie_tts_tpu.server.http import start_server, stop_server
from genie_tts_tpu.utils.wavio import write_wav

HOST, PORT = "127.0.0.1", 8000
SAMPLE_RATE = 32000

server = start_server(host=HOST, port=PORT, block=False)


def post(path, payload):
    req = urllib.request.Request(
        f"http://{HOST}:{PORT}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=600)


post("/load_character", {
    "character_name": "mika",
    "model_dir": "GenieData/CharacterModels/mika/tts_models",
    "language": "ja",
})
post("/set_reference_audio", {
    "character_name": "mika",
    "audio_path": "GenieData/CharacterModels/mika/prompt_wav/normal.wav",
    "audio_text": "こんにちは、今日はいい天気ですね。",
    "language": "ja",
})

resp = post("/tts", {
    "character_name": "mika",
    "text": "ストリーミング配信のテストです。一文ずつ音声が届きます。",
    "split_sentence": True,
})

import numpy as np

chunks = []
while True:
    data = resp.read(65536)
    if not data:
        break
    chunks.append(data)
pcm = b"".join(chunks)
audio = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
write_wav("output/server_stream.wav", audio, SAMPLE_RATE)
print(f"streamed {len(pcm)} bytes -> output/server_stream.wav")
stop_server()
