"""Operator-surface endpoints: converter jobs + log pane (GUI parity)."""
import json
import time
import urllib.error
import urllib.request

import pytest

from genie_tts_tpu.convert.torch_convert import find_checkpoints

PORT = 18521


class TestFindCheckpoints:
    def test_epoch_max(self, tmp_path):
        (tmp_path / "model_e3.ckpt").write_bytes(b"x")
        (tmp_path / "model_e12.ckpt").write_bytes(b"x")
        (tmp_path / "voice_e2.pth").write_bytes(b"x")
        (tmp_path / "voice_E8.pth").write_bytes(b"x")  # case-insensitive
        ckpt, pth = find_checkpoints(tmp_path)
        assert ckpt.name == "model_e12.ckpt"
        assert pth.name == "voice_E8.pth"

    def test_no_epoch_defaults_zero_mtime_tiebreak(self, tmp_path):
        a = tmp_path / "a.ckpt"
        b = tmp_path / "b.ckpt"
        a.write_bytes(b"x")
        time.sleep(0.02)
        b.write_bytes(b"x")
        ckpt, pth = find_checkpoints(tmp_path)
        assert ckpt.name == "b.ckpt"
        assert pth is None

    def test_ignores_other_files(self, tmp_path):
        (tmp_path / "readme.txt").write_bytes(b"x")
        assert find_checkpoints(tmp_path) == (None, None)


@pytest.fixture(scope="module")
def server():
    from genie_tts_tpu.server.http import start_server, stop_server

    srv = start_server(host="127.0.0.1", port=PORT, block=False)
    time.sleep(0.2)
    yield srv
    stop_server()


def _post(path, payload, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


class TestConvertEndpoint:
    def test_job_lifecycle(self, server, tmp_path, monkeypatch):
        from genie_tts_tpu.server import http as http_mod

        calls = {}

        def fake_convert(ckpt, pth, out, language="Japanese", version=None):
            calls["args"] = (str(ckpt), str(pth), str(out), language)
            return "v2"

        import genie_tts_tpu.convert.torch_convert as tc

        monkeypatch.setattr(tc, "convert_character", fake_convert)
        (tmp_path / "m_e5.ckpt").write_bytes(b"x")
        (tmp_path / "m_e5.pth").write_bytes(b"x")
        r = _post("/convert", {"folder": str(tmp_path),
                               "out": str(tmp_path / "char"), "language": "ja"})
        job_id = json.loads(r.read())["job_id"]
        for _ in range(100):
            jobs = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/convert_jobs", timeout=10).read())
            if jobs[job_id]["state"] != "running":
                break
            time.sleep(0.05)
        assert jobs[job_id]["state"] == "done"
        assert jobs[job_id]["version"] == "v2"
        assert calls["args"][3] == "ja"

    def test_missing_inputs_400(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post("/convert", {"out": "/tmp/x"})
        assert e.value.code == 400

    def test_empty_folder_400(self, server, tmp_path):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post("/convert", {"folder": str(tmp_path), "out": "/tmp/x"})
        assert e.value.code == 400

    def test_failed_job_reports(self, server, tmp_path, monkeypatch):
        import genie_tts_tpu.convert.torch_convert as tc

        def boom(*a, **k):
            raise RuntimeError("bad checkpoint")

        monkeypatch.setattr(tc, "convert_character", boom)
        (tmp_path / "x.ckpt").write_bytes(b"x")
        (tmp_path / "x.pth").write_bytes(b"x")
        r = _post("/convert", {"folder": str(tmp_path), "out": str(tmp_path / "o")})
        job_id = json.loads(r.read())["job_id"]
        for _ in range(100):
            jobs = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/convert_jobs", timeout=10).read())
            if jobs[job_id]["state"] != "running":
                break
            time.sleep(0.05)
        assert jobs[job_id]["state"] == "failed"
        assert "bad checkpoint" in jobs[job_id]["error"]


class TestLogsEndpoint:
    def test_logs_capture(self, server):
        import logging

        logging.getLogger("genie_tts_tpu.test").info("hello from the pane")
        r = urllib.request.urlopen(f"http://127.0.0.1:{PORT}/logs", timeout=10)
        lines = json.loads(r.read())["lines"]
        assert any("hello from the pane" in ln for ln in lines)

    def test_ui_mentions_panes(self, server):
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}/", timeout=10).read().decode()
        assert "Convert checkpoints" in html and "Server logs" in html
