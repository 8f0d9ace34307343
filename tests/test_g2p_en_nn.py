"""Neural English OOV G2P + word segmenter tests.

The GRU math is verified against torch.nn.GRUCell as an independent
oracle (same weights, same layout as the public g2p-en checkpoint);
the segmenter against hand-computed corpus scores.
"""
import numpy as np
import pytest

from genie_tts_tpu.frontend.g2p_en_nn import (
    GRAPHEMES, PHONEMES, NeuralG2P, WordSegmenter,
)


def _random_npz(tmp_path, E=8, H=16, seed=0):
    rng = np.random.default_rng(seed)
    nG, nP = len(GRAPHEMES), len(PHONEMES)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.4  # noqa: E731
    data = {
        "enc_emb": r(nG, E),
        "enc_w_ih": r(3 * H, E), "enc_w_hh": r(3 * H, H),
        "enc_b_ih": r(3 * H), "enc_b_hh": r(3 * H),
        "dec_emb": r(nP, E),
        "dec_w_ih": r(3 * H, E), "dec_w_hh": r(3 * H, H),
        "dec_b_ih": r(3 * H), "dec_b_hh": r(3 * H),
        "fc_w": r(nP, H), "fc_b": r(nP),
    }
    path = tmp_path / "checkpoint20.npz"
    np.savez(path, **data)
    return path, data


class TestNeuralG2P:
    def test_gru_cell_matches_torch(self, tmp_path):
        torch = pytest.importorskip("torch")
        path, d = _random_npz(tmp_path)
        model = NeuralG2P(path)
        cell = torch.nn.GRUCell(8, 16)
        with torch.no_grad():
            cell.weight_ih.copy_(torch.tensor(d["enc_w_ih"]))
            cell.weight_hh.copy_(torch.tensor(d["enc_w_hh"]))
            cell.bias_ih.copy_(torch.tensor(d["enc_b_ih"]))
            cell.bias_hh.copy_(torch.tensor(d["enc_b_hh"]))
        x = np.random.default_rng(1).standard_normal((1, 8)).astype(np.float32)
        h = np.random.default_rng(2).standard_normal((1, 16)).astype(np.float32)
        ours = model._cell(x, h, d["enc_w_ih"], d["enc_w_hh"],
                           d["enc_b_ih"], d["enc_b_hh"])
        with torch.no_grad():
            ref = cell(torch.tensor(x), torch.tensor(h)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_predict_matches_torch_seq2seq(self, tmp_path):
        torch = pytest.importorskip("torch")
        path, d = _random_npz(tmp_path, seed=3)
        model = NeuralG2P(path)
        word = "zylophonic"

        def mk(prefix):
            cell = torch.nn.GRUCell(8, 16)
            with torch.no_grad():
                cell.weight_ih.copy_(torch.tensor(d[f"{prefix}_w_ih"]))
                cell.weight_hh.copy_(torch.tensor(d[f"{prefix}_w_hh"]))
                cell.bias_ih.copy_(torch.tensor(d[f"{prefix}_b_ih"]))
                cell.bias_hh.copy_(torch.tensor(d[f"{prefix}_b_hh"]))
            return cell

        enc, dec = mk("enc"), mk("dec")
        g2i = {g: i for i, g in enumerate(GRAPHEMES)}
        ids = [g2i.get(c, g2i["<unk>"]) for c in word] + [g2i["</s>"]]
        with torch.no_grad():
            h = torch.zeros(1, 16)
            for i in ids:
                h = enc(torch.tensor(d["enc_emb"][None, i]), h)
            x = torch.tensor(d["dec_emb"][None, PHONEMES.index("<s>")])
            ref = []
            for _ in range(20):
                h = dec(x, h)
                logits = h @ torch.tensor(d["fc_w"]).T + torch.tensor(d["fc_b"])
                idx = int(logits.argmax())
                if idx == PHONEMES.index("</s>"):
                    break
                ref.append(PHONEMES[idx])
                x = torch.tensor(d["dec_emb"][None, idx])
        assert model.predict(word) == ref

    def test_predict_outputs_valid_phonemes(self, tmp_path):
        path, _ = _random_npz(tmp_path, seed=4)
        model = NeuralG2P(path)
        for w in ("brexit", "zylophonic", "qwzz"):
            pron = model.predict(w)
            assert len(pron) <= 20
            assert all(p in PHONEMES for p in pron)

    def test_missing_tensor_raises(self, tmp_path):
        path, d = _random_npz(tmp_path)
        d.pop("fc_b")
        bad = tmp_path / "bad.npz"
        np.savez(bad, **d)
        with pytest.raises(KeyError):
            NeuralG2P(bad)

    def test_oov_routes_through_neural(self, tmp_path, monkeypatch):
        """A deterministic checkpoint (fc picks a constant phoneme) proves
        word_to_phones routes OOV words through the neural model."""
        path, d = _random_npz(tmp_path, seed=5)
        k_idx = PHONEMES.index("K")
        d["fc_w"] = np.zeros_like(d["fc_w"])
        d["fc_b"] = np.zeros_like(d["fc_b"])
        d["fc_b"][k_idx] = 10.0
        np.savez(path, **d)

        from genie_tts_tpu.frontend import g2p_en, g2p_en_nn

        monkeypatch.setattr(g2p_en_nn, "english_g2p_dir", lambda: tmp_path)
        g2p_en_nn.neural_g2p.cache_clear()
        g2p_en_nn.word_segmenter.cache_clear()
        try:
            pron = g2p_en.word_to_phones("zzqxv")
            assert pron == ["K"] * 20
        finally:
            g2p_en_nn.neural_g2p.cache_clear()
            g2p_en_nn.word_segmenter.cache_clear()


class TestWordSegmenter:
    def _seg(self):
        uni = {"hello": 2e7, "world": 1e7,
               "the": 5e8, "me": 2e8, "theme": 1e6,
               "new": 3e7, "york": 8e6, "city": 2e7}
        big = {"new york": 6e6}
        return WordSegmenter(uni, big)

    def test_unigram_split(self):
        assert self._seg().segment("helloworld") == ["hello", "world"]

    def test_prefers_whole_word_over_tiny_pieces(self):
        # theme as one word beats the + me (product of probabilities)
        assert self._seg().segment("theme") == ["theme"]

    def test_multiword(self):
        assert self._seg().segment("newyorkcity") == ["new", "york", "city"]

    def test_cleaning(self):
        assert self._seg().segment("Hello, WORLD!") == ["hello", "world"]

    def test_oov_score_formula(self):
        import math
        seg = self._seg()
        # reference: 10 / (TOTAL * 10**len) for unknown words
        got = seg._log_score("zzz", None)
        want = math.log10(10.0 / (WordSegmenter.TOTAL * 10 ** 3))
        assert abs(got - want) < 1e-9

    def test_bigram_score_formula(self):
        import math
        seg = self._seg()
        got = seg._log_score("york", "new")
        want = math.log10((6e6 / WordSegmenter.TOTAL)
                          / (3e7 / WordSegmenter.TOTAL))
        assert abs(got - want) < 1e-9

    def test_empty_and_nonalpha(self):
        assert self._seg().segment("") == []
        assert self._seg().segment("!!!") == []

    def test_segmentation_in_word_lookup(self, monkeypatch, tmp_path):
        """helloworld resolves via segmentation + dictionary."""
        from genie_tts_tpu.frontend import g2p_en, g2p_en_nn

        monkeypatch.setattr(g2p_en_nn, "word_segmenter", lambda: self._seg())
        monkeypatch.setattr(g2p_en_nn, "neural_g2p", lambda: None)
        monkeypatch.setattr(
            g2p_en, "_load_dict",
            lambda: {"hello": ["HH", "AH0", "L", "OW1"],
                     "world": ["W", "ER1", "L", "D"]})
        pron = g2p_en._word_to_phones_nohg("helloworld")
        assert pron == ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]
