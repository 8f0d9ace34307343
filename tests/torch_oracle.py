"""Independent torch oracle for full-model e2e parity.

Hand-written GPT-SoVITS inference modules in plain torch, consuming the
ORIGINAL ``.ckpt``/``.pth`` state dicts (the converter's input), used to
verify that our converted checkpoints + JAX pipeline reproduce the
reference pipeline end-to-end. The reference itself ships only ONNX
graphs; every semantic choice here was audited operator-by-operator
against those graphs with ``scripts/onnx_inspect.py``:

* T2S sampling chain (rep-penalty 1.35 over all seen ids, top-k 15,
  temperature 1.0, stop = argmax(raw)==1024 | sampled==1024):
  ``t2s_first_stage_decoder_fp32.onnx`` nodes 1785-1821 and
  ``t2s_stage_decoder_fp32.onnx`` nodes 1773-1821.
* Sinusoidal positions are 1-based (CumSum of ones) with x_scale=1.0 and
  interleaved sin/cos: ``t2s_encoder_fp32.onnx`` nodes 63-83.
* VQ prompt extraction = Conv(k2,s2) + plain L2 argmin:
  ``t2s_encoder_fp32.onnx`` nodes 2-36.
* SoVITS: noise_scale 0.5 (``vits_fp32.onnx`` node 6494), MRTE 4 heads
  with +c_pre +ge residual (nodes 4960-4961), flow reverse starting at
  the last Flip (node 6500), final HiFi-GAN leaky slope 0.01 (node 8450),
  in-graph STFT n_fft=2048 hop=640 (nodes 33-36).

Intentional divergence from the ONNX graphs (matching upstream
GPT-SoVITS torch instead): EOS is masked on the very first sampled
token, so empty utterances cannot occur; the graphs only guard EOS via
the stage-decoder stop flag.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, key):
    v = sd[key]
    return v if isinstance(v, torch.Tensor) else torch.as_tensor(v)


def _wn(sd, key):
    """Fused weight-normed kernel via torch's own op (dim=0)."""
    return torch._weight_norm(_t(sd, f"{key}.weight_v"),
                              _t(sd, f"{key}.weight_g"), 0)


# ---------------------------------------------------------------------------
# Positional embedding (1-based, interleaved sin/cos, x_scale=1)
# ---------------------------------------------------------------------------

def pe_table(n: int, d: int) -> torch.Tensor:
    pos = torch.arange(1, n + 1, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / d))
    pe = torch.zeros(n, d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


# ---------------------------------------------------------------------------
# T2S oracle
# ---------------------------------------------------------------------------

def vq_extract_prompt(pth_sd, ssl_content: torch.Tensor) -> torch.Tensor:
    """HuBERT features [1, T, 768] -> semantic ids [1, T//2]."""
    sd = {k.removeprefix("vq_model."): v for k, v in pth_sd.items()}
    x = F.conv1d(ssl_content.transpose(1, 2).float(),
                 _t(sd, "ssl_proj.weight").float(),
                 _t(sd, "ssl_proj.bias").float(), stride=2)
    x = x.transpose(1, 2)                        # [1, T2, 768]
    cb = _t(sd, "quantizer.vq.layers.0._codebook.embed").float()
    d = (x.pow(2).sum(-1, keepdim=True)
         - 2.0 * x @ cb.T
         + cb.pow(2).sum(-1)[None, None, :])
    return d.argmin(-1)


class T2SOracle:
    """Greedy/sampled AR decode by full-sequence recomputation each step
    (no KV cache — an intentionally different algorithm from the JAX
    while_loop implementation, same function)."""

    def __init__(self, ckpt_sd, num_layers: int, d_model: int, n_heads: int,
                 ffn_dim: int):
        sd = {k.removeprefix("model."): _t(ckpt_sd, k).float()
              for k in ckpt_sd}
        self.sd = sd
        self.H = n_heads
        self.layers = []
        for i in range(num_layers):
            layer = torch.nn.TransformerEncoderLayer(
                d_model, n_heads, dim_feedforward=ffn_dim, dropout=0.0,
                batch_first=True, norm_first=False)
            pre = f"h.layers.{i}."
            layer.load_state_dict(
                {k.removeprefix(pre): v for k, v in sd.items()
                 if k.startswith(pre)})
            layer.eval()
            self.layers.append(layer)

    def _embed_text(self, phones: torch.Tensor, bert: torch.Tensor):
        sd = self.sd
        x = sd["ar_text_embedding.word_embeddings.weight"][phones]
        x = x + bert.float() @ sd["bert_proj.weight"].T + sd["bert_proj.bias"]
        x = x + sd["ar_text_position.alpha"] * pe_table(x.shape[1], x.shape[2])
        return x

    def _forward(self, x: torch.Tensor, y_ids: torch.Tensor) -> torch.Tensor:
        """Full [text | audio] pass; returns raw logits at the last position."""
        sd = self.sd
        y = sd["ar_audio_embedding.word_embeddings.weight"][y_ids]
        y = y + sd["ar_audio_position.alpha"] * pe_table(y.shape[1], y.shape[2])
        h = torch.cat([x, y], dim=1)
        Sx, S = x.shape[1], h.shape[1]
        # GPT-SoVITS mask: text attends text (bidirectional); audio attends
        # text + causally to audio. torch convention: True = NOT attend.
        i = torch.arange(S)[:, None]
        j = torch.arange(S)[None, :]
        allowed = torch.where(i < Sx, j < Sx, (j < Sx) | (j <= i))
        mask = ~allowed
        with torch.no_grad():
            for layer in self.layers:
                h = layer(h, src_mask=mask)
        return h[:, -1] @ sd["ar_predict_layer.weight"].T

    @staticmethod
    def _penalize(logits: torch.Tensor, seen_ids, penalty: float):
        out = logits.clone()
        ids = torch.as_tensor(sorted(seen_ids), dtype=torch.long)
        vals = out[0, ids]
        out[0, ids] = torch.where(vals < 0, vals * penalty, vals / penalty)
        return out

    def generate(self, phones, bert, prompts, max_steps: int,
                 eos_id: int = 1024, repetition_penalty: float = 1.35):
        """Greedy decode. Returns (codes 1-D np.int32 after the reference's
        finalize quirks, raw emitted token list)."""
        x = self._embed_text(phones, bert)
        y = prompts.clone()
        seen = set(prompts[0].tolist())
        emitted = []
        for step in range(max_steps):
            logits = self._forward(x, y)                     # [1, V] raw
            stop_argmax = int(logits.argmax(-1)) == eos_id and step > 0
            filt = self._penalize(logits, seen, repetition_penalty)
            if step == 0:
                filt[0, eos_id] = -1e10                      # first-step EOS mask
            tok = int(filt.argmax(-1))
            emitted.append(tok)
            seen.add(tok)
            y = torch.cat([y, torch.tensor([[tok]])], dim=1)
            if stop_argmax or tok == eos_id:
                break
        # reference finalize (Core/Inference.py:41-44,108): last token -> 0,
        # then trim at the first remaining id >= eos
        codes = np.asarray(emitted, np.int32)
        if len(codes):
            codes[-1] = 0
        bad = np.nonzero(codes >= eos_id)[0]
        if len(bad):
            codes = codes[: bad[0]]
        return codes, emitted


# ---------------------------------------------------------------------------
# SoVITS oracle ([B, C, T] torch conv layout throughout)
# ---------------------------------------------------------------------------

def _ln_ct(x, gamma, beta):
    """VITS LayerNorm over channels of [B, C, T]."""
    y = F.layer_norm(x.transpose(1, -1), (x.shape[1],), gamma, beta, 1e-5)
    return y.transpose(1, -1)


def _conv(sd, key, x, **kw):
    return F.conv1d(x, _t(sd, f"{key}.weight").float(),
                    _t(sd, f"{key}.bias").float() if f"{key}.bias" in sd else None,
                    **kw)


def _rel_table(emb, T: int, window: int) -> torch.Tensor:
    """[1, 2*window+1, Dh] -> dense [T, T, Dh]; zero outside the window
    (VITS zero-pads relative embeddings beyond +-window)."""
    Dh = emb.shape[-1]
    tab = torch.zeros(T, T, Dh)
    for i in range(T):
        for j in range(T):
            d = j - i
            if -window <= d <= window:
                tab[i, j] = emb[0, d + window]
    return tab


def _rel_attention(sd, pre, x, attn_mask, n_heads: int, window: int = 4):
    """VITS relative-position self-attention on [B, C, T]."""
    B, C, T = x.shape
    Dh = C // n_heads
    q = _conv(sd, f"{pre}.conv_q", x).view(B, n_heads, Dh, T).transpose(2, 3)
    k = _conv(sd, f"{pre}.conv_k", x).view(B, n_heads, Dh, T).transpose(2, 3)
    v = _conv(sd, f"{pre}.conv_v", x).view(B, n_heads, Dh, T).transpose(2, 3)
    scale = Dh ** -0.5
    scores = (q @ k.transpose(-2, -1)) * scale
    rel_k = _rel_table(_t(sd, f"{pre}.emb_rel_k").float(), T, window)
    scores = scores + torch.einsum("bhid,ijd->bhij", q, rel_k) * scale
    scores = scores.masked_fill(~attn_mask, -1e4)
    p = torch.softmax(scores, dim=-1)
    out = p @ v
    rel_v = _rel_table(_t(sd, f"{pre}.emb_rel_v").float(), T, window)
    out = out + torch.einsum("bhij,ijd->bhid", p, rel_v)
    out = out.transpose(2, 3).reshape(B, C, T)
    return _conv(sd, f"{pre}.conv_o", out)


def _encoder(sd, prefix, n_layers, x, mask, n_heads: int):
    """VITS rel-attn encoder stack. x [B,C,T]; mask [B,1,T] float."""
    attn_mask = (mask.unsqueeze(2) * mask.unsqueeze(-1)) > 0   # [B,1,T,T]
    x = x * mask
    for i in range(n_layers):
        y = _rel_attention(sd, f"{prefix}.attn_layers.{i}", x * mask,
                           attn_mask, n_heads)
        x = _ln_ct(x + y, _t(sd, f"{prefix}.norm_layers_1.{i}.gamma").float(),
                   _t(sd, f"{prefix}.norm_layers_1.{i}.beta").float())
        k1 = _t(sd, f"{prefix}.ffn_layers.{i}.conv_1.weight").shape[-1]
        y = _conv(sd, f"{prefix}.ffn_layers.{i}.conv_1", x * mask,
                  padding=(k1 - 1) // 2)
        y = torch.relu(y)
        k2 = _t(sd, f"{prefix}.ffn_layers.{i}.conv_2.weight").shape[-1]
        y = _conv(sd, f"{prefix}.ffn_layers.{i}.conv_2", y * mask,
                  padding=(k2 - 1) // 2)
        x = _ln_ct(x + y, _t(sd, f"{prefix}.norm_layers_2.{i}.gamma").float(),
                   _t(sd, f"{prefix}.norm_layers_2.{i}.beta").float())
    return x * mask


def _mrte(sd, ssl_enc, ssl_mask, text_enc, text_mask, ge, n_heads: int = 4):
    """vits_fp32.onnx nodes 4960-4961: conv_o(attn) + c_pre(ssl) + ge."""
    c = _conv(sd, "enc_p.mrte.c_pre", ssl_enc * ssl_mask)
    t = _conv(sd, "enc_p.mrte.text_pre", text_enc * text_mask)
    B, C, Ty = c.shape
    Tx = t.shape[-1]
    Dh = C // n_heads
    pre = "enc_p.mrte.cross_attention"
    q = _conv(sd, f"{pre}.conv_q", c).view(B, n_heads, Dh, Ty).transpose(2, 3)
    k = _conv(sd, f"{pre}.conv_k", t).view(B, n_heads, Dh, Tx).transpose(2, 3)
    v = _conv(sd, f"{pre}.conv_v", t).view(B, n_heads, Dh, Tx).transpose(2, 3)
    scores = (q @ k.transpose(-2, -1)) * Dh ** -0.5
    amask = (ssl_mask.unsqueeze(-1) * text_mask.unsqueeze(2)) > 0
    scores = scores.masked_fill(~amask, -1e4)
    o = (torch.softmax(scores, -1) @ v).transpose(2, 3).reshape(B, C, Ty)
    x = _conv(sd, f"{pre}.conv_o", o) + c + ge
    return _conv(sd, "enc_p.mrte.c_post", x * ssl_mask)


def _wavenet(sd, pre, x, mask, g, n_layers: int = 4, kernel: int = 5):
    hidden = x.shape[1]
    g_all = F.conv1d(g, _wn(sd, f"{pre}.cond_layer"),
                     _t(sd, f"{pre}.cond_layer.bias").float())
    out = torch.zeros_like(x)
    for i in range(n_layers):
        x_in = F.conv1d(x * mask, _wn(sd, f"{pre}.in_layers.{i}"),
                        _t(sd, f"{pre}.in_layers.{i}.bias").float(),
                        padding=(kernel - 1) // 2)
        acts = x_in + g_all[:, i * 2 * hidden:(i + 1) * 2 * hidden]
        h = torch.tanh(acts[:, :hidden]) * torch.sigmoid(acts[:, hidden:])
        rs = F.conv1d(h, _wn(sd, f"{pre}.res_skip_layers.{i}"),
                      _t(sd, f"{pre}.res_skip_layers.{i}.bias").float())
        if i < n_layers - 1:
            x = (x + rs[:, :hidden]) * mask
            out = out + rs[:, hidden:]
        else:
            out = out + rs
    return out * mask


def _flow_reverse(sd, x, mask, g, n_flows: int = 4):
    half = x.shape[1] // 2
    for i in reversed(range(n_flows)):
        x = torch.flip(x, [1])                    # the interleaved Flip flow
        pre = f"flow.flows.{2 * i}"
        x0, x1 = x[:, :half], x[:, half:]
        h = _conv(sd, f"{pre}.pre", x0) * mask
        h = _wavenet(sd, f"{pre}.enc", h, mask, g)
        m = _conv(sd, f"{pre}.post", h) * mask
        x = torch.cat([x0, (x1 - m) * mask], dim=1)
    return x


def _hifigan(sd, x, ge, upsample_rates=(10, 8, 2, 2, 2),
             upsample_kernels=(16, 16, 8, 2, 2),
             resblock_kernels=(3, 7, 11),
             dilations=((1, 3, 5),) * 3):
    LRELU = 0.1
    x = _conv(sd, "dec.conv_pre", x, padding=3)
    x = x + _conv(sd, "dec.cond", ge)
    n_k = len(resblock_kernels)
    for i, (u, ku) in enumerate(zip(upsample_rates, upsample_kernels)):
        x = F.leaky_relu(x, LRELU)
        x = F.conv_transpose1d(x, _wn(sd, f"dec.ups.{i}"),
                               _t(sd, f"dec.ups.{i}.bias").float(),
                               stride=u, padding=(ku - u) // 2)
        acc = None
        for j, (kern, dil) in enumerate(zip(resblock_kernels, dilations)):
            b = i * n_k + j
            h = x
            for d in dil:
                y = F.leaky_relu(h, LRELU)
                y = F.conv1d(y, _wn(sd, f"dec.resblocks.{b}.convs1.{dil.index(d)}"),
                             _t(sd, f"dec.resblocks.{b}.convs1.{dil.index(d)}.bias").float(),
                             padding=(kern * d - d) // 2, dilation=d)
                y = F.leaky_relu(y, LRELU)
                y = F.conv1d(y, _wn(sd, f"dec.resblocks.{b}.convs2.{dil.index(d)}"),
                             _t(sd, f"dec.resblocks.{b}.convs2.{dil.index(d)}.bias").float(),
                             padding=(kern - 1) // 2)
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / n_k
    # torch-default slope 0.01 on the final activation
    # (vits_fp32.onnx node 8450)
    x = F.leaky_relu(x, 0.01)
    x = F.conv1d(x, _t(sd, "dec.conv_post.weight").float(), None, padding=3)
    return torch.tanh(x)[:, 0]


def torch_spectrogram(audio: torch.Tensor, n_fft: int = 2048,
                      hop: int = 640) -> torch.Tensor:
    """GPT-SoVITS spectrogram_torch: reflect pad (n_fft-hop)/2, center=False.
    audio [B, S] -> [B, bins, T]."""
    pad = (n_fft - hop) // 2
    y = F.pad(audio[:, None], (pad, pad), mode="reflect")[:, 0]
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=n_fft,
                      window=torch.hann_window(n_fft), center=False,
                      return_complex=True)
    return torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-6)


def _mish(x):
    return x * torch.tanh(F.softplus(x))


def mel_style_encoder(sd, spec_bt: torch.Tensor, n_heads: int = 2):
    """MelStyleEncoder (v2 ref_enc). spec_bt [B, T, bins] -> ge [B, gin, 1]."""
    def lin(key, x):
        return x @ _t(sd, f"ref_enc.{key}.weight").float().T \
            + _t(sd, f"ref_enc.{key}.bias").float()

    x = _mish(lin("spectral.0.fc", spec_bt))
    x = _mish(lin("spectral.3.fc", x))
    # temporal Conv1dGLU blocks (residual), [B, C, T] conv layout
    x = x.transpose(1, 2)
    for i in range(2):
        h = _conv(sd, f"ref_enc.temporal.{i}.conv1.conv", x, padding=2)
        a, b = h.chunk(2, dim=1)
        x = x + a * torch.sigmoid(b)
    x = x.transpose(1, 2)                        # [B, T, C]
    B, T, C = x.shape
    Dh = C // n_heads
    q = lin("slf_attn.w_qs", x).view(B, T, n_heads, Dh).transpose(1, 2)
    k = lin("slf_attn.w_ks", x).view(B, T, n_heads, Dh).transpose(1, 2)
    v = lin("slf_attn.w_vs", x).view(B, T, n_heads, Dh).transpose(1, 2)
    p = torch.softmax((q @ k.transpose(-2, -1)) / Dh ** 0.5, dim=-1)
    o = (p @ v).transpose(1, 2).reshape(B, T, C)
    x = x + lin("slf_attn.fc", o)
    x = lin("fc.fc", x)
    return x.mean(dim=1)[:, :, None]


def sovits_oracle(pth_sd, codes: torch.Tensor, text_ids: torch.Tensor,
                  ref_audio_32k: torch.Tensor, noise_scale: float = 0.0,
                  enc_layers=(3, 6, 3), n_heads: int = 2):
    """codes [1,Tc] + text [1,Tx] + ref wav [1,S] -> waveform [1, 2*Tc*640]."""
    sd = {k.removeprefix("vq_model."): v for k, v in pth_sd.items()}
    ge = mel_style_encoder(sd, torch_spectrogram(ref_audio_32k).transpose(1, 2))
    q = _t(sd, "quantizer.vq.layers.0._codebook.embed").float()[codes]
    latent = q.transpose(1, 2).repeat_interleave(2, dim=2)   # [1,768,2Tc]
    ymask = torch.ones(1, 1, latent.shape[-1])
    tmask = torch.ones(1, 1, text_ids.shape[-1])
    y = _conv(sd, "enc_p.ssl_proj", latent * ymask) * ymask
    y = _encoder(sd, "enc_p.encoder_ssl", enc_layers[0], y, ymask, n_heads)
    t = _t(sd, "enc_p.text_embedding.weight").float()[text_ids].transpose(1, 2)
    t = _encoder(sd, "enc_p.encoder_text", enc_layers[1], t * tmask, tmask, n_heads)
    y = _mrte(sd, y, ymask, t, tmask, ge)
    y = _encoder(sd, "enc_p.encoder2", enc_layers[2], y, ymask, n_heads)
    stats = _conv(sd, "enc_p.proj", y) * ymask
    m, logs = stats.chunk(2, dim=1)
    z_p = m + torch.randn_like(m) * torch.exp(logs) * noise_scale
    z = _flow_reverse(sd, z_p * ymask, ymask, ge)
    with torch.no_grad():
        return _hifigan(sd, z * ymask, ge), ge
