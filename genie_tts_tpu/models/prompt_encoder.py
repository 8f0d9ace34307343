"""V2ProPlus prompt encoder — speaker conditioning from reference audio.

Role of the reference's ``prompt_encoder_fp32.onnx``
(``/root/reference/src/genie_tts/Data/v2ProPlus/Keys/prompt_encoder_weights.txt``,
23 weights; invoked at ``Audio/ReferenceAudio.py:68-76``):

  (ref_audio 32 kHz, sv_emb [20480]) ->
    ge          [B, 1024, 1]  (flow/decoder conditioning)
    ge_advanced [B,  512, 1]  (MRTE conditioning)

Pipeline: linear spectrogram -> MelStyleEncoder (style_vector_dim 1024)
-> + Linear(20480 -> 1024)(sv_emb) -> PReLU -> ge; ge_advanced =
Linear(1024 -> 512)(ge).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import SoVITSConfig
from .sovits import mel_style_encode

Params = Dict


def apply(params: Params, spec: jnp.ndarray, spec_len: jnp.ndarray,
          sv_emb: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """spec [B,T,1025], sv_emb [B,20480] -> (ge [B,1024,1], ge_adv [B,512,1])."""
    mask_t = (jnp.arange(spec.shape[1])[None, :] < spec_len[:, None]
              ).astype(spec.dtype)[..., None]
    ge = mel_style_encode(params["ref_enc"], spec, mask_t)     # [B,1024,1]
    sv = jnp.dot(sv_emb.astype(ge.dtype), params["sv_emb"]["w"]) + params["sv_emb"]["b"]
    ge = ge + sv[:, :, None]
    # PReLU with per-channel slope
    slope = params["prelu_weight"].reshape(1, -1, 1).astype(ge.dtype)
    ge = jnp.where(ge >= 0, ge, slope * ge)
    ge_adv = (jnp.einsum("bct,cd->bdt", ge, params["ge_to512"]["w"].astype(ge.dtype))
              + params["ge_to512"]["b"][None, :, None])
    return ge, ge_adv


def convert_from_torch(sd: Dict) -> Params:
    """Torch prompt-encoder state dict -> param tree (host-side)."""
    import numpy as np

    def lin(key):
        return {"w": sd[f"{key}.weight"].T, "b": sd[f"{key}.bias"]}

    return {
        "ref_enc": {
            "spectral0": lin("ref_enc.spectral.0.fc"),
            "spectral3": lin("ref_enc.spectral.3.fc"),
            "temporal": [
                {"w": np.transpose(sd[f"ref_enc.temporal.{i}.conv1.conv.weight"], (2, 1, 0)),
                 "b": sd[f"ref_enc.temporal.{i}.conv1.conv.bias"]}
                for i in range(2)],
            "w_qs": lin("ref_enc.slf_attn.w_qs"),
            "w_ks": lin("ref_enc.slf_attn.w_ks"),
            "w_vs": lin("ref_enc.slf_attn.w_vs"),
            "attn_fc": lin("ref_enc.slf_attn.fc"),
            "fc": lin("ref_enc.fc.fc"),
        },
        "sv_emb": lin("sv_emb"),
        "ge_to512": lin("ge_to512"),
        "prelu_weight": sd["prelu.weight"],
    }


def init_params(key: jax.Array, cfg: SoVITSConfig, dtype=jnp.bfloat16,
                gin: int = 1024, mrte_dim: int = 512) -> Params:
    ks = iter(jax.random.split(key, 16))

    def dense(k, i, o):
        return {"w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    return {
        "ref_enc": {
            "spectral0": dense(next(ks), cfg.spec_channels, 128),
            "spectral3": dense(next(ks), 128, 128),
            "temporal": [
                {"w": (jax.random.normal(next(ks), (5, 128, 256)) * 0.04).astype(dtype),
                 "b": jnp.zeros((256,), dtype)} for _ in range(2)],
            "w_qs": dense(next(ks), 128, 128),
            "w_ks": dense(next(ks), 128, 128),
            "w_vs": dense(next(ks), 128, 128),
            "attn_fc": dense(next(ks), 128, 128),
            "fc": dense(next(ks), 128, gin),
        },
        "sv_emb": dense(next(ks), cfg.sv_dim, gin),
        "ge_to512": dense(next(ks), gin, mrte_dim),
        "prelu_weight": jnp.full((gin,), 0.25, jnp.float32),
    }
