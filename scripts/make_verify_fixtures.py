"""Build FULL-SIZE GPT-SoVITS-shaped random torch checkpoints + GenieData."""
import sys, numpy as np, torch
sys.path.insert(0, "/root/repo")

g = torch.Generator().manual_seed(0)
def R(*s, scale=0.05):
    return torch.randn(*s, generator=g) * scale

# ---- T2S .ckpt (24L x 512)
ck = {}
ck["model.ar_text_embedding.word_embeddings.weight"] = R(732, 512)
ck["model.ar_audio_embedding.word_embeddings.weight"] = R(1025, 512)
ck["model.ar_text_position.alpha"] = torch.ones(1)
ck["model.ar_audio_position.alpha"] = torch.ones(1)
ck["model.bert_proj.weight"] = R(512, 1024); ck["model.bert_proj.bias"] = R(512)
ck["model.ar_predict_layer.weight"] = R(1025, 512)
for i in range(24):
    p = f"model.h.layers.{i}"
    ck[f"{p}.self_attn.in_proj_weight"] = R(1536, 512)
    ck[f"{p}.self_attn.in_proj_bias"] = R(1536)
    ck[f"{p}.self_attn.out_proj.weight"] = R(512, 512)
    ck[f"{p}.self_attn.out_proj.bias"] = R(512)
    ck[f"{p}.linear1.weight"] = R(2048, 512); ck[f"{p}.linear1.bias"] = R(2048)
    ck[f"{p}.linear2.weight"] = R(512, 2048); ck[f"{p}.linear2.bias"] = R(512)
    ck[f"{p}.norm1.weight"] = torch.ones(512); ck[f"{p}.norm1.bias"] = torch.zeros(512)
    ck[f"{p}.norm2.weight"] = torch.ones(512); ck[f"{p}.norm2.bias"] = torch.zeros(512)
torch.save({"weight": ck}, "/tmp/verify_e2e/model.ckpt")

# ---- SoVITS .pth (full v2 geometry)
sd = {}
def T(key, *s, scale=0.05): sd[key] = R(*s, scale=scale)
def conv(key, co, ci, k): T(f"{key}.weight", co, ci, k); T(f"{key}.bias", co)
def wn(key, co, ci, k):
    T(f"{key}.weight_v", co, ci, k)
    sd[f"{key}.weight_g"] = torch.abs(R(co, 1, 1, scale=0.3)) + 0.7
    T(f"{key}.bias", co)
C, F, MR = 192, 768, 512
T("quantizer.vq.layers.0._codebook.embed", 1024, 768)
T("ssl_proj.weight", 768, 768, 2); T("ssl_proj.bias", 768)
conv("enc_p.ssl_proj", C, 768, 1)
T("enc_p.text_embedding.weight", 732, C)
for enc, n in (("encoder_ssl", 3), ("encoder_text", 6), ("encoder2", 3)):
    for i in range(n):
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            conv(f"enc_p.{enc}.attn_layers.{i}.{nm}", C, C, 1)
        T(f"enc_p.{enc}.attn_layers.{i}.emb_rel_k", 1, 9, C // 2)
        T(f"enc_p.{enc}.attn_layers.{i}.emb_rel_v", 1, 9, C // 2)
        for li in (1, 2):
            sd[f"enc_p.{enc}.norm_layers_{li}.{i}.gamma"] = torch.ones(C)
            sd[f"enc_p.{enc}.norm_layers_{li}.{i}.beta"] = torch.zeros(C)
        conv(f"enc_p.{enc}.ffn_layers.{i}.conv_1", F, C, 3)
        conv(f"enc_p.{enc}.ffn_layers.{i}.conv_2", C, F, 3)
for nm, co, ci in (("c_pre", MR, C), ("text_pre", MR, C), ("c_post", C, MR)):
    conv(f"enc_p.mrte.{nm}", co, ci, 1)
for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
    conv(f"enc_p.mrte.cross_attention.{nm}", MR, MR, 1)
conv("enc_p.proj", 384, C, 1)
for i in (0, 2, 4, 6):
    conv(f"flow.flows.{i}.pre", C, 96, 1)
    conv(f"flow.flows.{i}.post", 96, C, 1)
    wn(f"flow.flows.{i}.enc.cond_layer", 2 * C * 4, 512, 1)
    for j in range(4):
        wn(f"flow.flows.{i}.enc.in_layers.{j}", 2 * C, C, 5)
        wn(f"flow.flows.{i}.enc.res_skip_layers.{j}", 2 * C if j < 3 else C, C, 1)
conv("dec.conv_pre", 512, C, 7)
conv("dec.cond", 512, 512, 1)
ch = 512
for i, (u, k) in enumerate(zip((10, 8, 2, 2, 2), (16, 16, 8, 2, 2))):
    sd[f"dec.ups.{i}.weight_v"] = R(ch, ch // 2, k)
    sd[f"dec.ups.{i}.weight_g"] = torch.abs(R(ch, 1, 1, scale=0.3)) + 0.7
    T(f"dec.ups.{i}.bias", ch // 2)
    ch //= 2
    for j, kern in enumerate((3, 7, 11)):
        b = i * 3 + j
        for d in range(3):
            wn(f"dec.resblocks.{b}.convs1.{d}", ch, ch, kern)
            wn(f"dec.resblocks.{b}.convs2.{d}", ch, ch, kern)
sd["dec.conv_post.weight"] = R(1, ch, 7)
for nm, o, i_ in (("spectral.0.fc", 128, 1025), ("spectral.3.fc", 128, 128),
                  ("fc.fc", 512, 128)):
    T(f"ref_enc.{nm}.weight", o, i_); T(f"ref_enc.{nm}.bias", o)
for i in range(2):
    conv(f"ref_enc.temporal.{i}.conv1.conv", 256, 128, 5)
for nm in ("w_qs", "w_ks", "w_vs", "fc"):
    T(f"ref_enc.slf_attn.{nm}.weight", 128, 128); T(f"ref_enc.slf_attn.{nm}.bias", 128)
torch.save({"weight": sd}, "/tmp/verify_e2e/model.pth")
print("ckpt/pth written")

# ---- GenieData with full-size random HuBERT
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from genie_tts_tpu.config import HubertConfig
from genie_tts_tpu.models import hubert
from genie_tts_tpu.convert.io import save_params
import pathlib
gd = pathlib.Path("/tmp/verify_e2e/GenieData/chinese-hubert-base")
gd.mkdir(parents=True, exist_ok=True)
params = jax.jit(hubert.init_params, static_argnames=("cfg","dtype"))(
    jax.random.PRNGKey(0), cfg=HubertConfig(), dtype=jnp.float32)
save_params(params, gd / "hubert.safetensors")
print("GenieData hubert written")

# ---- reference wav (3.5 s noise-ish tone)
from genie_tts_tpu.utils.wavio import write_wav
t = np.arange(int(3.5 * 32000)) / 32000
audio = (0.2 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
write_wav("/tmp/verify_e2e/ref.wav", audio, 32000)
print("ref.wav written")
