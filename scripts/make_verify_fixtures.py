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

# ---- V2ProPlus fixture: full-size v2pp .pth (gin 1024, prompt-encoder
# tensors with the vq_model. prefix) + ERes2NetV2 SV checkpoint
sdpp = {}
def Tpp(key, *s, scale=0.05): sdpp[key] = R(*s, scale=scale)
def convpp(key, co, ci, k): Tpp(f"{key}.weight", co, ci, k); Tpp(f"{key}.bias", co)
def wnpp(key, co, ci, k):
    Tpp(f"{key}.weight_v", co, ci, k)
    sdpp[f"{key}.weight_g"] = torch.abs(R(co, 1, 1, scale=0.3)) + 0.7
    Tpp(f"{key}.bias", co)
GIN = 1024
Tpp("quantizer.vq.layers.0._codebook.embed", 1024, 768)
Tpp("ssl_proj.weight", 768, 768, 2); Tpp("ssl_proj.bias", 768)
convpp("enc_p.ssl_proj", C, 768, 1)
Tpp("enc_p.text_embedding.weight", 732, C)
for enc, n in (("encoder_ssl", 3), ("encoder_text", 6), ("encoder2", 3)):
    for i in range(n):
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            convpp(f"enc_p.{enc}.attn_layers.{i}.{nm}", C, C, 1)
        Tpp(f"enc_p.{enc}.attn_layers.{i}.emb_rel_k", 1, 9, C // 2)
        Tpp(f"enc_p.{enc}.attn_layers.{i}.emb_rel_v", 1, 9, C // 2)
        for li in (1, 2):
            sdpp[f"enc_p.{enc}.norm_layers_{li}.{i}.gamma"] = torch.ones(C)
            sdpp[f"enc_p.{enc}.norm_layers_{li}.{i}.beta"] = torch.zeros(C)
        convpp(f"enc_p.{enc}.ffn_layers.{i}.conv_1", F, C, 3)
        convpp(f"enc_p.{enc}.ffn_layers.{i}.conv_2", C, F, 3)
for nm, co, ci in (("c_pre", MR, C), ("text_pre", MR, C), ("c_post", C, MR)):
    convpp(f"enc_p.mrte.{nm}", co, ci, 1)
for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
    convpp(f"enc_p.mrte.cross_attention.{nm}", MR, MR, 1)
convpp("enc_p.proj", 384, C, 1)
for i in (0, 2, 4, 6):
    convpp(f"flow.flows.{i}.pre", C, 96, 1)
    convpp(f"flow.flows.{i}.post", 96, C, 1)
    wnpp(f"flow.flows.{i}.enc.cond_layer", 2 * C * 4, GIN, 1)
    for j in range(4):
        wnpp(f"flow.flows.{i}.enc.in_layers.{j}", 2 * C, C, 5)
        wnpp(f"flow.flows.{i}.enc.res_skip_layers.{j}", 2 * C if j < 3 else C, C, 1)
convpp("dec.conv_pre", 512, C, 7)
convpp("dec.cond", 512, GIN, 1)
ch = 512
for i, (u, k) in enumerate(zip((10, 8, 2, 2, 2), (16, 16, 8, 2, 2))):
    sdpp[f"dec.ups.{i}.weight_v"] = R(ch, ch // 2, k)
    sdpp[f"dec.ups.{i}.weight_g"] = torch.abs(R(ch, 1, 1, scale=0.3)) + 0.7
    Tpp(f"dec.ups.{i}.bias", ch // 2)
    ch //= 2
    for j, kern in enumerate((3, 7, 11)):
        b = i * 3 + j
        for d in range(3):
            wnpp(f"dec.resblocks.{b}.convs1.{d}", ch, ch, kern)
            wnpp(f"dec.resblocks.{b}.convs2.{d}", ch, ch, kern)
sdpp["dec.conv_post.weight"] = R(1, ch, 7)
for nm, o, i_ in (("spectral.0.fc", 128, 1025), ("spectral.3.fc", 128, 128),
                  ("fc.fc", GIN, 128)):
    Tpp(f"ref_enc.{nm}.weight", o, i_); Tpp(f"ref_enc.{nm}.bias", o)
for i in range(2):
    convpp(f"ref_enc.temporal.{i}.conv1.conv", 256, 128, 5)
for nm in ("w_qs", "w_ks", "w_vs", "fc"):
    Tpp(f"ref_enc.slf_attn.{nm}.weight", 128, 128)
    Tpp(f"ref_enc.slf_attn.{nm}.bias", 128)
Tpp("sv_emb.weight", GIN, 20480); Tpp("sv_emb.bias", GIN)
Tpp("ge_to512.weight", 512, GIN); Tpp("ge_to512.bias", 512)
sdpp["prelu.weight"] = torch.full((GIN,), 0.25)
torch.save({"weight": {f"vq_model.{k}": v for k, v in sdpp.items()}},
           "/tmp/verify_e2e/model_pp.pth")
print("v2pp pth written")

# ERes2NetV2 SV checkpoint (converted from a torch-shaped random state dict)
import math as _math
from genie_tts_tpu.models import eres2net
_g2 = torch.Generator().manual_seed(4)
_sv_sd = {}
def _c(key, co, ci, k, bias=False):
    _sv_sd[f"{key}.weight"] = torch.randn(co, ci, k, k, generator=_g2) * (k * k * ci) ** -0.5
    if bias: _sv_sd[f"{key}.bias"] = torch.randn(co, generator=_g2) * 0.05
def _bn(key, c):
    _sv_sd[f"{key}.weight"] = 1.0 + torch.randn(c, generator=_g2) * 0.05
    _sv_sd[f"{key}.bias"] = torch.randn(c, generator=_g2) * 0.05
    _sv_sd[f"{key}.running_mean"] = torch.randn(c, generator=_g2) * 0.05
    _sv_sd[f"{key}.running_var"] = 1.0 + torch.rand(c, generator=_g2) * 0.1
def _aff(prefix, channels, inter):
    _c(f"{prefix}.local_att.0", inter, 2 * channels, 1); _bn(f"{prefix}.local_att.1", inter)
    _c(f"{prefix}.local_att.3", channels, inter, 1); _bn(f"{prefix}.local_att.4", channels)
_c("conv1", 64, 1, 3); _bn("bn1", 64)
in_c = 64
for li, blocks in enumerate(eres2net.NUM_BLOCKS):
    planes = 64 * (2 ** li)
    width = int(_math.floor(planes * eres2net.BASE_WIDTH / 64.0))
    for bi in range(blocks):
        pre = f"layer{li + 1}.{bi}"
        stride = (1, 2, 2, 2)[li] if bi == 0 else 1
        _c(f"{pre}.conv1", width * 4, in_c, 1); _bn(f"{pre}.bn1", width * 4)
        for j in range(4):
            _c(f"{pre}.convs.{j}", width, width, 3); _bn(f"{pre}.bns.{j}", width)
        _c(f"{pre}.conv3", planes * 4, width * 4, 1); _bn(f"{pre}.bn3", planes * 4)
        if stride != 1 or in_c != planes * 4:
            _c(f"{pre}.shortcut.0", planes * 4, in_c, 1); _bn(f"{pre}.shortcut.1", planes * 4)
        if li >= 2:
            for j in range(3):
                _aff(f"{pre}.fuse_models.{j}", width, max(width // 4, 4))
        in_c = planes * 4
_c("layer3_ds", 2048, 1024, 3, bias=True)
_aff("fuse_mode34", 2048, 512)
save_params(eres2net.convert_from_torch({k: v.numpy() for k, v in _sv_sd.items()}),
            "/tmp/verify_e2e/GenieData/speaker_encoder.safetensors")
print("SV checkpoint written")
