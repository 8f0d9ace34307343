"""RoBERTa BERT-feature hook: tokenizer -> per-phoneme features in the
G2P dispatcher (tiny model + programmatic WordPiece tokenizer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RobertaConfig
from genie_tts_tpu.frontend.dispatcher import get_phones_and_bert, set_bert_feature_fn
from genie_tts_tpu.models import roberta
from genie_tts_tpu.runtime.model_manager import ModelManager

RCFG = RobertaConfig(vocab_size=64, embed_dim=1024, num_layers=3, num_heads=2,
                     ffn_dim=32, max_position=64)


def make_char_tokenizer(chars):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    tok = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", 2), ("[SEP]", 3)],
    )
    return tok


@pytest.fixture()
def manager_with_roberta():
    chars = list("你好世界天气很这是测试不一个中文句子，。")
    tok = make_char_tokenizer(chars)
    mgr = ModelManager()
    params = roberta.init_params(jax.random.PRNGKey(0), RCFG, jnp.float32)
    mgr.set_roberta(params, RCFG, tok)
    yield mgr
    set_bert_feature_fn(None)


def test_chinese_bert_features_nonzero(manager_with_roberta):
    ids, bert = get_phones_and_bert("你好世界。", "zh")
    assert bert.shape == (len(ids), 1024)
    assert np.abs(bert).sum() > 0  # real features, not zeros


def test_repeat_alignment(manager_with_roberta):
    from genie_tts_tpu.frontend.g2p_zh import chinese_to_phones

    norm, _, ids, word2ph = chinese_to_phones("你好世界。")
    _, bert = get_phones_and_bert("你好世界。", "zh")
    # phones of the same character share identical feature rows
    ofs = 0
    for n in word2ph:
        for k in range(1, n):
            np.testing.assert_array_equal(bert[ofs], bert[ofs + k])
        ofs += n


def test_hook_absent_gives_zeros():
    set_bert_feature_fn(None)
    ids, bert = get_phones_and_bert("你好。", "zh")
    assert np.abs(bert).sum() == 0
