"""AST/ViT architecture parity: our Flax modules vs randomly-initialized HF
torch models through the checkpoint converter. This is the strongest possible
parity check without vendored weights (none are shipped, reference C17) — if
logits match on random weights, a real checkpoint import is exact too.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from transformers import ASTConfig, ASTForAudioClassification, ViTConfig, ViTForImageClassification

from eav_tpu.models.ast import AST
from eav_tpu.models.hf_import import convert_ast_state_dict, convert_vit_state_dict
from eav_tpu.models.vit import ViT

HID, LAYERS, HEADS, MLP = 32, 2, 2, 64


@pytest.fixture(scope="module")
def hf_ast():
    cfg = ASTConfig(
        hidden_size=HID,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=MLP,
        patch_size=16,
        frequency_stride=10,
        time_stride=10,
        max_length=128,
        num_mel_bins=128,
        num_labels=5,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = ASTForAudioClassification(cfg).eval()
    return model


def test_ast_logits_match_hf(hf_ast):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = hf_ast(torch.from_numpy(x)).logits.numpy()

    params = convert_ast_state_dict(
        hf_ast.state_dict(), num_layers=LAYERS, swap_head=False
    )
    model = AST(
        num_labels=5, hidden=HID, layers=LAYERS, heads=HEADS, mlp_dim=MLP,
        max_frames=128, num_mel_bins=128,
    )
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), train=False))
    assert ours.shape == ref.shape == (2, 5)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_ast_head_swap_shapes(hf_ast):
    params = convert_ast_state_dict(hf_ast.state_dict(), num_labels=7, num_layers=LAYERS)
    assert params["classifier"]["kernel"].shape == (HID, 7)
    # pretrained classifier LayerNorm kept (`Transformer_Audio.py:24`)
    ln = hf_ast.state_dict()["classifier.layernorm.weight"].numpy()
    np.testing.assert_array_equal(params["classifier_ln"]["scale"], ln)


def test_ast_token_count():
    model = AST(max_frames=1024, num_mel_bins=128)
    # 12 freq x 101 time = 1212 patches (+2 tokens = 1214, config.json:1071)
    assert model.num_patches == 1212


@pytest.fixture(scope="module")
def hf_vit():
    cfg = ViTConfig(
        hidden_size=HID,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=MLP,
        patch_size=16,
        image_size=64,
        num_labels=5,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    return ViTForImageClassification(cfg).eval()


def test_vit_logits_match_hf(hf_vit):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)  # torch NCHW
    with torch.no_grad():
        ref = hf_vit(torch.from_numpy(x)).logits.numpy()
    params = convert_vit_state_dict(hf_vit.state_dict(), num_layers=LAYERS, swap_head=False)
    model = ViT(
        num_labels=5, hidden=HID, layers=LAYERS, heads=HEADS, mlp_dim=MLP,
        image_size=64,
    )
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours = np.asarray(model.apply({"params": params}, x_nhwc, train=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
