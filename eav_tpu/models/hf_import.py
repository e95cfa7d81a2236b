"""HF torch checkpoint -> Flax parameter import for AST and ViT.

Reproduces the reference's ``from_pretrained`` + classifier-head-swap flow
(`Transformer_Audio.py:22-24`, `Transformer_Vision.py:29-30`) for our Flax
modules: mechanical name/layout mapping (Linear weights transposed, conv
OIHW -> HWIO), with the new head initialized exactly like a fresh
``torch.nn.Linear`` (kaiming-uniform bound 1/sqrt(fan_in)), since that is how
the reference's swapped heads start.

Checkpoint weights are NOT vendored (the reference doesn't vendor them
either, C17/`Download.txt`); loading is gated on a local file. Parity is
verified in tests against randomly-initialized HF torch models.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _convert_encoder_layer(out: Dict, prefix_hf: str, prefix_fx: str, sd: Mapping) -> None:
    ren = {
        "layernorm_before": "ln1",
        "layernorm_after": "ln2",
        "attention.output.dense": "attn/out",
        "intermediate.dense": "fc1",
        "output.dense": "fc2",
    }
    for hf_name, fx_name in ren.items():
        w = _to_np(sd[f"{prefix_hf}.{hf_name}.weight"])
        b = _to_np(sd[f"{prefix_hf}.{hf_name}.bias"])
        if w.ndim == 2:  # torch Linear (out, in) -> flax (in, out)
            _set(out, f"{prefix_fx}/{fx_name}/kernel", w.T)
            _set(out, f"{prefix_fx}/{fx_name}/bias", b)
        else:  # LayerNorm
            _set(out, f"{prefix_fx}/{fx_name}/scale", w)
            _set(out, f"{prefix_fx}/{fx_name}/bias", b)
    # HF stores q/k/v as three Linears; our encoder computes them as ONE
    # fused DenseGeneral with kernel (in, 3, hidden) (models/transformer.py)
    # — stack the three (out, in) torch weights along a new middle axis.
    ws, bs = [], []
    for which in ("query", "key", "value"):
        ws.append(_to_np(sd[f"{prefix_hf}.attention.attention.{which}.weight"]).T)
        bs.append(_to_np(sd[f"{prefix_hf}.attention.attention.{which}.bias"]))
    _set(out, f"{prefix_fx}/attn/qkv/kernel", np.stack(ws, axis=1))
    _set(out, f"{prefix_fx}/attn/qkv/bias", np.stack(bs, axis=0))


def torch_linear_init(rng: np.random.Generator, fan_in: int, fan_out: int):
    """Fresh torch.nn.Linear init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for the weight, U(+-1/sqrt(fan_in)) for the bias."""
    bound = 1.0 / np.sqrt(fan_in)
    kernel = rng.uniform(-bound, bound, size=(fan_in, fan_out)).astype(np.float32)
    bias = rng.uniform(-bound, bound, size=(fan_out,)).astype(np.float32)
    return kernel, bias


def convert_ast_state_dict(
    sd: Mapping,
    num_labels: int = 5,
    head_seed: int = 0,
    num_layers: int = 12,
    swap_head: bool = True,
) -> Dict:
    """HF ASTForAudioClassification state_dict -> flax params for models.ast.AST,
    with the classifier Dense swapped to ``num_labels`` outputs (torch-default
    init) and the pretrained classifier LayerNorm kept (`Transformer_Audio.py:24`).
    ``swap_head=False`` keeps the checkpoint's own head (for parity tests)."""
    p = "audio_spectrogram_transformer"
    out: Dict = {}
    _set(out, "cls_token", _to_np(sd[f"{p}.embeddings.cls_token"]))
    _set(out, "dist_token", _to_np(sd[f"{p}.embeddings.distillation_token"]))
    _set(out, "pos_embed", _to_np(sd[f"{p}.embeddings.position_embeddings"]))
    w = _to_np(sd[f"{p}.embeddings.patch_embeddings.projection.weight"])  # OIHW
    _set(out, "patch_proj/kernel", np.transpose(w, (2, 3, 1, 0)))
    _set(out, "patch_proj/bias", _to_np(sd[f"{p}.embeddings.patch_embeddings.projection.bias"]))
    for i in range(num_layers):
        _convert_encoder_layer(out, f"{p}.encoder.layer.{i}", f"encoder/layer_{i}", sd)
    _set(out, "final_ln/scale", _to_np(sd[f"{p}.layernorm.weight"]))
    _set(out, "final_ln/bias", _to_np(sd[f"{p}.layernorm.bias"]))
    _set(out, "classifier_ln/scale", _to_np(sd["classifier.layernorm.weight"]))
    _set(out, "classifier_ln/bias", _to_np(sd["classifier.layernorm.bias"]))
    hidden = out["final_ln"]["scale"].shape[0]
    if swap_head:
        rng = np.random.default_rng(head_seed)
        kernel, bias = torch_linear_init(rng, hidden, num_labels)
    else:
        kernel = _to_np(sd["classifier.dense.weight"]).T
        bias = _to_np(sd["classifier.dense.bias"])
    _set(out, "classifier/kernel", kernel)
    _set(out, "classifier/bias", bias)
    return out


def convert_vit_state_dict(
    sd: Mapping,
    num_labels: int = 5,
    head_seed: int = 0,
    num_layers: int = 12,
    swap_head: bool = True,
) -> Dict:
    """HF ViTForImageClassification state_dict -> flax params for models.vit.ViT,
    classifier swapped (`Transformer_Vision.py:30`)."""
    p = "vit"
    out: Dict = {}
    _set(out, "cls_token", _to_np(sd[f"{p}.embeddings.cls_token"]))
    _set(out, "pos_embed", _to_np(sd[f"{p}.embeddings.position_embeddings"]))
    w = _to_np(sd[f"{p}.embeddings.patch_embeddings.projection.weight"])
    _set(out, "patch_proj/kernel", np.transpose(w, (2, 3, 1, 0)))
    _set(out, "patch_proj/bias", _to_np(sd[f"{p}.embeddings.patch_embeddings.projection.bias"]))
    for i in range(num_layers):
        _convert_encoder_layer(out, f"{p}.encoder.layer.{i}", f"encoder/layer_{i}", sd)
    _set(out, "final_ln/scale", _to_np(sd[f"{p}.layernorm.weight"]))
    _set(out, "final_ln/bias", _to_np(sd[f"{p}.layernorm.bias"]))
    hidden = out["final_ln"]["scale"].shape[0]
    if swap_head:
        rng = np.random.default_rng(head_seed)
        kernel, bias = torch_linear_init(rng, hidden, num_labels)
    else:
        kernel = _to_np(sd["classifier.weight"]).T
        bias = _to_np(sd["classifier.bias"])
    _set(out, "classifier/kernel", kernel)
    _set(out, "classifier/bias", bias)
    return out


def load_state_dict_from_dir(model_dir: str) -> Mapping:
    """Load a torch/safetensors state dict from a local HF checkpoint dir."""
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(bin_path):
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(
        f"no model.safetensors / pytorch_model.bin under {model_dir}; "
        "pretrained weights are not vendored (reference C17) — download them "
        "to this directory to enable checkpoint-parity fine-tuning"
    )
