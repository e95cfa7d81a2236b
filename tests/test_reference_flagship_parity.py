"""Trainer-TRAJECTORY parity for the FLAGSHIP protocols vs the imported
reference trainers (VERDICT r4 missing #1).

Round 4 proved the method pays: running the actual reference EEG trainers
surfaced four semantics gaps (unbiased BN running-var, sticky eval,
maxnorm-at-init, LN eps) that every hand-written oracle had missed. These
tests extend the audit to the trainers behind the headline accuracies:

- `Transformer_torch/Transformer_Audio.py:44-103` ``AudioModelTrainer``
  (AST two-phase freeze protocol, single lr-mutated AdamW, last-unfreeze
  ``outputs_test``),
- `Transformer_torch/Transformer_Vision.py:61-129` ``ImageClassifierTrainer``
  (HF ``labels=`` internal loss, per-frame x25 labels, batch-mean accuracy),
- `CNN_torch/CNN_Vision.py:66-171` torch vision trainer (ResNet50+attn,
  backbone ``requires_grad`` freeze, batch-mean train/test accuracy),
- `CNN_torch/CNN_audio.py:75-142` ``train_model`` (SCNN, plain Adam,
  per-epoch ActivationSaver val logits).

Each runs the REAL imported trainer on tiny synthetic data (the two HF
trainers from a tiny random-config checkpoint written to tmp with
``save_pretrained`` — both take a local ``model_path``), with init weights
copied into our Flax modules and a forced common batch order, and asserts
per-epoch loss / accuracy trajectories plus final ``outputs_test``.

All are ``slow`` (torch-CPU training, minutes each); they skip when the
reference tree is absent. No reference code is copied — the modules are
imported read-only from /root/reference.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

import test_reference_import_parity as base  # noqa: E402  (same-dir import)

REFERENCE_ROOT = base.REFERENCE_ROOT

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT), reason="reference tree not available"
    ),
]

_t = base._t


# ---------------------------------------------------------------------------
# shared instrumentation
# ---------------------------------------------------------------------------


class _RecordingLoss(torch.nn.Module):
    """Wraps a loss module, appending each scalar to ``sink``."""

    def __init__(self, inner, sink):
        super().__init__()
        self.inner = inner
        self.sink = sink

    def forward(self, scores, targets):
        loss = self.inner(scores, targets)
        self.sink.append(float(loss.detach()))
        return loss


def _hook_eval_logits(model, sink, loss_sink=None, train_sink=None):
    """Forward hook capturing eval-mode logits (plus, optionally, train-mode
    logits, and — for HF models that compute their loss internally via
    ``labels=`` — train-mode losses)."""

    def hook(module, args, output):
        logits = output.logits if hasattr(output, "logits") else output
        if module.training:
            if loss_sink is not None and getattr(output, "loss", None) is not None:
                loss_sink.append(float(output.loss.detach()))
            if train_sink is not None:
                train_sink.append(logits.detach().cpu().numpy())
        else:
            sink.append(logits.detach().cpu().numpy())

    return model.register_forward_hook(hook)


def _epoch_group(batches, per_epoch):
    """Concatenate a flat list of per-batch arrays into per-epoch arrays."""
    assert len(batches) % per_epoch == 0, (len(batches), per_epoch)
    epochs = len(batches) // per_epoch
    return [
        np.concatenate(batches[e * per_epoch : (e + 1) * per_epoch], axis=0)
        for e in range(epochs)
    ]


def _batch_mean_acc(logits, labels, bs):
    """The reference vision trainers' accuracy: mean of per-batch accuracies
    (`Transformer_Vision.py:106-124`, `CNN_Vision.py:147-157`)."""
    n = len(labels)
    accs = []
    for i in range(0, n, bs):
        lg, lb = logits[i : i + bs], labels[i : i + bs]
        accs.append(float((np.argmax(lg, -1) == lb).mean()))
    return float(np.mean(accs))


# ---------------------------------------------------------------------------
# AudioModelTrainer (AST) — `Transformer_Audio.py:44-103`
# ---------------------------------------------------------------------------


def test_reference_audio_model_trainer_trajectory(tmp_path, monkeypatch):
    """`AudioModelTrainer` == JitTrainer on a tiny AST: the two-phase
    freeze(lr=5e-4) -> unfreeze(lr=5e-6) protocol with ONE AdamW whose lr is
    mutated between phases (`Transformer_Audio.py:45-48`), torch's DEFAULT
    wd=0.01 (the ctor never forwards its own weight_decay kwarg, `:30`),
    frozen-phase trainable set = classifier layernorm+dense (`:53-56`),
    sample-weighted per-epoch test accuracy (`:92-97`), and ``outputs_test``
    captured at the last unfrozen epoch (`:98-99`).

    The fbank frontend is identity-patched on the trainer (features are fed
    directly): ASTFeatureExtractor parity is pinned separately
    (tests/test_spectral.py HF golden parity), and the default extractor
    needs torchaudio (absent in this image). This test audits the TRAINER.

    Exercises our frozen-feature cache against the real reference protocol:
    the AST preset conditions hold (dropout 0, head_regex == head graph), so
    phase 1 runs on cached backbone features — and must land on the same
    trajectory the reference gets from full per-step backbone forwards."""
    monkeypatch.chdir(tmp_path)  # trainer appends training_performance_audio.txt
    from transformers import ASTConfig, ASTForAudioClassification

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.ast import AST
    from eav_tpu.models.hf_import import convert_ast_state_dict
    from eav_tpu.train.loop import JitTrainer

    mod = base._import_reference("Transformer_Audio", subdir="Transformer_torch")

    hid, layers, heads, mlp = 32, 2, 2, 64
    ckpt = tmp_path / "ast_ckpt"
    cfg_hf = ASTConfig(
        hidden_size=hid, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, patch_size=16, frequency_stride=10,
        time_stride=10, max_length=128, num_mel_bins=128,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    ASTForAudioClassification(cfg_hf).save_pretrained(str(ckpt))

    rng = np.random.default_rng(7)
    tr_x = rng.normal(size=(20, 128, 128)).astype(np.float32)
    tr_y = np.tile(np.arange(5), 4).astype(np.int64)
    te_x = rng.normal(size=(10, 128, 128)).astype(np.float32)
    te_y = np.tile(np.arange(5), 2).astype(np.int64)
    bs = 8

    monkeypatch.setattr(
        mod.AudioModelTrainer,
        "_feature_extract",
        lambda self, x: torch.from_numpy(np.asarray(x, np.float32)),
    )
    torch.manual_seed(1)  # head swap Linear init (`:24`)
    trainer = mod.AudioModelTrainer(
        (tr_x, tr_y, te_x, te_y), model_path=str(ckpt), sub="s01",
        num_classes=5, lr=5e-4, batch_size=bs,
    )
    # force a common batch order (the trainer shuffles, `:19`)
    trainer.train_dataloader = trainer._prepare_dataloader(
        trainer.tr_x, trainer.tr_y, shuffle=False
    )
    # snapshot INIT weights (training mutates the live tensors in place)
    init_sd = {k: v.detach().clone() for k, v in trainer.model.state_dict().items()}
    losses, eval_batches = [], []
    trainer.loss_fn = _RecordingLoss(trainer.loss_fn, losses)
    handle = _hook_eval_logits(trainer.model, eval_batches)

    phases = ((2, 5e-4, True), (3, 5e-6, False))
    for epochs, lr, freeze in phases:
        trainer.train(epochs=epochs, lr=lr, freeze=freeze)
    handle.remove()

    n_epochs = sum(p[0] for p in phases)
    steps = -(-len(tr_x) // bs)
    ref_loss = np.asarray(losses).reshape(n_epochs, steps).mean(1)
    per_epoch_eval = -(-len(te_x) // bs)
    ep_logits = _epoch_group(eval_batches, per_epoch_eval)
    assert len(ep_logits) == n_epochs
    ref_acc = np.asarray(
        [float((np.argmax(lg, -1) == te_y).mean()) for lg in ep_logits]
    )
    np.testing.assert_array_equal(ep_logits[-1], trainer.outputs_test)

    params = convert_ast_state_dict(init_sd, num_layers=layers, swap_head=False)
    model = AST(
        num_labels=5, hidden=hid, layers=layers, heads=heads, mlp_dim=mlp,
        max_frames=128, num_mel_bins=128,
    )
    cfg = FinetuneConfig(
        model="ast", batch_size=bs, optimizer="adamw", weight_decay=0.01,
        shuffle=False,
        phases=tuple(PhaseConfig(epochs=e, lr=lr, freeze=f) for e, lr, f in phases),
    )
    res = JitTrainer(model, cfg).fit(
        (tr_x, tr_y.astype(np.int32), te_x, te_y.astype(np.int32)),
        seed=0, init_params=params,
    )
    np.testing.assert_allclose(res.history["loss"], ref_loss, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(res.history["test_acc"], ref_acc, atol=1e-6)
    d = np.abs(np.asarray(res.outputs_test) - trainer.outputs_test)
    # f32 chaos floor (see the conformer trajectory test's rationale); a
    # semantics gap (wrong wd set, wrong frozen set, extra step) lands >10x
    assert d.mean() < 2e-2 and d.max() < 8e-2, (d.mean(), d.max())


# ---------------------------------------------------------------------------
# ImageClassifierTrainer (ViT) — `Transformer_Vision.py:61-129`
# ---------------------------------------------------------------------------


def test_reference_image_classifier_trainer_trajectory(tmp_path, monkeypatch):
    """HF `ImageClassifierTrainer` == JitTrainer on a tiny ViT: per-frame
    labels repeated ``frame_per_sample`` times (`Transformer_Vision.py:46`),
    the model's INTERNAL `labels=` cross-entropy (`:92` — plain CE once
    ``model.num_labels`` is 5, `:31`), two-phase freeze protocol with one
    AdamW (torch default wd=0.01, `:36`), per-epoch test accuracy averaged
    over BATCHES (`:106-124` — compat_batch_mean_acc), and ``outputs_test``
    at the last unfrozen epoch (`:120-121`)."""
    from transformers import ViTConfig, ViTForImageClassification, ViTImageProcessor

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.hf_import import convert_vit_state_dict
    from eav_tpu.models.vit import ViT
    from eav_tpu.train.loop import JitTrainer

    mod = base._import_reference("Transformer_Vision", subdir="Transformer_torch")

    # image size must be 224: `_prepare_dataloader` hardcodes
    # ``.view(-1, 3, 224, 224)`` (`:48`) whatever the processor emits. The
    # transformer itself stays tiny (hidden 32, 2 layers).
    hid, layers, heads, mlp, img = 32, 2, 2, 64, 224
    ckpt = tmp_path / "vit_ckpt"
    # num_labels=5 in the CHECKPOINT config: the reference patches only the
    # model instance (`self.model.num_labels = 5`, `:31`) — enough on the
    # authors' transformers version whose ViT forward read ``self.num_labels``,
    # but the installed version's loss reads ``config.num_labels``, so with a
    # stale config the internal CE reshapes (B,5) logits to (-1, old_labels)
    # and crashes. The published semantics (plain 5-class CE) are what both
    # versions compute once the config agrees.
    cfg_hf = ViTConfig(
        hidden_size=hid, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, patch_size=16, image_size=img, num_labels=5,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    ViTForImageClassification(cfg_hf).save_pretrained(str(ckpt))
    ViTImageProcessor().save_pretrained(str(ckpt))  # default 224 resize

    rng = np.random.default_rng(8)
    frames = 2  # frame_per_sample (25 in production, `:21`)
    tr_x = rng.integers(0, 256, size=(5, frames, 64, 64, 3), dtype=np.uint8)
    tr_y = np.arange(5).astype(np.int64)
    te_x = rng.integers(0, 256, size=(5, frames, 64, 64, 3), dtype=np.uint8)
    te_y = np.arange(5).astype(np.int64)
    bs = 8  # 10 frames -> batches (8, 2): partial batches on BOTH loops

    torch.manual_seed(3)  # head swap Linear init (`:30`)
    trainer = mod.ImageClassifierTrainer(
        (tr_x, tr_y, te_x, te_y), model_path=str(ckpt), sub="s01",
        num_labels=5, lr=5e-4, batch_size=bs,
    )
    trainer.train_dataloader = trainer._prepare_dataloader(
        trainer.tr_x, trainer.tr_y, shuffle=False
    )[0]
    # snapshot INIT weights (training mutates the live tensors in place)
    init_sd = {k: v.detach().clone() for k, v in trainer.model.state_dict().items()}
    losses, eval_batches = [], []
    handle = _hook_eval_logits(trainer.model, eval_batches, loss_sink=losses)

    phases = ((2, 5e-4, True), (3, 5e-6, False))
    for epochs, lr, freeze in phases:
        trainer.train(epochs=epochs, lr=lr, freeze=freeze)
    handle.remove()

    y_frames = np.repeat(te_y, frames)
    n_epochs = sum(p[0] for p in phases)
    steps = -(-len(tr_y) * frames // bs)
    ref_loss = np.asarray(losses).reshape(n_epochs, steps).mean(1)
    per_epoch_eval = -(-len(y_frames) // bs)
    ep_logits = _epoch_group(eval_batches, per_epoch_eval)
    ref_acc = np.asarray(
        [_batch_mean_acc(lg, y_frames, bs) for lg in ep_logits]
    )
    np.testing.assert_array_equal(ep_logits[-1], trainer.outputs_test)

    # our split: the trainer's OWN preprocessed tensors (processor parity is
    # not under test here), flattened per-frame exactly like `:48`
    px = trainer.train_dataloader.dataset.tensors[0].numpy()
    pe = trainer.test_dataloader.dataset.tensors[0].numpy()
    px = np.ascontiguousarray(np.transpose(px, (0, 2, 3, 1)))  # NCHW -> NHWC
    pe = np.ascontiguousarray(np.transpose(pe, (0, 2, 3, 1)))

    params = convert_vit_state_dict(init_sd, num_layers=layers, swap_head=False)
    model = ViT(
        num_labels=5, hidden=hid, layers=layers, heads=heads, mlp_dim=mlp,
        image_size=img,
    )
    cfg = FinetuneConfig(
        model="vit", batch_size=bs, optimizer="adamw", weight_decay=0.01,
        shuffle=False, compat_batch_mean_acc=True,
        phases=tuple(PhaseConfig(epochs=e, lr=lr, freeze=f) for e, lr, f in phases),
    )
    res = JitTrainer(model, cfg).fit(
        (px, np.repeat(tr_y, frames).astype(np.int32),
         pe, y_frames.astype(np.int32)),
        seed=0, init_params=params,
    )
    np.testing.assert_allclose(res.history["loss"], ref_loss, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(res.history["test_acc"], ref_acc, atol=1e-6)
    d = np.abs(np.asarray(res.outputs_test) - trainer.outputs_test)
    assert d.mean() < 2e-2 and d.max() < 8e-2, (d.mean(), d.max())


# ---------------------------------------------------------------------------
# CNN_torch vision trainer (ResNet50 + channel attention) — `CNN_Vision.py:66-171`
# ---------------------------------------------------------------------------


def _install_torchvision_stub():
    """torchvision is not installed in this image; `CNN_Vision.py:10-11`
    imports ``transforms`` and ``resnet50`` at module top. This stub
    replicates exactly what that pipeline uses: Compose/Resize/ToTensor/
    Normalize (PIL bilinear resize, /255 CHW tensor, (x-mean)/std) and a
    ``resnet50`` factory returning a torchvision-layout model (reusing the
    oracle from tests/test_resnet_import.py, whose state_dict is
    indistinguishable from a real resnet50 download) with avgpool/fc
    children appended so ``children()[:-2]`` slices the backbone exactly
    like `CNN_Vision.py:33`. The factory records created instances so the
    test can read the weights actually in use (the Sequential shares the
    module objects)."""
    import torch.nn as nn
    from PIL import Image

    import test_resnet_import as tri

    created = []
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]._eav_created  # idempotent

    class _Resize:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class _ToTensor:
        def __call__(self, img):
            a = np.asarray(img, np.uint8).astype(np.float32) / 255.0
            return torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1)))

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, img):
            for t in self.ts:
                img = t(img)
            return img

    class _FullResNet50(nn.Module):
        """torchvision child ORDER: conv1,bn1,relu,maxpool,layer1..4,avgpool,fc."""

        def __init__(self):
            super().__init__()
            bb = tri._TorchResNet50Backbone()
            self.conv1, self.bn1 = bb.conv1, bb.bn1
            self.relu, self.maxpool = bb.relu, bb.maxpool
            for i in (1, 2, 3, 4):
                setattr(self, f"layer{i}", getattr(bb, f"layer{i}"))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(2048, 1000)

    def resnet50(pretrained=False, **kw):
        # pretrained weights are unobtainable offline; trajectory parity only
        # needs the SAME weights on both sides, which the test copies out
        m = _FullResNet50()
        created.append(m)
        return m

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")
    mdl = types.ModuleType("torchvision.models")
    tfm.Compose, tfm.Resize = _Compose, _Resize
    tfm.ToTensor, tfm.Normalize = _ToTensor, _Normalize
    mdl.resnet50 = resnet50
    tv.transforms, tv.models = tfm, mdl
    tv._eav_created = created
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tfm
    sys.modules["torchvision.models"] = mdl
    return created


def test_reference_cnn_vision_trainer_trajectory(tmp_path, monkeypatch):
    """torch `ImageClassifierTrainer` (`CNN_Vision.py:66-171`) == JitTrainer
    on ResNetAttn: backbone-only ``requires_grad`` freeze (`:123-124` — the
    attention MLP and classifier train in BOTH phases, HEAD_REGEX), one AdamW
    (default wd=0.01, `:86`), BatchNorm trained in train mode through the
    frozen phase with torch's UNBIASED running-var update (models/norm.py —
    the gap this test exists to pin for the vision CNN), batch-mean train AND
    test accuracy (`:141-157`, compat_batch_mean_acc), trial-score
    ``outputs_test`` at the last unfrozen epoch (`:159-160`).

    Latent reference bug, surfaced by importing the real module:
    ``accuracy`` is defined WITHOUT ``self`` (`:114-116`) yet called as
    ``self.accuracy(out, y)`` (`:141,154`) — a TypeError on the first batch
    (bound method + 2 args = 3). The published runs must have had it as a
    @staticmethod; patched here exactly so, preserving the intended
    batch-mean semantics."""
    import torch.nn as nn

    created = _install_torchvision_stub()
    mod = base._import_reference("CNN_Vision", subdir="CNN_torch")

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.resnet_attn import ResNetAttn, convert_torchvision_resnet50
    from eav_tpu.train.loop import JitTrainer

    monkeypatch.setattr(
        mod.ImageClassifierTrainer,
        "accuracy",
        staticmethod(
            lambda outputs, labels: (outputs.argmax(dim=1) == labels)
            .float().mean().item()
        ),
    )

    rng = np.random.default_rng(9)
    frames, img = 2, 224  # IMAGE_TRANSFORM resizes everything to 224 (`:17-24`)
    tr_x = rng.integers(0, 256, size=(3, frames, img, img, 3), dtype=np.uint8)
    tr_y = np.array([0, 1, 2], np.int64)
    te_x = rng.integers(0, 256, size=(3, frames, img, img, 3), dtype=np.uint8)
    te_y = np.array([0, 1, 2], np.int64)
    bs = 4  # 6 frames -> batches (4, 2): partial batch both loops

    torch.manual_seed(4)
    del created[:]
    trainer = mod.ImageClassifierTrainer(
        data=[tr_x, tr_y, te_x, te_y], num_labels=5, lr=5e-4, batch_size=bs,
    )
    # INIT weight snapshots (training mutates the live tensors): the full
    # resnet50 (torchvision key names — the Sequential shares its modules)
    # for the backbone converter, the VideoModel for attn/classifier
    full_sd = {k: v.detach().clone() for k, v in created[0].state_dict().items()}
    vm_sd = {
        k: v.detach().numpy().copy() for k, v in trainer.model.state_dict().items()
    }
    trainer.train_loader = trainer._build_loader(tr_x, tr_y, shuffle=False)
    losses, eval_batches, train_batches = [], [], []
    trainer.criterion = _RecordingLoss(trainer.criterion, losses)
    handle = _hook_eval_logits(trainer.model, eval_batches, train_sink=train_batches)

    phases = ((2, 5e-4, True), (2, 5e-6, False))
    for epochs, lr, freeze in phases:
        trainer.train(epochs=epochs, lr=lr, freeze=freeze)
    handle.remove()

    y_frames = np.repeat(te_y, frames)
    n_epochs = sum(p[0] for p in phases)
    n_tr = len(tr_y) * frames
    steps = -(-n_tr // bs)
    ref_loss = np.asarray(losses).reshape(n_epochs, steps).mean(1)
    per_epoch_eval = -(-len(y_frames) // bs)
    ep_logits = _epoch_group(eval_batches, per_epoch_eval)
    ref_acc = np.asarray([_batch_mean_acc(lg, y_frames, bs) for lg in ep_logits])
    np.testing.assert_array_equal(ep_logits[-1], trainer.outputs_test)

    # weights in use -> our params. Backbone via the torchvision converter;
    # attention + classifier Linears transpose; fresh-BN batch_stats (0/1)
    # come from the converter too (the stub's stats are torch defaults).
    cv = convert_torchvision_resnet50(full_sd, None)
    params = {
        "backbone": cv["params"],
        "attn_fc1": {"kernel": vm_sd["attn_fc1.weight"].T,
                     "bias": vm_sd["attn_fc1.bias"]},
        "attn_fc2": {"kernel": vm_sd["attn_fc2.weight"].T,
                     "bias": vm_sd["attn_fc2.bias"]},
        "cls_fc1": {"kernel": vm_sd["classifier.1.weight"].T,
                    "bias": vm_sd["classifier.1.bias"]},
        "cls_fc2": {"kernel": vm_sd["classifier.3.weight"].T,
                    "bias": vm_sd["classifier.3.bias"]},
    }
    bstats = {"backbone": cv["batch_stats"]}

    # our split: identical preprocessing read back from the torch loaders
    px = trainer.train_loader.dataset.tensors[0].numpy()
    pe = trainer.test_loader.dataset.tensors[0].numpy()
    px = np.ascontiguousarray(np.transpose(px, (0, 2, 3, 1)))
    pe = np.ascontiguousarray(np.transpose(pe, (0, 2, 3, 1)))

    cfg = FinetuneConfig(
        model="resnet_attn", batch_size=bs, optimizer="adamw",
        weight_decay=0.01, shuffle=False, compat_batch_mean_acc=True,
        keep_epoch_logits=True,
        phases=tuple(PhaseConfig(epochs=e, lr=lr, freeze=f) for e, lr, f in phases),
    )
    res = JitTrainer(ResNetAttn(), cfg, head_regex=ResNetAttn.HEAD_REGEX).fit(
        (px, np.repeat(tr_y, frames).astype(np.int32),
         pe, y_frames.astype(np.int32)),
        seed=0, init_params=params, init_batch_stats=bstats,
    )
    # Chaos calibration for this trainer (measured, scripts kept in the test
    # log): the reference's no-sigmoid attention (`:49-61`) puts init losses
    # at 18-27, an extremely steep regime where f32 sign-step chaos amplifies
    # ~300x per two optimizer steps. At production lrs epoch 1 matches to
    # 3e-6 rel, epoch 2 to 2e-4, epochs 3-4 drift to ~10%; re-running the
    # SAME protocol at lr/10 collapses the epoch-4 drift to 1% with epochs
    # 1-3 at 1e-5 — divergence scales with lr, i.e. chaotic amplification,
    # not a semantics gap (a wrong wd/mask/BN rule would persist at small
    # lr). So: phase-1 epochs assert tight, phase-2 epochs assert 15%.
    n_p1 = phases[0][0]
    np.testing.assert_allclose(
        res.history["loss"][:n_p1], ref_loss[:n_p1], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        res.history["loss"][n_p1:], ref_loss[n_p1:], rtol=0.15
    )
    # the reference's train_acc is ALSO a batch-mean (`:141-143`): rebuild it
    # from the recorded train-mode logits (in-order batches, so labels are
    # just the repeated y sequence)
    tr_labels = np.repeat(tr_y, frames)
    ep_train_logits = _epoch_group(train_batches, steps)
    ref_train_acc = np.asarray(
        [_batch_mean_acc(lg, tr_labels, bs) for lg in ep_train_logits]
    )
    np.testing.assert_allclose(
        res.history["train_acc"][:n_p1], ref_train_acc[:n_p1], atol=1e-6
    )
    np.testing.assert_allclose(
        res.history["test_acc"][:n_p1], ref_acc[:n_p1], atol=1e-6
    )
    # phase 2: chaos can flip individual argmaxes at this logit scale —
    # allow at most one flipped frame per epoch on each metric
    per_frame = 1.0 / len(y_frames) / 0.5  # worst batch-mean weight of 1 frame
    assert np.all(np.abs(res.history["train_acc"][n_p1:] - ref_train_acc[n_p1:])
                  <= per_frame + 1e-6)
    assert np.all(np.abs(res.history["test_acc"][n_p1:] - ref_acc[n_p1:])
                  <= per_frame + 1e-6)
    # metric-semantics check, chaos-free: OUR logged batch-mean accuracy must
    # equal the reference formula applied to OUR OWN epoch logits — this pins
    # compat_batch_mean_acc exactly even where trajectories have drifted
    ours_acc_recomputed = np.asarray(
        [_batch_mean_acc(lg, y_frames, bs) for lg in np.asarray(res.epoch_logits)]
    )
    np.testing.assert_allclose(res.history["test_acc"], ours_acc_recomputed,
                               atol=1e-6)
    # final logits: scale-normalized bound + argmax agreement (logits are
    # O(20) here because of the no-sigmoid attention)
    ours_out = np.asarray(res.outputs_test)
    scale = np.abs(trainer.outputs_test).mean()
    d = np.abs(ours_out - trainer.outputs_test)
    assert d.mean() < 0.1 * scale, (d.mean(), scale)
    agree = (np.argmax(ours_out, -1) == np.argmax(trainer.outputs_test, -1)).mean()
    assert agree >= 1.0 - 1.0 / len(y_frames), agree


# ---------------------------------------------------------------------------
# CNN_torch audio train_model (SCNN) — `CNN_audio.py:75-142`
# ---------------------------------------------------------------------------


def test_reference_cnn_audio_train_model_trajectory(tmp_path, monkeypatch):
    """`train_model` (`CNN_audio.py:75-142`) == JitTrainer on SCNNAudio:
    plain Adam lr=1e-3 (`:89`), sample-weighted val accuracy (`:116-125`),
    and the ActivationSaver pattern — val logits dumped to disk EVERY epoch
    (`:48-72`) == our ``keep_epoch_logits`` per-epoch test logits.

    Dropout is zeroed on both sides (cross-framework RNG streams cannot
    match); dropout-off is also what the sticky-eval EEG twin trains with.
    Note two reference data-order quirks NOT replicated here because the
    batch order is forced common: the driver builds the VAL loader with
    shuffle=True (`:211` default), so the published activation dumps are in
    a different shuffled order every epoch; and train shuffling is torch-RNG
    dependent."""
    mod = base._import_reference("CNN_audio", subdir="CNN_torch")
    from torch.utils.data import DataLoader, TensorDataset

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.scnn_audio import SCNNAudio
    from eav_tpu.train.loop import JitTrainer

    rng = np.random.default_rng(10)
    T = 180  # the 180-d handcrafted feature; 180 // 8 = 22 -> flatten 2816
    tr_x = rng.normal(size=(20, T, 1)).astype(np.float32)
    tr_y = np.tile(np.arange(5), 4).astype(np.int64)
    te_x = rng.normal(size=(10, T, 1)).astype(np.float32)
    te_y = np.tile(np.arange(5), 2).astype(np.int64)
    bs, epochs, lr = 8, 3, 1e-3

    torch.manual_seed(5)
    tm = mod.AudioModel(num_classes=5)
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    # snapshot INIT weights (train_model mutates them in place)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    train_loader = DataLoader(
        TensorDataset(_t(tr_x), torch.from_numpy(tr_y.copy())),
        batch_size=bs, shuffle=False,
    )
    val_loader = DataLoader(
        TensorDataset(_t(te_x), torch.from_numpy(te_y.copy())),
        batch_size=bs, shuffle=False,
    )
    losses = []
    real_ce = torch.nn.CrossEntropyLoss
    monkeypatch.setattr(
        torch.nn, "CrossEntropyLoss",
        lambda: _RecordingLoss(real_ce(), losses),
    )
    acts_dir = tmp_path / "acts"
    mod.train_model(
        tm, train_loader, val_loader, epochs=epochs, lr=lr,
        save_dir=str(acts_dir), subject_id=None, device=torch.device("cpu"),
    )
    steps = -(-len(tr_x) // bs)
    ref_loss = np.asarray(losses).reshape(epochs, steps).mean(1)
    ref_epoch_logits = np.stack([
        torch.load(str(acts_dir / f"activations_epoch_{e + 1}.pth"),
                   weights_only=False)
        for e in range(epochs)
    ])
    ref_acc = (np.argmax(ref_epoch_logits, -1) == te_y).mean(axis=1)

    # torch conv1d (out, in, k) -> flax (k, in, out); the head flatten is
    # channel-major in torch (c*22+t) vs time-major in flax (t*128+c)
    conv = lambda k: {"kernel": np.transpose(sd[f"features.{k}.weight"], (2, 1, 0)),
                      "bias": sd[f"features.{k}.bias"]}
    head_w = sd["classifier.weight"].reshape(5, 128, 22)
    head_w = np.transpose(head_w, (2, 1, 0)).reshape(22 * 128, 5)
    params = {
        "conv1": conv(0), "conv2": conv(2), "conv3": conv(6), "conv4": conv(8),
        "head": {"kernel": head_w, "bias": sd["classifier.bias"]},
    }

    cfg = FinetuneConfig(
        model="scnn_audio", batch_size=bs, optimizer="adam", weight_decay=0.0,
        shuffle=False, keep_epoch_logits=True,
        phases=(PhaseConfig(epochs=epochs, lr=lr, freeze=False),),
    )
    res = JitTrainer(SCNNAudio(dropout_rates=(0.0, 0.0)), cfg).fit(
        (tr_x[..., 0], tr_y.astype(np.int32), te_x[..., 0], te_y.astype(np.int32)),
        seed=0, init_params=params,
    )
    # rtol 2e-3, not 2e-4: under the test harness's
    # --xla_force_host_platform_device_count=8 flag XLA:CPU partitions the
    # convs differently (measured: the flag alone moves the epoch-3 loss by
    # 1.1e-3 rel with identical semantics), and Adam's sign-like first steps
    # amplify f32 reassociation — same rationale as the conformer trajectory
    # test. A real semantics gap (wrong lr, extra step, wrong flatten) lands
    # orders of magnitude above this.
    np.testing.assert_allclose(res.history["loss"], ref_loss, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(res.history["test_acc"], ref_acc, atol=1e-6)
    # ActivationSaver parity: per-epoch val logits, mean/max-abs bounded.
    # Measured chaos floor: WITHOUT the test harness's 8-virtual-device flag
    # the epoch-1 logits match torch to 7.7e-7 mean (bit-level semantics
    # parity of one full training epoch), growing to 3.2e-3 by epoch 3; the
    # flag's different conv partitioning multiplies that ~6x (epoch-3 mean
    # 2.0e-2, max 6.7e-2). A semantics gap (wrong flatten order, extra/missing
    # step) lands >0.3 mean.
    d = np.abs(np.asarray(res.epoch_logits) - ref_epoch_logits)
    assert d.mean() < 5e-2 and d.max() < 2e-1, (d.mean(), d.max())
    d = np.abs(np.asarray(res.outputs_test) - ref_epoch_logits[-1])
    assert d.mean() < 5e-2 and d.max() < 2e-1, (d.mean(), d.max())
