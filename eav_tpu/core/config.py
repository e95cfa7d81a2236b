"""Dataclass config system + named presets.

The reference has no config system at all: paths, epochs, bands, and split
indices are hard-coded inline (reference `Dataload_eeg.py:167`,
`Dataload_audio.py:11`, `Dataload_vision.py:136`; the README instructs users to
edit source). Here every pipeline is driven by one frozen dataclass tree, and
the five BASELINE.json workloads are named presets.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

# Canonical EAV label map (reference `Dataload_audio.py:58-64`,
# `Dataload_vision.py:87-93`).
EMOTION_TO_INDEX: Dict[str, int] = {
    "Neutral": 0,
    "Sadness": 1,
    "Anger": 2,
    "Happiness": 3,
    "Calmness": 4,
}
INDEX_TO_EMOTION: Dict[int, str] = {v: k for k, v in EMOTION_TO_INDEX.items()}
NUM_CLASSES = 5
NUM_SUBJECTS = 42

# One-hot rows of the label .mat that correspond to the *listening* tasks kept
# by the EEG pipeline (reference `Dataload_eeg.py:33`).
EEG_SELECTED_CLASSES: Tuple[int, ...] = (1, 3, 5, 7, 9)


@dataclass(frozen=True)
class SplitConfig:
    """Deterministic class-stratified in-temporal-order split.

    Reference `EAV_datasplit.py:26-40`: per class, the first ``h_idx`` samples
    (in dataset order) go to train, the rest to test. ``h_idx=56`` with 80
    samples/class gives the published 70/30 split.
    """

    h_idx: int = 56
    num_classes: int = NUM_CLASSES
    samples_per_class: int = 80


@dataclass(frozen=True)
class EEGPreprocConfig:
    """EEG ingest: .mat -> (400, 30, 500) trials.

    Mirrors reference `Dataload_eeg.py:85-152`: polyphase downsample
    500->100 Hz on the F-order-flattened continuous signal, order-5 Butterworth
    SOS bandpass per channel, 20 s trials split into 4 x 5 s chunks (F-order),
    keep listening classes only.
    """

    fs_orig: int = 500
    fs_target: int = 100
    band: Tuple[float, float] = (0.5, 45.0)
    butter_order: int = 5
    channels: int = 30
    trial_seconds: float = 20.0
    chunk_seconds: float = 5.0
    selected_classes: Tuple[int, ...] = EEG_SELECTED_CLASSES
    # The Keras notebook pipeline filters at the ORIGINAL rate before
    # downsampling (`CNN_EEG_tf.py` commented block / `EEG_nb.ipynb` cell4,
    # band [3, 50]), the torch pipeline downsamples first
    # (`Dataload_eeg.py:156-158`) — SURVEY.md C8 order discrepancy.
    filter_before_downsample: bool = False

    @property
    def chunks_per_trial(self) -> int:
        return int(round(self.trial_seconds / self.chunk_seconds))

    @property
    def samples_per_chunk(self) -> int:
        return int(round(self.chunk_seconds * self.fs_target))


@dataclass(frozen=True)
class AudioPreprocConfig:
    """Audio ingest: .wav -> 5 s / 16 kHz segments, then one of two frontends.

    - ``frontend='fbank'``: AST 128-bin x 1024-frame Kaldi-style log-mel fbank
      normalized by the AudioSet corpus stats (reference
      `Pre_trained_models/ast-finetuned-audioset/preprocessor_config.json`).
    - ``frontend='scnn180'``: the notebook's 180-d vector (40 MFCC + 12 chroma
      + 128 mel means over a 5 s segment at 22.05 kHz; reference
      `CNN_tensorflow/CNN_audio_emotion_recognition.ipynb` extract_feature).
    """

    target_sr: int = 16000
    segment_seconds: float = 5.0
    frontend: str = "fbank"
    # AST fbank (Kaldi-compatible)
    num_mel_bins: int = 128
    max_frames: int = 1024
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    norm_mean: float = -4.2677393
    norm_std: float = 4.5689974
    # SCNN 180-d frontend (librosa conventions)
    scnn_sr: int = 22050
    n_mfcc: int = 40
    n_chroma: int = 12
    n_mels: int = 128
    n_fft: int = 2048
    hop_length: int = 512

    @property
    def segment_samples(self) -> int:
        return int(round(self.segment_seconds * self.target_sr))


@dataclass(frozen=True)
class VisionPreprocConfig:
    """Vision ingest: .mp4 -> (400, 25, H, W, 3) uint8 frame stacks.

    Mirrors reference `Dataload_vision.py:42-94`: Speaking clips only, every
    6th frame of the first 600 (100 frames / 20 s clip), grouped 25 frames =
    5 s per sample; optional MTCNN face alignment to 56x56, else resize to
    ``image_size``.
    """

    frame_stride: int = 6
    max_frames: int = 600
    frames_per_sample: int = 25
    image_size: int = 224
    face_detection: bool = False
    face_image_size: int = 56
    face_prob_threshold: float = 0.3
    mtcnn_thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7)
    mtcnn_factor: float = 0.709
    mtcnn_min_face_size: int = 20


@dataclass(frozen=True)
class PhaseConfig:
    """One phase of the freeze->unfreeze fine-tune protocol
    (reference `Dataload_audio.py:113-114`)."""

    epochs: int
    lr: float
    freeze: bool


@dataclass(frozen=True)
class FinetuneConfig:
    """Trainer hyper-parameters for one model family."""

    model: str
    batch_size: int
    phases: Tuple[PhaseConfig, ...]
    optimizer: str = "adamw"  # 'adamw' | 'adam'
    weight_decay: float = 1e-5
    eval_batch_size: Optional[int] = None
    # Per-trial aggregation for per-frame/per-segment models
    # (reference `Transformer_Vision.py:170-188`): mean logits over this many
    # consecutive test rows before argmax. None = per-sample scoring.
    vote_group: Optional[int] = None
    # 'mean' = mean-logit vote (`Transformer_Vision.py:178-180`);
    # 'majority' = per-frame argmax + mode (Keras video notebook C15).
    vote_mode: str = "mean"
    seed: int = 0
    # jit the whole (epoch x batch) schedule with lax control flow.
    donate: bool = True
    compat_softmax: bool = False  # replicate reference double-softmax quirk
    # Replicate Trainer_uni's sticky eval-mode quirk (`CNN_torch/
    # EEGNet_tor.py:96-116` + `:118-135`): ``train()`` sets train mode ONCE
    # before the epoch loop, but ``validate()`` — called at the end of every
    # epoch — sets eval mode and nothing ever switches back. From the second
    # epoch on, training therefore runs with dropout DISABLED and BatchNorm
    # in eval mode (running stats used for the forward and never updated
    # again). The published EEGNet trajectory (README.md:40) was trained this
    # way, so the eeg preset enables it; each phase re-enters train mode at
    # its start (``train()`` is called once per phase).
    compat_sticky_eval: bool = False
    # torch DataLoader(shuffle=True) batching (`EEGNet_tor.py:77`). False =
    # in-order batches every epoch — used by the trainer-trajectory parity
    # tests to force a common batch order with the imported reference
    # trainers (tests/test_reference_import_parity.py).
    shuffle: bool = True
    # keep per-epoch test logits (the reference's ActivationSaver pattern,
    # `CNN_audio.py:48-72`, dumps val logits every epoch)
    keep_epoch_logits: bool = False
    # Replicate the HF-trainer accuracy quirk: the reference's vision
    # trainers average PER-BATCH accuracies over batches
    # (`Transformer_Vision.py:106-124` ``total_accuracy / len(test_dataloader)``,
    # `CNN_torch/CNN_Vision.py:128-157` same for train and test), so a
    # partial final batch is over-weighted (5000 test frames at bs 128 leave
    # an 8-frame batch counted like a 128-frame one). True = reproduce that
    # batch-mean in the per-epoch history (train_acc and test_acc); False
    # (default, and all presets) = unbiased sample mean. The published
    # headline accuracies are unaffected either way — they come from the
    # trial-vote over ``outputs_test`` (`Transformer_Vision.py:170-188`),
    # not from this logged metric — so the presets keep the honest mean and
    # only the trainer-trajectory parity tests enable the quirk.
    compat_batch_mean_acc: bool = False
    # L1/L2 penalties on kernel params (the Keras SCNN's l1_l2 regularizers,
    # notebook C14 cell0:189-209)
    l1_reg: float = 0.0
    l2_reg: float = 0.0
    # Frozen-phase feature cache: when a phase freezes everything but the
    # head (`Transformer_Audio.py:53-56` protocol) and the model declares a
    # features/head split (models/{ast,vit}.py ``supports_head_mode``), the
    # backbone outputs are constant across the phase — compute them once and
    # replay the frozen epochs on cached (B, hidden) features. Numerically
    # the same math (gated off automatically for dropout>0 / batch-stats /
    # max-norm / l1-l2 models, train/loop.py ``_frozen_cache_ok``); disable
    # with --set to force the full per-step backbone forward.
    cache_frozen_features: bool = True
    model_kwargs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.eval_batch_size is None:
            object.__setattr__(self, "eval_batch_size", self.batch_size)


@dataclass(frozen=True)
class SweepConfig:
    """42-subject x modality sweep."""

    subjects: Tuple[int, ...] = tuple(range(1, NUM_SUBJECTS + 1))
    modalities: Tuple[str, ...] = ("eeg", "audio", "vision")
    data_root: str = "./Datasets/EAV"
    cache_dir: str = "./cache"
    journal_path: str = "./sweep_journal.jsonl"
    metrics_path: str = "./metrics.jsonl"
    checkpoint_dir: Optional[str] = None
    resume: bool = True
    max_retries: int = 1


def _eegnet_finetune() -> FinetuneConfig:
    # Reference `Dataload_eeg.py:250-256`: Adam lr=1e-5, bs=32, 200 epochs,
    # no freeze protocol (trained from scratch).
    return FinetuneConfig(
        model="eegnet",
        batch_size=32,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=200, lr=1e-5, freeze=False),),
        compat_softmax=True,
        # Trainer_uni never restores train mode after epoch 1's validate()
        # (`EEGNet_tor.py:96-135`): the published EEGNet trajectory ran
        # epochs 2+ with dropout off and BN frozen — replicate it
        # (trajectory-equality-tested against the imported reference trainer,
        # tests/test_reference_import_parity.py).
        compat_sticky_eval=True,
        # rFFT temporal conv: numerics-equal to the direct conv, ~20% faster
        # on v5e (the 1->8-channel conv underutilizes the MXU)
        model_kwargs={"temporal_mode": "fft"},
    )


def _scnn_finetune() -> FinetuneConfig:
    # Reference `CNN_torch/CNN_audio.py:89` (Adam 1e-3) / notebook (100 ep, bs 64).
    return FinetuneConfig(
        model="scnn_audio",
        batch_size=64,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=100, lr=1e-3, freeze=False),),
    )


def _ast_finetune() -> FinetuneConfig:
    # Reference `Dataload_audio.py:110-114`: AdamW, bs 8, 10 ep lr 5e-4 frozen
    # -> 15 ep lr 5e-6 unfrozen; one optimizer across phases.
    # weight_decay: the reference builds `optim.AdamW(params, lr)` without
    # passing its own wd through (`Transformer_Audio.py:30`), so torch's
    # DEFAULT wd=0.01 is the effective value — replicated here (core/optim.py).
    return FinetuneConfig(
        model="ast",
        batch_size=8,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(
            PhaseConfig(epochs=10, lr=5e-4, freeze=True),
            PhaseConfig(epochs=15, lr=5e-6, freeze=False),
        ),
        # The reference evaluates the full 120-fbank test set EVERY epoch at
        # the train batch size (`Transformer_Audio.py:85-97`, bs 8) — but the
        # eval batch is not protocol-pinned (eval is a pure map; batching
        # cannot change its results, tests/test_finetune_protocol.py
        # test_eval_batch_size_invariance). bs 64 shrinks the per-epoch eval
        # tail the frozen-feature cache doesn't cover (the 15 unfrozen
        # epochs): 25 evals x 15 steps instead of 25 x 2.
        eval_batch_size=64,
        vote_group=None,
        # bf16 matmuls on the MXU: +51% step throughput measured on v5e
        # (params, optimizer state and softmax stay f32). Deliberate
        # deviation from the all-f32 torch reference; flip with
        # --set audio.finetune.model_kwargs.compute_dtype=float32
        # attn_impl='auto' = Pallas flash attention on TPU (another +13%
        # measured: 104.2 -> 90.3 ms/step, 88 samples/s; fwd relerr vs the
        # einsum path ~3e-5 bf16), XLA attention elsewhere.
        # stream_dtype=bf16 keeps the residual stream in bf16 through the
        # encoder (head stays f32): −2% step measured (87.9 vs 89.7 ms,
        # scripts/patch_embed_variants.py); logits stay within bf16
        # roundoff of the f32 stream (tests/test_models_misc.py).
        model_kwargs={
            "compute_dtype": "bfloat16",
            "attn_impl": "auto",
            "stream_dtype": "bfloat16",
        },
    )


def _vit_finetune() -> FinetuneConfig:
    # Reference `Dataload_vision.py:140-141`: bs 128, 10 ep 5e-4 frozen ->
    # 5 ep 5e-6 unfrozen; trial vote = mean logits over 25 frames
    # (`Transformer_Vision.py:178-180`).
    # weight_decay: `optim.AdamW(params, lr)` (`Transformer_Vision.py:36`)
    # leaves torch's default wd=0.01 in effect — replicated here.
    return FinetuneConfig(
        model="vit",
        batch_size=128,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(
            PhaseConfig(epochs=10, lr=5e-4, freeze=True),
            PhaseConfig(epochs=5, lr=5e-6, freeze=False),
        ),
        # eval at 2x the train batch: the 3,000-frame per-epoch eval is not
        # protocol-pinned (pure map, batching-invariant — see the AST preset
        # note) and fewer eval steps means fewer dispatches per epoch.
        eval_batch_size=256,
        vote_group=25,
        # raw uint8 frames to device (resize+normalize fold into the model);
        # bf16 MXU matmuls (+29% measured on v5e), f32 params/softmax.
        # stream_dtype bf16: +16% step (753 -> 877 samples/s, ~47% MFU,
        # scripts/vit_ablation.py round 3). attn_impl stays 'xla': flash
        # MEASURED SLOWER at T=197 (558 samples/s — short rows pad to the
        # kernel's block minimum; flash wins from ~1k tokens, see AST).
        model_kwargs={"preprocess_uint8": True, "compute_dtype": "bfloat16",
                      "stream_dtype": "bfloat16"},
    )


def _conformer_finetune() -> FinetuneConfig:
    # Reference `Transformer_EEG.py:239-247`: Adam 1e-3, bs 32, 485 epochs,
    # post-step fc renorm maxnorm=0.5.
    return FinetuneConfig(
        model="conformer_eeg",
        batch_size=32,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=485, lr=1e-3, freeze=False),),
        compat_softmax=True,
    )


def _fusion_finetune() -> FinetuneConfig:
    # New capability (the reference only hints at it via the dead
    # `Fusion.VIT_audio` import, `CNN_torch/EEGNet_tor.py:4`).
    return FinetuneConfig(
        model="fusion",
        batch_size=32,
        optimizer="adamw",
        weight_decay=1e-4,
        phases=(PhaseConfig(epochs=100, lr=1e-3, freeze=False),),
    )


@dataclass(frozen=True)
class PresetConfig:
    name: str
    description: str
    split: SplitConfig
    finetune: FinetuneConfig
    eeg: Optional[EEGPreprocConfig] = None
    audio: Optional[AudioPreprocConfig] = None
    vision: Optional[VisionPreprocConfig] = None
    sweep: Optional[SweepConfig] = None

    def replace(self, **kw) -> "PresetConfig":
        return dataclasses.replace(self, **kw)


PRESETS: Dict[str, PresetConfig] = {
    # BASELINE.json config 1
    "eegnet_subject": PresetConfig(
        name="eegnet_subject",
        description="EEGNet on one subject's EEG (.mat, 200 trials x 30ch x 10k), CPU-runnable",
        split=SplitConfig(),
        eeg=EEGPreprocConfig(),
        finetune=_eegnet_finetune(),
    ),
    # BASELINE.json config 2
    "scnn_audio": PresetConfig(
        name="scnn_audio",
        description="Audio SCNN: wav -> 180-d librosa-style features -> Conv1D",
        split=SplitConfig(),
        audio=AudioPreprocConfig(frontend="scnn180"),
        finetune=_scnn_finetune(),
    ),
    # BASELINE.json config 3
    "ast_finetune": PresetConfig(
        name="ast_finetune",
        description="AST-audioset fine-tune per subject (freeze 10ep -> unfreeze 15ep, bs=8)",
        split=SplitConfig(),
        audio=AudioPreprocConfig(frontend="fbank"),
        finetune=_ast_finetune(),
    ),
    # BASELINE.json config 4
    "vit_finetune": PresetConfig(
        name="vit_finetune",
        description="Vision ViT fine-tune on face frames, per-trial mean-logit vote",
        split=SplitConfig(),
        vision=VisionPreprocConfig(face_detection=True),
        finetune=_vit_finetune(),
    ),
    # BASELINE.json config 5
    "fusion_sweep": PresetConfig(
        name="fusion_sweep",
        description="Tri-modal EEG+AST+ViT fusion, full 42-subject sweep",
        split=SplitConfig(),
        eeg=EEGPreprocConfig(),
        audio=AudioPreprocConfig(),
        vision=VisionPreprocConfig(face_detection=True),
        finetune=_fusion_finetune(),
        sweep=SweepConfig(),
    ),
    # Extra parity presets (model families the reference also ships)
    "conformer_eeg": PresetConfig(
        name="conformer_eeg",
        description="ShallowConvNet+Transformer EEG hybrid (Transformer_EEG.py)",
        split=SplitConfig(),
        eeg=EEGPreprocConfig(),
        finetune=_conformer_finetune(),
    ),
    "resnet_vision": PresetConfig(
        name="resnet_vision",
        description="ResNet50+channel-attention video baseline (CNN_Vision.py), "
        "3+3 epoch freeze protocol, mean-logit trial vote",
        split=SplitConfig(),
        vision=VisionPreprocConfig(face_detection=True),
        finetune=FinetuneConfig(
            model="resnet_attn",
            batch_size=32,
            optimizer="adamw",
            weight_decay=0.01,  # torch AdamW default (`CNN_Vision.py:86`)
            phases=(
                PhaseConfig(epochs=3, lr=5e-4, freeze=True),
                PhaseConfig(epochs=3, lr=5e-6, freeze=False),
            ),
            vote_group=25,
        ),
    ),
}


def get_preset(name: str) -> PresetConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")


# -----------------------------------------------------------------------------
# Field-level overrides (SURVEY.md §5 config row: "YAML/CLI overrides")
# -----------------------------------------------------------------------------


def parse_override_value(s: str) -> Any:
    """Literal-eval the value when possible ('5e-4' -> 0.0005, '(3, 50)' ->
    tuple, 'true'/'True' -> bool), else keep the raw string."""
    import ast

    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    if s.lower() in ("none", "null"):
        return None
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _set_path(obj: Any, parts: Sequence[str], value: Any) -> Any:
    """Immutable deep-set along a dotted path through frozen dataclasses,
    tuples/lists (integer components) and dicts."""
    if not parts:
        return value
    head, rest = parts[0], parts[1:]
    if dataclasses.is_dataclass(obj):
        names = {f.name for f in dataclasses.fields(obj)}
        if head not in names:
            raise KeyError(
                f"{type(obj).__name__} has no field {head!r}; available: {sorted(names)}"
            )
        return dataclasses.replace(obj, **{head: _set_path(getattr(obj, head), rest, value)})
    if isinstance(obj, (tuple, list)):
        idx = int(head)
        items = list(obj)
        items[idx] = _set_path(items[idx], rest, value)
        return type(obj)(items) if isinstance(obj, tuple) else items
    if isinstance(obj, dict):
        out = dict(obj)
        out[head] = _set_path(obj.get(head), rest, value) if rest else value
        return out
    raise KeyError(f"cannot descend into {type(obj).__name__} at {head!r}")


def override_preset(preset: PresetConfig, path: str, value: Any) -> PresetConfig:
    """One override, e.g. ``override_preset(p, 'finetune.phases.0.lr', 1e-4)``."""
    return _set_path(preset, path.split("."), value)


def apply_overrides(
    presets: Dict[str, PresetConfig], overrides
) -> Dict[str, PresetConfig]:
    """Apply ``modality.field.path=value`` overrides to a preset dict, e.g.
    ``audio.finetune.phases.0.epochs=2`` or ``eeg.split.h_idx=40``. The first
    path component selects the preset key (the reference hard-codes every one
    of these values in source, `Dataload_eeg.py:167` etc.).

    ``overrides``: either ``path=value`` strings (CLI ``--set``) or a
    ``{path: value}`` mapping (load_override_file)."""
    if isinstance(overrides, dict):
        items = list(overrides.items())
    else:
        items = []
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"override {ov!r} is not of the form path=value")
            path, _, raw = ov.partition("=")
            items.append((path.strip(), parse_override_value(raw.strip())))
    out = dict(presets)
    for path, value in items:
        if isinstance(value, str):
            # YAML 1.1 parses '1e-3' as a string; normalize like CLI values
            value = parse_override_value(value)
        parts = str(path).split(".")
        key = parts[0]
        if key not in out:
            raise KeyError(f"unknown preset key {key!r}; available: {sorted(out)}")
        out[key] = _set_path(out[key], parts[1:], value)
    return out


def _flatten_override_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        p = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            flat.update(_flatten_override_tree(v, p))
        else:
            flat[p] = v
    return flat


def load_override_file(path: str) -> Dict[str, Any]:
    """Read a YAML (or JSON) override file into flat ``path -> value`` pairs.

    Example YAML::

        audio:
          finetune:
            phases:
              0: {epochs: 2, lr: 1e-3}
    """
    import json

    with open(path) as f:
        text = f.read()
    try:
        import yaml  # type: ignore

        tree = yaml.safe_load(text)
    except ImportError:
        tree = json.loads(text)
    if not isinstance(tree, dict):
        raise ValueError(f"override file {path} must contain a mapping")
    return _flatten_override_tree(tree)
