"""eav_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for the EAV
multimodal emotion-recognition benchmark.

Re-implements, TPU-first, every capability of the reference `nubcico/EAV`
repository (per-subject EEG / audio / vision emotion classification over
42 subjects x 5 classes), plus the subsystems the reference lacks:
a config system, a test pyramid, structured metrics, checkpoint/resume,
a subject-parallel sweep scheduler over a device mesh, and a tri-modal
fusion head.

Layout
------
- ``core``     : configs, train state, optimizer semantics, metrics, checkpoints
- ``ingest``   : host decode (.mat / .wav / frames) + fused on-device preprocessing
- ``ops``      : signal DSP (resample, IIR, STFT/mel/MFCC/fbank) and Pallas kernels
- ``models``   : Flax model zoo (EEGNet, EEG conformer, SCNN, AST, ViT, ResNet-attn,
                 MTCNN, fusion head)
- ``parallel`` : mesh construction, sharding helpers, subject-parallel vmap trainers
- ``train``    : two-phase freeze->unfreeze fine-tune loops, evaluation / trial vote
"""

__version__ = "0.1.0"

from eav_tpu.core.config import (  # noqa: F401
    EEGPreprocConfig,
    AudioPreprocConfig,
    VisionPreprocConfig,
    SplitConfig,
    PhaseConfig,
    FinetuneConfig,
    SweepConfig,
    get_preset,
    PRESETS,
)
