"""End-to-end per-(subject, modality) task pipelines.

The glue the reference scatters across ``__main__`` blocks
(`Dataload_{eeg,audio,vision}.py`): ingest -> EAVDataSplit (h_idx=56) ->
fine-tune -> metrics. Each modality is a task function for
core/sweep.SweepRunner; per-trial logits are archived per subject so the
fusion stage (BASELINE config 5) can train on aligned tri-modal scores.

Preprocessed features are cached as .npz per (subject, modality) — the
reference's pkl-cache pattern (`README.md:92-98`) done properly (versioned
by config hash, no pickle).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from eav_tpu.core import metrics as M
from eav_tpu.core.config import (
    AudioPreprocConfig,
    EEGPreprocConfig,
    PresetConfig,
    SplitConfig,
    VisionPreprocConfig,
    get_preset,
)
from eav_tpu.core.sweep import TaskResult
from eav_tpu.ingest.split import eav_split
from eav_tpu.train.loop import JitTrainer, _ensure_device


def default_presets() -> Dict[str, PresetConfig]:
    """The modality-key -> preset mapping the sweep runs by default."""
    return {
        "eeg": get_preset("eegnet_subject"),
        "eeg_conformer": get_preset("conformer_eeg"),
        "audio": get_preset("ast_finetune"),
        "audio_scnn": get_preset("scnn_audio"),
        "vision": get_preset("vit_finetune"),
        "vision_resnet": get_preset("resnet_vision"),
        "fusion": get_preset("fusion_sweep"),
    }


def _cfg_hash(cfg) -> str:
    return hashlib.sha1(json.dumps(asdict(cfg), sort_keys=True, default=str).encode()).hexdigest()[:10]


def _cached(cache_dir: Optional[str], key: str, compute: Callable[[], Tuple[np.ndarray, np.ndarray]]):
    if cache_dir is None:
        return compute()
    path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(path):
        from eav_tpu.ingest.npz import fast_npz_load  # 101 s -> <1 s on the 1.5 GB vision cache

        z = fast_npz_load(path)
        return z["x"], z["y"]
    x, y = compute()
    os.makedirs(cache_dir, exist_ok=True)
    # write-then-rename: fast_npz_load readers hold mmap views of the old
    # inode, so a concurrent rebuild must never truncate the file in place
    # (silent data change / SIGBUS under the reader) — os.replace keeps the
    # old inode alive until the last view drops
    tmp = path + f".{os.getpid()}.tmp.npz"  # savez appends .npz unless present
    try:
        np.savez(tmp, x=x, y=y)
        os.replace(tmp, path)
    except BaseException:
        # a failed write (ENOSPC, kill) must not leave a multi-GB orphan
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return x, y


def _model_kwargs(preset: PresetConfig) -> dict:
    """Normalize model_kwargs from config space: dtype names ('bfloat16')
    become jnp dtypes so presets stay JSON-serializable/hashable."""
    kw = dict(preset.finetune.model_kwargs or {})
    for key in ("compute_dtype", "stream_dtype"):
        if isinstance(kw.get(key), str):
            import jax.numpy as jnp

            kw[key] = jnp.dtype(kw[key]).type
    return kw


def build_model(preset: PresetConfig):
    """Model + trainer kwargs for a preset's finetune config."""
    name = preset.finetune.model
    kwargs = _model_kwargs(preset)
    if name == "eegnet":
        from eav_tpu.models.eegnet import EEGNet

        model = EEGNet(**kwargs)
        return model, dict(maxnorm_rules=model.maxnorm_rules)
    if name == "conformer_eeg":
        from eav_tpu.models.conformer_eeg import ConformerEEG

        model = ConformerEEG(**kwargs)
        return model, dict(maxnorm_rules=model.maxnorm_rules)
    if name == "scnn_audio":
        from eav_tpu.models.scnn_audio import SCNNAudio

        return SCNNAudio(**kwargs), {}
    if name == "ast":
        from eav_tpu.models.ast import AST

        return AST(**kwargs), {}
    if name == "vit":
        from eav_tpu.models.vit import ViT

        return ViT(**kwargs), {}
    if name == "resnet_attn":
        from eav_tpu.models.resnet_attn import ResNetAttn

        return ResNetAttn(**kwargs), dict(head_regex=ResNetAttn.HEAD_REGEX)
    if name == "fusion":
        from eav_tpu.models.fusion import FusionHead

        return FusionHead(**kwargs), {}
    raise KeyError(f"unknown model {name!r}")


_pretrained_cache: Dict[Any, Any] = {}
# farm workers (parallel/farm.py) share this module-level cache from N
# threads: the lock makes the first conversion exclusive so concurrent
# workers neither duplicate the ~340 MB read+convert nor race the dict
import threading as _threading

_pretrained_lock = _threading.Lock()


def _pretrained_params(model_name: str, num_labels: int):
    """Optional pretrained checkpoint import, gated on env-var-pointed local
    files. Returns ``(init_params, init_batch_stats)`` — either may be None.

    - ``ast`` / ``vit``: HF checkpoint dir (`Transformer_Audio.py:22-24`,
      `Transformer_Vision.py:28-30`); full param tree, no batch stats.
    - ``resnet_attn``: a torchvision ``resnet50`` state-dict ``.pth`` file
      via ``EAV_TPU_RESNET_CKPT`` (`CNN_Vision.py:32` ``resnet50(pretrained)``).
      Returns a *partial* tree covering only ``backbone/`` (+ its BN running
      stats); the trainer overlays it onto random init (train/loop.py
      ``overlay_params``) so attention/head start fresh like the reference's
      new layers (`CNN_Vision.py:42-56`).

    The converted tree is cached per (model, labels, path): a 42-subject
    sweep would otherwise re-read and re-convert the identical ~340 MB
    checkpoint once per subject on the 1-core host. The cached leaves are
    read-only (overlay/jnp.asarray never mutate them).
    """
    key = (
        model_name,
        num_labels,
        os.environ.get("EAV_TPU_RESNET_CKPT", "")
        if model_name == "resnet_attn"
        else os.environ.get(
            {"ast": "EAV_TPU_AST_CKPT", "vit": "EAV_TPU_VIT_CKPT"}.get(model_name, ""), ""
        ),
    )
    with _pretrained_lock:
        if key in _pretrained_cache:
            return _pretrained_cache[key]
        out = _pretrained_params_uncached(model_name, num_labels)
        _pretrained_cache[key] = out
        return out


def _pretrained_params_uncached(model_name: str, num_labels: int):
    if model_name == "resnet_attn":
        path = os.environ.get("EAV_TPU_RESNET_CKPT", "")
        if not path or not os.path.isfile(path):
            return None, None
        import torch

        from eav_tpu.models.resnet_attn import convert_torchvision_resnet50

        sd = torch.load(path, map_location="cpu", weights_only=True)
        cv = convert_torchvision_resnet50(sd, None)
        return {"backbone": cv["params"]}, {"backbone": cv["batch_stats"]}
    env = {"ast": "EAV_TPU_AST_CKPT", "vit": "EAV_TPU_VIT_CKPT"}.get(model_name)
    if not env:
        return None, None
    path = os.environ.get(env, "")
    if not path or not os.path.isdir(path):
        return None, None
    from eav_tpu.models import hf_import

    sd = hf_import.load_state_dict_from_dir(path)
    if model_name == "ast":
        return hf_import.convert_ast_state_dict(sd, num_labels=num_labels), None
    return hf_import.convert_vit_state_dict(sd, num_labels=num_labels), None


class ModalityPipelines:
    """Task-fn factory bound to a data root + cache/logit directories."""

    def __init__(
        self,
        data_root: str,
        cache_dir: Optional[str] = None,
        logits_dir: Optional[str] = None,
        presets: Optional[Dict[str, PresetConfig]] = None,
        seed: int = 0,
        epochs_per_call: Optional[int] = None,
        mesh=None,
        epc_target_seconds: Optional[float] = None,
    ):
        """``mesh``: optional Mesh with a ``data`` axis — serial per-subject
        fine-tunes of the large per-frame models (vision) run batch-DP across
        it, the TPU-native replacement for the reference's ``nn.DataParallel``
        over GPUs (`Transformer_Vision.py:82-83`).

        ``epc_target_seconds``: with ``epochs_per_call`` set, adaptively
        enlarge later chunks so each device call runs ~this long (see
        JitTrainer) — cuts per-call dispatch overhead on short-epoch models
        without exceeding runtime execution-duration bounds."""
        self.data_root = data_root
        self.cache_dir = cache_dir
        self.logits_dir = logits_dir
        self.seed = seed
        self.epochs_per_call = epochs_per_call
        self.epc_target_seconds = epc_target_seconds
        self.mesh = mesh
        self.presets = presets or default_presets()
        # one JitTrainer per preset, reused across subjects: every subject
        # runs the same compiled phase programs (identical shapes), so the
        # per-subject rebuild was paying re-trace + executable reload —
        # measured ~60 s/subject through the remote-compile tunnel
        self._trainers: Dict[str, JitTrainer] = {}
        # (modality, subject) -> device-resident split parked by ``prefetch``
        self._prefetched: Dict[Tuple[str, int], Any] = {}
        import threading

        self._prefetch_lock = threading.Lock()
        # fusion-prewarm daemon thread (start_fusion_prewarm); run_fusion
        # joins an in-flight compile (_fusion_warm_fitting set) or calls a
        # still-polling warm off (_fusion_warm_stop)
        self._fusion_warm_thread: Optional[threading.Thread] = None
        self._fusion_warm_fitting = threading.Event()
        self._fusion_warm_stop = threading.Event()

    def _trainer(self, preset_key: str, preset) -> "JitTrainer":
        t = self._trainers.get(preset_key)
        if t is None:
            model, kw = build_model(preset)
            t = JitTrainer(model, preset.finetune,
                           epochs_per_call=self.epochs_per_call,
                           epc_target_seconds=self.epc_target_seconds, **kw)
            self._trainers[preset_key] = t
        return t

    # -- per-modality feature loading -------------------------------------

    def load_eeg(self, subject: int, preset_key: str = "eeg"):
        preset = self.presets.get(preset_key) or self.presets["eeg"]
        cfg = preset.eeg or (self.presets["eeg"].eeg or EEGPreprocConfig())

        def compute():
            from eav_tpu.ingest.eeg import DataLoadEEG

            return DataLoadEEG(subject, cfg, self.data_root).prepare_data()

        return _cached(self.cache_dir, f"s{subject:02d}_eeg_{_cfg_hash(cfg)}", compute)

    def load_audio(self, subject: int, frontend: str):
        preset = self.presets["audio" if frontend == "fbank" else "audio_scnn"]
        cfg = preset.audio or AudioPreprocConfig()

        def compute():
            from eav_tpu.ingest.audio import DataLoadAudio, ast_frontend, scnn_frontend

            loader = DataLoadAudio(subject, self.data_root, cfg)
            if frontend == "fbank":
                segs, y = loader.process(target_sr=cfg.target_sr)
                return ast_frontend(segs, cfg), y
            segs, y = loader.process(target_sr=cfg.scnn_sr)
            return scnn_frontend(segs, cfg), y

        return _cached(
            self.cache_dir, f"s{subject:02d}_aud_{frontend}_{_cfg_hash(cfg)}", compute
        )

    def load_vision(self, subject: int, preset_key: str = "vision"):
        preset = self.presets[preset_key]
        cfg = preset.vision or VisionPreprocConfig()

        def compute():
            from eav_tpu.ingest.video import DataLoadVision

            return DataLoadVision(subject, self.data_root, cfg).process()

        return _cached(self.cache_dir, f"s{subject:02d}_vis_{_cfg_hash(cfg)}", compute)

    # -- task functions -----------------------------------------------------

    def _save_logits(self, subject: int, modality: str, split: str, logits: np.ndarray):
        if self.logits_dir is None:
            return
        os.makedirs(self.logits_dir, exist_ok=True)
        path = os.path.join(self.logits_dir, f"s{subject:02d}_{modality}_{split}.npy")
        # atomic: concurrent readers (warm_fusion's poll, a farmed fusion
        # consumer) must never see a half-written archive
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.save(f, logits)
        os.replace(tmp, path)

    def _finish(self, subject, modality, preset, trainer, result, te_y, vote_group,
                fit_seconds: Optional[float] = None, n_train: Optional[int] = None,
                load_seconds: Optional[float] = None,
                archive_seconds: Optional[float] = None):
        logits = result.outputs_test
        if vote_group:
            tl, pred = M.trial_vote(logits, vote_group)
            if preset.finetune.vote_mode == "majority":
                pred = M.trial_majority_vote(logits, vote_group, 5)
            te_y_trial = np.asarray(te_y).reshape(-1, vote_group)[:, 0]
            summary = M.classification_summary(te_y_trial, np.asarray(pred), 5)
            self._save_logits(subject, modality, "test", np.asarray(tl))
        else:
            pred = np.argmax(logits, axis=-1)
            summary = M.classification_summary(np.asarray(te_y), pred, 5)
            self._save_logits(subject, modality, "test", logits)
        epochs = int(len(result.history["test_acc"]))
        metrics = {
            "accuracy": summary["accuracy"],
            "weighted_f1": summary["weighted_f1"],
            "confusion": summary["confusion"],
            "final_train_acc": float(result.history["train_acc"][-1]),
            "epochs": epochs,
        }
        if fit_seconds and n_train:  # SURVEY.md §5 metrics row: samples/sec
            metrics["fit_seconds"] = round(fit_seconds, 3)
            metrics["samples_per_sec"] = round(epochs * n_train / fit_seconds, 2)
            # per-stage wall split (round-3 observability: the production
            # sweep journal showed 150-230 s/subject of non-fit wall with no
            # way to attribute it — load = cache read + split + host preproc,
            # archive = train-split predict + logit save for fusion)
            metrics["load_seconds"] = round(load_seconds or 0.0, 3)
            metrics["archive_seconds"] = round(archive_seconds or 0.0, 3)
        return TaskResult(metrics=metrics, artifacts={"params": result.params})

    # -- split loaders (ingest + h_idx split + device placement) -----------
    # One H2D at load time; fit() and the archive predict() share the device
    # copy instead of each paying a tunnel transfer (loop.py _ensure_device
    # passes device arrays through untouched). Each is also a prefetch unit:
    # the sweep runner calls ``prefetch`` for the NEXT task concurrently with
    # the current fit, overlapping host decode/cache IO and the H2D transfer
    # with device compute (SURVEY.md §7.3 hard part 4: the host media
    # pipeline must not dominate the sweep).

    def _load_split_eeg(self, subject: int, preset_key: str):
        preset = self.presets[preset_key]
        x, y = self.load_eeg(subject, preset_key)
        d = eav_split(x, y, h_idx=preset.split.h_idx)
        return (_ensure_device(d[0]), d[1], _ensure_device(d[2]), d[3])

    def _load_split_audio(self, subject: int, key: str, frontend: str):
        preset = self.presets[key]
        x, y = self.load_audio(subject, frontend)
        d = eav_split(x, y, h_idx=preset.split.h_idx)
        return (_ensure_device(d[0]), d[1], _ensure_device(d[2]), d[3])

    def _load_split_vision(self, subject: int, preset_key: str):
        from eav_tpu.ingest.vision import flatten_trials_to_frames, preprocess_frames

        preset = self.presets[preset_key]
        x, y = self.load_vision(subject, preset_key)  # (trials, frames, H, W, 3) uint8
        tr_x, tr_y, te_x, te_y = eav_split(x, y, h_idx=preset.split.h_idx)
        fps = x.shape[1]
        tr_f, tr_fy = flatten_trials_to_frames(tr_x, tr_y)
        te_f, te_fy = flatten_trials_to_frames(te_x, te_y)
        if not (preset.finetune.model_kwargs or {}).get("preprocess_uint8"):
            # host path: model expects processor-normalized floats
            size = (preset.finetune.model_kwargs or {}).get("image_size", 224)
            tr_f = preprocess_frames(tr_f, size=size)
            te_f = preprocess_frames(te_f, size=size)
        return _ensure_device(tr_f), tr_fy, _ensure_device(te_f), te_fy, fps

    _PREFETCH_LOADERS = {
        "eeg": ("_load_split_eeg", ("eeg",)),
        "eeg_conformer": ("_load_split_eeg", ("eeg_conformer",)),
        "audio": ("_load_split_audio", ("audio", "fbank")),
        "audio_scnn": ("_load_split_audio", ("audio_scnn", "scnn180")),
        "vision": ("_load_split_vision", ("vision",)),
        "vision_resnet": ("_load_split_vision", ("vision_resnet",)),
    }

    def prefetch(self, subject: int, modality: str) -> None:
        """Best-effort: run a coming task's split loader and park the device-
        resident result for its ``run_*`` to consume. Called by the sweep
        runner in a thread concurrent with the previous task's fit; failures
        are swallowed (the task will redo the load and surface the error in
        its own journal record)."""
        spec = self._PREFETCH_LOADERS.get(modality)
        if spec is None:  # fusion etc. — load is trivial
            return
        try:
            data = getattr(self, spec[0])(subject, *spec[1])
            with self._prefetch_lock:
                self._prefetched[(modality, subject)] = data
                # bound parked device memory: the runner's start/join
                # discipline keeps <=2 live entries (the running task's,
                # racing its pop, + this one); anything older is a task
                # that crashed before consuming — evict FIFO
                while len(self._prefetched) > 2:
                    self._prefetched.pop(next(iter(self._prefetched)))
        except Exception as e:  # noqa: BLE001 — best-effort by design
            print(f"[prefetch] subject{subject:02d} {modality} failed ({e}); "
                  "task will load inline")

    def _take_or_load(self, subject: int, modality: str, loader):
        with self._prefetch_lock:
            data = self._prefetched.pop((modality, subject), None)
        return loader() if data is None else data

    def run_eeg(self, subject: int, preset_key: str = "eeg") -> TaskResult:
        preset = self.presets[preset_key]
        t0 = time.perf_counter()
        data = self._take_or_load(
            subject, preset_key, lambda: self._load_split_eeg(subject, preset_key)
        )
        load_s = time.perf_counter() - t0
        trainer = self._trainer(preset_key, preset)
        t0 = time.perf_counter()
        result = trainer.fit(data, seed=self.seed + subject)
        fit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if self.logits_dir is not None:
            self._save_logits(
                subject, preset_key, "train",
                trainer.predict(result.params, result.batch_stats, data[0]),
            )
        archive_s = time.perf_counter() - t0
        return self._finish(subject, preset_key, preset, trainer, result, data[3], None,
                            fit_seconds=fit_s, n_train=len(data[0]),
                            load_seconds=load_s, archive_seconds=archive_s)

    def run_audio(self, subject: int, frontend: str = "fbank") -> TaskResult:
        key = "audio" if frontend == "fbank" else "audio_scnn"
        preset = self.presets[key]
        t0 = time.perf_counter()
        data = self._take_or_load(
            subject, key, lambda: self._load_split_audio(subject, key, frontend)
        )
        load_s = time.perf_counter() - t0
        init_params, init_bstats = _pretrained_params(preset.finetune.model, 5)
        trainer = self._trainer(key, preset)
        t0 = time.perf_counter()
        result = trainer.fit(data, seed=self.seed + subject, init_params=init_params,
                             init_batch_stats=init_bstats)
        fit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if self.logits_dir is not None:
            self._save_logits(
                subject, key, "train",
                trainer.predict(result.params, result.batch_stats, data[0]),
            )
        archive_s = time.perf_counter() - t0
        return self._finish(subject, key, preset, trainer, result, data[3], None,
                            fit_seconds=fit_s, n_train=len(data[0]),
                            load_seconds=load_s, archive_seconds=archive_s)

    def run_vision(self, subject: int, preset_key: str = "vision") -> TaskResult:
        preset = self.presets[preset_key]
        t0 = time.perf_counter()
        tr_f, tr_fy, te_f, te_fy, fps = self._take_or_load(
            subject, preset_key, lambda: self._load_split_vision(subject, preset_key)
        )
        load_s = time.perf_counter() - t0
        init_params, init_bstats = _pretrained_params(preset.finetune.model, 5)
        trainer = self._trainer(preset_key, preset)
        t0 = time.perf_counter()
        result = trainer.fit((tr_f, tr_fy, te_f, te_fy), seed=self.seed + subject,
                             init_params=init_params, init_batch_stats=init_bstats,
                             mesh=self.mesh)
        fit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        if self.logits_dir is not None:
            tr_logits = trainer.predict(result.params, result.batch_stats, tr_f)
            self._save_logits(
                subject, preset_key, "train", np.asarray(M.trial_vote(tr_logits, fps)[0])
            )
        archive_s = time.perf_counter() - t0
        return self._finish(subject, preset_key, preset, trainer, result, te_fy, fps,
                            fit_seconds=fit_s, n_train=len(tr_f),
                            load_seconds=load_s, archive_seconds=archive_s)

    def run_stacked(self, subjects, modality: str = "eeg") -> Dict[int, TaskResult]:
        """Subject-parallel fine-tunes: all subjects of one modality as ONE
        sharded program (parallel/subject.py) — the 42-subject sweep lever.

        Supports every fixed-shape modality including vision (per-frame
        samples, uint8-preserving transfer, trial-vote scoring); for the
        per-frame models keep per-chip subject groups small (activation
        memory scales with the stack).

        Pretrained checkpoints (the reference's ``from_pretrained`` flow,
        `Transformer_Audio.py:22-24` / `Transformer_Vision.py:28-30`) are
        loaded exactly as in the serial path and broadcast across the subject
        axis, so ``--subject-parallel`` sweeps start from the same init as
        serial runs."""
        from eav_tpu.parallel.subject import SubjectParallelTrainer

        preset = self.presets[modality]
        loaders = {
            "eeg": lambda s: self.load_eeg(s, "eeg"),
            "eeg_conformer": lambda s: self.load_eeg(s, "eeg_conformer"),
            "audio": lambda s: self.load_audio(s, "fbank"),
            "audio_scnn": lambda s: self.load_audio(s, "scnn180"),
            "vision": lambda s: self.load_vision(s, "vision"),
            "vision_resnet": lambda s: self.load_vision(s, "vision_resnet"),
        }
        if modality not in loaders:
            raise KeyError(f"run_stacked does not support modality {modality!r}")
        is_vision = modality in ("vision", "vision_resnet")
        vote_group = None
        splits = []
        t_load = time.perf_counter()
        for s in subjects:
            x, y = loaders[modality](s)
            sp = eav_split(x, y, h_idx=preset.split.h_idx)
            if is_vision:
                from eav_tpu.ingest.vision import (
                    flatten_trials_to_frames,
                    preprocess_frames,
                )

                vote_group = int(x.shape[1])  # frames per trial
                tr_f, tr_fy = flatten_trials_to_frames(sp[0], sp[1])
                te_f, te_fy = flatten_trials_to_frames(sp[2], sp[3])
                if not (preset.finetune.model_kwargs or {}).get("preprocess_uint8"):
                    size = (preset.finetune.model_kwargs or {}).get("image_size", 224)
                    tr_f = preprocess_frames(tr_f, size=size)
                    te_f = preprocess_frames(te_f, size=size)
                sp = (tr_f, tr_fy, te_f, te_fy)
            splits.append(sp)
        shapes = {tuple(np.asarray(sp[0]).shape) for sp in splits}
        if len(shapes) != 1:
            raise ValueError(f"subjects have inconsistent split shapes: {shapes}")
        stack = tuple(np.stack([sp[i] for sp in splits]) for i in range(4))
        load_s = time.perf_counter() - t_load  # shared across the group, like fit_seconds
        model, kw = build_model(preset)
        if getattr(model, "attn_impl", None) == "auto":
            # vmap-stacked fine-tunes: the flash kernels' saved q/k/v/o
            # residuals push a no-remat 4-subject AST stack past 16 GB HBM
            # (measured RESOURCE_EXHAUSTED). flash + remat='attn' fits and
            # measures 61.7 samples/s vs 62.3 for XLA attention (round 3,
            # bench.py --stacked with EAV_BENCH_STACK_ATTN) — a wash, so
            # stacked programs resolve 'auto' to the residual-light XLA
            # path; serial runs (where flash wins +13%) keep the preset
            # default. Either way stacking AST loses to serial (93.9), so
            # the sweep policy keeps AST serial (cli.py stacking policy).
            model = model.clone(attn_impl="xla")
        if getattr(model, "remat", None) == "none":
            # Stacked programs multiply every residual by S. For the
            # transformer families the attention sublayer's residuals
            # (q/k/v/o + the (B,H,T,T) probs on the XLA path) dominate:
            # a SINGLE-subject stacked ViT-base at production shape exceeds
            # the 16 GB buffer budget without remat (journaled
            # RESOURCE_EXHAUSTED, round-3 production sweep), while
            # remat='attn' re-runs one attention forward in the backward
            # pass instead — numerically identical (tests/test_models_misc).
            model = model.clone(remat="attn")
        init_params, init_bstats = _pretrained_params(preset.finetune.model, 5)
        if init_params is not None:
            # broadcast the checkpoint across the subject axis (same init as
            # the serial path's JitTrainer.fit(init_params=...))
            S = len(subjects)
            bcast = lambda tree: jax.tree.map(
                lambda p: np.broadcast_to(np.asarray(p), (S,) + np.shape(p)), tree
            )
            init_params = bcast(init_params)
            if init_bstats is not None:
                init_params = (init_params, bcast(init_bstats))
        sp_trainer = SubjectParallelTrainer(
            model, preset.finetune, epochs_per_call=self.epochs_per_call,
            epc_target_seconds=self.epc_target_seconds, **kw
        )
        t0 = time.perf_counter()
        stacked = sp_trainer.fit_stacked(
            stack, seeds=[self.seed + s for s in subjects], init_params=init_params
        )
        fit_s = time.perf_counter() - t0
        epochs = int(stacked.history["test_acc"].shape[1])
        n_train = int(stack[0].shape[1])
        out: Dict[int, TaskResult] = {}
        inner = JitTrainer(model, preset.finetune, **kw)
        for i, s in enumerate(subjects):
            t_arch = time.perf_counter()
            logits = stacked.outputs_test[i]
            if vote_group:
                tl, pred = M.trial_vote(logits, vote_group)
                if preset.finetune.vote_mode == "majority":
                    pred = M.trial_majority_vote(logits, vote_group, 5)
                te_y_trial = np.asarray(stack[3][i]).reshape(-1, vote_group)[:, 0]
                summary = M.classification_summary(te_y_trial, np.asarray(pred), 5)
                self._save_logits(s, modality, "test", np.asarray(tl))
            else:
                pred = np.argmax(logits, axis=-1)
                summary = M.classification_summary(stack[3][i], pred, 5)
                self._save_logits(s, modality, "test", logits)
            if self.logits_dir is not None:
                # train-split logits per subject so fusion works after a
                # subject-parallel sweep too
                params_i = jax.tree.map(lambda p: p[i], stacked.params)
                bstats_i = jax.tree.map(lambda b: b[i], stacked.batch_stats)
                tr_logits = inner.predict(params_i, bstats_i, stack[0][i])
                if vote_group:
                    tr_logits = np.asarray(M.trial_vote(tr_logits, vote_group)[0])
                self._save_logits(s, modality, "train", tr_logits)
            out[s] = TaskResult(
                metrics={
                    "accuracy": summary["accuracy"],
                    "weighted_f1": summary["weighted_f1"],
                    # same JSONL schema as the serial path's _finish — mixed
                    # serial+stacked journals stay aggregation-compatible
                    "confusion": summary["confusion"],
                    "final_train_acc": float(stacked.history["train_acc"][i, -1]),
                    "epochs": epochs,
                    "fit_seconds": round(fit_s, 3),
                    "group_size": len(subjects),
                    # aggregate throughput of the stacked program (all
                    # subjects trained concurrently in fit_seconds)
                    "samples_per_sec": round(
                        len(subjects) * epochs * n_train / fit_s, 2
                    ),
                    # same per-stage split as the serial _finish rows:
                    # load is the whole group's data loop (shared), archive
                    # this subject's predict-train + logit saves
                    "load_seconds": round(load_s, 3),
                    "archive_seconds": round(time.perf_counter() - t_arch, 3),
                }
            )
        return out

    def run_eeg_stacked(self, subjects) -> Dict[int, TaskResult]:
        return self.run_stacked(subjects, "eeg")

    def run_fusion(
        self,
        subject: int,
        strict: bool = True,
        mods: Tuple[str, ...] = ("eeg", "audio", "vision"),
    ) -> TaskResult:
        """Late fusion over archived per-trial logits (BASELINE config 5).

        ``strict=True`` (production) requires equal, class-divisible row
        counts across modalities — truncation would silently misalign the
        per-class blocks that the label reconstruction assumes. Tests may
        pass strict=False to exercise the mechanism on unaligned synthetic
        data (labels then cover only the common prefix).

        ``mods`` selects the source archives, so fusion also composes over
        the alternative model families (e.g. ``("eeg_conformer",
        "audio_scnn", "vision_resnet")``)."""
        if self.logits_dir is None:
            raise ValueError("run_fusion requires logits_dir (archived per-trial logits)")

        def load(split):
            parts = [
                np.load(os.path.join(self.logits_dir, f"s{subject:02d}_{m}_{split}.npy"))
                for m in mods
            ]
            lens = {m: len(p) for m, p in zip(mods, parts)}
            n = min(lens.values())
            if strict and (len(set(lens.values())) != 1 or n % 5 != 0):
                raise ValueError(
                    f"modality logit counts misaligned for subject {subject}: {lens} "
                    "(per-class blocks would not line up; re-archive logits)"
                )
            n -= n % 5
            return np.stack([p[:n] for p in parts], axis=1).astype(np.float32)

        t = self._fusion_warm_thread
        if t is not None and t.is_alive():
            if self._fusion_warm_fitting.is_set():
                # the prewarm COMPILE is in flight: wait for it rather than
                # launching a duplicate compile of the same program
                t.join(timeout=1800)
            else:
                # still polling for archives — this task is about to read
                # them itself (or fail fast on their absence), so call the
                # poll off instead of blocking behind it
                self._fusion_warm_stop.set()
                t.join(timeout=30)
        tr = load("train")
        te = load("test")
        # labels follow eav_split's layout: per-class blocks in class order
        tr_y = np.repeat(np.arange(5), tr.shape[0] // 5)
        te_y = np.repeat(np.arange(5), te.shape[0] // 5)
        result = self._fusion_trainer(tr.shape[1]).fit(
            (tr, tr_y, te, te_y), seed=self.seed + subject
        )
        pred = np.argmax(result.outputs_test, axis=-1)
        summary = M.classification_summary(te_y, pred, 5)
        return TaskResult(
            metrics={
                "accuracy": summary["accuracy"],
                "weighted_f1": summary["weighted_f1"],
            },
            artifacts={"params": result.params},
        )

    def _fusion_trainer(self, n_mods: int) -> "JitTrainer":
        """The fusion-head trainer, cached per modality count: every fusion
        subject fits the same shapes, so one compiled phase program serves
        the whole sweep (and the warm_fusion prewarm below)."""
        key = f"fusion#{n_mods}"
        t = self._trainers.get(key)
        if t is None:
            preset = self.presets["fusion"]
            model, kw = build_model(preset)
            if getattr(model, "num_modalities", n_mods) != n_mods:
                model = model.clone(num_modalities=n_mods)
            t = JitTrainer(model, preset.finetune, **kw)
            self._trainers[key] = t
        return t

    def warm_fusion(
        self,
        mods: Tuple[str, ...] = ("eeg", "audio", "vision"),
        poll_s: float = 2.0,
        timeout_s: Optional[float] = None,
        stop=None,
    ) -> bool:
        """Compile the fusion phase program CONCURRENTLY with the sweep.

        The fusion head itself fits in ~1 s, but its first fit pays the full
        XLA compile — measured 680 s through the remote-compile tunnel on the
        2026-08-20 production journal, i.e. 95% of the fusion leg's 11.9 min
        wall was one compile, serialized AFTER all training because fusion
        consumes the other modalities' archived logits. The compile itself
        touches the device for ~no time, so it can hide entirely under the
        hours of training that precede fusion: poll ``logits_dir`` until the
        first archive lands (row counts fix the program's static shapes —
        strict fusion demands equal rows across modalities, so any one
        archive determines them), then run one throwaway fit on random
        logits of those shapes through the SAME cached trainer the real
        fusion tasks use. cli._run_sweep spawns this on a daemon thread via
        ``start_fusion_prewarm`` when fusion tasks are pending.

        ``mods``: the archive families fusion will load — the poll only
        accepts THEIR files, so alternative-family archives sharing the
        logits_dir (e.g. an eeg_conformer sweep) cannot feed the prewarm
        wrong row counts and silently waste the compile.

        ``stop``: optional threading.Event — checked each poll tick;
        ``run_fusion`` sets the instance-level one to call off a poll it is
        about to outrun. Returns True when a warm fit ran.
        """
        import glob
        import time as _time

        if self.logits_dir is None:
            return False
        stops = [s for s in (stop, self._fusion_warm_stop) if s is not None]
        deadline = None if timeout_s is None else _time.monotonic() + timeout_s
        shapes = None
        while shapes is None:
            if any(s.is_set() for s in stops):
                return False
            if deadline is not None and _time.monotonic() > deadline:
                return False
            for m in mods:
                for tr_p in sorted(glob.glob(
                    os.path.join(self.logits_dir, f"s*_{m}_train.npy")
                )):
                    te_p = tr_p[: -len("_train.npy")] + "_test.npy"
                    if not os.path.exists(te_p):
                        continue
                    try:  # archives are written atomically (_save_logits),
                        # but a stale/foreign file may still be unreadable
                        shapes = (len(np.load(tr_p)), len(np.load(te_p)))
                        break
                    except Exception:  # noqa: BLE001 — keep polling
                        continue
                if shapes is not None:
                    break
            if shapes is None:
                _time.sleep(poll_s)
        self._fusion_warm_fitting.set()  # past polling: run_fusion now waits
        # mirror run_fusion's shape discipline exactly (same program)
        n_mods = len(mods)
        n_tr, n_te = (n - n % 5 for n in shapes)
        rng = np.random.default_rng(0)
        tr = rng.normal(size=(n_tr, n_mods, 5)).astype(np.float32)
        te = rng.normal(size=(n_te, n_mods, 5)).astype(np.float32)
        tr_y = np.repeat(np.arange(5), n_tr // 5)
        te_y = np.repeat(np.arange(5), n_te // 5)
        t0 = _time.perf_counter()
        self._fusion_trainer(n_mods).fit((tr, tr_y, te, te_y), seed=self.seed)
        print(
            f"[sweep] fusion prewarm done in {_time.perf_counter() - t0:.1f}s "
            f"(train {n_tr} x {n_mods} mods; compile overlapped with the sweep)",
            flush=True,
        )
        return True

    def start_fusion_prewarm(self, **kw) -> "threading.Thread":
        """Spawn ``warm_fusion`` on a daemon thread (idempotent).
        ``run_fusion`` joins it, so the catch-all waits for — instead of
        duplicating — an in-flight compile."""
        import threading

        t = self._fusion_warm_thread
        if t is None:
            t = threading.Thread(
                target=self.warm_fusion, kwargs=kw, daemon=True,
                name="fusion-prewarm",
            )
            self._fusion_warm_thread = t
            t.start()
        return t

    def task_fn(self, subject: int, modality: str) -> TaskResult:
        if modality == "eeg":
            return self.run_eeg(subject)
        if modality == "eeg_conformer":
            return self.run_eeg(subject, "eeg_conformer")
        if modality == "audio":
            return self.run_audio(subject, "fbank")
        if modality == "audio_scnn":
            return self.run_audio(subject, "scnn180")
        if modality == "vision":
            return self.run_vision(subject)
        if modality == "vision_resnet":
            return self.run_vision(subject, "vision_resnet")
        if modality == "fusion":
            return self.run_fusion(subject)
        raise KeyError(f"unknown modality {modality!r}")
