"""Synthetic-subject end-to-end: full ingest -> split -> fine-tune -> sweep
-> fusion machinery on generated .mat/.wav/.mp4 data (SURVEY.md §4's
integration tier; the reference has nothing comparable)."""

import dataclasses
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eav_tpu.core.config import (
    AudioPreprocConfig,
    EEGPreprocConfig,
    FinetuneConfig,
    PhaseConfig,
    PresetConfig,
    SplitConfig,
    VisionPreprocConfig,
)
from eav_tpu.core.sweep import SweepRunner, SweepConfig
from eav_tpu.ingest import mat5
from eav_tpu.ingest.wav import write_wav
from eav_tpu.train.pipeline import ModalityPipelines

EMOTIONS = ["Neutral", "Sadness", "Anger", "Happiness", "Calmness"]
CH, T500, TRI = 4, 4000, 20  # 8 s trials @500 Hz -> 4 x 2 s chunks


def _make_subject(root, rng, subject=1):
    sdir = root / f"subject{subject:02d}"
    # EEG: one-hot rows drawn from the selected listening rows
    (sdir / "EEG").mkdir(parents=True)
    seg = rng.normal(size=(T500, CH, TRI))
    rows = np.asarray([1, 3, 5, 7, 9] * 4)
    label = np.zeros((10, TRI))
    label[rows, np.arange(TRI)] = 1
    mat5.savemat(str(sdir / "EEG" / f"subject{subject:02d}_eeg.mat"), {"seg": seg})
    mat5.savemat(str(sdir / "EEG" / f"subject{subject:02d}_eeg_label.mat"), {"label": label})
    # audio: 5 wavs (1/emotion), 16 kHz, 8 s -> 1 x 5 s segment each... use 20 s for 4 segments
    (sdir / "Audio").mkdir(parents=True)
    sr = 16000
    t = np.arange(20 * sr) / sr
    for i, emo in enumerate(EMOTIONS):
        x = 0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        write_wav(str(sdir / "Audio" / f"subject_{subject:02d}_Speaking_1_{emo}_.wav"), x, sr)
    # video: 5 mp4s (1/emotion), 12 strided frames each -> 2 samples of 6
    (sdir / "Video").mkdir(parents=True)
    for i, emo in enumerate(EMOTIONS):
        w = cv2.VideoWriter(
            str(sdir / "Video" / f"subject_{subject:02d}_Speaking_{i}_{emo}_.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 48),
        )
        for f in range(72):
            frame = np.full((48, 48, 3), 20 + 40 * i, np.uint8)
            frame += (rng.normal(size=frame.shape) * 5).astype(np.uint8)
            w.write(frame)
        w.release()


def _tiny_presets():
    split = SplitConfig(h_idx=2, samples_per_class=4)
    eeg_pre = EEGPreprocConfig(channels=CH, trial_seconds=8.0, chunk_seconds=2.0)
    eegnet_kwargs = dict(chans=CH, samples=200, kern_length=16, dropout_rate=0.25)
    return {
        "eeg": PresetConfig(
            name="eeg_tiny", description="", split=split, eeg=eeg_pre,
            finetune=FinetuneConfig(
                model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
                phases=(PhaseConfig(epochs=2, lr=1e-3, freeze=False),),
                model_kwargs=eegnet_kwargs,
            ),
        ),
        "audio_scnn": PresetConfig(
            name="aud_tiny", description="", split=SplitConfig(h_idx=2),
            audio=AudioPreprocConfig(frontend="scnn180"),
            finetune=FinetuneConfig(
                model="scnn_audio", batch_size=8, optimizer="adam", weight_decay=0.0,
                phases=(PhaseConfig(epochs=1, lr=1e-3, freeze=False),),
            ),
        ),
        "audio": PresetConfig(  # AST-tiny standing in for the flagship
            name="ast_tiny", description="", split=SplitConfig(h_idx=2),
            audio=AudioPreprocConfig(frontend="fbank", max_frames=128),
            finetune=FinetuneConfig(
                model="ast", batch_size=4, optimizer="adamw", weight_decay=0.01,
                phases=(
                    PhaseConfig(epochs=1, lr=5e-4, freeze=True),
                    PhaseConfig(epochs=1, lr=5e-6, freeze=False),
                ),
                model_kwargs=dict(
                    hidden=32, layers=1, heads=2, mlp_dim=64, max_frames=128
                ),
            ),
        ),
        "vision": PresetConfig(
            name="vit_tiny", description="", split=SplitConfig(h_idx=1),
            vision=VisionPreprocConfig(
                frame_stride=6, max_frames=72, frames_per_sample=6,
                image_size=32, face_detection=False,
            ),
            finetune=FinetuneConfig(
                model="vit", batch_size=8, optimizer="adamw", weight_decay=0.01,
                phases=(PhaseConfig(epochs=1, lr=5e-4, freeze=True),
                        PhaseConfig(epochs=1, lr=5e-6, freeze=False)),
                vote_group=6,
                model_kwargs=dict(
                    hidden=32, layers=1, heads=2, mlp_dim=64, image_size=32
                ),
            ),
        ),
        "fusion": PresetConfig(
            name="fusion_tiny", description="", split=SplitConfig(h_idx=2),
            finetune=FinetuneConfig(
                model="fusion", batch_size=8, optimizer="adamw", weight_decay=1e-4,
                phases=(PhaseConfig(epochs=3, lr=5e-2, freeze=False),),
            ),
        ),
    }


@pytest.mark.slow
def test_full_pipeline_and_sweep(tmp_path, rng):
    root = tmp_path / "EAV"
    root.mkdir()
    _make_subject(root, rng, subject=1)
    out = tmp_path / "run"
    pipelines = ModalityPipelines(
        data_root=str(root),
        cache_dir=str(out / "cache"),
        logits_dir=str(out / "logits"),
        presets=_tiny_presets(),
    )
    cfg = SweepConfig(
        subjects=(1,),
        modalities=("eeg", "audio", "vision"),
        journal_path=str(out / "journal.jsonl"),
        metrics_path=str(out / "metrics.jsonl"),
    )
    runner = SweepRunner(cfg, pipelines.task_fn)
    state = runner.run(verbose=True)
    assert all(r["status"] == "done" for r in state.values()), state
    agg = runner.aggregate()
    assert set(agg) == {"eeg", "audio", "vision"}
    for mod in agg:
        assert 0.0 <= agg[mod]["mean_accuracy"] <= 1.0

    # feature caches exist and make the second load instant
    assert len(os.listdir(out / "cache")) >= 3
    # archived logits enable fusion when counts align — here EEG has 80
    # trials vs audio 20 vs vision 10, so strict mode must refuse (silent
    # truncation would misalign class blocks) while non-strict exercises the
    # mechanism end-to-end:
    with pytest.raises(ValueError, match="misaligned"):
        pipelines.run_fusion(1)
    fus = pipelines.run_fusion(1, strict=False)
    assert 0.0 <= fus.metrics["accuracy"] <= 1.0

    # resume is a no-op
    assert SweepRunner(cfg, pipelines.task_fn).pending_tasks() == []


@pytest.mark.slow
def test_subject_parallel_eeg_pipeline(tmp_path, rng):
    """run_eeg_stacked: two synthetic subjects as one sharded program, with
    journal records identical to the serial path."""
    root = tmp_path / "EAV"
    root.mkdir()
    _make_subject(root, rng, subject=1)
    _make_subject(root, rng, subject=2)
    out = tmp_path / "run"
    pipelines = ModalityPipelines(
        data_root=str(root),
        cache_dir=str(out / "cache"),
        logits_dir=str(out / "logits"),
        presets=_tiny_presets(),
    )
    cfg = SweepConfig(
        subjects=(1, 2),
        modalities=("eeg",),
        journal_path=str(out / "journal.jsonl"),
        metrics_path=str(out / "metrics.jsonl"),
    )
    runner = SweepRunner(cfg, pipelines.task_fn)
    state = runner.run_batched("eeg", pipelines.run_eeg_stacked, group_size=2, verbose=False)
    assert state["subject01_eeg"]["status"] == "done"
    assert state["subject02_eeg"]["status"] == "done"
    agg = runner.aggregate()
    assert agg["eeg"]["n_subjects"] == 2
    # the stacked path must archive BOTH splits' logits so fusion can follow
    for s_ in (1, 2):
        for split in ("train", "test"):
            assert (out / "logits" / f"s{s_:02d}_eeg_{split}.npy").exists()


@pytest.mark.slow
def test_subject_parallel_vision_pipeline(tmp_path, rng):
    """run_stacked('vision'): stacked ViT over two synthetic subjects gives
    the same per-subject accuracy as the serial run_vision path (VERDICT
    round-1 gap: vision at sweep scale, `Transformer_Vision.py:82-83`)."""
    root = tmp_path / "EAV"
    root.mkdir()
    _make_subject(root, rng, subject=1)
    _make_subject(root, rng, subject=2)
    out = tmp_path / "run"
    presets = _tiny_presets()
    pipelines = ModalityPipelines(
        data_root=str(root), cache_dir=str(out / "cache"),
        logits_dir=str(out / "logits"), presets=presets,
    )
    stacked = pipelines.run_stacked([1, 2], "vision")
    assert set(stacked) == {1, 2}
    for s in (1, 2):
        m = stacked[s].metrics
        assert 0.0 <= m["accuracy"] <= 1.0
        assert m["samples_per_sec"] > 0
        # trial-voted logits archived for both splits (fusion-ready)
        assert (out / "logits" / f"s{s:02d}_vision_test.npy").exists()
        assert (out / "logits" / f"s{s:02d}_vision_train.npy").exists()
    # stacked == serial per-subject accuracy (same PRNG discipline)
    serial = pipelines.run_vision(1)
    assert stacked[1].metrics["accuracy"] == pytest.approx(
        serial.metrics["accuracy"], abs=1e-6
    )
    # schema alignment (VERDICT r2 weak #5): a mixed serial+stacked journal
    # must carry the same metric keys either path — the stacked rows add only
    # group_size (their one extra, meaningful field)
    assert set(serial.metrics) | {"group_size"} == set(stacked[1].metrics)
    assert stacked[1].metrics["confusion"] == serial.metrics["confusion"]


@pytest.mark.slow
def test_subject_parallel_pretrained_init(tmp_path, rng, monkeypatch):
    """The stacked path must start from the pretrained checkpoint when one is
    available — previously it silently trained from random init (VERDICT
    round-1 missing #1; reference `Dataload_audio.py:110-114`)."""
    import jax as _jax
    import eav_tpu.train.pipeline as P

    root = tmp_path / "EAV"
    root.mkdir()
    _make_subject(root, rng, subject=1)
    _make_subject(root, rng, subject=2)
    out = tmp_path / "run"
    presets = _tiny_presets()
    pipelines = ModalityPipelines(
        data_root=str(root), cache_dir=str(out / "cache"),
        logits_dir=str(out / "logits"), presets=presets,
    )
    # a fixed fake "checkpoint" for the tiny AST config
    from eav_tpu.models.ast import AST
    model = AST(**presets["audio"].finetune.model_kwargs)
    import jax.numpy as jnp
    ckpt = model.init(
        {"params": _jax.random.PRNGKey(123), "dropout": _jax.random.PRNGKey(123)},
        jnp.zeros((1, 128, 128), jnp.float32), train=False,
    )["params"]
    calls = []
    def fake_pretrained(model_name, num_labels):
        calls.append(model_name)
        return (ckpt, None) if model_name == "ast" else (None, None)
    monkeypatch.setattr(P, "_pretrained_params", fake_pretrained)

    stacked = pipelines.run_stacked([1, 2], "audio")
    assert "ast" in calls, "run_stacked never consulted the checkpoint loader"
    serial = pipelines.run_audio(1, "fbank")
    assert stacked[1].metrics["accuracy"] == pytest.approx(
        serial.metrics["accuracy"], abs=1e-6
    )


def _make_aligned_subject(root, rng, subject=1):
    """A subject whose three modalities yield the SAME sample count (20) in
    the same class-block layout — the real dataset's alignment (400 rows
    everywhere), shrunk: EEG 20 trials x 1 chunk, audio 5 wav x 4 segments,
    vision 5 clips x 4 samples."""
    sdir = root / f"subject{subject:02d}"
    (sdir / "EEG").mkdir(parents=True)
    T = 4000  # 8 s @ 500 Hz
    seg = rng.normal(size=(T, CH, 20))
    rows = np.asarray([1, 3, 5, 7, 9] * 4)
    label = np.zeros((10, 20))
    label[rows, np.arange(20)] = 1
    mat5.savemat(str(sdir / "EEG" / f"subject{subject:02d}_eeg.mat"), {"seg": seg})
    mat5.savemat(str(sdir / "EEG" / f"subject{subject:02d}_eeg_label.mat"), {"label": label})
    (sdir / "Audio").mkdir(parents=True)
    sr = 16000
    t = np.arange(20 * sr) / sr
    for i, emo in enumerate(EMOTIONS):
        x = 0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        write_wav(str(sdir / "Audio" / f"subject_{subject:02d}_Speaking_1_{emo}_.wav"), x, sr)
    (sdir / "Video").mkdir(parents=True)
    for i, emo in enumerate(EMOTIONS):
        w = cv2.VideoWriter(
            str(sdir / "Video" / f"subject_{subject:02d}_Speaking_{i}_{emo}_.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 48),
        )
        for f in range(72):
            frame = np.full((48, 48, 3), 20 + 40 * i, np.uint8)
            frame += (rng.normal(size=frame.shape) * 5).astype(np.uint8)
            w.write(frame)
        w.release()


def _aligned_presets():
    """_tiny_presets aligned to _make_aligned_subject's 20-sample layout:
    EEG 8 s = ONE chunk, vision 12 strided frames -> 4 samples of 3."""
    presets = _tiny_presets()
    presets["eeg"] = dataclasses.replace(
        presets["eeg"],
        eeg=EEGPreprocConfig(channels=CH, trial_seconds=8.0, chunk_seconds=8.0),
        finetune=dataclasses.replace(
            presets["eeg"].finetune,
            model_kwargs=dict(chans=CH, samples=800, kern_length=16, dropout_rate=0.25),
        ),
    )
    presets["vision"] = dataclasses.replace(
        presets["vision"],
        split=SplitConfig(h_idx=2),
        vision=VisionPreprocConfig(
            frame_stride=6, max_frames=72, frames_per_sample=3,
            image_size=32, face_detection=False,
        ),
        finetune=dataclasses.replace(presets["vision"].finetune, vote_group=3),
    )
    return presets


@pytest.mark.slow
def test_strict_fusion_end_to_end(tmp_path, rng):
    """Aligned tri-modal subject through run_fusion(strict=True): the
    production path (VERDICT round-1 weak: fusion only ever ran strict=False
    on misaligned data), plus fusion over an alternative model family."""
    root = tmp_path / "EAV"
    root.mkdir()
    _make_aligned_subject(root, rng, subject=1)
    out = tmp_path / "run"
    presets = _aligned_presets()
    pipelines = ModalityPipelines(
        data_root=str(root), cache_dir=str(out / "cache"),
        logits_dir=str(out / "logits"), presets=presets,
    )
    pipelines.run_eeg(1)
    pipelines.run_audio(1, "fbank")
    pipelines.run_vision(1)
    # all three archives have 10 train / 10 test rows -> strict must pass
    for m in ("eeg", "audio", "vision"):
        assert np.load(out / "logits" / f"s01_{m}_train.npy").shape[0] == 10, m
    fus = pipelines.run_fusion(1, strict=True)
    assert 0.0 <= fus.metrics["accuracy"] <= 1.0

    # fusion over an alternative family mix (audio_scnn instead of AST)
    pipelines.run_audio(1, "scnn180")
    fus2 = pipelines.run_fusion(1, strict=True, mods=("eeg", "audio_scnn", "vision"))
    assert 0.0 <= fus2.metrics["accuracy"] <= 1.0

    # two-modality fusion exercises the num_modalities clone path
    fus3 = pipelines.run_fusion(1, strict=True, mods=("eeg", "vision"))
    assert 0.0 <= fus3.metrics["accuracy"] <= 1.0


@pytest.mark.slow
def test_farmed_trimodal_with_fusion_catchall(tmp_path, rng):
    """The exact composition cli._run_sweep executes for a farmed tri-modal
    sweep: run_farmed spreads the eeg/audio/vision fine-tunes over two
    device-bound workers (real ModalityPipelines per worker, real ingest ->
    fit -> logit archive) and DEFERS fusion; the serial catch-all pass then
    runs strict fusion over the farmed workers' archives. Guards the whole
    farm -> archives -> fusion dependency chain that the runner-level unit
    test (tests/test_sweep.py) only mocks."""
    import jax

    from eav_tpu.parallel.farm import device_workers

    root = tmp_path / "EAV"
    root.mkdir()
    for s in (1, 2):
        _make_aligned_subject(root, rng, subject=s)
    out = tmp_path / "run"

    def make_pipelines():
        return ModalityPipelines(
            data_root=str(root), cache_dir=str(out / "cache"),
            logits_dir=str(out / "logits"), presets=_aligned_presets(),
        )

    cfg = SweepConfig(
        subjects=(1, 2),
        modalities=("eeg", "audio", "vision", "fusion"),
        journal_path=str(out / "journal.jsonl"),
        metrics_path=str(out / "metrics.jsonl"),
    )
    runner = SweepRunner(cfg, make_pipelines().task_fn)
    workers = device_workers(make_pipelines, devices=jax.devices()[:2])
    state = runner.run_farmed(workers, verbose=False)
    # every producer done across (at least) two devices; fusion deferred
    assert sorted(runner.pending_tasks()) == [(1, "fusion"), (2, "fusion")]
    assert all(r["status"] == "done" for r in state.values())
    assert len({r["device"] for r in state.values()}) == 2, state
    # archives aligned (10 train rows per modality per subject) -> the
    # catch-all serial pass completes strict fusion from the farmed outputs
    state = runner.run(verbose=False)
    for s in (1, 2):
        rec = state[f"subject{s:02d}_fusion"]
        assert rec["status"] == "done"
    agg = runner.aggregate()
    assert 0.0 <= agg["fusion"]["mean_accuracy"] <= 1.0


def test_fusion_fuses_complementary_modalities(tmp_path, rng):
    """Fusion must actually FUSE (VERDICT r4 missing #3): synthetic tri-modal
    archives where the class information is SPLIT across modalities — EEG
    separates {0,1}, audio {2,3}, vision {4}; every other class looks like
    noise to that modality — so each single modality caps near 50% while the
    fused score can only exceed them by combining sources. Asserted through
    the production ``run_fusion(strict=True)`` path for both fuser modes
    (models/fusion.py). A sign-flipped or weight-collapsed fusion head fails
    this where every chance-accuracy machinery test would pass."""
    import dataclasses as _dc

    from eav_tpu.train.pipeline import default_presets

    logits_dir = tmp_path / "logits"
    logits_dir.mkdir(parents=True)
    known = {"eeg": (0, 1), "audio": (2, 3), "vision": (4,)}
    n_train, n_test = 150, 50
    for split, n in (("train", n_train), ("test", n_test)):
        y = np.repeat(np.arange(5), n // 5)  # eav_split per-class block layout
        for m, ks in known.items():
            logits = rng.normal(size=(n, 5)).astype(np.float32)
            informative = np.isin(y, ks)
            logits[informative] = (
                rng.normal(size=(informative.sum(), 5)) * 0.3
            ).astype(np.float32)
            logits[informative, y[informative]] += 5.0
            np.save(logits_dir / f"s01_{m}_{split}.npy", logits)

    te_y = np.repeat(np.arange(5), n_test // 5)
    singles = {
        m: float(
            (np.load(logits_dir / f"s01_{m}_test.npy").argmax(1) == te_y).mean()
        )
        for m in known
    }
    # each single modality is capped: 2 known classes + chance on the rest
    assert max(singles.values()) < 0.7, singles

    for mode in ("weighted", "mlp"):
        presets = default_presets()
        fus_ft = _dc.replace(
            presets["fusion"].finetune, model_kwargs={"mode": mode}
        )
        presets["fusion"] = _dc.replace(presets["fusion"], finetune=fus_ft)
        pipelines = ModalityPipelines(
            data_root="/nonexistent", cache_dir=str(tmp_path / "cache"),
            logits_dir=str(logits_dir), presets=presets,
        )
        fus = pipelines.run_fusion(1, strict=True)
        acc = fus.metrics["accuracy"]
        # fused beats EVERY single modality by a real margin
        assert acc >= 0.85, (mode, acc, singles)
        assert acc > max(singles.values()) + 0.15, (mode, acc, singles)


def test_fusion_beats_every_single_modality(tmp_path):
    """Fusion must actually FUSE (VERDICT r4 missing #3): synthetic tri-modal
    archives where class information is SPLIT across modalities — EEG logits
    separate classes {0,1}, audio {2,3}, vision {4}; each modality is pure
    noise on the classes it doesn't know — so each single modality caps near
    0.5/0.36 while the fused head can reach ~1.0. Asserts, through the
    production ``run_fusion(strict=True)`` path for BOTH fuser modes, that
    fused accuracy clears every single-modality accuracy by a wide margin
    (a sign-flipped or dead fusion head cannot pass). Complements the
    machinery-level fusion tests that run at chance accuracy.

    Fusion is a net-new capability: the reference only hints at it via the
    dead ``Fusion.VIT_audio`` import (`CNN_torch/EEGNet_tor.py:4`)."""
    from eav_tpu.train.pipeline import default_presets

    rng = np.random.default_rng(0)
    n_tr, n_te = 100, 50  # strict mode: equal, class-divisible counts
    y_tr = np.repeat(np.arange(5), n_tr // 5)
    y_te = np.repeat(np.arange(5), n_te // 5)

    def modality_logits(known, y, strength=4.0):
        logits = rng.normal(size=(len(y), 5)).astype(np.float32)
        mask = np.isin(y, known)
        logits[mask, y[mask]] += strength
        return logits

    known = {"eeg": (0, 1), "audio": (2, 3), "vision": (4,)}
    ldir = tmp_path / "logits"
    ldir.mkdir()
    single_acc = {}
    for m, k in known.items():
        np.save(ldir / f"s01_{m}_train.npy", modality_logits(k, y_tr))
        te = modality_logits(k, y_te)
        np.save(ldir / f"s01_{m}_test.npy", te)
        single_acc[m] = float((np.argmax(te, -1) == y_te).mean())
    # the construction really does cap each modality (~0.5 / ~0.36)
    assert max(single_acc.values()) < 0.65, single_acc

    for mode in ("weighted", "mlp"):
        presets = default_presets()
        ft = dataclasses.replace(
            presets["fusion"].finetune, model_kwargs={"mode": mode}
        )
        presets["fusion"] = presets["fusion"].replace(finetune=ft)
        pipe = ModalityPipelines(
            data_root=str(tmp_path / "unused"),
            logits_dir=str(ldir),
            presets=presets,
        )
        res = pipe.run_fusion(1, strict=True)
        acc = res.metrics["accuracy"]
        assert acc >= 0.8, (mode, acc, single_acc)
        assert acc > max(single_acc.values()) + 0.15, (mode, acc, single_acc)


def test_fusion_prewarm_compiles_and_matches_cold(tmp_path, rng):
    """The fusion compile prewarm (train/pipeline.warm_fusion): on the
    2026-08-20 hardware journal, 680 s of the 715 s fusion leg was the ONE
    XLA compile of the fusion phase program, serialized after all training
    because fusion consumes archived logits. The prewarm polls the archive
    dir on a daemon thread, reads the static shapes off the first archive,
    and runs a throwaway fit through the SAME cached trainer
    (_fusion_trainer) — so the catch-all's real fusion fits start warm.
    Asserts: warm thread completes from archives, populates the trainer
    cache, run_fusion joins it and produces metrics identical to a cold
    pipelines instance; with no archives the poll times out False."""
    from eav_tpu.train.pipeline import default_presets

    ldir = tmp_path / "logits"
    ldir.mkdir()
    n_tr, n_te = 50, 25
    for m in ("eeg", "audio", "vision"):
        for split, n in (("train", n_tr), ("test", n_te)):
            logits = rng.normal(size=(n, 5)).astype(np.float32)
            np.save(ldir / f"s01_{m}_{split}.npy", logits)

    def mk():
        return ModalityPipelines(
            data_root=str(tmp_path / "unused"), logits_dir=str(ldir),
            presets=default_presets(),
        )

    cold = mk()
    r_cold = cold.run_fusion(1, strict=True)

    warm = mk()
    t = warm.start_fusion_prewarm(poll_s=0.05, timeout_s=60)
    assert warm.start_fusion_prewarm() is t  # idempotent
    t.join(120)
    assert not t.is_alive()
    assert "fusion#3" in warm._trainers  # the prewarm populated the cache
    r_warm = warm.run_fusion(1, strict=True)
    assert r_warm.metrics["accuracy"] == pytest.approx(
        r_cold.metrics["accuracy"], abs=1e-6
    )

    # no archives ever arrive -> the poll gives up quietly
    empty = ModalityPipelines(
        data_root=str(tmp_path / "unused"), logits_dir=str(tmp_path / "none"),
        presets=default_presets(),
    )
    assert empty.warm_fusion(poll_s=0.02, timeout_s=0.2) is False
    # no logits_dir at all -> immediate False
    bare = ModalityPipelines(data_root=str(tmp_path / "unused"))
    assert bare.warm_fusion(timeout_s=0.1) is False

    # only foreign-family archives -> the mods-restricted poll ignores them
    # (an alt-family sweep sharing the logits_dir must not feed the prewarm
    # wrong static shapes; code-review r5)
    alt = tmp_path / "alt"
    alt.mkdir()
    for split in ("train", "test"):
        np.save(alt / f"s01_eeg_conformer_{split}.npy",
                rng.normal(size=(30, 5)).astype(np.float32))
    altp = ModalityPipelines(
        data_root=str(tmp_path / "unused"), logits_dir=str(alt),
        presets=default_presets(),
    )
    assert altp.warm_fusion(poll_s=0.02, timeout_s=0.3) is False


def test_run_fusion_calls_off_polling_prewarm(tmp_path):
    """A prewarm still POLLING (no archives yet) must not block run_fusion
    behind the 30-min compile join (code-review r5): run_fusion signals the
    poll off and proceeds to its own fast failure on the missing archives."""
    import time as _t

    from eav_tpu.train.pipeline import default_presets

    pipe = ModalityPipelines(
        data_root=str(tmp_path / "unused"), logits_dir=str(tmp_path / "empty"),
        presets=default_presets(),
    )
    t = pipe.start_fusion_prewarm(poll_s=0.05)  # no timeout: polls until told
    t0 = _t.perf_counter()
    with pytest.raises(FileNotFoundError):
        pipe.run_fusion(1, strict=True)
    assert _t.perf_counter() - t0 < 20
    t.join(10)
    assert not t.is_alive()
