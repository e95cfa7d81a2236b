"""Cross-chip task farm integration: real ModalityPipelines through
run_farmed on the 8-virtual-device CPU harness (VERDICT r3 next-round #1:
'an 8-virtual-device test proving farmed == serial metrics AND that tasks
executed on distinct devices')."""

import json

import numpy as np
import pytest

from eav_tpu.core.config import SweepConfig, apply_overrides
from eav_tpu.core.sweep import SweepRunner
from eav_tpu.train.pipeline import ModalityPipelines, _cfg_hash, default_presets

SUBJECTS = (1, 2, 3, 4)


def _presets():
    return apply_overrides(default_presets(), [
        "eeg.finetune.model_kwargs.kern_length=8",
        "eeg.finetune.phases.0.epochs=2",
        "eeg.split.h_idx=2",
    ])


def _seed_cache(cache_dir, presets):
    rng = np.random.default_rng(7)
    cache_dir.mkdir(parents=True, exist_ok=True)
    for s in SUBJECTS:
        x = rng.normal(size=(20, 30, 500)).astype(np.float32)
        y = np.repeat(np.arange(5), 4).astype(np.int32)
        np.savez(cache_dir / f"s{s:02d}_eeg_{_cfg_hash(presets['eeg'].eeg)}.npz", x=x, y=y)


def test_farm_real_pipelines_matches_serial(tmp_path):
    presets = _presets()
    cache = tmp_path / "cache"
    _seed_cache(cache, presets)

    def make_pipelines():
        return ModalityPipelines(
            "/nonexistent", cache_dir=str(cache), logits_dir=None, presets=presets
        )

    def run(mode):
        out = tmp_path / mode
        cfg = SweepConfig(
            subjects=SUBJECTS, modalities=("eeg",),
            journal_path=str(out / "journal.jsonl"),
            metrics_path=str(out / "metrics.jsonl"),
            checkpoint_dir=None,
        )
        runner = SweepRunner(cfg, make_pipelines().task_fn)
        if mode == "farm":
            import jax

            from eav_tpu.parallel.farm import device_workers

            workers = device_workers(make_pipelines, devices=jax.devices()[:2])
            state = runner.run_farmed(workers, verbose=False)
        else:
            state = runner.run(verbose=False)
        assert all(r["status"] == "done" for r in state.values())
        rows = [json.loads(l) for l in open(cfg.metrics_path)]
        metrics = {r["subject"]: r for r in rows if r.get("accuracy") is not None}
        return state, metrics

    s_state, s_metrics = run("serial")
    f_state, f_metrics = run("farm")
    # farmed == serial, per subject (same seed discipline, same ingest)
    for s in SUBJECTS:
        assert f_metrics[s]["accuracy"] == pytest.approx(s_metrics[s]["accuracy"])
        assert f_metrics[s]["weighted_f1"] == pytest.approx(s_metrics[s]["weighted_f1"])
        assert f_metrics[s]["epochs"] == s_metrics[s]["epochs"]
    # tasks executed on (at least) two distinct devices
    devices = {f_state[f"subject{s:02d}_eeg"]["device"] for s in SUBJECTS}
    assert len(devices) >= 2, devices


def test_farm_task_timeout_retires_worker_and_drains(tmp_path):
    """VERDICT r4 next #4: a wedged task must not hang the whole farm. The
    bad worker's task blows the soft deadline -> journaled failed with a
    ``timeout`` note, the worker retires (returning its ahead-claim to the
    pool), and the good worker drains every remaining task."""
    import threading

    from eav_tpu.core.sweep import TaskResult
    from eav_tpu.parallel.farm import DeviceWorker

    release = threading.Event()

    def good_fn(subject, modality):
        return TaskResult(metrics={"accuracy": 1.0})

    def hang_fn(subject, modality):
        release.wait(timeout=60.0)  # wedged far beyond the deadline
        return TaskResult(metrics={"accuracy": 0.0})

    cfg = SweepConfig(
        subjects=(1, 2, 3, 4, 5, 6), modalities=("eeg",),
        journal_path=str(tmp_path / "journal.jsonl"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
        max_retries=0,
    )
    runner = SweepRunner(cfg, good_fn)
    workers = [DeviceWorker("bad", hang_fn), DeviceWorker("good", good_fn)]
    try:
        state = runner.run_farmed(workers, verbose=False, task_timeout_s=0.5)
        # snapshot BEFORE releasing the zombie: once released it completes
        # hang_fn and journals ``done`` (the documented supersede-on-resume
        # behavior), mutating this shared state dict under the assertions
        state = {tid: dict(r) for tid, r in state.items()}
    finally:
        release.set()  # free the zombie helper so pytest exits promptly
    statuses = {tid: r["status"] for tid, r in state.items()}
    assert sorted(statuses.values()).count("failed") == 1, statuses
    assert sorted(statuses.values()).count("done") == 5, statuses
    failed = [r for r in state.values() if r["status"] == "failed"]
    assert failed[0].get("note") == "timeout"
    assert "deadline" in failed[0]["error"]
    # the survivor drained everything else; the farm summary counts only
    # completed tasks
    rows = [json.loads(l) for l in open(cfg.metrics_path)]
    summary = [r for r in rows if r.get("event") == "farm_summary"][-1]
    assert summary["n_tasks"] == 5
    done_devices = {r["device"] for r in state.values() if r["status"] == "done"}
    assert done_devices == {"good"}


def test_farm_prefetch_timeout_retires_worker_and_drains(tmp_path):
    """A wedged PREFETCH (it issues the same device H2D calls as a fit) must
    not hang the farm either: the worker's post-fit ``pf.join`` honors the
    task deadline, returns the ahead-claimed task to the pool, and retires
    — the survivor drains everything, nothing is journaled failed."""
    import threading

    from eav_tpu.core.sweep import TaskResult
    from eav_tpu.parallel.farm import DeviceWorker

    release = threading.Event()

    def task_fn(subject, modality):
        return TaskResult(metrics={"accuracy": 1.0})

    def hang_prefetch(subject, modality):
        release.wait(timeout=60.0)  # wedged far beyond the deadline

    cfg = SweepConfig(
        subjects=(1, 2, 3, 4, 5, 6), modalities=("eeg",),
        journal_path=str(tmp_path / "journal.jsonl"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
        max_retries=0,
    )
    runner = SweepRunner(cfg, task_fn)
    workers = [
        DeviceWorker("bad", task_fn, prefetch_fn=hang_prefetch),
        DeviceWorker("good", task_fn),
    ]
    try:
        state = runner.run_farmed(workers, verbose=False, task_timeout_s=0.5)
    finally:
        release.set()  # free the zombie prefetch so pytest exits promptly
    # every task completes (the wedge was only in prefetch, and its
    # ahead-claimed task went back to the pool for the survivor)
    assert sorted(r["status"] for r in state.values()) == ["done"] * 6, state
    rows = [json.loads(l) for l in open(cfg.metrics_path)]
    summary = [r for r in rows if r.get("event") == "farm_summary"][-1]
    assert summary["n_tasks"] == 6
    # the bad worker retired after its first fit: it ran exactly one task,
    # the survivor the rest
    by_dev = {}
    for r in state.values():
        by_dev[r["device"]] = by_dev.get(r["device"], 0) + 1
    assert by_dev["bad"] == 1 and by_dev["good"] == 5, by_dev


def test_farm_of_one_ahead_claims_last_task():
    """ADVICE r4: a single-worker farm skips the starvation guard — the last
    task IS ahead-claimed, so its prefetch overlaps the current fit."""
    from eav_tpu.core.sweep import TaskResult
    from eav_tpu.parallel.farm import DeviceWorker

    prefetched = []

    def task_fn(subject, modality):
        return TaskResult(metrics={"accuracy": 1.0})

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = SweepConfig(
            subjects=(1, 2), modalities=("eeg",),
            journal_path=f"{td}/journal.jsonl", metrics_path=f"{td}/metrics.jsonl",
        )
        runner = SweepRunner(cfg, task_fn)
        worker = DeviceWorker(
            "w0", task_fn, prefetch_fn=lambda s, m: prefetched.append((s, m))
        )
        state = runner.run_farmed([worker], verbose=False)
    assert all(r["status"] == "done" for r in state.values())
    # task 2 was ahead-claimed while task 1 ran -> its prefetch fired
    assert prefetched == [(2, "eeg")]


@pytest.mark.slow
def test_cli_chip_parallel_e2e(tmp_path):
    """`run --chip-parallel 2` end-to-end from synthetic .mat files: the
    farm path engages (journal device labels), metrics match a serial run,
    and the serial catch-all finds nothing left to do."""
    from eav_tpu.cli import main
    from eav_tpu.ingest import mat5

    root = tmp_path / "EAV"
    rng = np.random.default_rng(0)
    for s in (1, 2, 3):
        sdir = root / f"subject{s:02d}" / "EEG"
        sdir.mkdir(parents=True)
        seg = rng.normal(size=(4000, 4, 20))
        rows = np.asarray([1, 3, 5, 7, 9] * 4)
        label = np.zeros((10, 20))
        label[rows, np.arange(20)] = 1
        mat5.savemat(str(sdir / f"subject{s:02d}_eeg.mat"), {"seg": seg})
        mat5.savemat(str(sdir / f"subject{s:02d}_eeg_label.mat"), {"label": label})

    shrink = [
        "--set", "eeg.eeg.channels=4",
        "--set", "eeg.eeg.trial_seconds=8.0",
        "--set", "eeg.eeg.chunk_seconds=2.0",
        "--set", "eeg.split.h_idx=2",
        "--set", "eeg.finetune.phases.0.epochs=1",
        "--set", "eeg.finetune.model_kwargs.chans=4",
        "--set", "eeg.finetune.model_kwargs.samples=200",
        "--set", "eeg.finetune.model_kwargs.kern_length=16",
    ]

    def run(out, extra):
        rc = main([
            "run", "--data-root", str(root), "--subjects", "1-3",
            "--modalities", "eeg", "--out", str(out),
            "--cache-dir", str(tmp_path / "cache"), *shrink, *extra,
        ])
        assert rc == 0
        rows = [json.loads(l) for l in open(out / "metrics.jsonl")]
        return {r["subject"]: r for r in rows if r.get("accuracy") is not None}

    serial = run(tmp_path / "serial", [])
    farmed = run(tmp_path / "farm", ["--chip-parallel", "2"])
    for s in (1, 2, 3):
        assert farmed[s]["accuracy"] == pytest.approx(serial[s]["accuracy"], abs=1e-6)
        assert "device" in farmed[s]
    # --chip-parallel 1: the farm machinery with a single device-bound
    # worker (the single-chip smoke of the multi-chip path — the only farm
    # configuration the 1-chip dev tunnel can exercise on real hardware)
    farm1 = run(tmp_path / "farm1", ["--chip-parallel", "1"])
    for s in (1, 2, 3):
        assert farm1[s]["accuracy"] == pytest.approx(serial[s]["accuracy"], abs=1e-6)
        assert "device" in farm1[s]
    # single-worker accounting (ADVICE r4): the farm summary and journal of
    # the farm-of-one run, not just metrics equality
    rows1 = [json.loads(l) for l in open(tmp_path / "farm1" / "metrics.jsonl")]
    summary1 = [r for r in rows1 if r.get("event") == "farm_summary"][-1]
    assert summary1["n_workers"] == 1 and summary1["n_tasks"] == 3, summary1
    journal1 = [json.loads(l) for l in open(tmp_path / "farm1" / "journal.jsonl")]
    assert all(r["status"] == "done" for r in journal1 if "task" in r)
    journal = [json.loads(l) for l in open(tmp_path / "farm" / "journal.jsonl")]
    assert all(r["status"] == "done" for r in journal if "task" in r)

    # overlapped mode: --subject-parallel routes the stackable family to
    # worker 0's setup (run_batched groups), the farm excludes it, and the
    # farm summary reports zero farmed tasks but nonzero worker-0 busy time
    # (the stacked pass it absorbed)
    both = run(tmp_path / "overlap", [
        "--chip-parallel", "2", "--subject-parallel", "2",
    ])
    for s in (1, 2, 3):
        assert both[s]["accuracy"] == pytest.approx(serial[s]["accuracy"], abs=1e-6)
        assert both[s].get("group_size") == 2 or both[s].get("group_size") == 1, both[s]
    rows = [json.loads(l) for l in open(tmp_path / "overlap" / "metrics.jsonl")]
    summary = [r for r in rows if r.get("event") == "farm_summary"][-1]
    assert summary["n_tasks"] == 0  # eeg went through the stacked setups
    # the stacked pass is SPREAD: chunks [1,2] and [3] land on DIFFERENT
    # workers' setup_fns (cli._partition_stacked_chunks), so both workers
    # report setup busy time
    assert summary["busy_s"][0] > 0.0 and summary["busy_s"][1] > 0.0, summary
    # mutual exclusion with --data-parallel
    with pytest.raises(SystemExit):
        main([
            "run", "--data-root", str(root), "--subjects", "1",
            "--modalities", "eeg", "--out", str(tmp_path / "x"),
            "--chip-parallel", "2", "--data-parallel", "2", *shrink,
        ])
