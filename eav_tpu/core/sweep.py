"""Journaled subject x modality sweep scheduler with resume + JSONL metrics.

The reference's "sweep" is a bare ``for sub in range(1, 43)`` loop that
crashes on any failure and logs via append-txt
(`Dataload_audio.py:80-115`, `Transformer_Audio.py:102-103`). This runner
gives the 126-task (42 subjects x 3 modalities) sweep the auxiliary
subsystems the reference lacks (SURVEY.md §5):

- per-task journal (JSONL): done/failed state, attempts, wall-clock — a new
  run resumes by skipping completed tasks and retrying failed ones;
- structured metrics JSONL (subject, modality, accuracy, weighted F1,
  samples/sec, wall-clock) replacing print+txt;
- optional checkpoint of final params per task (core/checkpoint.py);
- pluggable task functions so tests can run the full machinery on synthetic
  data (and fusion can consume archived logits).
"""

from __future__ import annotations

import json
import os
import time
import traceback
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from eav_tpu.core.config import SweepConfig


@dataclass
class TaskResult:
    metrics: Dict[str, Any]
    artifacts: Optional[Dict[str, Any]] = None  # e.g. params to checkpoint


TaskFn = Callable[[int, str], TaskResult]  # (subject, modality) -> result

# Farm claim order: longest expected family first (LPT heuristic). The
# pending list is modality-major in SweepConfig order, which typically puts
# the LONGEST family (vision, measured ~141 s/subject round 3) at the TAIL —
# the last vision task would then run alone while every other chip idles,
# adding up to one full task length to the makespan. Ranks follow the
# measured per-subject walls (docs/RUNBOOK.md): vision > audio > conformer >
# EEGNet > SCNN; unknown modalities keep list position among themselves.
_FARM_DURATION_RANK = {
    "vision": 0, "vision_resnet": 1, "audio": 2, "eeg_conformer": 3,
    "eeg": 4, "audio_scnn": 5,
}


def _read_jsonl(path: str) -> List[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        lines = [l.strip() for l in f]
    for i, line in enumerate(lines):
        if not line:
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            # a torn FINAL line can be seen by a reader in another process
            # (watchdog tail, concurrent CLI) racing an append; treat it as
            # not-yet-written. Corruption anywhere else is a real error.
            if i == len(lines) - 1:
                break
            raise
    return out


def _append_jsonl(path: str, record: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


class SweepRunner:
    def __init__(self, cfg: SweepConfig, task_fn: TaskFn):
        self.cfg = cfg
        self.task_fn = task_fn
        # serializes journal/metrics appends + state updates: the farmed
        # path (run_farmed) executes tasks from concurrent worker threads
        import threading

        self._log_lock = threading.Lock()

    def _task_id(self, subject: int, modality: str) -> str:
        return f"subject{subject:02d}_{modality}"

    def journal_state(self) -> Dict[str, dict]:
        """Latest journal record per task id. Read under the log lock: the
        overlapped farm (a worker's stacked setup_fn calling run_batched
        while other workers journal their tasks) reads and appends this
        file concurrently within one process."""
        with self._log_lock:
            return self._journal_state_unlocked()

    def _journal_state_unlocked(self) -> Dict[str, dict]:
        state: Dict[str, dict] = {}
        for rec in _read_jsonl(self.cfg.journal_path):
            if "task" in rec:  # skip event records (e.g. farm summaries)
                state[rec["task"]] = rec
        return state

    def pending_tasks(self) -> List[Tuple[int, str]]:
        state = self.journal_state() if self.cfg.resume else {}
        tasks = []
        for modality in self.cfg.modalities:
            for subject in self.cfg.subjects:
                tid = self._task_id(subject, modality)
                rec = state.get(tid)
                if rec is None:
                    tasks.append((subject, modality))
                elif rec["status"] == "failed" and rec.get("attempts", 1) <= self.cfg.max_retries:
                    tasks.append((subject, modality))
        return tasks

    def _run_one(
        self,
        subject: int,
        modality: str,
        task_fn: TaskFn,
        state: Dict[str, dict],
        verbose: bool,
        extra: Optional[dict] = None,
    ) -> dict:
        """Execute ONE task and journal the outcome. Thread-safe: journal and
        metrics appends and the shared ``state`` update are serialized under
        ``_log_lock`` (the farmed path runs this from N worker threads;
        distinct tasks per worker are guaranteed by the claim lock)."""
        tid = self._task_id(subject, modality)
        with self._log_lock:
            attempts = state.get(tid, {}).get("attempts", 0) + 1
        t0 = time.perf_counter()
        try:
            result = task_fn(subject, modality)
            wall = time.perf_counter() - t0
            metrics = dict(result.metrics)
            metrics.update(subject=subject, modality=modality, wall_clock_s=round(wall, 3))
            if extra:
                metrics.update(extra)
            if result.artifacts and self.cfg.checkpoint_dir:
                from eav_tpu.core.checkpoint import save_pytree

                save_pytree(
                    os.path.join(self.cfg.checkpoint_dir, tid), result.artifacts
                )
            rec = {
                "task": tid,
                "status": "done",
                "attempts": attempts,
                "wall_clock_s": round(wall, 3),
                "ts": time.time(),
            }
        except Exception as e:  # noqa: BLE001 — task isolation is the point
            metrics = None
            rec = {
                "task": tid,
                "status": "failed",
                "attempts": attempts,
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc(limit=5),
                "ts": time.time(),
            }
        if extra:
            rec.update(extra)
        with self._log_lock:
            if metrics is not None:
                _append_jsonl(self.cfg.metrics_path, metrics)
            _append_jsonl(self.cfg.journal_path, rec)
            state[tid] = rec
        if verbose:
            if rec["status"] == "done":
                print(f"[sweep] {tid} done in {rec['wall_clock_s']}s")
            else:
                print(f"[sweep] {tid} FAILED ({rec['error']})")
        return rec

    def run(self, verbose: bool = True, prefetch_fn=None) -> Dict[str, dict]:
        """``prefetch_fn(subject, modality)``: optional — launched in a
        daemon thread for task N+1 as task N starts, overlapping the next
        task's ingest/H2D with the current task's device compute (the
        pipelines' ``ModalityPipelines.prefetch``). Joined before task N+1
        runs, so the consumer never races the producer."""
        import threading

        state = self.journal_state()
        tasks = self.pending_tasks()
        for i, (subject, modality) in enumerate(tasks):
            prefetch_thread = None
            if prefetch_fn is not None and i + 1 < len(tasks):
                prefetch_thread = threading.Thread(
                    target=prefetch_fn, args=tasks[i + 1], daemon=True
                )
                prefetch_thread.start()
            self._run_one(subject, modality, self.task_fn, state, verbose)
            if prefetch_thread is not None:
                prefetch_thread.join()
        return state

    def run_farmed(
        self,
        workers: Sequence,
        verbose: bool = True,
        exclude_modalities: Sequence[str] = (),
        task_timeout_s: Optional[float] = None,
    ) -> Dict[str, dict]:
        """Cross-chip task farm: ``len(workers)`` device-bound workers
        concurrently pull pending (subject, modality) tasks — ONE serial
        fine-tune per chip, all chips busy. This is the TPU-native scale-out
        for the serial-policy model families (AST/ViT saturate a chip alone,
        cli.py ``_STACK_CAPS``), replacing the reference's only multi-device
        engagement, ``nn.DataParallel``'s automatic intra-host scatter
        (`Transformer_Audio.py:59-60`, `Transformer_Vision.py:82-83`) — and
        the mechanism behind the "42 subjects x 3 modalities scheduled across
        v5e-8 cores" lever (SURVEY.md §2.3).

        ``workers``: ``parallel.farm.DeviceWorker``-likes — ``.name`` (device
        label journaled per task), ``.task_fn`` and optional ``.prefetch_fn``,
        both already bound to the worker's device (parallel/farm.py binds via
        thread-local ``jax.default_device``). Tasks are claimed under a lock
        (journal-safe: each task runs on exactly one worker); each worker
        claims one task AHEAD and prefetches it while the current task fits,
        so ingest/H2D overlaps device compute per chip, like the serial
        path's prefetch. A farm summary row (per-worker busy seconds, tasks,
        makespan — the accounting behind the v5e-8 wall-clock claims) is
        appended to the metrics JSONL.

        ``exclude_modalities``: families the caller drives through another
        scheduler concurrently with this farm — cli._run_sweep excludes the
        stacked subject-parallel families, which worker 0's ``setup_fn``
        (below) runs through ``run_batched`` on its own device before
        joining the claim loop, so every chip is busy from t=0. Fusion is
        ALWAYS excluded: it consumes the other modalities' archived logits
        (pipeline.run_fusion); farmed concurrently with its producers it
        would read half-written archives or fail on missing ones. It runs
        in the caller's serial catch-all — at ~1 s per 100-epoch
        logit-head fit, 42 fusion tasks cost under 2 min serial, noise
        next to the farmed legs.

        A worker's optional ``setup_fn`` (parallel/farm.DeviceWorker) runs
        on the worker's thread BEFORE its first claim; its wall time counts
        toward that worker's busy seconds in the farm summary. A setup
        failure is logged and the worker proceeds to the claim loop — the
        setup's own tasks stay pending for the serial catch-all.

        ``task_timeout_s``: per-task soft deadline (None = off, the default).
        A device call can wedge forever (observed twice on hardware
        2026-08-18: the axon worker hangs mid-subject, docs/ROUND3.md);
        without a deadline one wedged fit hangs the farm's ``join()`` until
        the cross-process watchdog (scripts/run_production_sweep.py
        ``--watchdog-minutes``) kills the WHOLE CLI, losing every worker's
        in-flight task to recover one. With a deadline the farm degrades
        per-chip instead: the task runs on a helper thread; if it exceeds
        the deadline it is journaled ``failed`` with a ``timeout`` note, the
        worker's ahead-claimed task is returned to the pool, and the worker
        RETIRES (its device is presumed wedged — a thread cannot be killed,
        so the zombie helper is abandoned as a daemon) while the remaining
        workers drain the pool. If the zombie later completes after all, it
        journals ``done``, which supersedes the timeout row on resume
        (latest record per task wins)."""
        import threading

        state = self.journal_state()
        excluded = set(exclude_modalities) | {"fusion"}
        tasks = [t for t in self.pending_tasks() if t[1] not in excluded]
        # longest-expected-first across families; stable, so subject order
        # within a family is preserved (see _FARM_DURATION_RANK)
        tasks.sort(key=lambda t: _FARM_DURATION_RANK.get(t[1], 50))
        claim_cv = threading.Condition()
        pos = [0]
        inflight = [0]  # tasks currently executing under a worker

        def claim(ahead: bool = False):
            with claim_cv:
                if ahead:
                    # ahead-claims (a worker reserving its NEXT task to
                    # prefetch it during the current fit) are refused once
                    # the unclaimed tail is no deeper than the worker count:
                    # claiming there pins tail tasks to busy workers while
                    # idle workers starve (observed: 2 tasks / 2 workers ->
                    # both on worker 0, speedup x1.0). Tail tasks are claimed
                    # only by free workers. A single-worker farm skips the
                    # guard — no other worker can starve, and refusing would
                    # just drop the last task's prefetch overlap (ADVICE r4).
                    if len(workers) > 1 and len(tasks) - pos[0] <= len(workers):
                        return None
                    if pos[0] >= len(tasks):
                        return None
                else:
                    # a free worker does NOT exit on an empty pool while any
                    # task is still in flight: a worker timing out returns
                    # its ahead-claimed task to the pool (below), and the
                    # survivors must be around to drain it
                    while pos[0] >= len(tasks):
                        if inflight[0] == 0:
                            return None
                        claim_cv.wait(timeout=1.0)
                t = tasks[pos[0]]
                pos[0] += 1
                return t

        per_worker = [
            {"name": getattr(w, "name", str(i)), "tasks": 0, "busy_s": 0.0}
            for i, w in enumerate(workers)
        ]

        def safe_prefetch(fn, subject, modality):
            try:
                fn(subject, modality)
            except Exception as e:  # noqa: BLE001 — prefetch is best-effort
                print(f"[farm] prefetch subject{subject:02d} {modality} failed ({e})")

        def run_deadlined(widx, w, cur) -> bool:
            """Run ``cur`` on worker ``w``, honoring ``task_timeout_s``.
            Returns False when the task blew the deadline (worker retires)."""
            extra = {"device": getattr(w, "name", str(widx)), "worker": widx}
            if task_timeout_s is None:
                self._run_one(cur[0], cur[1], w.task_fn, state, verbose, extra=extra)
                return True
            helper = threading.Thread(
                target=self._run_one,
                args=(cur[0], cur[1], w.task_fn, state, verbose),
                kwargs={"extra": extra},
                daemon=True,
                name=f"farm-{widx}-task",
            )
            helper.start()
            helper.join(task_timeout_s)
            if not helper.is_alive():
                return True
            tid = self._task_id(*cur)
            rec = {
                "task": tid,
                "status": "failed",
                "attempts": state.get(tid, {}).get("attempts", 0) + 1,
                "error": f"TimeoutError: task exceeded farm deadline "
                         f"({task_timeout_s}s); worker {widx} retired",
                "note": "timeout",
                "ts": time.time(),
                **extra,
            }
            with self._log_lock:
                _append_jsonl(self.cfg.journal_path, rec)
                state[tid] = rec
            if verbose:
                print(f"[farm] {tid} TIMED OUT after {task_timeout_s}s on "
                      f"worker {widx}; retiring the worker, others drain on")
            return False

        def run_setup_deadlined(widx, setup) -> bool:
            """Run a worker's setup_fn, honoring the task deadline scaled by
            4: a spread stacked-setup slice (cli._partition_stacked_chunks)
            holds a few GROUP fits, each itself task-sized, so the per-task
            deadline alone would false-positive. Setups run the same wedging
            device calls as tasks (the observed axon hang), and a hung setup
            with no deadline hangs the farm's join() forever — the exact
            failure task_timeout_s exists to degrade. On timeout the worker
            RETIRES (device presumed wedged); its stacked tasks are simply
            never journaled and stay pending for the serial catch-all.
            Returns False when the worker must retire."""
            if task_timeout_s is None:
                try:
                    setup()
                except Exception as e:  # noqa: BLE001 — keep the worker alive
                    print(f"[farm] worker {widx} setup failed ({e}); "
                          "its tasks stay pending for the serial pass")
                return True
            done = threading.Event()

            def target():
                try:
                    setup()
                except Exception as e:  # noqa: BLE001 — keep the worker alive
                    print(f"[farm] worker {widx} setup failed ({e}); "
                          "its tasks stay pending for the serial pass")
                finally:
                    done.set()

            helper = threading.Thread(
                target=target, daemon=True, name=f"farm-{widx}-setup"
            )
            helper.start()
            if done.wait(task_timeout_s * 4):
                return True
            print(f"[farm] worker {widx} setup exceeded "
                  f"{task_timeout_s * 4:.0f}s; retiring the worker, its "
                  "stacked tasks stay pending for the serial pass")
            return False

        def worker_loop(widx, w):
            setup = getattr(w, "setup_fn", None)
            if setup is not None:
                t0 = time.perf_counter()
                ok = run_setup_deadlined(widx, setup)
                per_worker[widx]["busy_s"] += time.perf_counter() - t0
                if not ok:
                    return  # device presumed wedged; abandon the helper
            cur = claim()
            while cur is not None:
                nxt = claim(ahead=True)
                pf = None
                if getattr(w, "prefetch_fn", None) is not None and nxt is not None:
                    pf = threading.Thread(
                        target=safe_prefetch, args=(w.prefetch_fn, *nxt), daemon=True
                    )
                    pf.start()
                t0 = time.perf_counter()
                with claim_cv:
                    inflight[0] += 1
                ok = run_deadlined(widx, w, cur)
                # the prefetch issues the same wedgeable device calls as a
                # fit (H2D of the next subject's split), so its join honors
                # the task deadline too — an unbounded join would hang the
                # worker (and the farm's join()) on a wedged prefetch even
                # with task_timeout_s set. While that bounded join is
                # pending the worker stays counted in-flight: once inflight
                # hits 0 on an empty pool the survivors exit, and an
                # ahead-claim returned after that would strand unrun.
                hold = ok and pf is not None and task_timeout_s is not None
                with claim_cv:
                    if not ok and nxt is not None:
                        # return the ahead-claim to the head of the pool so
                        # a surviving worker (possibly waiting in claim())
                        # picks it up; same lock as the inflight decrement so
                        # no waiter can exit between the two
                        tasks.insert(pos[0], nxt)
                    if not hold:
                        inflight[0] -= 1
                    claim_cv.notify_all()
                per_worker[widx]["busy_s"] += time.perf_counter() - t0
                if not ok:
                    return  # device presumed wedged; abandon the daemon helper
                per_worker[widx]["tasks"] += 1
                if pf is not None:
                    if hold:
                        pf.join(task_timeout_s)
                        stuck = pf.is_alive()
                        with claim_cv:
                            if stuck:
                                # give the ahead-claimed task (whose
                                # prefetch is wedged) back to the survivors
                                tasks.insert(pos[0], nxt)
                            inflight[0] -= 1
                            claim_cv.notify_all()
                        if stuck:
                            if verbose:
                                print(f"[farm] worker {widx} prefetch "
                                      f"exceeded {task_timeout_s}s; retiring "
                                      "the worker, its ahead-claim returns "
                                      "to the pool")
                            return  # device presumed wedged
                    else:
                        pf.join()
                cur = nxt if nxt is not None else claim()

        t_start = time.perf_counter()
        threads = [
            threading.Thread(target=worker_loop, args=(i, w), name=f"farm-{i}")
            for i, w in enumerate(workers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        makespan = time.perf_counter() - t_start
        summary = {
            "event": "farm_summary",
            "n_workers": len(workers),
            "n_tasks": sum(pw["tasks"] for pw in per_worker),
            "makespan_s": round(makespan, 3),
            "busy_s": [round(pw["busy_s"], 3) for pw in per_worker],
            "workers": [pw["name"] for pw in per_worker],
            "ts": time.time(),
        }
        with self._log_lock:
            _append_jsonl(self.cfg.metrics_path, summary)
        if verbose and summary["n_tasks"]:
            busy = sum(pw["busy_s"] for pw in per_worker)
            print(
                f"[farm] {summary['n_tasks']} tasks over {len(workers)} workers: "
                f"makespan {makespan:.1f}s, aggregate busy {busy:.1f}s "
                f"(speedup x{busy / max(makespan, 1e-9):.2f})"
            )
        return state

    def run_batched(
        self, modality: str, batch_fn, group_size: int = 8, verbose: bool = True,
        prefetch_fn=None, only_subjects=None,
    ) -> Dict[str, dict]:
        """Run pending subjects of one modality in groups through a batched
        task function (subjects -> {subject: TaskResult}) — used by the
        subject-parallel trainers. Journal/metrics records are identical to
        the serial path, so resume/aggregate work unchanged.

        ``prefetch_fn(subject, modality)``: optional — while group G's
        stacked fit runs on the device, a daemon thread walks group G+1's
        subjects through it (the batched analogue of ``run``'s prefetch; on
        real data a stacked EEG group is 8 subjects x .mat ingest, minutes of
        idle chip without the overlap). Joined before G+1 starts.

        Fault isolation: a failing group is BISECTED — each half retries
        independently, recursing until the offending subject(s) run alone —
        so one bad subject (or an OOM at the full stack size) costs only its
        own retry budget instead of poisoning every group member. The smaller
        sub-stacks recompile, but only on the failure path.

        ``only_subjects``: optional subject filter — cli._run_sweep spreads
        the stacked pass across several farm workers by giving each a
        disjoint chunk of the pending subjects (pending order is preserved,
        so whole group-sized chunks regroup identically). Callers must pass
        disjoint sets: the journal has no claim lock for batched groups."""
        import threading

        state = self.journal_state()
        pending = [
            s for s, m in self.pending_tasks()
            if m == modality and (only_subjects is None or s in only_subjects)
        ]
        groups = [pending[g : g + group_size]
                  for g in range(0, len(pending), group_size)]

        def prefetch_group(subjects):
            for s in subjects:
                try:
                    prefetch_fn(s, modality)
                except Exception as e:  # noqa: BLE001 — prefetch is best-effort
                    print(f"[sweep] prefetch subject{s:02d} {modality} failed ({e})")

        for i, group in enumerate(groups):
            thread = None
            if prefetch_fn is not None and i + 1 < len(groups):
                thread = threading.Thread(
                    target=prefetch_group, args=(groups[i + 1],), daemon=True
                )
                thread.start()
            self._run_group(modality, batch_fn, group, state, verbose)
            if thread is not None:
                thread.join()
        return state

    def _run_group(self, modality: str, batch_fn, group: List[int],
                   state: Dict[str, dict], verbose: bool) -> None:
        t0 = time.perf_counter()
        try:
            results = batch_fn(group)
            wall = time.perf_counter() - t0
            for s in group:
                tid = self._task_id(s, modality)
                metrics = dict(results[s].metrics)
                metrics.update(
                    subject=s, modality=modality,
                    wall_clock_s=round(wall / len(group), 3),
                )
                rec = {
                    "task": tid, "status": "done",
                    "attempts": state.get(tid, {}).get("attempts", 0) + 1,
                    "wall_clock_s": round(wall / len(group), 3),
                    "ts": time.time(),
                }
                # under _log_lock: the stacked pass runs concurrently with
                # run_farmed's worker threads when it is a farm worker's
                # setup_fn (cli._run_sweep overlap)
                with self._log_lock:
                    _append_jsonl(self.cfg.metrics_path, metrics)
                    _append_jsonl(self.cfg.journal_path, rec)
                state[tid] = rec
            if verbose:
                print(f"[sweep] {modality} subjects {group} done in {wall:.1f}s")
        except Exception as e:  # noqa: BLE001 — task isolation is the point
            if len(group) > 1:
                if verbose:
                    print(
                        f"[sweep] {modality} group {group} failed ({e}); "
                        "bisecting to isolate"
                    )
                mid = len(group) // 2
                self._run_group(modality, batch_fn, group[:mid], state, verbose)
                self._run_group(modality, batch_fn, group[mid:], state, verbose)
                return
            s = group[0]
            tid = self._task_id(s, modality)
            # Bisection bottom: a SINGLE-subject stacked program still
            # failed. A stacked (vmapped) program can exceed the device
            # buffer budget where the plain serial program fits (journaled
            # on hardware: S=1 stacked ViT-base at production shape), so
            # fall back to the serial task fn here rather than burning the
            # subject's serial retry budget on another stacked attempt.
            if verbose:
                print(f"[sweep] {tid} stacked failed ({e}); serial fallback")
            try:
                t1 = time.perf_counter()
                result = self.task_fn(s, modality)
                wall = time.perf_counter() - t1
                metrics = dict(result.metrics)
                metrics.update(subject=s, modality=modality,
                               wall_clock_s=round(wall, 3))
                with self._log_lock:
                    _append_jsonl(self.cfg.metrics_path, metrics)
                rec = {
                    "task": tid, "status": "done",
                    "attempts": state.get(tid, {}).get("attempts", 0) + 1,
                    "wall_clock_s": round(wall, 3),
                    "note": f"serial fallback after stacked failure: {e}",
                    "ts": time.time(),
                }
            except Exception as e2:  # noqa: BLE001 — task isolation
                rec = {
                    "task": tid, "status": "failed",
                    "attempts": state.get(tid, {}).get("attempts", 0) + 1,
                    "error": f"{type(e2).__name__}: {e2}",
                    "stacked_error": f"{type(e).__name__}: {e}",
                    "traceback": traceback.format_exc(limit=5),
                    "ts": time.time(),
                }
            with self._log_lock:
                _append_jsonl(self.cfg.journal_path, rec)
            state[tid] = rec
            if verbose and rec["status"] == "failed":
                print(f"[sweep] {tid} FAILED ({rec['error']})")

    def aggregate(self) -> Dict[str, Dict[str, float]]:
        """Per-modality mean/std of accuracy and weighted F1 over subjects —
        the published summary quantities (`README.md:23,31,40`)."""
        rows = _read_jsonl(self.cfg.metrics_path)
        by_mod: Dict[str, Dict[str, list]] = {}
        seen = set()
        for r in reversed(rows):  # latest record per task wins
            key = (r.get("subject"), r.get("modality"))
            if key in seen or r.get("accuracy") is None:
                continue
            seen.add(key)
            d = by_mod.setdefault(r["modality"], {"accuracy": [], "weighted_f1": []})
            d["accuracy"].append(r["accuracy"])
            if r.get("weighted_f1") is not None:
                d["weighted_f1"].append(r["weighted_f1"])
        out = {}
        for mod, d in by_mod.items():
            out[mod] = {
                "n_subjects": len(d["accuracy"]),
                "mean_accuracy": float(np.mean(d["accuracy"])),
                "std_accuracy": float(np.std(d["accuracy"])),
                "mean_weighted_f1": float(np.mean(d["weighted_f1"])) if d["weighted_f1"] else None,
            }
        return out
