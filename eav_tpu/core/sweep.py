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
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from eav_tpu.core.config import SweepConfig


@dataclass
class TaskResult:
    metrics: Dict[str, Any]
    artifacts: Optional[Dict[str, Any]] = None  # e.g. params to checkpoint


TaskFn = Callable[[int, str], TaskResult]  # (subject, modality) -> result


def _read_jsonl(path: str) -> List[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _append_jsonl(path: str, record: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


class SweepRunner:
    def __init__(self, cfg: SweepConfig, task_fn: TaskFn):
        self.cfg = cfg
        self.task_fn = task_fn

    def _task_id(self, subject: int, modality: str) -> str:
        return f"subject{subject:02d}_{modality}"

    def journal_state(self) -> Dict[str, dict]:
        """Latest journal record per task id."""
        state: Dict[str, dict] = {}
        for rec in _read_jsonl(self.cfg.journal_path):
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
            tid = self._task_id(subject, modality)
            attempts = state.get(tid, {}).get("attempts", 0) + 1
            t0 = time.perf_counter()
            try:
                result = self.task_fn(subject, modality)
                wall = time.perf_counter() - t0
                metrics = dict(result.metrics)
                metrics.update(subject=subject, modality=modality, wall_clock_s=round(wall, 3))
                _append_jsonl(self.cfg.metrics_path, metrics)
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
                rec = {
                    "task": tid,
                    "status": "failed",
                    "attempts": attempts,
                    "error": f"{type(e).__name__}: {e}",
                    "traceback": traceback.format_exc(limit=5),
                    "ts": time.time(),
                }
                if verbose:
                    print(f"[sweep] {tid} FAILED ({rec['error']})")
            _append_jsonl(self.cfg.journal_path, rec)
            state[tid] = rec
            if verbose and rec["status"] == "done":
                print(f"[sweep] {tid} done in {rec['wall_clock_s']}s")
            if prefetch_thread is not None:
                prefetch_thread.join()
        return state

    def run_batched(
        self, modality: str, batch_fn, group_size: int = 8, verbose: bool = True
    ) -> Dict[str, dict]:
        """Run pending subjects of one modality in groups through a batched
        task function (subjects -> {subject: TaskResult}) — used by the
        subject-parallel trainers. Journal/metrics records are identical to
        the serial path, so resume/aggregate work unchanged.

        Fault isolation: a failing group is BISECTED — each half retries
        independently, recursing until the offending subject(s) run alone —
        so one bad subject (or an OOM at the full stack size) costs only its
        own retry budget instead of poisoning every group member. The smaller
        sub-stacks recompile, but only on the failure path."""
        state = self.journal_state()
        pending = [s for s, m in self.pending_tasks() if m == modality]
        for g in range(0, len(pending), group_size):
            self._run_group(modality, batch_fn, pending[g : g + group_size],
                            state, verbose)
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
                _append_jsonl(self.cfg.metrics_path, metrics)
                rec = {
                    "task": tid, "status": "done",
                    "attempts": state.get(tid, {}).get("attempts", 0) + 1,
                    "wall_clock_s": round(wall / len(group), 3),
                    "ts": time.time(),
                }
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
