"""Replay a measured sweep journal through the REAL farm scheduler.

The v5e-8 wall-clock claim needs a schedule, not arithmetic: 42 subjects x
{audio, vision} are independent serial-policy fine-tunes (one saturates a
chip, cli._STACK_CAPS) whose measured walls vary 54-350 s, so "sum / 8" is
only a lower bound — the real number depends on claim order, stragglers and
tail balance. This script builds a per-(subject, modality) duration table
from a committed hardware metrics journal (default: round 3's full 168-task
production sweep, docs/results/sweep_full_metrics.jsonl) and executes
``SweepRunner.run_farmed`` — the exact production scheduler: LPT claim
order, ahead-claim starvation guard, fusion deferral — with N simulated
workers whose task_fn sleeps the measured duration (time-scaled). The
reported makespan is the schedule the farm would actually produce on a
v5e-8 given those measured task walls.

The projection composes like the CLI's `--subject-parallel 8
--chip-parallel 8` path (cli._run_sweep): worker 0 drives the stacked EEG
groups on its chip as farm setup (journal group walls) while workers 1-7
farm the serial-policy tasks, worker 0 joins the claim loop when the
stacked pass finishes, and the serial fusion pass follows.

Usage: python scripts/farm_makespan.py [--workers 8] [--scale 0.02]
                                       [--metrics docs/results/sweep_full_metrics.jsonl]
Pure host-side simulation — no devices touched; safe anywhere.
"""

import argparse
import collections
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_walls(metrics_path):
    """Per-(subject, modality) measured walls, split by scheduling policy.

    Serial-policy rows (group_size absent) carry their own wall_clock_s.
    Stacked rows (group_size set) carry the PER-SUBJECT SHARE of their
    group's wall (run_batched journals wall/len(group), core/sweep.py):
    shares within one group are identical and sum back to the group wall,
    so summing every stacked row gives the stacked pass total, and grouping
    identical (modality, share) rows reconstructs each group's wall for the
    spread-setup schedule. (Rounds ≤4 mistook the shares for group walls
    and undercounted the stacked pass 8x — 3.2 min where the journal's own
    log shows 19.4 min of groups.)

    Fusion rows are returned as a wall list: the first fit carries the
    program's XLA compile (680 s of the 715 s leg on the 2026-08-20
    journal), which the prewarm thread (train/pipeline.warm_fusion) now
    overlaps with the sweep.
    """
    serial = {}
    stacked_rows = {}  # (modality, share, group_size) -> row count
    fusion_walls = []
    for line in open(metrics_path):
        r = json.loads(line)
        if r.get("accuracy") is None or "modality" not in r:
            continue
        key = (r["subject"], r["modality"])
        if r["modality"] == "fusion":
            fusion_walls.append(r["wall_clock_s"])
        elif r.get("group_size"):
            k = (r["modality"], r["wall_clock_s"], r["group_size"])
            stacked_rows[k] = stacked_rows.get(k, 0) + 1
        else:
            serial[key] = r["wall_clock_s"]
    # reconstruct GROUP walls: each group of size g journals g rows with the
    # identical share, so group wall = share * g and the number of groups
    # behind a (mod, share, g) key is row_count / g — two groups whose walls
    # coincide to the journal's 3-decimal rounding stay two groups instead
    # of merging into one mega-wall
    stacked_groups = []
    for (mod, share, g), n_rows in stacked_rows.items():
        for _ in range(max(1, round(n_rows / g))):
            stacked_groups.append(share * g)
    return serial, stacked_groups, fusion_walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--scale", type=float, default=0.02,
                    help="sleep = measured_wall * scale (0.02 -> ~25 s sim)")
    ap.add_argument(
        "--metrics",
        default=os.path.join(REPO, "docs/results/sweep_full_metrics.jsonl"),
    )
    args = ap.parse_args()

    from eav_tpu.core.sweep import SweepConfig, SweepRunner, TaskResult

    serial, stacked_groups, fusion_walls = load_walls(args.metrics)
    stacked_s = sum(stacked_groups)
    fusion_s = sum(fusion_walls)
    # the max fusion wall is the compile-carrying first fit; the rest is the
    # steady-state ~1 s/subject head fit
    fusion_compile_s = max(fusion_walls) if fusion_walls else 0.0
    fusion_steady_s = fusion_s - fusion_compile_s
    fusion_mean_steady = (
        fusion_steady_s / max(len(fusion_walls) - 1, 1) if fusion_walls else 0.0
    )
    subjects = sorted({s for s, _ in serial})
    modalities = sorted({m for _, m in serial})
    per_mod = collections.defaultdict(float)
    for (s, m), w in serial.items():
        per_mod[m] += w
    serial_total = sum(serial.values())
    print(json.dumps({
        "tasks": len(serial), "subjects": len(subjects),
        "serial_policy_seconds": {m: round(v, 1) for m, v in per_mod.items()},
        "stacked_eeg_seconds": round(stacked_s, 1),
        "stacked_group_walls_s": [round(w, 1) for w in stacked_groups],
        "fusion_seconds": round(fusion_s, 1),
        "fusion_compile_s": round(fusion_compile_s, 1),
        "journaled_single_chip_total_min": round(
            (serial_total + stacked_s + fusion_s) / 60.0, 1),
    }), flush=True)

    with tempfile.TemporaryDirectory() as td:
        cfg = SweepConfig(
            subjects=tuple(subjects), modalities=tuple(modalities),
            journal_path=os.path.join(td, "journal.jsonl"),
            metrics_path=os.path.join(td, "metrics.jsonl"),
        )

        def task_fn(subject, modality):
            time.sleep(serial[(subject, modality)] * args.scale)
            return TaskResult(metrics={"accuracy": 0.0})

        class W:
            def __init__(self, i, setup_fn=None):
                self.name = f"simdev{i}"
                self.prefetch_fn = None
                self.task_fn = task_fn
                self.setup_fn = setup_fn

        # mirror cli._run_sweep's spread overlap: the stacked pass's GROUPS
        # are partitioned round-robin across the workers' setup_fns
        # (cli._partition_stacked_chunks); each worker runs its slice on its
        # chip while the rest farm serial-policy tasks, then joins the
        # claim loop — no single worker's ~19-min full stacked pass becomes
        # the critical path
        n_setup = min(args.workers, len(stacked_groups))
        setup_walls = [0.0] * args.workers
        for j, gw in enumerate(stacked_groups):
            setup_walls[j % max(n_setup, 1)] += gw

        def make_setup(wall):
            return lambda: time.sleep(wall * args.scale)

        workers = [
            W(i, setup_fn=make_setup(setup_walls[i]) if setup_walls[i] else None)
            for i in range(args.workers)
        ]
        runner = SweepRunner(cfg, task_fn)
        t0 = time.perf_counter()
        state = runner.run_farmed(workers, verbose=False)
        sim_wall = time.perf_counter() - t0
        assert all(r["status"] == "done" for r in state.values())
        summary = [json.loads(l) for l in open(cfg.metrics_path)
                   if "farm_summary" in l][-1]

    farm_s = sim_wall / args.scale
    busy = [b / args.scale for b in summary["busy_s"]]
    # scheduling overhead in the sim is claim-lock + thread wakeups, all
    # host-side and identical in production; sleep granularity adds ~ms/task.
    # The lower bound spreads ALL work (stacked included, since the setups
    # absorb it) perfectly over the workers.
    lower_bound = (serial_total + stacked_s) / args.workers
    # fusion with the prewarm (cli start_fusion_prewarm): the compile starts
    # when the FIRST stacked group archives its logits (earliest setup
    # worker's first group; groups within a setup run in assignment order)
    # and overlaps the farm. The fusion tail after the farm is then the
    # steady-state fits only — the prewarmed program serves all 42 subjects,
    # the compile-carrying first fit replays at steady-state cost.
    first_archive_s = min(stacked_groups) if stacked_groups else 0.0
    warm_done_s = first_archive_s + fusion_compile_s
    fusion_tail_s = fusion_steady_s + fusion_mean_steady
    total = max(farm_s, warm_done_s) + fusion_tail_s
    journaled_single = serial_total + stacked_s + fusion_s
    # single chip, same prewarm (compile hides under the ~2.3 h of
    # training): journaled walls minus the no-longer-serialized compile
    single_prewarmed = serial_total + stacked_s + fusion_tail_s
    print(json.dumps({
        "metric": "farm_makespan_projection",
        "n_workers": args.workers,
        "farmed_makespan_min": round(farm_s / 60.0, 1),
        "farmed_lower_bound_min": round(lower_bound / 60.0, 1),
        "schedule_efficiency": round(lower_bound / farm_s, 3),
        "per_worker_busy_min": [round(b / 60.0, 1) for b in busy],
        "stacked_spread_setup_min": [round(w / 60.0, 1) for w in setup_walls],
        "fusion_prewarm_done_min": round(warm_done_s / 60.0, 1),
        "fusion_prewarm_overlapped": bool(warm_done_s <= farm_s),
        "fusion_tail_min": round(fusion_tail_s / 60.0, 1),
        "projected_total_min": round(total / 60.0, 1),
        "journaled_single_chip_total_min": round(journaled_single / 60.0, 1),
        "single_chip_prewarmed_min": round(single_prewarmed / 60.0, 1),
        "speedup_vs_journaled": round(journaled_single / total, 2),
        "speedup_vs_prewarmed_single": round(single_prewarmed / total, 2),
    }, ), flush=True)


if __name__ == "__main__":
    main()
