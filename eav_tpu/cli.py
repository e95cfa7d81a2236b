"""Command-line entry point.

The reference requires editing source paths and running module scripts
(`README.md:80-84,157-161`); here the sweep is a CLI:

  python -m eav_tpu.cli presets
  python -m eav_tpu.cli run --data-root /data/EAV --subjects 1-42 \
      --modalities eeg,audio,vision --cache-dir ./cache --out ./runs/sweep1
  python -m eav_tpu.cli aggregate --out ./runs/sweep1
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List


def _parse_subjects(spec: str) -> List[int]:
    out: List[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def cmd_presets(_args) -> int:
    from eav_tpu.core.config import PRESETS

    for name, p in PRESETS.items():
        print(f"{name:18s} {p.description}")
    return 0


def cmd_run(args) -> int:
    from eav_tpu.core.config import SweepConfig, apply_overrides, load_override_file
    from eav_tpu.core.sweep import SweepRunner
    from eav_tpu.train.pipeline import ModalityPipelines, default_presets

    out = args.out
    os.makedirs(out, exist_ok=True)
    presets = default_presets()
    if args.config:
        presets = apply_overrides(presets, load_override_file(args.config))
    if args.set:
        presets = apply_overrides(presets, args.set)
    if args.chip_parallel >= 1 and args.data_parallel > 1:
        raise SystemExit(
            "--chip-parallel and --data-parallel are mutually exclusive: the "
            "farm gives each fine-tune a whole chip; DP shards one fine-tune "
            "across chips"
        )
    mesh = None
    if args.data_parallel > 1:
        # Batch-DP over a pure data mesh: the TPU-native replacement for the
        # reference's automatic nn.DataParallel engagement
        # (`Transformer_Vision.py:82-83`) — the per-frame vision fine-tunes
        # shard their batch across the axis, XLA inserts the gradient psum.
        import jax

        from eav_tpu.parallel.mesh import DATA_AXIS, make_mesh

        n = args.data_parallel
        if len(jax.devices()) < n:
            raise SystemExit(
                f"--data-parallel {n} requested but only "
                f"{len(jax.devices())} devices are visible"
            )
        mesh = make_mesh(((DATA_AXIS, n),), devices=jax.devices()[:n])
    def make_pipelines():
        return ModalityPipelines(
            data_root=args.data_root,
            cache_dir=args.cache_dir or os.path.join(out, "cache"),
            logits_dir=os.path.join(out, "logits"),
            presets=presets,
            seed=args.seed,
            epochs_per_call=args.epochs_per_call,
            mesh=mesh,
            epc_target_seconds=args.epc_target_seconds,
        )

    pipelines = make_pipelines()
    cfg = SweepConfig(
        subjects=tuple(_parse_subjects(args.subjects)),
        modalities=tuple(args.modalities.split(",")),
        data_root=args.data_root,
        journal_path=os.path.join(out, "journal.jsonl"),
        metrics_path=os.path.join(out, "metrics.jsonl"),
        checkpoint_dir=os.path.join(out, "checkpoints") if args.checkpoint else None,
        resume=not args.no_resume,
        max_retries=args.max_retries,
    )
    runner = SweepRunner(cfg, pipelines.task_fn)
    if args.profile:
        from eav_tpu.utils.profiling import trace

        with trace(args.profile):
            rc = _run_sweep(args, cfg, runner, pipelines, make_pipelines)
        print(f"[profile] jax.profiler trace written to {args.profile}")
        return rc
    return _run_sweep(args, cfg, runner, pipelines, make_pipelines)


# Per-family subject-stack caps for --subject-parallel, from 16 GB v5e
# measurements (bench.py / docs/ROUND2.md / scripts/measure_vision_flagship.py):
# - EEGNet-scale models stack ~linearly to 8 (beyond that the worker OOMs);
# - AST-base at bs 8 x 1214 tokens saturates the chip ALONE (S=1 68.2 vs S=4
#   aggregate 62.6 samples/s measured) — stacking strictly hurts, so AST
#   subjects run serially per chip and spread ACROSS chips;
# - ViT-base at production shape (7k frames, bs 128) MEASURED round 3: a
#   no-remat stack exceeds the 16 GB buffer budget even at S=1; with
#   remat='attn' an S=2 stack runs but at 107.8 aggregate samples/s vs 520
#   serial — the memory pressure forces XLA into a far slower program. So
#   vision is serial per chip too; stacking is the lever for the SMALL
#   models only.
_STACK_CAPS = {"eeg": 8, "eeg_conformer": 8, "audio": 1, "audio_scnn": 8,
               "vision": 1, "vision_resnet": 1}


def _partition_stacked_chunks(stacked, pending_by_mod, n_workers):
    """Spread the stacked families' group-sized chunks round-robin over
    workers: ``[{mod: (group_size, [subjects])}]``, one dict per setup
    worker. Whole chunks move, in pending order, so each worker's
    ``run_batched(only_subjects=...)`` regroups into exactly the chunks it
    was assigned (at most one partial chunk exists and it stays last).

    Spreading matters for the schedule: the full stacked EEG pass is ~19 min
    of chip time on the 2026-08-20 journal — serialized onto ONE worker's
    setup it becomes the farm's critical path (the serial-policy legs split
    8 ways are ~18 min); split into its 6 groups across 6 workers it is
    ~3-5 min per worker and disappears into the schedule."""
    chunks = []
    for mod, group in stacked:
        pend = pending_by_mod.get(mod, [])
        chunks += [
            (mod, group, pend[i : i + group]) for i in range(0, len(pend), group)
        ]
    n_setup = min(n_workers, len(chunks))
    assign = [dict() for _ in range(n_setup)]
    for j, (mod, group, subs) in enumerate(chunks):
        d = assign[j % n_setup]
        if mod in d:
            d[mod][1].extend(subs)
        else:
            d[mod] = (group, list(subs))
    return assign


def _run_sweep(args, cfg, runner, pipelines, make_pipelines=None) -> int:
    # stacked subject-parallel families (group > 1 after capping)
    stacked = [
        (mod, min(args.subject_parallel, cap))
        for mod, cap in _STACK_CAPS.items()
        if mod in cfg.modalities and min(args.subject_parallel, cap) > 1
    ] if args.subject_parallel > 1 else []

    if (hasattr(pipelines, "start_fusion_prewarm")
            and any(m == "fusion" for _, m in runner.pending_tasks())):
        # fusion's first fit is ~95% XLA compile (680 s of an 11.9 min leg on
        # the 2026-08-20 journal) and runs strictly after its producer legs;
        # prewarm the compile on a daemon thread so it overlaps the sweep
        # (train/pipeline.warm_fusion; run_fusion joins the thread). Gated on
        # PENDING fusion tasks: a resume with fusion already done must not
        # spend minutes of remote-compile tunnel on a program nothing runs.
        pipelines.start_fusion_prewarm()

    def stacked_pass():
        for mod, group in stacked:
            runner.run_batched(
                mod,
                lambda subs, m=mod: pipelines.run_stacked(subs, m),
                group_size=group,
                prefetch_fn=pipelines.prefetch,
            )

    if getattr(args, "chip_parallel", 0) >= 1:
        # cross-chip task farm: the serial-policy tasks (audio AST, vision
        # ViT — one fine-tune saturates a chip, cli _STACK_CAPS) spread ONE
        # PER CHIP and run concurrently. Per-worker ModalityPipelines keep
        # compiled-program caches and prefetch parking isolated per device.
        import jax

        from eav_tpu.parallel.farm import device_workers

        n = args.chip_parallel
        if len(jax.devices()) < n:
            raise SystemExit(
                f"--chip-parallel {n} requested but only "
                f"{len(jax.devices())} devices are visible"
            )
        devices = jax.devices()[:n]
        workers = device_workers(make_pipelines, devices=devices)
        if stacked:
            # overlap AND spread: the stacked families' group-sized chunks
            # are partitioned round-robin across the workers' setup_fns, so
            # each chip runs a slice of the stacked pass concurrently with
            # the others farming serial-policy tasks, then joins the claim
            # loop. Each setup uses ITS worker's pipelines + device (trainer
            # caches stay per-device); only_subjects keeps the journal
            # slices disjoint. Worker prefetch_fns bind the device inside
            # the call, so run_batched's prefetch daemons land on the right
            # chip.
            pending_by_mod = {}
            for s, m in runner.pending_tasks():
                pending_by_mod.setdefault(m, []).append(s)
            assign = _partition_stacked_chunks(stacked, pending_by_mod, len(workers))
            for widx, part in enumerate(assign):
                w = workers[widx]

                def stacked_setup(_part=part, _w=w):
                    with jax.default_device(_w.device):
                        for mod, (group, subs) in _part.items():
                            runner.run_batched(
                                mod,
                                lambda ss, m=mod, _p=_w.pipelines: _p.run_stacked(ss, m),
                                group_size=group,
                                prefetch_fn=_w.prefetch_fn,
                                only_subjects=set(subs),
                            )

                workers[widx] = w._replace(setup_fn=stacked_setup)
        runner.run_farmed(
            workers, verbose=True,
            exclude_modalities=[m for m, _ in stacked],
            task_timeout_s=(getattr(args, "farm_timeout_minutes", None) * 60.0
                            if getattr(args, "farm_timeout_minutes", None)
                            else None),
        )
    elif stacked:
        stacked_pass()
    # serial pass: everything still pending — the whole sweep in the default
    # mode, or only retries/fallbacks after a farm run. Overlaps the NEXT
    # subject's ingest + H2D with the current fit (core/sweep.py run
    # prefetch_fn) — on real data this hides the mp4 decode + face-crop
    # pipeline under device compute.
    runner.run(verbose=True, prefetch_fn=pipelines.prefetch)
    print(json.dumps(runner.aggregate(), indent=2))
    return 0


def format_summary(agg: dict) -> str:
    """Human table of the published summary quantities (README.md:23,31,40)."""
    lines = [f"{'modality':12s} {'n':>3s} {'mean ACC':>9s} {'std':>6s} {'mean wF1':>9s}"]
    for mod, d in sorted(agg.items()):
        wf1 = f"{d['mean_weighted_f1']*100:8.1f}%" if d.get("mean_weighted_f1") is not None else "      --"
        lines.append(
            f"{mod:12s} {d['n_subjects']:3d} {d['mean_accuracy']*100:8.1f}% "
            f"{d['std_accuracy']*100:5.1f}% {wf1}"
        )
    return "\n".join(lines)


def cmd_aggregate(args) -> int:
    from eav_tpu.core.config import SweepConfig
    from eav_tpu.core.sweep import SweepRunner

    cfg = SweepConfig(
        journal_path=os.path.join(args.out, "journal.jsonl"),
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
    )
    agg = SweepRunner(cfg, lambda s, m: None).aggregate()
    print(format_summary(agg))
    print(json.dumps(agg, indent=2))
    return 0


def cmd_verify_data(args) -> int:
    """Walk the data root and validate every per-subject layout/shape/label
    invariant the ingest layer depends on BEFORE a multi-hour sweep is
    launched against it (ingest/verify.py; the reference's implicit data
    contract, `README.md:18-40`, is otherwise enforced only by crashing
    mid-run). Exit 0 = clean (warnings allowed), 1 = errors found."""
    from eav_tpu.core.config import apply_overrides, load_override_file
    from eav_tpu.ingest.verify import verify_data_root
    from eav_tpu.train.pipeline import default_presets

    presets = default_presets()
    if args.config:
        presets = apply_overrides(presets, load_override_file(args.config))
    if args.set:
        presets = apply_overrides(presets, args.set)
    eeg_cfg = presets["eeg"].eeg
    reports = verify_data_root(
        args.data_root,
        _parse_subjects(args.subjects),
        modalities=tuple(args.modalities.split(",")),
        eeg_channels=eeg_cfg.channels,
        trial_seconds=eeg_cfg.trial_seconds,
        probe_video=not args.no_probe,
        deep=args.deep,
        verbose=True,
    )
    n_err = sum(len(r.errors) for r in reports)
    n_warn = sum(len(r.warnings) for r in reports)
    print(
        f"[verify] {len(reports)} subjects: "
        f"{sum(r.ok for r in reports)} ok, {n_err} errors, {n_warn} warnings"
    )
    return 0 if n_err == 0 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="eav_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("presets").set_defaults(fn=cmd_presets)

    vd = sub.add_parser(
        "verify-data",
        help="validate a data root's layout/shapes/labels before sweeping",
    )
    vd.add_argument("--data-root", required=True)
    vd.add_argument("--subjects", default="1-42")
    vd.add_argument("--modalities", default="eeg,audio,vision")
    vd.add_argument("--no-probe", action="store_true",
                    help="skip the first/middle/last video probe decodes per subject")
    vd.add_argument("--deep", action="store_true",
                    help="additionally walk EVERY Speaking clip's mp4 "
                    "container header (no decode; catches corruption "
                    "anywhere in the archive, ~ms per clip)")
    vd.add_argument("--set", action="append", default=[], metavar="PATH=VALUE")
    vd.add_argument("--config", default=None)
    vd.set_defaults(fn=cmd_verify_data)

    run = sub.add_parser("run")
    run.add_argument("--data-root", required=True)
    run.add_argument("--subjects", default="1-42")
    run.add_argument("--modalities", default="eeg,audio,vision")
    run.add_argument("--out", default="./runs/sweep")
    run.add_argument("--cache-dir", default=None)
    run.add_argument("--seed", type=int, default=0)
    run.add_argument("--checkpoint", action="store_true")
    run.add_argument("--no-resume", action="store_true")
    run.add_argument("--max-retries", type=int, default=1)
    run.add_argument(
        "--subject-parallel", type=int, default=1,
        help="run N subjects' EEG fine-tunes as one sharded program",
    )
    run.add_argument(
        "--data-parallel", type=int, default=1,
        help="shard each fine-tune's batch across N devices (vision path; "
        "the reference's nn.DataParallel equivalent)",
    )
    run.add_argument(
        "--chip-parallel", type=int, default=0,
        help="cross-chip task farm: N device-bound workers run serial-policy "
        "fine-tunes concurrently, one whole chip per task (the v5e-8 sweep "
        "scale-out for audio/vision; combine with --subject-parallel for the "
        "stackable EEG families). N=1 runs the farm machinery with a single "
        "worker (device-bound thread + prefetch-ahead claiming) — the "
        "single-chip smoke of the multi-chip path; default 0 = plain serial",
    )
    run.add_argument(
        "--farm-timeout-minutes", type=float, default=0.0,
        help="with --chip-parallel: per-task soft deadline — a fine-tune "
        "exceeding it is journaled failed (note: timeout) and its worker "
        "retires while the other chips drain the pool (a wedged device call "
        "otherwise hangs the farm until the cross-process watchdog kills "
        "ALL workers; see docs/RUNBOOK.md). 0 = off (the default; leave off "
        "on CPU test meshes where timing is noisy)",
    )
    run.add_argument(
        "--epochs-per-call", type=int, default=None,
        help="split subject-parallel phases into chunks of N epochs per device call",
    )
    run.add_argument(
        "--epc-target-seconds", type=float, default=None,
        help="with --epochs-per-call: adaptively enlarge later chunks so each "
        "device call runs about this long (cuts per-call dispatch overhead)",
    )
    run.add_argument(
        "--set", action="append", default=[], metavar="PATH=VALUE",
        help="field override, e.g. audio.finetune.phases.0.epochs=2 "
        "or eeg.split.h_idx=40 (repeatable)",
    )
    run.add_argument(
        "--config", default=None,
        help="YAML/JSON file of nested overrides applied before --set",
    )
    run.add_argument(
        "--profile", default=None, metavar="LOGDIR",
        help="wrap the sweep in a jax.profiler trace (view in xprof/TensorBoard)",
    )
    run.set_defaults(fn=cmd_run)

    agg = sub.add_parser("aggregate")
    agg.add_argument("--out", default="./runs/sweep")
    agg.set_defaults(fn=cmd_aggregate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
