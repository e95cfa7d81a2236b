"""Cross-chip task farm: one serial fine-tune per device, all devices busy.

The sweep's measured per-chip policy (cli.py ``_STACK_CAPS``) is that the
transformer flagships saturate a v5e chip ALONE — stacking AST subjects on
one chip loses (61.7 vs 93.9 samples/s aggregate), a ViT stack loses worse
(107.8 vs 520). So the serial-policy modalities scale out the only way that
wins: N concurrent per-subject fine-tunes, each pinned to its own chip, with
zero inter-chip communication. This is the TPU-native form of the
reference's only scale-out — ``nn.DataParallel``'s automatic multi-GPU
engagement (`Transformer_torch/Transformer_Audio.py:59-60`,
`Transformer_Vision.py:82-83`) — restructured as task parallelism because
the EAV workload is 126 *independent* fine-tunes (SURVEY.md §2.3), not one
big batch.

Mechanics: each worker owns

- a ``jax.Device``, bound thread-locally via ``jax.default_device`` — every
  array the worker's thread creates (ingest H2D, params, optimizer state)
  lands on, and every program it dispatches executes on, that device;
- its own ``ModalityPipelines`` (hence its own ``JitTrainer`` instances), so
  compiled-program caches and parked prefetch data never cross workers.
  Programs are identical across workers, so after worker 0's compile the
  rest hit the persistent compile cache.

Workers pull (subject, modality) tasks from the shared journal-backed pool
(core/sweep.SweepRunner.run_farmed) with lock-protected claiming, and
prefetch their NEXT claimed task's ingest+H2D while the current task fits.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence


class DeviceWorker(NamedTuple):
    """One farm worker: ``task_fn``/``prefetch_fn`` are already bound to the
    worker's device; ``name`` labels its journal records.

    ``setup_fn``: optional work this worker runs on its thread BEFORE
    joining the claim loop (sweep.SweepRunner.run_farmed). cli._run_sweep
    uses it to drive a slice of the stacked subject-parallel pass on the
    worker's device concurrently with the other workers farming the
    serial-policy tasks — so every chip is busy from t=0 and each setup
    worker joins the farm the moment its stacked groups finish.

    ``device``/``pipelines``: the underlying jax.Device and per-worker
    task provider, exposed so callers composing setup work (cli's spread
    stacked pass) can bind it to the same device and trainer caches the
    worker's farmed tasks use."""

    name: str
    task_fn: Callable  # (subject, modality) -> TaskResult
    prefetch_fn: Optional[Callable] = None  # (subject, modality) -> None
    setup_fn: Optional[Callable] = None  # () -> None, pre-claim-loop work
    device: Optional[object] = None  # the bound jax.Device
    pipelines: Optional[object] = None  # the worker's own task provider


def device_workers(
    pipelines_factory: Callable[[], "object"],
    devices: Optional[Sequence] = None,
    n: Optional[int] = None,
) -> List[DeviceWorker]:
    """Build one device-bound worker per device.

    ``pipelines_factory``: zero-arg callable returning a fresh task provider
    (anything with ``task_fn(subject, modality)`` and optionally
    ``prefetch(subject, modality)`` — production passes a
    ``train.pipeline.ModalityPipelines`` constructor closure). Called once
    per worker so trainer caches don't collide across threads.

    ``devices``: explicit device list; default ``jax.devices()[:n]``.
    """
    import jax

    if devices is None:
        devices = jax.devices()
        if n is not None:
            if len(devices) < n:
                raise ValueError(
                    f"chip farm needs {n} devices, only {len(devices)} visible"
                )
            devices = devices[:n]
    workers: List[DeviceWorker] = []
    for dev in devices:
        pipelines = pipelines_factory()

        def task_fn(subject, modality, _p=pipelines, _d=dev):
            # thread-local binding: only this worker's thread (and the
            # prefetch threads it spawns) see _d as the default device
            with jax.default_device(_d):
                return _p.task_fn(subject, modality)

        prefetch = getattr(pipelines, "prefetch", None)
        if prefetch is not None:

            def prefetch_fn(subject, modality, _pf=prefetch, _d=dev):
                with jax.default_device(_d):
                    _pf(subject, modality)

        else:
            prefetch_fn = None
        workers.append(
            DeviceWorker(str(dev), task_fn, prefetch_fn,
                         device=dev, pipelines=pipelines)
        )
    return workers
