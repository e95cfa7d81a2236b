"""Subject-parallel training: N independent per-subject fine-tunes as one
sharded program.

The EAV sweep is 42 subjects x 3 modalities of *independent* fine-tunes
(reference `Dataload_audio.py:80-115` runs them serially). TPU-natively the
whole batch of subjects becomes ONE program: per-subject (params, optimizer
state, data) are stacked on a leading ``subject`` axis, the phase program
(train/loop.py) is ``vmap``-ed over that axis, and the stack is sharded
across the mesh's ``subject`` axis — zero inter-device communication, linear
scaling, and small-batch models (EEGNet bs=32) pack the chip instead of
underutilizing it (SURVEY.md §7.3 hard-part 6).

Sizing: activation memory scales with the per-device stack; on a 16 GB v5e
chip keep subject groups <= 8 for EEGNet-scale models with the FFT conv
(16- and 42-way stacks crash the worker). The sweep runner's ``run_batched(group_size=...)`` controls
this; groups beyond one device's share shard across the ``subject`` axis.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eav_tpu.core.config import FinetuneConfig
from eav_tpu.core.optim import init_adam_state, maxnorm_project, trainable_mask
from eav_tpu.parallel.mesh import SUBJECT_AXIS, make_mesh, put_sharded
from eav_tpu.train.loop import JitTrainer, TrainResult


class StackedResult(NamedTuple):
    params: Any  # stacked on subject axis
    batch_stats: Any
    history: Dict[str, np.ndarray]  # (subjects, epochs)
    outputs_test: np.ndarray  # (subjects, n_test, classes)
    # (subjects, epochs, n_test, classes) when cfg.keep_epoch_logits — the
    # reference's ActivationSaver pattern (`CNN_audio.py:48-72`), preserved
    # through the subject-parallel path too
    epoch_logits: Optional[np.ndarray] = None


class SubjectParallelTrainer:
    def __init__(
        self,
        model,
        cfg: FinetuneConfig,
        maxnorm_rules=(),
        head_regex: str = r"(^|/)(head|classifier(_ln)?)(/|$)",
        mesh=None,
        epochs_per_call: Optional[int] = None,
        epc_target_seconds: Optional[float] = None,
    ):
        """``epochs_per_call``: split each phase into multiple invocations of
        an ``epochs_per_call``-epoch program. Numerically identical to the
        single program (the carry threads through); needed where a runtime
        bounds single-execution duration (the axon tunnel kills executions of
        a few minutes), and useful to bound time-to-first-metric.

        ``epc_target_seconds``: adaptively enlarge chunks after timing the
        first one so each call executes for about this long — per-call
        dispatch costs ~0.4-0.7 s through the tunneled runtime, which at
        epochs_per_call=2 is ~40% of a 200-epoch EEGNet group (100 calls).
        Same semantics as :class:`JitTrainer`'s parameter."""
        self.inner = JitTrainer(model, cfg, maxnorm_rules, head_regex)
        self.model = model
        self.cfg = cfg
        self.epochs_per_call = epochs_per_call
        self.epc_target_seconds = epc_target_seconds
        self._auto_mesh = mesh is None
        self.mesh = mesh if mesh is not None else make_mesh(((SUBJECT_AXIS, -1),))

    def _mesh_for(self, n_subjects: int):
        """Auto meshes shrink so the subject axis divides the stack."""
        if not self._auto_mesh:
            return self.mesh
        size = self.mesh.devices.size
        while size > 1 and n_subjects % size != 0:
            size -= 1
        if size == self.mesh.devices.size:
            return self.mesh
        import jax

        return make_mesh(((SUBJECT_AXIS, size),), devices=jax.devices()[:size])

    def fit_stacked(
        self, data, seeds: Optional[Sequence[int]] = None, init_params=None
    ) -> StackedResult:
        """``data``: (tr_x, tr_y, te_x, te_y), each stacked (S, n, ...).
        ``init_params``: optional stacked params (e.g. a pretrained
        checkpoint broadcast to all subjects)."""
        tr_x, tr_y, te_x, te_y = data
        S = tr_x.shape[0]

        def to_device(x):
            # mirror JitTrainer.fit: keep uint8 as-is (4x smaller transfer;
            # preprocess_uint8 models normalize on device), else float32
            x = np.asarray(x)
            return jnp.asarray(x) if x.dtype == np.uint8 else jnp.asarray(x, jnp.float32)

        tr_x = to_device(tr_x)
        te_x = to_device(te_x)
        tr_y = jnp.asarray(tr_y, jnp.int32)
        te_y = jnp.asarray(te_y, jnp.int32)
        seeds = list(seeds) if seeds is not None else list(range(S))
        # identical key discipline to JitTrainer.fit so stacked == serial
        base_keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
        keys, init_keys = jax.vmap(lambda k: tuple(jax.random.split(k)))(base_keys)

        def init_one(key, x1):
            variables = self.model.init(
                {"params": key, "dropout": key}, x1[:1], train=False
            )
            # no projection at init — matches JitTrainer.fit (torch renorm
            # fires only after a forward/step; see train/loop.py fit())
            return variables["params"], variables.get("batch_stats", {})

        # jit(vmap(init)): eager vmap still dispatches every initializer op
        # separately — hundreds of device round trips through the tunneled
        # runtime at transformer scale (see JitTrainer._init_fn_cache)
        jit_init = jax.jit(jax.vmap(init_one))
        if init_params is None:
            params, bstats = jit_init(init_keys, tr_x)
        else:
            # stacked pretrained trees overlay the fresh init (possibly
            # partially, e.g. a backbone-only checkpoint) — identical
            # semantics to JitTrainer.fit's overlay_params path. Full trees
            # skip the fresh init entirely (cheap structure check via
            # eval_shape — no compile, no allocation).
            from eav_tpu.train.loop import overlay_params

            if isinstance(init_params, tuple) and len(init_params) == 2:
                given_p, given_b = init_params
            else:  # bare stacked params
                given_p, given_b = init_params, None
            given_p = jax.tree.map(jnp.asarray, given_p)
            if given_b is not None:
                given_b = jax.tree.map(jnp.asarray, given_b)
            p_shapes, b_shapes = jax.eval_shape(jax.vmap(init_one), init_keys, tr_x)
            structure = jax.tree_util.tree_structure
            full_p = structure(given_p) == structure(p_shapes)
            full_b = (
                structure(given_b) == structure(b_shapes)
                if given_b is not None
                else not jax.tree_util.tree_leaves(b_shapes)
            )
            if full_p and full_b:
                params = given_p
                bstats = given_b if given_b is not None else {}
            else:
                params, bstats = jit_init(init_keys, tr_x)
                params = overlay_params(params, given_p)
                if given_b is not None:
                    bstats = overlay_params(bstats, given_b)
        opt_state = jax.vmap(init_adam_state)(params)

        # masks are identical across subjects (same structure)
        one_params = jax.tree.map(lambda p: p[0], params)
        n_train, n_test = int(tr_x.shape[1]), int(te_x.shape[1])

        hist = {"loss": [], "train_acc": [], "test_acc": []}
        el_h = []
        outputs_test = None
        rngs = keys  # the post-split carry keys, matching JitTrainer.fit
        mesh = self._mesh_for(S)
        sub_shard = lambda x: put_sharded(x, mesh, SUBJECT_AXIS)
        params = jax.tree.map(sub_shard, params)
        opt_state = jax.tree.map(sub_shard, opt_state)
        tr_x, tr_y, te_x, te_y = map(sub_shard, (tr_x, tr_y, te_x, te_y))

        vphase_cache = {}

        def get_vphase(mask_key, mask, epochs, sticky_first=True):
            # sticky_first only splits the cache when compat_sticky_eval is
            # on (otherwise it's ignored by the program — one cache entry)
            key = (mask_key, epochs,
                   sticky_first if self.cfg.compat_sticky_eval else True)
            if key not in vphase_cache:
                phase = self.inner.build_phase_fn(
                    mask, epochs, n_train, n_test, sticky_first=sticky_first
                )
                vphase_cache[key] = jax.jit(
                    jax.vmap(phase, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)),
                    donate_argnums=(0, 2),
                )
            return vphase_cache[key]

        import time

        for phase_cfg in self.cfg.phases:
            mask = trainable_mask(one_params, phase_cfg.freeze, self.inner.head_regex)
            epc = self.epochs_per_call or phase_cfg.epochs
            # adaptive chunk sizing: see __init__ (decided once per phase,
            # from the first chunk's measured wall; a compile-polluted first
            # wall just keeps chunks at the safe floor size)
            adaptive = bool(self.epc_target_seconds) and epc < phase_cfg.epochs
            lr = jnp.asarray(phase_cfg.lr, jnp.float32)
            remaining = phase_cfg.epochs
            chunk_size = epc
            while remaining > 0:
                chunk_epochs = min(chunk_size, remaining)
                t_chunk = time.perf_counter()
                vphase = get_vphase(
                    phase_cfg.freeze, mask, chunk_epochs,
                    sticky_first=remaining == phase_cfg.epochs,
                )
                params, bstats, opt_state, rngs, (lh, trh, teh, el), logits = vphase(
                    params, bstats, opt_state, rngs, tr_x, tr_y, te_x, te_y, lr
                )
                hist["loss"].append(np.asarray(lh))
                hist["train_acc"].append(np.asarray(trh))
                hist["test_acc"].append(np.asarray(teh))
                if el is not None:
                    el_h.append(np.asarray(el))
                outputs_test = np.asarray(logits)  # also fences the chunk
                remaining -= chunk_epochs
                if adaptive and remaining > 0:
                    from eav_tpu.train.loop import _quantize_chunk

                    per_epoch = (time.perf_counter() - t_chunk) / chunk_epochs
                    k = _quantize_chunk(
                        int(self.epc_target_seconds / max(per_epoch, 1e-9))
                    )
                    chunk_size = max(epc, min(k, remaining))
                    adaptive = False

        history = {k: np.concatenate(v, axis=1) for k, v in hist.items()}
        epoch_logits = np.concatenate(el_h, axis=1) if el_h else None
        return StackedResult(params, bstats, history, outputs_test, epoch_logits)
