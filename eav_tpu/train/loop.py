"""Jit-compiled training loops with the reference's fine-tune protocol.

Where the reference runs a Python loop of per-batch ``.to(device)`` hops
(`Transformer_Audio.py:67-97`, `EEGNet_tor.py:96-116`), here the entire
phase — every epoch, every shuffled batch, the per-epoch full test-set
evaluation the reference also does — is ONE compiled XLA program:
``lax.scan`` over epochs around ``lax.scan`` over steps, with the whole
per-subject split resident on device (<=150 MB, SURVEY.md §3). Per-subject
fine-tunes therefore run with zero host round-trips.

Protocol parity:
- shuffled batches with a final partial batch (torch DataLoader
  ``drop_last=False``) — the remainder batch runs at its TRUE size as a
  second static shape, so batch-mean loss AND BatchNorm batch statistics
  match torch exactly (no padded duplicate rows);
- freeze -> unfreeze with ONE optimizer whose lr is swapped between phases
  (`Transformer_Audio.py:45-48`), per-leaf step counts (core/optim.py);
- max-norm projections applied after each update (`EEGNet_tor.py:33-34`);
- per-epoch test accuracy history, final-phase test logits kept as
  ``outputs_test`` (`Transformer_Audio.py:98-99`).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.core.optim import (
    AdamState,
    adam_update,
    init_adam_state,
    maxnorm_project,
    trainable_mask,
)


class TrainResult(NamedTuple):
    params: Any
    batch_stats: Any
    history: Dict[str, np.ndarray]  # per-epoch train/test accuracy, loss
    outputs_test: np.ndarray  # (n_test, num_classes) final-phase logits
    # per-epoch test logits when cfg.keep_epoch_logits (the reference's
    # ActivationSaver pattern, `CNN_audio.py:48-72`)
    epoch_logits: Optional[np.ndarray] = None


def overlay_params(base, update):
    """Recursively overlay ``update`` onto ``base``: leaves present in
    ``update`` replace ``base``'s, missing subtrees keep their (random-init)
    values — torch's ``load_state_dict(strict=False)`` pattern. Lets a
    partial pretrained tree (e.g. a torchvision ResNet50 *backbone*,
    models/resnet_attn.py) initialize only the matching submodule while the
    attention/head params stay freshly initialized, exactly like the
    reference's ``resnet50(pretrained=True)`` + new head (`CNN_Vision.py:32-47`).
    Unknown keys in ``update`` are an error (silent typos would train from
    random init while claiming pretrained)."""
    if update is None:
        return base
    if isinstance(base, dict) or hasattr(base, "keys"):
        if not (isinstance(update, dict) or hasattr(update, "keys")):
            raise TypeError(f"cannot overlay leaf onto subtree {list(base)}")
        unknown = set(update) - set(base)
        if unknown:
            raise KeyError(f"overlay keys not in target tree: {sorted(unknown)}")
        return {
            k: overlay_params(base[k], update[k]) if k in update else base[k]
            for k in base
        }
    return update


_CHUNK_BUCKETS = (1, 2, 3, 5, 8, 12, 20, 30, 50, 75, 100, 150, 200, 300, 500)


def _quantize_chunk(k: int) -> int:
    """Largest bucket <= k. Adaptive chunk sizes are snapped to this fixed
    ladder so run-to-run timing noise cannot produce novel program shapes —
    each would be a persistent-compile-cache miss (minutes through the
    remote-compile tunnel)."""
    out = _CHUNK_BUCKETS[0]
    for b in _CHUNK_BUCKETS:
        if b <= k:
            out = b
    return out


def _ensure_device(x):
    """Move ``x`` to device: uint8 kept as-is (4x smaller transfer; models
    with ``preprocess_uint8`` normalize on device), everything else float32.
    Arrays ALREADY on device pass through untouched — ``np.asarray`` on a
    device array would round-trip the whole split D2H+H2D, which through the
    ~20 MB/s axon tunnel costs minutes at vision shape (the round-3 frozen-
    cache regression: 732 s vs 55 s warm fit)."""
    if isinstance(x, jax.Array):
        return x if x.dtype in (jnp.uint8, jnp.float32) else x.astype(jnp.float32)
    x = np.asarray(x)
    return jnp.asarray(x) if x.dtype == np.uint8 else jnp.asarray(x, jnp.float32)


def _scan_eval(apply, xs, n: int, bs: int):
    """Evaluate ``apply`` over ``xs`` in one fused ``lax.scan``: indices are
    clamped so the padded tail batch repeats the last row (no mutable state
    in eval, padded rows sliced off the result). Shared by the phase
    programs' per-epoch eval and the public ``predict``."""
    steps = -(-n // bs)
    idx = jnp.minimum(jnp.arange(steps * bs), n - 1).reshape(steps, bs)

    def body(_, ix):
        return None, apply(xs[ix])

    _, logits = jax.lax.scan(body, None, idx)
    return logits.reshape(steps * bs, -1)[:n]


def cross_entropy(logits, labels, weights, compat_softmax: bool = False):
    """Weighted-mean CE. ``compat_softmax=True`` replicates the reference's
    double-softmax quirk (Softmax layer feeding CrossEntropyLoss,
    `EEGNet_tor.py:44,66` + `:81`): CE is computed on log_softmax(softmax(z)).
    """
    if compat_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(weights.sum(), 1.0)
    return (ce * weights).sum() / denom


class JitTrainer:
    """Two-phase fine-tune runner for any Flax model following the
    (B, ...) -> (B, num_classes) logits contract."""

    def __init__(
        self,
        model,
        cfg: FinetuneConfig,
        maxnorm_rules: Sequence[Tuple[str, float, Tuple[int, ...]]] = (),
        head_regex: str = r"(^|/)(head|classifier(_ln)?)(/|$)",
        epochs_per_call: Optional[int] = None,
        epc_target_seconds: Optional[float] = None,
    ):
        """``epochs_per_call``: split each phase into chunked invocations of
        a shorter compiled program — numerically identical (the carry threads
        through); needed on runtimes that bound single-execution duration.

        ``epc_target_seconds``: adaptively ENLARGE chunks after timing the
        first ``epochs_per_call``-sized one, so each call executes for about
        this long. Small fixed chunks pay one dispatch round trip per call —
        measured ~0.4-0.7 s each through the tunneled runtime, i.e. ~40% of
        a 200-epoch EEGNet phase at epochs_per_call=2 (100 calls). Sizes are
        quantized to a fixed bucket ladder so reruns hit the persistent
        compile cache. Numerically identical either way (the carry threads
        through chunk boundaries; tests/test_eegnet_train.py pins it)."""
        self.model = model
        self.cfg = cfg
        self.maxnorm_rules = tuple(maxnorm_rules)
        self.head_regex = head_regex
        self.epochs_per_call = epochs_per_call
        self.epc_target_seconds = epc_target_seconds
        # compiled phase programs keyed by (freeze, epochs, n_train, n_test):
        # a sweep runs the SAME program for every subject (identical shapes),
        # and rebuilding it per fit() pays re-trace + executable reload —
        # ~60 s/subject through the remote-compile tunnel (round-3 journal)
        self._phase_fn_cache: Dict[Any, Any] = {}
        # jitted model.init keyed by example-input (shape, dtype): eager Flax
        # init dispatches every initializer op separately — hundreds of
        # per-op device round trips through the tunneled runtime for a
        # ViT/AST-base tree, tens of seconds per fit() (round-3 probe)
        self._init_fn_cache: Dict[Any, Any] = {}

    # -- model plumbing --------------------------------------------------

    def _ckpt_fingerprint(self, tr_shape, te_shape) -> str:
        """Hash of everything that determines a fit() trajectory given the
        data: the full FinetuneConfig (lr/epochs/compat flags/model kwargs),
        max-norm rules, head regex, and split shapes. Written alongside phase
        checkpoints so a rerun under a changed configuration refuses to
        resume instead of silently continuing stale state (fit())."""
        import hashlib
        import json
        from dataclasses import asdict

        blob = json.dumps(
            {
                "cfg": asdict(self.cfg),
                "maxnorm": [list(r[:2]) + [list(r[2])] for r in self.maxnorm_rules],
                "head_regex": self.head_regex,
                "train_shape": list(tr_shape),
                "test_shape": list(te_shape),
            },
            sort_keys=True,
            default=str,
        )
        return hashlib.sha1(blob.encode()).hexdigest()[:16]

    def _apply_train(self, params, bstats, x, rng):
        out, mut = self.model.apply(
            {"params": params, "batch_stats": bstats},
            x,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return out, mut.get("batch_stats", bstats)

    def _apply_eval(self, params, bstats, x):
        return self.model.apply(
            {"params": params, "batch_stats": bstats}, x, train=False
        )

    # -- frozen-feature cache (models with a features/head split) ----------

    def _apply_train_head(self, params, bstats, f, rng):
        # rng is split per step exactly like the full path (rng-sequence
        # parity: phase 2 must start from the same key either way); the head
        # has no dropout so the key itself is unused.
        out = self.model.apply(
            {"params": params}, f, train=True, mode="head", rngs={"dropout": rng}
        )
        return out, bstats

    def _apply_eval_head(self, params, bstats, f):
        return self.model.apply({"params": params}, f, train=False, mode="head")

    def _frozen_cache_ok(self) -> bool:
        """A frozen phase may run on cached backbone features only when that
        is the same math: the model declares the split (`supports_head_mode`
        + `head_mode_regex`, the exact trainable set its 'head' graph
        covers), the trainer's head_regex IS that set (a superset regex
        would mark params trainable that the head graph never touches —
        their grads would be silently zero while AdamW weight decay still
        shrinks them every step), nothing stochastic or stateful lives in
        the backbone (dropout 0, no max-norm projection — it would touch
        frozen leaves), and the loss has no whole-tree regularizers (l1/l2
        sum over ALL kernels)."""
        return bool(
            self.cfg.cache_frozen_features
            and getattr(self.model, "supports_head_mode", False)
            and self.head_regex == getattr(self.model, "head_mode_regex", None)
            and getattr(self.model, "dropout", 1.0) == 0.0
            and not self.maxnorm_rules
            and not self.cfg.l1_reg
            and not self.cfg.l2_reg
        )

    def extract_features(self, params, bstats, x, batch_size: Optional[int] = None):
        """Pooled backbone features (mode='features') for a whole split —
        fused scan on accelerators, per-batch jit loop on CPU (same split as
        ``predict`` and for the same reasons)."""
        apply = lambda p, b, c: self.model.apply(  # noqa: E731
            {"params": p, "batch_stats": b}, c, train=False, mode="features"
        )
        return self._batched_apply(params, bstats, x, batch_size, apply, "_feat")

    # -- phase program ----------------------------------------------------

    def build_phase_fn(self, mask, epochs: int, n_train: int, n_test: int,
                       sticky_first: bool = True):
        """Pure phase program (no jit): suitable for direct jit or for
        vmap-over-subjects composition (parallel/subject.py).

        ``sticky_first``: under ``cfg.compat_sticky_eval`` only — True means
        this program starts a phase, so its FIRST epoch runs in train mode
        and the rest in sticky eval mode; False (a later chunk of the same
        phase) runs every epoch in eval mode. Ignored when the flag is off."""
        return self._build_phase(
            mask, epochs, n_train, n_test, jit=False, sticky_first=sticky_first
        )

    def _phase_pieces(self, mask, n_train: int, n_test: int, head: bool = False):
        """Shared building blocks: (train_step, eval_logits, batching dims).
        Both phase implementations compose these identically, so they are
        bit-for-bit equivalent (same RNG split order, same exact batching).

        ``head``: the frozen-feature fast path — tr_x/te_x are cached
        (B, hidden) backbone features and the model applies in mode='head'.
        Identical epoch/step/RNG structure, so the carried rng leaves a head
        phase exactly as it would the full program.

        Batching matches torch DataLoader ``drop_last=False`` exactly: the
        final partial batch runs at its TRUE size (a second static shape)
        rather than padded — so BatchNorm batch statistics never see padded
        duplicate rows. ``steps_full`` full batches go through ``lax.scan``;
        the remainder (if any) is one extra ``train_step`` call per epoch."""
        cfg = self.cfg
        bs = min(cfg.batch_size, n_train)
        steps_full = n_train // bs
        rem = n_train % bs
        eval_bs = min(cfg.eval_batch_size or bs, n_test)
        apply_train = self._apply_train_head if head else self._apply_train
        apply_eval = self._apply_eval_head if head else self._apply_eval

        def eval_logits(params, bstats, te_x):
            return _scan_eval(
                lambda b: apply_eval(params, bstats, b), te_x, n_test, eval_bs
            )

        def train_step(carry, idx, tr_x, tr_y, lr, eval_fwd: bool = False):
            """``eval_fwd=True`` is the compat_sticky_eval step (config.py):
            the forward runs in eval mode — dropout off, BatchNorm reading
            (and not updating) its running stats — while the backward/update
            still happens, exactly like torch training a module left in
            ``.eval()`` mode (`EEGNet_tor.py:96-135`). The dropout key is
            still split so the carried rng stream is identical either way."""
            params, bstats, opt_state, rng = carry
            rng, kd = jax.random.split(rng)
            bx, by = tr_x[idx], tr_y[idx]
            w = jnp.ones(idx.shape, jnp.float32)

            def loss_fn(p):
                if eval_fwd:
                    logits, new_bstats = apply_eval(p, bstats, bx), bstats
                else:
                    logits, new_bstats = apply_train(p, bstats, bx, kd)
                loss = cross_entropy(logits, by, w, cfg.compat_softmax)
                if cfg.l1_reg or cfg.l2_reg:  # Keras l1_l2 (notebook C14)
                    kernels = [
                        v for path, v in jax.tree_util.tree_flatten_with_path(p)[0]
                        if "kernel" in str(path[-1])
                    ]
                    if cfg.l1_reg:
                        loss = loss + cfg.l1_reg * sum(jnp.abs(k).sum() for k in kernels)
                    if cfg.l2_reg:
                        loss = loss + cfg.l2_reg * sum((k * k).sum() for k in kernels)
                return loss, (new_bstats, logits)

            (loss, (bstats_new, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            params, opt_state = adam_update(
                grads,
                opt_state,
                params,
                lr=lr,
                trainable_mask=mask,
                weight_decay=cfg.weight_decay if cfg.optimizer == "adamw" else 0.0,
            )
            if self.maxnorm_rules:
                params = maxnorm_project(params, self.maxnorm_rules)
            correct = (jnp.argmax(logits, -1) == by).sum(dtype=jnp.float32)
            return (params, bstats_new, opt_state, rng), (loss, correct)

        def epoch_perm(rng_key):
            if not cfg.shuffle:  # in-order batches (torch DataLoader
                return jnp.arange(n_train)  # shuffle=False); key unused
            return jax.random.permutation(rng_key, n_train)

        # epoch-metric helpers, shared by the fused scan program and the CPU
        # python driver so both paths log identical history values. Under
        # cfg.compat_batch_mean_acc they reproduce the reference vision
        # trainers' per-BATCH accuracy mean (`Transformer_Vision.py:106-124`,
        # `CNN_Vision.py:128-157` — a partial final batch is over-weighted);
        # default is the unbiased per-sample mean.
        train_sizes = [bs] * steps_full + ([rem] if rem else [])
        eval_steps = -(-n_test // eval_bs)
        eval_pad = eval_steps * eval_bs - n_test
        eval_sizes = jnp.asarray(
            [eval_bs] * (eval_steps - 1) + [n_test - (eval_steps - 1) * eval_bs],
            jnp.float32,
        )

        def train_acc_fn(corrects):
            """``corrects``: per-step correct counts, steps_full(+1) entries."""
            if not cfg.compat_batch_mean_acc:
                return corrects.sum() / n_train
            return (corrects / jnp.asarray(train_sizes, jnp.float32)).mean()

        def test_acc_fn(te_logits, te_y):
            correct = (jnp.argmax(te_logits, -1) == te_y).astype(jnp.float32)
            if not cfg.compat_batch_mean_acc:
                return correct.mean()
            if eval_pad:
                correct = jnp.concatenate(
                    [correct, jnp.zeros((eval_pad,), jnp.float32)]
                )
            return (correct.reshape(eval_steps, eval_bs).sum(1) / eval_sizes).mean()

        return (
            train_step, eval_logits, epoch_perm, (bs, steps_full, rem),
            (train_acc_fn, test_acc_fn),
        )

    def _build_phase(self, mask, epochs: int, n_train: int, n_test: int,
                     jit: bool = True, head: bool = False,
                     sticky_first: bool = True):
        """The fused phase program: lax.scan over epochs around lax.scan over
        steps — ONE device program per phase (the TPU path).

        Under ``cfg.compat_sticky_eval`` (Trainer_uni's sticky eval-mode
        quirk, config.py), only the phase's first epoch runs train-mode
        forwards; epochs 2+ run eval-mode forwards (``sticky_first`` says
        whether THIS program contains that first epoch — later chunks of a
        chunked phase pass False)."""
        train_step, eval_logits, epoch_perm, (bs, steps_full, rem), accs = (
            self._phase_pieces(mask, n_train, n_test, head=head)
        )
        train_acc_fn, test_acc_fn = accs
        sticky = self.cfg.compat_sticky_eval

        def phase(params, bstats, opt_state, rng, tr_x, tr_y, te_x, te_y, lr):
            keep = self.cfg.keep_epoch_logits

            def make_epoch_body(eval_fwd):
                def step_body(carry, idx):
                    return train_step(carry, idx, tr_x, tr_y, lr, eval_fwd=eval_fwd)

                def epoch_body(carry, _):
                    params, bstats, opt_state, rng = carry
                    rng, kp = jax.random.split(rng)
                    perm = epoch_perm(kp)
                    carry2, (losses, corrects) = jax.lax.scan(
                        step_body,
                        (params, bstats, opt_state, rng),
                        perm[: steps_full * bs].reshape(steps_full, bs),
                    )
                    if rem:  # final partial batch at its true size (static shape)
                        carry2, (loss_r, corr_r) = step_body(carry2, perm[steps_full * bs :])
                        losses = jnp.concatenate([losses, loss_r[None]])
                        corrects = jnp.concatenate([corrects, corr_r[None]])
                    params, bstats, opt_state, rng = carry2
                    train_acc = train_acc_fn(corrects)
                    te_logits = eval_logits(params, bstats, te_x)
                    test_acc = test_acc_fn(te_logits, te_y)
                    ys = (losses.mean(), train_acc, test_acc)
                    if keep:
                        ys = ys + (te_logits,)
                    return carry2, ys

                return epoch_body

            carry = (params, bstats, opt_state, rng)
            if not sticky:
                carry, hist = jax.lax.scan(
                    make_epoch_body(False), carry, None, length=epochs
                )
            else:
                parts = []
                n_eval = epochs
                if sticky_first:
                    carry, ys0 = make_epoch_body(False)(carry, None)
                    parts.append(jax.tree.map(lambda a: jnp.asarray(a)[None], ys0))
                    n_eval -= 1
                if n_eval:
                    carry, hist1 = jax.lax.scan(
                        make_epoch_body(True), carry, None, length=n_eval
                    )
                    parts.append(hist1)
                hist = (
                    parts[0]
                    if len(parts) == 1
                    else jax.tree.map(
                        lambda *xs: jnp.concatenate(xs, axis=0), *parts
                    )
                )
            loss_h, tr_h, te_h = hist[:3]
            epoch_logits = hist[3] if keep else None
            params, bstats, opt_state, rng = carry
            logits = eval_logits(params, bstats, te_x)
            return params, bstats, opt_state, rng, (loss_h, tr_h, te_h, epoch_logits), logits

        if not jit:
            return phase
        return jax.jit(phase, donate_argnums=(0, 2))

    def _run_phase_python(
        self, mask, epochs, params, bstats, opt_state, rng, tr_x, tr_y, te_x, te_y, lr,
        head: bool = False, sticky_first: bool = True,
    ):
        """Host-loop phase driver, numerically identical to the scan program.

        XLA:CPU compiles convolutions inside while-loop bodies to a slow
        generic path (>100x on this host), so on the CPU backend each step is
        its own jitted call; TPU always uses the fused scan program.
        ``sticky_first``: see :meth:`build_phase_fn`."""
        import functools

        n_train, n_test = int(tr_x.shape[0]), int(te_x.shape[0])
        train_step, eval_logits, epoch_perm, (bs, steps_full, rem), accs = (
            self._phase_pieces(mask, n_train, n_test, head=head)
        )
        train_acc_fn, test_acc_fn = accs
        step_jit = jax.jit(train_step, donate_argnums=(0,))
        if self.cfg.compat_sticky_eval:
            step_jit_eval = jax.jit(
                functools.partial(train_step, eval_fwd=True), donate_argnums=(0,)
            )
        eval_jit = jax.jit(eval_logits)
        carry = (params, bstats, opt_state, rng)
        loss_h, tr_h, te_h, el_h = [], [], [], []
        keep = self.cfg.keep_epoch_logits
        for epoch in range(epochs):
            params, bstats, opt_state, rng = carry
            rng, kp = jax.random.split(rng)
            perm = epoch_perm(kp)
            carry = (params, bstats, opt_state, rng)
            losses, corrects = [], []
            batches = [perm[s * bs : (s + 1) * bs] for s in range(steps_full)]
            if rem:
                batches.append(perm[steps_full * bs :])
            step = step_jit
            if self.cfg.compat_sticky_eval and not (sticky_first and epoch == 0):
                step = step_jit_eval
            for b in batches:
                carry, (l, c) = step(carry, b, tr_x, tr_y, lr)
                losses.append(l)
                corrects.append(c)
            params, bstats, opt_state, rng = carry
            loss_h.append(jnp.stack(losses).mean())
            tr_h.append(train_acc_fn(jnp.stack(corrects)))
            te_logits = eval_jit(params, bstats, te_x)
            te_h.append(test_acc_fn(te_logits, te_y))
            if keep:
                el_h.append(te_logits)
        logits = eval_jit(params, bstats, te_x)
        epoch_logits = jnp.stack(el_h) if keep else None
        return (
            params, bstats, opt_state, rng,
            (jnp.stack(loss_h), jnp.stack(tr_h), jnp.stack(te_h), epoch_logits),
            logits,
        )

    # -- public API --------------------------------------------------------

    def predict(self, params, bstats, x, batch_size: Optional[int] = None) -> np.ndarray:
        """Eval-mode logits for an arbitrary split (used by the fusion stage
        to collect train-trial scores).

        On accelerators the whole split is ONE fused scan program (padded
        tail via clamped indices, padded rows sliced off) — the per-batch
        loop costs one device round trip per batch, which on the tunneled
        TPU measured ~0.5 s each: 36-50 s per subject for the 7,000-frame
        vision archive (round-3 journal archive_seconds). CPU keeps the
        per-batch jit loop (XLA:CPU lowers convs inside scan bodies ~130x
        slower than standalone — same reason as _run_phase_python)."""
        return np.asarray(
            self._batched_apply(params, bstats, x, batch_size, self._apply_eval, "_pred")
        )

    def _batched_apply(self, params, bstats, x, batch_size, apply, cache_tag: str):
        """Whole-split batched apply: one fused scan program on accelerators,
        per-batch jit loop on CPU (XLA:CPU lowers convs inside scan bodies
        ~130x slower than standalone — same reason as _run_phase_python).
        Returns a device array on accelerators (callers that need host data
        wrap in ``np.asarray``)."""
        bs = batch_size or (self.cfg.eval_batch_size or self.cfg.batch_size)
        x = _ensure_device(x)
        n = int(x.shape[0])
        bs = min(bs, n)
        caches = getattr(self, "_batched_apply_cache", None)
        if caches is None:
            caches = self._batched_apply_cache = {}
        if jax.default_backend() == "cpu":
            key = (cache_tag, "cpu")
            if key not in caches:
                caches[key] = jax.jit(apply)
            fn = caches[key]
            # pad the tail batch to keep one compiled shape
            outs = []
            for i in range(0, n, bs):
                chunk = x[i : i + bs]
                m = chunk.shape[0]
                if m < bs:
                    chunk = jnp.concatenate(
                        [chunk, jnp.repeat(chunk[-1:], bs - m, axis=0)]
                    )
                outs.append(np.asarray(fn(params, bstats, chunk))[:m])
            return np.concatenate(outs, axis=0)
        key = (cache_tag, bs, n, str(x.dtype))
        if key not in caches:

            def fused(params, bstats, xs):
                return _scan_eval(lambda b: apply(params, bstats, b), xs, n, bs)

            caches[key] = jax.jit(fused)
        return caches[key](params, bstats, x)

    def fit(
        self,
        data,
        seed: Optional[int] = None,
        verbose: bool = False,
        init_params=None,
        init_batch_stats=None,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
    ) -> TrainResult:
        """``init_params``: optional pretrained params (e.g. an imported HF
        checkpoint, models/hf_import.py) replacing random init — the
        reference's ``from_pretrained`` flow.

        ``mesh``: optional Mesh with a ``data`` axis — the split is placed
        batch-sharded across it (data parallelism; XLA inserts the gradient
        reduction), the TPU-native replacement for the reference's
        ``nn.DataParallel`` (`Transformer_Audio.py:59-60`).

        ``checkpoint_dir``: per-phase TrainState checkpoints (params, batch
        stats, optimizer state, rng) under ``<dir>/phase<N>``; a rerun
        resumes after the last completed phase (SURVEY.md §5 checkpoint
        row)."""
        tr_x, tr_y, te_x, te_y = data

        tr_x = _ensure_device(tr_x)
        te_x = _ensure_device(te_x)
        tr_y = jnp.asarray(np.asarray(tr_y).reshape(-1), jnp.int32)
        te_y = jnp.asarray(np.asarray(te_y).reshape(-1), jnp.int32)
        if mesh is not None:
            from eav_tpu.parallel.mesh import DATA_AXIS, put_sharded

            tr_x, tr_y, te_x, te_y = (
                put_sharded(a, mesh, DATA_AXIS) for a in (tr_x, tr_y, te_x, te_y)
            )

        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        rng, k_init = jax.random.split(rng)
        init_key = (tuple(tr_x.shape[1:]), str(tr_x.dtype))
        if init_key not in self._init_fn_cache:
            self._init_fn_cache[init_key] = jax.jit(
                lambda k, x0: self.model.init(
                    {"params": k, "dropout": k}, x0, train=False
                )
            )
        variables = self._init_fn_cache[init_key](k_init, tr_x[:1])
        params = variables["params"]
        bstats = variables.get("batch_stats", {})
        if init_params is not None:
            params = overlay_params(params, jax.tree.map(jnp.asarray, init_params))
        if init_batch_stats is not None:
            bstats = overlay_params(bstats, jax.tree.map(jnp.asarray, init_batch_stats))
        # NOTE: no max-norm projection at init — torch's renorm fires only
        # AFTER a forward/step (post-step clamp `Transformer_EEG.py:196-199`;
        # forward hooks fire after the layer runs, `EEGNet_tor.py:33-34`), so
        # the first step's gradients see the unprojected weights. Projecting
        # here diverged the imported-trainer trajectory by ~2%/epoch
        # (tests/test_reference_import_parity.py
        # test_traineruni_conformer_trajectory_matches_jittrainer).
        opt_state = init_adam_state(params)

        hist_loss, hist_tr, hist_te, hist_el = [], [], [], []
        outputs_test = None
        use_python_loop = jax.default_backend() == "cpu"
        start_phase = 0
        if checkpoint_dir is not None:

            from eav_tpu.core.checkpoint import load_pytree, save_pytree

            # config fingerprint: a phaseN checkpoint is only resumable under
            # the exact run configuration that produced it — rerunning with a
            # changed preset (lr, epochs, compat flags) or different split
            # shapes must NOT silently resume stale state just because the
            # trees unflatten (VERDICT r3 weak #5)
            fp = self._ckpt_fingerprint(tr_x.shape, te_x.shape)
            fp_path = os.path.join(checkpoint_dir, "fingerprint.txt")
            if os.path.exists(fp_path):
                saved_fp = open(fp_path).read().strip()
                if saved_fp != fp:
                    raise ValueError(
                        f"checkpoint_dir {checkpoint_dir} was written under a "
                        f"different configuration (fingerprint {saved_fp} != "
                        f"{fp}: FinetuneConfig / maxnorm rules / head regex / "
                        f"split shapes changed) — refusing to resume; point "
                        f"at a fresh directory or delete the stale checkpoints"
                    )
            for i in range(len(self.cfg.phases) - 1, -1, -1):
                path = os.path.join(checkpoint_dir, f"phase{i}")
                if os.path.exists(path) or os.path.exists(path + ".npz"):
                    state = load_pytree(path)
                    params = jax.tree.map(jnp.asarray, state["params"])
                    bstats = jax.tree.map(jnp.asarray, state["batch_stats"])
                    opt_state = AdamState(**{
                        k: jax.tree.map(jnp.asarray, state["opt"][k])
                        for k in ("count", "mu", "nu")
                    })
                    rng = jnp.asarray(state["rng"], jnp.uint32)
                    start_phase = i + 1
                    break
        for phase_idx, phase_cfg in enumerate(self.cfg.phases):
            if phase_idx < start_phase:
                continue
            mask = trainable_mask(params, phase_cfg.freeze, self.head_regex)
            lr = jnp.asarray(phase_cfg.lr, jnp.float32)
            # frozen-feature fast path: the backbone is constant through a
            # frozen phase, so run its epochs on once-computed pooled
            # features — one backbone pass over train+test replaces
            # epochs x (steps + eval) backbone forwards (same math; see
            # _frozen_cache_ok for the exactness conditions)
            use_head = bool(phase_cfg.freeze and not bstats and self._frozen_cache_ok())
            if use_head:
                px = self.extract_features(params, bstats, tr_x)
                pe = self.extract_features(params, bstats, te_x)
                if jax.default_backend() == "cpu":
                    px, pe = jnp.asarray(px), jnp.asarray(pe)
            else:
                px, pe = tr_x, te_x
            if use_python_loop or use_head:
                # epochs_per_call exists because runtimes can bound a single
                # execution's duration — a head-mode phase executes in
                # milliseconds regardless of epochs, so chunking it only
                # pays per-call dispatch; run it as one program
                epc = phase_cfg.epochs
                adaptive = False
            else:
                epc = self.epochs_per_call or phase_cfg.epochs
                # size later chunks from the first one's measured wall so
                # each call runs ~epc_target_seconds (see __init__)
                adaptive = bool(self.epc_target_seconds) and epc < phase_cfg.epochs
            remaining = phase_cfg.epochs
            chunk_size = epc
            while remaining > 0:
                chunk_epochs = min(chunk_size, remaining)
                # under compat_sticky_eval only the chunk containing the
                # phase's first epoch runs it train-mode (build_phase_fn)
                sticky_first = remaining == phase_cfg.epochs
                sticky_key = self.cfg.compat_sticky_eval and sticky_first
                t_chunk = time.perf_counter()
                if use_python_loop:
                    params, bstats, opt_state, rng, (lh, trh, teh, el), logits = (
                        self._run_phase_python(
                            mask, chunk_epochs, params, bstats, opt_state, rng,
                            px, tr_y, pe, te_y, lr, head=use_head,
                            sticky_first=sticky_first,
                        )
                    )
                else:
                    key = (phase_cfg.freeze, chunk_epochs, use_head,
                           int(tr_x.shape[0]), int(te_x.shape[0]), sticky_key)
                    if key not in self._phase_fn_cache:
                        self._phase_fn_cache[key] = self._build_phase(
                            mask, chunk_epochs, int(tr_x.shape[0]), int(te_x.shape[0]),
                            head=use_head, sticky_first=sticky_first,
                        )
                    params, bstats, opt_state, rng, (lh, trh, teh, el), logits = (
                        self._phase_fn_cache[key](
                            params, bstats, opt_state, rng, px, tr_y, pe, te_y, lr,
                        )
                    )
                # NO per-chunk host fence: chunk outputs stay device arrays
                # (converted once per phase end / fit end), so chunk N+1's
                # dispatch is issued while chunk N still executes — the
                # round-3 vision journal's ~2x fit-wall spread (median 116 s
                # vs min 53.8 s, identical work) pointed at dispatch/tunnel
                # gaps between chunks, not compute (VERDICT r3 next #3).
                # EAV_TPU_FENCE_CHUNKS=1 restores the round-3 per-chunk
                # fence (A/B measurement knob, scripts/measure_*_flagship).
                if os.environ.get("EAV_TPU_FENCE_CHUNKS") == "1":
                    np.asarray(lh)
                hist_loss.append(lh)
                hist_tr.append(trh)
                hist_te.append(teh)
                if el is not None:
                    hist_el.append(el)
                outputs_test = logits
                remaining -= chunk_epochs
                if adaptive and remaining > 0:
                    np.asarray(lh)  # fence ONLY the timing chunk (axon's
                    # block_until_ready does not block; D2H does)
                    # decide once, from the first chunk: a compile-polluted
                    # first wall just keeps chunks at the safe floor size
                    per_epoch = (time.perf_counter() - t_chunk) / chunk_epochs
                    k = _quantize_chunk(int(self.epc_target_seconds / max(per_epoch, 1e-9)))
                    chunk_size = max(epc, min(k, remaining))
                    adaptive = False
            if checkpoint_dir is not None:
                save_pytree(
                    os.path.join(checkpoint_dir, f"phase{phase_idx}"),
                    {
                        "params": params,
                        "batch_stats": bstats,
                        "opt": {"count": opt_state.count, "mu": opt_state.mu, "nu": opt_state.nu},
                        "rng": rng,
                    },
                )
                if not os.path.exists(fp_path):
                    with open(fp_path, "w") as f:
                        f.write(fp + "\n")
            if verbose:
                print(
                    f"[phase freeze={phase_cfg.freeze}] "
                    f"final train_acc={hist_tr[-1][-1]:.3f} test_acc={hist_te[-1][-1]:.3f}"
                )
        if not hist_loss:
            # fully resumed from checkpoints: no phases ran — reconstruct the
            # result from the restored state (NaN-marked training history)
            outputs_test = self.predict(params, bstats, te_x)
            acc = float((np.argmax(outputs_test, -1) == np.asarray(te_y)).mean())
            history = {
                "loss": np.array([np.nan]),
                "train_acc": np.array([np.nan]),
                "test_acc": np.array([acc]),
            }
            return TrainResult(params, bstats, history, outputs_test, None)
        history = {
            "loss": np.concatenate([np.asarray(h) for h in hist_loss]),
            "train_acc": np.concatenate([np.asarray(h) for h in hist_tr]),
            "test_acc": np.concatenate([np.asarray(h) for h in hist_te]),
        }
        epoch_logits = (
            np.concatenate([np.asarray(h) for h in hist_el]) if hist_el else None
        )
        return TrainResult(params, bstats, history, np.asarray(outputs_test), epoch_logits)
