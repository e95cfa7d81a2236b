"""Benchmark: flagship AST fine-tune throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default workload (the reference's headline pipeline, `Transformer_Audio.py`):
AST-base (12L/768h, 1214 tokens) unfrozen AdamW fine-tune steps at the
published bs=8 on one chip, on the production preset path (bf16 MXU compute
+ Pallas flash attention + donated optimizer state). The sweep spreads AST
subjects ACROSS chips (vmap-stacking measurably does not help at this model
size — see ``--stacked``), so the serial per-chip step IS the production
number. ``vs_baseline`` = our samples/sec / the reference-style torch
AST-base train step on this host's CPU (the only hardware the torch
reference can use in this image): 170 s per warm step, so the torch number
is a measured constant (see TORCH_AST_CPU_SPS for provenance); set
EAV_BENCH_MEASURE_TORCH=1 to re-measure it live.

The measurement runs in a child process under a hard timeout (the axon TPU
worker sometimes hangs inside native code, where no in-process watchdog can
fire); one retry after 180 s.

``--eegnet`` keeps round 1's metric (EEGNet subject-parallel vs live torch
CPU, `Dataload_eeg.py:250-256` recipe) for cross-round comparability.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import numpy as np

# Persistent compilation cache: compiles through the remote-compile tunnel
# cost minutes; cache them across bench runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))


def bench_tpu(subjects: int = 8, epochs: int = 20) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet
    from eav_tpu.parallel.mesh import SUBJECT_AXIS, make_mesh
    from eav_tpu.parallel.subject import SubjectParallelTrainer

    rng = np.random.default_rng(0)
    S, n_tr, n_te = subjects, 280, 120
    tr_x = rng.normal(size=(S, n_tr, 30, 500)).astype(np.float32)
    tr_y = rng.integers(0, 5, size=(S, n_tr)).astype(np.int32)
    te_x = rng.normal(size=(S, n_te, 30, 500)).astype(np.float32)
    te_y = rng.integers(0, 5, size=(S, n_te)).astype(np.int32)

    # experimental knobs (numerics-parity default: f32 + direct conv)
    import jax.numpy as _jnp

    dtype = {"bf16": _jnp.bfloat16}.get(os.environ.get("EAV_BENCH_DTYPE", ""), None)
    temporal = os.environ.get("EAV_BENCH_TEMPORAL", "fft")  # +20% vs direct conv, numerics-equal
    model = EEGNet(compute_dtype=dtype, temporal_mode=temporal)
    mesh = make_mesh(((SUBJECT_AXIS, 1),), devices=jax.devices()[:1])

    # One compiled multi-epoch phase program — the whole fine-tune is a single
    # device program (train/loop.py), which also amortizes the per-invocation
    # latency of the remote TPU tunnel.
    import jax.numpy as jnp

    from eav_tpu.core.optim import init_adam_state, trainable_mask
    from eav_tpu.train.loop import JitTrainer

    inner = JitTrainer(model, FinetuneConfig(
        model="eegnet",
        batch_size=32,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=epochs, lr=1e-5, freeze=False),),
    ), maxnorm_rules=model.maxnorm_rules)
    tr_xd, te_xd = jnp.asarray(tr_x), jnp.asarray(te_x)
    tr_yd, te_yd = jnp.asarray(tr_y), jnp.asarray(te_y)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))

    def init_one(key, x1):
        v = model.init({"params": key, "dropout": key}, x1[:1], train=False)
        return v["params"], v.get("batch_stats", {})

    params, bstats = jax.vmap(init_one)(keys, tr_xd)
    opt_state = jax.vmap(init_adam_state)(params)
    one_params = jax.tree.map(lambda p: p[0], params)
    mask = trainable_mask(one_params, False)
    phase = inner.build_phase_fn(mask, epochs, n_tr, n_te)
    vphase = jax.jit(jax.vmap(phase, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)))
    lr = jnp.float32(1e-5)
    args = (params, bstats, opt_state, keys, tr_xd, tr_yd, te_xd, te_yd, lr)
    out = vphase(*args)  # compile + warmup run
    np.asarray(out[5])  # materialize to host: the only reliable fence here
    t0 = time.perf_counter()
    out = vphase(*args)
    np.asarray(out[5])
    dt = time.perf_counter() - t0
    return S * n_tr * epochs / dt


def bench_torch_cpu(epochs: int = 2) -> float:
    """Reference-style torch EEGNet (EEGNet_tor semantics) on host CPU."""
    import torch
    import torch.nn as nn

    class TorchEEGNet(nn.Module):
        def __init__(self, C=30, T=500, F1=8, D=8, F2=64, K=300, ncls=5):
            super().__init__()
            self.c1 = nn.Conv2d(1, F1, (1, K), padding="same", bias=False)
            self.b1 = nn.BatchNorm2d(F1)
            self.c2 = nn.Conv2d(F1, F1 * D, (C, 1), groups=F1, bias=False)
            self.b2 = nn.BatchNorm2d(F1 * D)
            self.c3 = nn.Conv2d(F1 * D, F2, (1, 16), padding="same", bias=False)
            self.b3 = nn.BatchNorm2d(F2)
            self.fc = nn.Linear(F2 * (T // 4 // 8), ncls)
            self.drop = nn.Dropout(0.5)
            self.elu = nn.ELU()

        def forward(self, x):
            x = self.elu(self.b1(self.c1(x)))
            x = self.elu(self.b2(self.c2(x)))
            x = self.drop(nn.functional.avg_pool2d(x, (1, 4)))
            x = self.elu(self.b3(self.c3(x)))
            x = self.drop(nn.functional.avg_pool2d(x, (1, 8)))
            return self.fc(torch.flatten(x, 1))

    torch.manual_seed(0)
    n = 280
    x = torch.randn(n, 1, 30, 500)
    y = torch.randint(0, 5, (n,))
    model = TorchEEGNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-5)
    lossf = nn.CrossEntropyLoss()
    model.train()
    # one warmup epoch
    for b in range(0, n, 32):
        opt.zero_grad()
        loss = lossf(model(x[b : b + 32]), y[b : b + 32])
        loss.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in range(0, n, 32):
            opt.zero_grad()
            loss = lossf(model(x[b : b + 32]), y[b : b + 32])
            loss.backward()
            opt.step()
    dt = time.perf_counter() - t0
    return n * epochs / dt


# torch.optim.AdamW step of an AST-base-equivalent model (12L/768h/1214
# tokens, bs=8) measured on THIS host's 1-core CPU on 2026-08-16 with
# bench_torch_ast_cpu's exact model: warm steady-state step2 = 170.1 s
# fwd+bwd+step -> 0.047 samples/s (cold step1 was 227-397 s; the faster
# warm number is used, which is the CONSERVATIVE choice for vs_baseline).
# Re-measure live with EAV_BENCH_MEASURE_TORCH=1 (budget ~10 min).
TORCH_AST_CPU_SPS = 8.0 / 170.1


def bench_torch_ast_cpu(steps: int = 1, batch: int = 8) -> float:
    """Reference-style torch AST-base train step on host CPU (live
    re-measurement of TORCH_AST_CPU_SPS; ~7 min/step on this 1-core host)."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(s):
            super().__init__()
            s.ln1 = nn.LayerNorm(768)
            s.at = nn.MultiheadAttention(768, 12, batch_first=True)
            s.ln2 = nn.LayerNorm(768)
            s.fc1 = nn.Linear(768, 3072)
            s.fc2 = nn.Linear(3072, 768)

        def forward(s, x):
            y = s.ln1(x)
            x = x + s.at(y, y, y, need_weights=False)[0]
            z = s.ln2(x)
            return x + s.fc2(nn.functional.gelu(s.fc1(z)))

    class TorchAST(nn.Module):
        def __init__(s):
            super().__init__()
            s.patch = nn.Conv2d(1, 768, 16, stride=10)
            s.pos = nn.Parameter(torch.zeros(1, 1214, 768))
            s.blocks = nn.ModuleList([Block() for _ in range(12)])
            s.ln = nn.LayerNorm(768)
            s.head = nn.Linear(768, 5)

        def forward(s, x):
            x = s.patch(x.unsqueeze(1).transpose(2, 3)).flatten(2).transpose(1, 2)
            x = torch.cat([torch.zeros(x.shape[0], 2, 768), x], 1) + s.pos
            for b in s.blocks:
                x = b(x)
            return s.head(s.ln(x)[:, 0])

    torch.manual_seed(0)
    m = TorchAST()
    opt = torch.optim.AdamW(m.parameters(), lr=5e-6)
    x = torch.randn(batch, 1024, 128)
    y = torch.randint(0, 5, (batch,))
    lossf = nn.CrossEntropyLoss()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        lossf(m(x), y).backward()
        opt.step()
    return batch * steps / (time.perf_counter() - t0)


def bench_ast_stacked(
    subjects: int = 4,
    steps: int = 20,
    batch: int = 8,
    attn_impl: str = "xla",
    remat: str = "none",
) -> float:
    """Flagship metric: subject-parallel AST-base fine-tune steps.

    ``subjects`` independent per-subject AdamW fine-tunes (each at the
    published bs=8, unfrozen phase — the hot loop of
    `Transformer_Audio.py:67-82`) execute as ONE vmapped program in bf16,
    the way the sweep actually runs (parallel/subject.py)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
    from eav_tpu.models.ast import AST
    from eav_tpu.train.loop import cross_entropy

    rng = np.random.default_rng(0)
    S = subjects
    # Default XLA attention: the flash kernels' saved q/k/v/o residuals push
    # a no-remat 4-subject stack past 16 GB HBM (measured RESOURCE_EXHAUSTED).
    # attn_impl='flash', remat='attn' drops those residuals (one extra
    # attention forward in bwd) so the stack fits with the flash kernels.
    model = AST(compute_dtype=jnp.bfloat16, attn_impl=attn_impl, remat=remat)
    x = jnp.asarray(rng.normal(size=(S, batch, 1024, 128)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(S, batch)).astype(np.int32))

    def init_one(key, x1):
        return model.init({"params": key, "dropout": key}, x1[:1], train=False)["params"]

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))
    params = jax.vmap(init_one)(keys, x)
    opt = jax.vmap(init_adam_state)(params)
    mask = trainable_mask(jax.tree.map(lambda p: p[0], params), freeze=False)

    def step_one(params, opt, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=False)
            return cross_entropy(logits, y, jnp.ones_like(y, jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(
            grads, opt, params, lr=5e-6, trainable_mask=mask, weight_decay=0.01
        )
        return loss, params, opt

    vstep = jax.jit(jax.vmap(step_one, in_axes=(0, 0, 0, 0)))
    loss, params, opt = vstep(params, opt, x, y)
    np.asarray(loss)  # fence (block_until_ready is unreliable on this platform)
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, params, opt = vstep(params, opt, x, y)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    return S * batch * steps / dt


def ast_train_flops_per_sample(
    t: int = 1214, hidden: int = 768, mlp: int = 3072, layers: int = 12,
    patch: int = 16,
) -> float:
    """Analytic matmul FLOPs of ONE AST-base train step sample, fwd+bwd
    counted as 3x forward (the standard MFU convention — backward does the
    two matmul transposes per forward matmul). Counts: patch conv, fused
    qkv, attention score/context gemms, attention out, MLP. Elementwise ops
    (LN, gelu, softmax) excluded — they are HBM-bound, not MXU work."""
    per_layer = (
        2 * t * hidden * 3 * hidden   # qkv
        + 2 * t * t * hidden          # scores  Q K^T (all heads)
        + 2 * t * t * hidden          # context P V
        + 2 * t * hidden * hidden     # attn out
        + 2 * 2 * t * hidden * mlp    # fc1 + fc2
    )
    patches = t - 2  # cls + dist tokens carry no conv FLOPs
    patch_conv = 2 * patches * hidden * patch * patch
    return 3.0 * (layers * per_layer + patch_conv)


def ast_param_count(
    t: int = 1214, hidden: int = 768, mlp: int = 3072, layers: int = 12,
    patch: int = 16, num_labels: int = 5,
) -> int:
    """Exact parameter count of models/ast.AST at the bench shape."""
    per_layer = (
        hidden * 3 * hidden + 3 * hidden      # fused qkv
        + hidden * hidden + hidden            # attn out
        + hidden * mlp + mlp                  # fc1
        + mlp * hidden + hidden               # fc2
        + 4 * hidden                          # ln1 + ln2 (scale+bias)
    )
    embeds = (
        patch * patch * hidden + hidden       # patch conv
        + t * hidden                          # pos embed (1212 patches + 2 tokens)
        + 2 * hidden                          # cls + dist tokens
    )
    head = 4 * hidden + hidden * num_labels + num_labels  # final_ln + cls_ln + dense
    return layers * per_layer + embeds + head


def ast_step_hbm_bytes(
    batch: int = 8, t: int = 1214, hidden: int = 768, mlp: int = 3072,
    layers: int = 12,
) -> dict:
    """Itemized HBM traffic of ONE unfrozen AdamW train step under the
    production preset (bf16 activations/compute, f32 params + Adam moments,
    flash attention so the T x T probability matrix is never materialized,
    remat 'none'). Counts, per step (VERDICT r4 next #5):

    - params (f32): read by fwd, read by bwd, read + written by AdamW;
    - Adam moments (f32): mu and nu each read + written;
    - grads (f32): written by bwd, read by AdamW;
    - activation stash (bf16): tensors saved by the fwd for the bwd — per
      layer the residual input, ln1 out, qkv, flash O + softmax stats, attn
      proj out, ln2 in/out, fc1 out, gelu out (fwd writes them, bwd reads
      them back).

    This is a LOWER bound on real traffic (re-reads of the stash, optimizer
    temp buffers and imperfect fusion add more), which makes the derived
    HBM roofline an UPPER bound — conservative in the right direction."""
    p = ast_param_count(t, hidden, mlp, layers)
    param_traffic = 4 * p * (2 + 2)          # fwd+bwd reads, opt read+write
    moment_traffic = 4 * p * 4               # mu, nu each read + write
    grad_traffic = 4 * p * 2                 # bwd write, opt read
    bt = batch * t
    stash_per_layer = (
        3 * bt * hidden                      # residual in, ln1 out, proj out
        + 3 * bt * hidden                    # q, k, v
        + bt * hidden + 4 * batch * 12 * t   # flash O + f32 row stats
        + 2 * bt * hidden                    # ln2 in, ln2 out
        + 2 * bt * mlp                       # fc1 out, gelu out
    )
    stash = 2 * (layers * stash_per_layer + 2 * bt * hidden)  # bf16 bytes
    act_traffic = 2 * stash                  # fwd writes + bwd reads
    total = param_traffic + moment_traffic + grad_traffic + act_traffic
    return {
        "params": param_traffic, "moments": moment_traffic,
        "grads": grad_traffic, "activations": act_traffic, "total": total,
    }


def ast_roofline(samples_per_sec: float, batch: int = 8) -> dict:
    """AST bs=8 step roofline on v5e (VERDICT r4 next #5): FLOPs/step over
    MXU peak and bytes/step over HBM bandwidth give two per-step floors; the
    ceiling is batch / max(floor). Two MXU variants are reported: 'mxu'
    charges every counted FLOP at the full 197 TFLOP/s peak; 'mxu_eff'
    charges the attention score/context gemms at HALF peak because their
    contraction/output dim is d_head=64 — half the 128-lane MXU tile, so
    those gemms cannot exceed ~50% utilization at this head size regardless
    of software. The honest ceiling quotes both."""
    flops = batch * ast_train_flops_per_sample()
    hbm = ast_step_hbm_bytes(batch)
    peak, bw = 197e12, 819e9  # v5e MXU bf16 peak, HBM bandwidth
    t_mxu = flops / peak
    # attention score+context share of per-layer FLOPs (d_head-64 gemms)
    t, hidden, mlp = 1214, 768, 3072
    attn_gemms = 12 * (2 * 2 * t * t * hidden) * 3.0 * batch
    t_mxu_eff = (flops - attn_gemms) / peak + attn_gemms / (peak / 2)
    t_hbm = hbm["total"] / bw
    ceil = batch / max(t_mxu, t_hbm)
    ceil_eff = batch / max(t_mxu_eff, t_hbm)
    return {
        "flops_per_step": flops,
        "bytes_per_step": hbm["total"],
        "t_mxu_ms": round(t_mxu * 1e3, 2),
        "t_mxu_eff_ms": round(t_mxu_eff * 1e3, 2),
        "t_hbm_ms": round(t_hbm * 1e3, 2),
        "ceiling_sps": round(ceil, 1),
        "ceiling_eff_sps": round(ceil_eff, 1),
        "roofline_pct": round(100.0 * samples_per_sec / ceil, 1),
        "roofline_eff_pct": round(100.0 * samples_per_sec / ceil_eff, 1),
    }


def tpu_peak_flops() -> float | None:
    """Peak bf16 FLOP/s of the attached chip (for MFU), by device kind."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
        "v4": 275e12, "v5p": 459e12, "v6 lite": 918e12, "v6e": 918e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return None


def bench_ast_tpu(steps: int = 20, batch: int = 8, dtype: str = "bf16") -> float:
    """Serial AST-base fine-tune step throughput (bs=8, unfrozen phase —
    the hot loop of `Transformer_Audio.py:67-82`).

    The benched step is the PRODUCTION JitTrainer step — the literal
    ``_phase_pieces`` train_step the sweep executes (train=True forward with
    dropout-rng threading, AdamW + weight decay, same preset model: bf16 MXU
    compute + flash attention) — so this metric can never drift from what
    `eav_tpu.cli run` actually runs. Params/opt donated (87M params x3
    trees update in place)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from eav_tpu.core.config import get_preset
    from eav_tpu.core.optim import init_adam_state, trainable_mask
    from eav_tpu.train.loop import JitTrainer
    from eav_tpu.train.pipeline import build_model

    preset = get_preset("ast_finetune")
    if dtype != "bf16":  # experimental knob: all-f32 torch-parity numerics
        kw = dict(preset.finetune.model_kwargs)
        kw["compute_dtype"] = None
        preset = preset.replace(
            finetune=dataclasses.replace(preset.finetune, model_kwargs=kw)
        )
    model, mkw = build_model(preset)
    trainer = JitTrainer(model, preset.finetune, **mkw)

    rng = np.random.default_rng(0)
    n_train, n_test = 280, 120  # the real per-subject split (README.md:82)
    x = jnp.asarray(rng.normal(size=(n_train, 1024, 128)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, size=(n_train,)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = init_adam_state(params)
    mask = trainable_mask(params, freeze=False)  # unfrozen phase
    train_step, _eval, _perm, (bs, _sf, _rem), _accs = trainer._phase_pieces(
        mask, n_train, n_test
    )
    assert bs == batch, f"preset batch size {bs} != benched batch {batch}"

    step = jax.jit(
        lambda carry, idx, lr: train_step(carry, idx, x, y, lr),
        donate_argnums=(0,),
    )
    lr = jnp.float32(5e-6)
    idx = jnp.arange(batch)
    carry = (params, bstats, opt, jax.random.PRNGKey(1))
    carry, (loss, _) = step(carry, idx, lr)
    np.asarray(loss)  # fence (block_until_ready is unreliable on this platform)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, (loss, _) = step(carry, idx, lr)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    import sys

    if "--_inproc" not in sys.argv:
        # Watchdog: the axon TPU worker occasionally crashes and auto-recovers
        # in a few minutes — and sometimes HANGS inside native code (observed:
        # a 29-min stall on a cached-compile program), where a SIGALRM can
        # never raise (CPython only runs handlers between bytecodes). So the
        # measurement runs in a CHILD process under a hard subprocess timeout;
        # a hang/crash becomes one retried attempt. Cold-cache compiles are
        # minutes-slow, hence the generous default (override with
        # EAV_BENCH_TIMEOUT seconds).
        import subprocess

        timeout_s = int(os.environ.get("EAV_BENCH_TIMEOUT", "2400"))
        child_cmd = [sys.executable, os.path.abspath(__file__), "--_inproc"] + sys.argv[1:]
        last_err = None
        for attempt in range(2):
            try:
                r = subprocess.run(
                    child_cmd, capture_output=True, text=True, timeout=timeout_s
                )
            except subprocess.TimeoutExpired:
                last_err = f"attempt timed out after {timeout_s}s"
            else:
                lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
                if r.returncode == 0 and lines:
                    print(lines[-1])
                    return
                last_err = (r.stderr or r.stdout).strip().splitlines()[-5:]
            if attempt == 0:
                print(f"# bench attempt failed ({last_err}); retrying in 180s")
                time.sleep(180)
        raise SystemExit(f"bench failed after retries: {last_err}")

    def with_retry(fn, **_kw):
        # retries/timeouts are handled by the parent-process watchdog above
        return fn()

    if "--eegnet" in sys.argv:
        # round 1's metric, kept for cross-round comparability
        tpu_sps = with_retry(bench_tpu)
        torch_sps = bench_torch_cpu()
        print(
            json.dumps(
                {
                    "metric": "eegnet_finetune_samples_per_sec",
                    "value": round(tpu_sps, 1),
                    "unit": "samples/s",
                    "vs_baseline": round(tpu_sps / torch_sps, 2),
                }
            )
        )
        return
    if "--stacked" in sys.argv:
        # vmapped multi-subject stack. Measured on v5e: AST at bs=8 already
        # saturates the chip (S=1 68.2 vs S=4 aggregate 62.6 samples/s), so
        # the sweep distributes AST subjects ACROSS chips (core/sweep.py
        # groups) rather than vmap-stacking them; stacking is the lever for
        # the small models (EEGNet: --eegnet runs 8 stacked).
        S = int(os.environ.get("EAV_BENCH_STACK", "4"))
        attn = os.environ.get("EAV_BENCH_STACK_ATTN", "flash")
        remat = os.environ.get(
            "EAV_BENCH_STACK_REMAT", "attn" if attn == "flash" else "none"
        )
        ast_sps = with_retry(
            lambda: bench_ast_stacked(subjects=S, attn_impl=attn, remat=remat)
        )
        print(
            json.dumps(
                {
                    "metric": f"ast_finetune_samples_per_sec_stacked{S}_{attn}"
                    + (f"_remat-{remat}" if remat != "none" else ""),
                    "value": round(ast_sps, 2),
                    "unit": "samples/s",
                    "vs_baseline": round(ast_sps / TORCH_AST_CPU_SPS, 2),
                }
            )
        )
        return
    # default (also --flagship): the reference's headline AST fine-tune —
    # one bf16 train step per chip, subjects spread across chips by the
    # sweep scheduler
    ast_sps = with_retry(bench_ast_tpu)
    torch_sps = TORCH_AST_CPU_SPS
    baseline = "torch-cpu-constant-2026-08-16"  # provenance (machine-visible)
    if os.environ.get("EAV_BENCH_MEASURE_TORCH"):
        torch_sps = bench_torch_ast_cpu()
        baseline = "torch-cpu-measured-live"
    # achieved TFLOP/s + % of peak from the analytic matmul FLOP count — an
    # absolute efficiency signal alongside the soft-target torch ratio
    achieved = ast_sps * ast_train_flops_per_sample()
    peak = tpu_peak_flops()
    out = {
        "metric": "ast_finetune_samples_per_sec",
        "value": round(ast_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(ast_sps / torch_sps, 2),
        "baseline": baseline,
        "tflops": round(achieved / 1e12, 1),
    }
    if peak:
        out["mfu_pct"] = round(100.0 * achieved / peak, 1)
        # analytic step roofline (docs/ROUND5.md): % of the bs-8 ceiling set
        # by max(MXU FLOP floor, HBM byte floor); _eff charges the d_head-64
        # attention gemms at the 50% tile utilization they are capped at
        rl = ast_roofline(ast_sps)
        out["roofline_pct"] = rl["roofline_pct"]
        out["roofline_eff_pct"] = rl["roofline_eff_pct"]
        out["ceiling_sps"] = rl["ceiling_sps"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
