"""Is the AST bench dispatch-bound on the tunneled chip?

bench.py's flagship metric times the production `_phase_pieces` train_step
in a PYTHON loop: one device dispatch per step through the axon tunnel.
Production (`JitTrainer._build_phase` / `fit(epochs_per_call=...)`) executes
the identical step inside `lax.scan` — one dispatch per multi-epoch chunk.
If per-dispatch overhead is a material constant at the 85 ms step scale,
the python-loop bench UNDERSTATES production throughput and the two-round
"plateau" (docs/ROUND3.md:128-141) is partly a measurement artifact.

Times three programs built from the SAME step (ast_finetune preset, bs=8,
unfrozen mask, bf16 + flash attention — the hot loop of
/root/reference/Transformer_torch/Transformer_Audio.py:67-82):
  1. python-loop:  K dispatches of jit(train_step)      [bench.py today]
  2. scan-of-steps: ONE dispatch of jit(scan(train_step, K))
  3. production phase: ONE dispatch of _build_phase(epochs=E) — scan of
     epochs around scan of steps, per-epoch eval included (the program the
     sweep actually runs; samples/s here counts TRAIN samples only, so the
     eval forwards are charged against it, as in the journal).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform != "cpu", (
    "this measures the TPU path (axon can crash and silently fall back to CPU)")

from eav_tpu.core.config import get_preset
from eav_tpu.core.optim import init_adam_state, trainable_mask
from eav_tpu.train.loop import JitTrainer
from eav_tpu.train.pipeline import build_model

STEPS = int(os.environ.get("EAV_STEPS", "35"))  # one epoch of 280 @ bs 8
EPOCHS = int(os.environ.get("EAV_EPOCHS", "4"))

preset = get_preset("ast_finetune")
model, mkw = build_model(preset)
trainer = JitTrainer(model, preset.finetune, **mkw)

rng = np.random.default_rng(0)
n_train, n_test = 280, 120
x = jnp.asarray(rng.normal(size=(n_train, 1024, 128)).astype(np.float32))
y = jnp.asarray(rng.integers(0, 5, size=(n_train,)).astype(np.int32))
te_x = jnp.asarray(rng.normal(size=(n_test, 1024, 128)).astype(np.float32))
te_y = jnp.asarray(rng.integers(0, 5, size=(n_test,)).astype(np.int32))
variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
params0 = variables["params"]
bstats = variables.get("batch_stats", {})
mask = trainable_mask(params0, freeze=False)
train_step, _eval, _perm, (bs, steps_full, rem), _accs = trainer._phase_pieces(
    mask, n_train, n_test
)
lr = jnp.float32(5e-6)


def timeit(label, launch, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = launch()
        np.asarray(jax.tree.leaves(out)[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def fresh_carry(key=1):
    # per-stage copies: the python-loop step DONATES its carry, so handing
    # it the shared params0/bstats buffers would delete them for stage 2/3
    p = jax.tree.map(jnp.copy, params0)
    b = jax.tree.map(jnp.copy, bstats)
    return (p, b, init_adam_state(p), jax.random.PRNGKey(key))


# --- 1. python loop of dispatches (bench.py's current shape) -------------
step = jax.jit(lambda carry, idx, lr: train_step(carry, idx, x, y, lr),
               donate_argnums=(0,))
idx = jnp.arange(bs)
carry = fresh_carry()
carry, (loss, _) = step(carry, idx, lr)
np.asarray(loss)

def run_loop():
    global carry
    for _ in range(STEPS):
        carry, (loss, _) = step(carry, idx, lr)
    return loss

dt = timeit("loop", run_loop)
print(f"python-loop   : {STEPS} steps in {dt*1e3:8.1f} ms  "
      f"{bs*STEPS/dt:7.2f} samples/s  ({dt/STEPS*1e3:6.2f} ms/step)", flush=True)

# --- 2. one scan-of-steps program ----------------------------------------
idxs = jnp.tile(jnp.arange(bs), (STEPS, 1))

@jax.jit
def scan_prog(carry, idxs):
    def body(c, ix):
        c, (loss, _) = train_step(c, ix, x, y, lr)
        return c, loss
    return jax.lax.scan(body, carry, idxs)

carry2 = fresh_carry()
carry2, losses = scan_prog(carry2, idxs)
np.asarray(losses)
dt = timeit("scan", lambda: scan_prog(carry2, idxs)[1])
print(f"scan-of-steps : {STEPS} steps in {dt*1e3:8.1f} ms  "
      f"{bs*STEPS/dt:7.2f} samples/s  ({dt/STEPS*1e3:6.2f} ms/step)", flush=True)

# --- 3. the production phase program (epochs x steps + per-epoch eval) ---
phase = trainer._build_phase(mask, EPOCHS, n_train, n_test)

def run_phase():
    # _build_phase donates params/opt (argnums 0, 2): hand it fresh copies
    # each call (the ~0.4 ms on-device copy is charged against the program)
    p = jax.tree.map(jnp.copy, params0)
    return phase(p, bstats, init_adam_state(p), jax.random.PRNGKey(1),
                 x, y, te_x, te_y, lr)[-1]

np.asarray(run_phase())  # compile

dt = timeit("phase", run_phase)
n_steps = EPOCHS * (steps_full + (1 if rem else 0))
print(f"phase program : {EPOCHS} epochs ({n_steps} steps + {EPOCHS} evals) in "
      f"{dt*1e3:8.1f} ms  {EPOCHS*n_train/dt:7.2f} train-samples/s", flush=True)
