"""Full-scale EEG sweep simulation: 42 subjects x the published EEGNet
recipe (280 train / 120 test, bs 32, Adam 1e-5, 200 epochs,
`Dataload_eeg.py:250-256`) as ONE subject-parallel program on real hardware,
with synthetic data at true shapes. Turns the <1 h north-star's EEG leg into
a measured number. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eav_tpu.core.config import get_preset
from eav_tpu.models.eegnet import EEGNet
from eav_tpu.parallel.mesh import SUBJECT_AXIS, make_mesh
from eav_tpu.parallel.subject import SubjectParallelTrainer


def main(subjects: int = 42, group: int = 8):
    """Process ``subjects`` fine-tunes in stacked groups of ``group`` (8 is
    the safe per-chip stack for the FFT EEGNet on 16 GB; the compiled program
    is reused across groups of equal size)."""
    preset = get_preset("eegnet_subject")
    rng = np.random.default_rng(0)
    n_tr, n_te = 280, 120
    model = EEGNet(**preset.finetune.model_kwargs)
    mesh = make_mesh(((SUBJECT_AXIS, 1),), devices=jax.devices()[:1])
    sp = SubjectParallelTrainer(
        model, preset.finetune, maxnorm_rules=model.maxnorm_rules, mesh=mesh,
        epochs_per_call=20,  # the axon tunnel kills multi-minute executions
    )
    t0 = time.perf_counter()
    done, epochs = 0, 0
    while done < subjects:
        S = min(group, subjects - done)
        tr_x = rng.normal(size=(S, n_tr, 30, 500)).astype(np.float32)
        tr_y = np.tile(np.repeat(np.arange(5), n_tr // 5), (S, 1)).astype(np.int32)
        te_x = rng.normal(size=(S, n_te, 30, 500)).astype(np.float32)
        te_y = np.tile(np.repeat(np.arange(5), n_te // 5), (S, 1)).astype(np.int32)
        result = sp.fit_stacked(
            (tr_x, tr_y, te_x, te_y), seeds=list(range(done, done + S))
        )
        np.asarray(result.outputs_test)
        epochs = int(result.history["test_acc"].shape[1])
        done += S
        print(f"# group done: {done}/{subjects}", flush=True)
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "eegnet_42subject_sweep_wall_clock",
                "subjects": subjects,
                "epochs": epochs,
                "value": round(wall, 1),
                "unit": "s (incl. compile)",
                "samples_per_sec": round(subjects * n_tr * epochs / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 42,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
    )
