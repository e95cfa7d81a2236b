"""Mesh/sharding tests on the 8-virtual-device CPU platform (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.models.eegnet import EEGNet
from eav_tpu.parallel.mesh import (
    DATA_AXIS,
    SUBJECT_AXIS,
    constrain,
    make_mesh,
    put_sharded,
)
from eav_tpu.parallel.subject import SubjectParallelTrainer
from eav_tpu.train.loop import JitTrainer


def test_cpu_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(((DATA_AXIS, -1),))
    assert m.devices.shape == (8,)
    m2 = make_mesh(((SUBJECT_AXIS, 4), ("model", 2)))
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh((("a", 16),))


def test_sharded_matmul_matches_local(rng):
    mesh = make_mesh(((DATA_AXIS, 8),))
    x = rng.normal(size=(16, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    xs = put_sharded(jnp.asarray(x), mesh, DATA_AXIS)

    @jax.jit
    def f(x, w):
        return constrain(x @ w, mesh, DATA_AXIS)

    out = f(xs, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=2e-5, atol=1e-5)


def test_subject_parallel_matches_serial(rng):
    """8 subjects trained in one sharded program == 8 serial fits."""
    S, n, chans, samples = 8, 20, 4, 64
    x = rng.normal(size=(S, n, chans, samples)).astype(np.float32)
    y = rng.integers(0, 5, size=(S, n)).astype(np.int32)
    te_x = rng.normal(size=(S, 12, chans, samples)).astype(np.float32)
    te_y = rng.integers(0, 5, size=(S, 12)).astype(np.int32)

    cfg = FinetuneConfig(
        model="eegnet",
        batch_size=8,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=2, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=chans, samples=samples, kern_length=16, dropout_rate=0.0)
    sp = SubjectParallelTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules)
    stacked = sp.fit_stacked((x, y, te_x, te_y), seeds=list(range(S)))
    assert stacked.outputs_test.shape == (S, 12, 5)
    assert stacked.history["test_acc"].shape == (S, 2)

    # serial reference for subject 3
    jt = JitTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules)
    serial = jt.fit((x[3], y[3], te_x[3], te_y[3]), seed=3)
    np.testing.assert_allclose(
        stacked.outputs_test[3], serial.outputs_test, rtol=2e-4, atol=2e-4
    )


def test_jittrainer_with_dp_mesh_matches_unsharded(rng):
    """Batch-DP via the mesh arg must give the same result as unsharded."""
    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet

    x = rng.normal(size=(32, 4, 64)).astype(np.float32)
    y = rng.integers(0, 5, 32).astype(np.int32)
    te_x = rng.normal(size=(16, 4, 64)).astype(np.float32)
    te_y = rng.integers(0, 5, 16).astype(np.int32)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=2, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=4, samples=64, kern_length=8, dropout_rate=0.0)
    jt = JitTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules)
    plain = jt.fit((x, y, te_x, te_y), seed=0)
    mesh = make_mesh(((DATA_AXIS, 8),))
    sharded = jt.fit((x, y, te_x, te_y), seed=0, mesh=mesh)
    np.testing.assert_allclose(
        sharded.outputs_test, plain.outputs_test, rtol=2e-4, atol=2e-4
    )


def test_chunked_epochs_match_single_program(rng):
    """epochs_per_call chunks are numerically identical to one program."""
    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet

    S, n = 2, 16
    x = rng.normal(size=(S, n, 4, 32)).astype(np.float32)
    y = rng.integers(0, 5, (S, n)).astype(np.int32)
    te_x = rng.normal(size=(S, 8, 4, 32)).astype(np.float32)
    te_y = rng.integers(0, 5, (S, 8)).astype(np.int32)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=4, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=4, samples=32, kern_length=8, dropout_rate=0.0)
    a = SubjectParallelTrainer(model, cfg).fit_stacked((x, y, te_x, te_y), seeds=[0, 1])
    b = SubjectParallelTrainer(model, cfg, epochs_per_call=1).fit_stacked(
        (x, y, te_x, te_y), seeds=[0, 1]
    )
    np.testing.assert_allclose(a.outputs_test, b.outputs_test, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        a.history["test_acc"].shape, b.history["test_acc"].shape
    )


def test_adaptive_chunks_match_fixed_and_enlarge(rng):
    """epc_target_seconds enlarges chunks after the first timed one (fewer
    device calls — each costs a dispatch round trip on tunneled runtimes)
    while staying numerically identical to fixed chunking."""
    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet

    S, n = 2, 16
    x = rng.normal(size=(S, n, 4, 32)).astype(np.float32)
    y = rng.integers(0, 5, (S, n)).astype(np.int32)
    te_x = rng.normal(size=(S, 8, 4, 32)).astype(np.float32)
    te_y = rng.integers(0, 5, (S, 8)).astype(np.int32)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=9, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=4, samples=32, kern_length=8, dropout_rate=0.0)
    fixed = SubjectParallelTrainer(model, cfg, epochs_per_call=1).fit_stacked(
        (x, y, te_x, te_y), seeds=[0, 1]
    )
    sp = SubjectParallelTrainer(
        model, cfg, epochs_per_call=1, epc_target_seconds=3600.0
    )
    adaptive = sp.fit_stacked((x, y, te_x, te_y), seeds=[0, 1])
    np.testing.assert_allclose(
        adaptive.outputs_test, fixed.outputs_test, rtol=1e-5, atol=1e-6
    )
    assert adaptive.history["test_acc"].shape == (S, 9)
    # chunk plan: first timed chunk of 1 epoch, then one enlarged chunk for
    # the remaining 8 (the huge target clamps to `remaining`)
    assert fixed.history["loss"].shape == (S, 9)


def test_adaptive_chunks_respect_bucket_ladder():
    """Chunk sizes snap to the fixed bucket ladder (novel sizes would be
    persistent-compile-cache misses on reruns)."""
    from eav_tpu.train.loop import _CHUNK_BUCKETS, _quantize_chunk

    assert _quantize_chunk(0) == 1
    assert _quantize_chunk(1) == 1
    assert _quantize_chunk(4) == 3
    assert _quantize_chunk(57) == 50
    assert _quantize_chunk(10**9) == _CHUNK_BUCKETS[-1]
    for b in _CHUNK_BUCKETS:
        assert _quantize_chunk(b) == b


def test_stacked_with_init_params_matches_serial(rng):
    """Pretrained-checkpoint flow through the subject-parallel path: a single
    checkpoint broadcast across the subject axis must reproduce the serial
    ``JitTrainer.fit(init_params=...)`` result per subject (the reference's
    ``from_pretrained`` fine-tune, `Transformer_Audio.py:22-24`)."""
    import jax

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.ast import ast_tiny

    model = ast_tiny(hidden=16, layers=1, heads=2, mlp_dim=32, max_frames=32,
                     num_mel_bins=16)
    S, n, nt = 2, 12, 8
    x = rng.normal(size=(S, n, 32, 16)).astype(np.float32)
    y = rng.integers(0, 5, (S, n)).astype(np.int32)
    te_x = rng.normal(size=(S, nt, 32, 16)).astype(np.float32)
    te_y = rng.integers(0, 5, (S, nt)).astype(np.int32)
    cfg = FinetuneConfig(
        model="ast", batch_size=8, optimizer="adamw", weight_decay=0.01,
        phases=(PhaseConfig(epochs=2, lr=5e-4, freeze=True),
                PhaseConfig(epochs=1, lr=5e-6, freeze=False)),
    )
    # the "checkpoint": params from an independent seed, as hf_import returns
    ckpt = model.init({"params": jax.random.PRNGKey(99), "dropout": jax.random.PRNGKey(99)},
                      jnp.asarray(x[0, :1]), train=False)["params"]
    stacked_init = jax.tree.map(lambda p: np.broadcast_to(np.asarray(p), (S,) + p.shape), ckpt)
    stacked = SubjectParallelTrainer(model, cfg).fit_stacked(
        (x, y, te_x, te_y), seeds=[0, 1], init_params=stacked_init
    )
    for i in range(S):
        serial = JitTrainer(model, cfg).fit(
            (x[i], y[i], te_x[i], te_y[i]), seed=i, init_params=ckpt
        )
        np.testing.assert_allclose(
            stacked.outputs_test[i], serial.outputs_test, rtol=2e-4, atol=2e-4
        )


def test_stacked_vision_uint8_matches_serial(rng):
    """Stacked ViT on raw uint8 frames == serial fits (the vision sweep
    path, reference `Transformer_Vision.py:82-83` DataParallel analogue)."""
    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.vit import ViT

    S = 2
    tr_x = rng.integers(0, 256, size=(S, 12, 16, 16, 3)).astype(np.uint8)
    te_x = rng.integers(0, 256, size=(S, 8, 16, 16, 3)).astype(np.uint8)
    tr_y = np.stack([np.arange(12) % 5 for _ in range(S)]).astype(np.int32)
    te_y = np.stack([np.arange(8) % 5 for _ in range(S)]).astype(np.int32)
    model = ViT(num_labels=5, hidden=16, layers=1, heads=2, mlp_dim=32,
                patch_size=8, image_size=16, preprocess_uint8=True)
    cfg = FinetuneConfig(
        model="vit", batch_size=8, optimizer="adamw", weight_decay=0.01,
        phases=(PhaseConfig(epochs=1, lr=5e-4, freeze=True),
                PhaseConfig(epochs=1, lr=5e-6, freeze=False)),
    )
    stacked = SubjectParallelTrainer(model, cfg).fit_stacked(
        (tr_x, tr_y, te_x, te_y), seeds=[3, 4]
    )
    for i, seed in enumerate([3, 4]):
        serial = JitTrainer(model, cfg).fit(
            (tr_x[i], tr_y[i], te_x[i], te_y[i]), seed=seed
        )
        np.testing.assert_allclose(
            stacked.outputs_test[i], serial.outputs_test, rtol=2e-4, atol=2e-4
        )


def test_stacked_keep_epoch_logits(rng):
    """cfg.keep_epoch_logits survives the subject-parallel path (the
    reference's per-epoch ActivationSaver dumps, `CNN_audio.py:48-72`)."""
    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet

    S, n, nt = 2, 16, 8
    x = rng.normal(size=(S, n, 4, 32)).astype(np.float32)
    y = rng.integers(0, 5, (S, n)).astype(np.int32)
    te_x = rng.normal(size=(S, nt, 4, 32)).astype(np.float32)
    te_y = rng.integers(0, 5, (S, nt)).astype(np.int32)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=3, lr=1e-3, freeze=False),),
        keep_epoch_logits=True,
    )
    model = EEGNet(chans=4, samples=32, kern_length=8, dropout_rate=0.0)
    res = SubjectParallelTrainer(model, cfg, epochs_per_call=2).fit_stacked(
        (x, y, te_x, te_y), seeds=[0, 1]
    )
    assert res.epoch_logits is not None
    assert res.epoch_logits.shape == (S, 3, nt, 5)
    # final epoch's logits == the returned outputs_test
    np.testing.assert_allclose(
        res.epoch_logits[:, -1], res.outputs_test, rtol=1e-5, atol=1e-6
    )


def test_fit_stacked_partial_pretrained_overlay():
    """A backbone-only (partial) pretrained tree broadcast over the subject
    axis overlays the stacked random init — the stacked analogue of
    JitTrainer.fit's overlay path (train/loop.overlay_params)."""
    import jax
    import numpy as np

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.eegnet import EEGNet
    from eav_tpu.parallel.subject import SubjectParallelTrainer

    rng = np.random.default_rng(0)
    S, n_tr, n_te, C, T = 2, 8, 4, 4, 64
    data = (
        rng.normal(size=(S, n_tr, C, T)).astype(np.float32),
        rng.integers(0, 5, (S, n_tr)).astype(np.int32),
        rng.normal(size=(S, n_te, C, T)).astype(np.float32),
        rng.integers(0, 5, (S, n_te)).astype(np.int32),
    )
    model = EEGNet(chans=C, samples=T, kern_length=8, f1=2, d=2, f2=4)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=4, optimizer="adam",
        phases=(PhaseConfig(epochs=1, lr=0.0, freeze=False),),  # lr=0: params frozen in place
    )
    # partial init: only the head, broadcast over subjects
    head_kernel = np.full((960 // 960 * model.f2 * (T // 4 // 8), 5), 0.125, np.float32)
    head = {"head": {"kernel": np.broadcast_to(head_kernel, (S,) + head_kernel.shape)}}
    sp = SubjectParallelTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules)
    res = sp.fit_stacked(data, seeds=[0, 1], init_params=head)
    got = np.asarray(res.params["head"]["kernel"])
    # lr=0 => the head kernel must still be the overlaid value (modulo the
    # maxnorm projection applied at init, which this value is within)
    assert np.allclose(got, 0.125), got.ravel()[:4]
    # and the temporal conv kernels differ across subjects (random init kept)
    k = np.asarray(res.params["conv_temporal"]["kernel"])
    assert not np.allclose(k[0], k[1])


def test_tp_sharded_train_step_matches_unsharded(rng):
    """Megatron-style TP shardings (parallel/tp.py) must be a pure layout
    choice: loss AND per-leaf gradients of a tiny AST with params sharded
    over a 4-way model axis match the unsharded step to float tolerance
    (XLA inserts the ICI collectives; math unchanged). Gradients — not
    post-Adam params — are compared: Adam's step-1 normalization g/|g|
    amplifies reduction-order noise on near-zero grads into +-lr sign flips,
    which says nothing about the sharding's correctness."""
    import jax
    import jax.numpy as jnp

    from eav_tpu.models.ast import ast_tiny
    from eav_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
    from eav_tpu.parallel.tp import shard_params_tp
    from eav_tpu.train.loop import cross_entropy

    model = ast_tiny(heads=4, hidden=64, mlp_dim=128)
    x = jnp.asarray(rng.normal(size=(4, 128, 128)).astype("float32"))
    y = jnp.asarray(rng.integers(0, 5, 4).astype("int32"))
    params = model.init(jax.random.PRNGKey(0), x[:1], train=False)["params"]

    @jax.jit
    def loss_and_grads(params):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=False)
            return cross_entropy(logits, y, jnp.ones_like(y, jnp.float32))

        return jax.value_and_grad(loss_fn)(params)

    loss_ref, grads_ref = loss_and_grads(params)

    mesh = make_mesh(((DATA_AXIS, 2), (MODEL_AXIS, 4)))
    params_tp = shard_params_tp(params, mesh)
    loss_tp, grads_tp = loss_and_grads(params_tp)

    assert np.allclose(float(loss_ref), float(loss_tp), rtol=1e-5)
    # normalize by the GLOBAL grad scale: leaves whose true gradient is
    # mathematically zero (attn key bias — softmax cancels a per-row
    # constant) carry only ~1e-8 float noise on both sides
    scale = max(
        float(np.max(np.abs(np.asarray(g)))) for g in jax.tree.leaves(grads_ref)
    )
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_tp)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)
