"""Flash attention kernel vs the einsum reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eav_tpu.ops.pallas.attention import _reference_attention, flash_attention


@pytest.mark.parametrize("t", [128, 197, 300])
def test_flash_matches_reference(rng, t):
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    ref = np.asarray(_reference_attention(q, k, v))
    out = np.asarray(flash_attention(q, k, v, True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flash_gradients_match(rng):
    b, t, h, d = 1, 130, 2, 16
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


def test_ast_with_flash_attention_matches_xla(rng):
    from eav_tpu.models.ast import ast_tiny

    x = rng.normal(size=(2, 128, 128)).astype(np.float32)
    m_xla = ast_tiny()
    m_flash = ast_tiny(attn_impl="flash")
    v = m_xla.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out_xla = np.asarray(m_xla.apply(v, jnp.asarray(x), train=False))
    out_flash = np.asarray(m_flash.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out_flash, out_xla, rtol=2e-4, atol=2e-4)


def test_flash_gradients_match_bf16_odd_length(rng):
    """Pallas backward kernels at a padded odd length in bf16 (the long-
    context configuration the microbench runs)."""
    b, t, h, d = 2, 300, 2, 32
    mk = lambda: jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, True).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v).astype(jnp.float32) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=0.08, atol=0.08,  # bf16 reference path is itself low-precision
        )


def test_attn_impl_auto_resolves_to_xla_on_cpu(rng):
    """attn_impl='auto' (the ast_finetune preset value) must resolve to the
    XLA path off-TPU — flash-in-interpret-mode would be pathologically slow
    in CPU runs — and stay logit-identical to the explicit XLA setting."""
    import jax.numpy as jnp

    from eav_tpu.models.ast import ast_tiny

    x = rng.normal(size=(2, 128, 128)).astype("float32")
    m_auto = ast_tiny(attn_impl="auto")
    m_xla = ast_tiny(attn_impl="xla")
    v = m_xla.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out_auto = np.asarray(m_auto.apply(v, jnp.asarray(x), train=False))
    out_xla = np.asarray(m_xla.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_array_equal(out_auto, out_xla)


def test_flash_under_vmap_matches_reference(rng):
    """The subject-parallel path vmaps the model (and thus the kernel) over
    a leading stack axis; Pallas lifts vmap into an extra grid dimension —
    values and grads must still match the einsum reference."""
    s, b, t, h, d = 3, 2, 96, 2, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(s, b, t, h, d)).astype("float32"))
        for _ in range(3)
    )

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v) ** 2).sum()

    vf = jax.vmap(jax.value_and_grad(loss_flash, argnums=(0, 1, 2)))
    vr = jax.vmap(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))
    (lf, gf), (lr, gr) = vf(q, k, v), vr(q, k, v)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), rtol=2e-5)
    for a, b2 in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), rtol=5e-4, atol=5e-5)


def test_flash_bh_layout_matches_reference(rng):
    """flash_attention_bh (head-major (B*H, T_pad, D) operands, the
    zero-transpose path) == the einsum reference, values and grads."""
    import jax
    import jax.numpy as jnp

    from eav_tpu.ops.pallas.attention import (
        _pick_blocks,
        _reference_attention,
        flash_attention_bh,
    )

    b, t, h, d = 2, 200, 3, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
        for _ in range(3)
    )
    _, _, t_pad = _pick_blocks(t)

    def bh(x):
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t_pad, d)

    def via_bh(q, k, v):
        o = flash_attention_bh(bh(q), bh(k), bh(v), t, True)
        return jnp.transpose(o.reshape(b, h, t_pad, d)[:, :, :t], (0, 2, 1, 3))

    out = via_bh(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    g1 = jax.grad(lambda *a: jnp.sum(via_bh(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(_reference_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)
