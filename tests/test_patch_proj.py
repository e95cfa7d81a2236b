"""PatchProj impl parity: 'slices' (TPU lowering, incl. the non-overlapping
reshape fast path) must match 'conv' bitwise-or-roundoff on values AND grads
for both patch geometries we ship — AST's overlapping 16x16-stride-10
(`models/ast.py`) and ViT's non-overlapping 16x16-stride-16 (`models/vit.py`,
reference `Transformer_Vision.py:28-30` patchify).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eav_tpu.models.transformer import PatchProj


@pytest.mark.parametrize(
    "hw,stride",
    [
        ((48, 36), (10, 10)),  # overlapping (AST geometry, shrunk)
        ((64, 64), (16, 16)),  # non-overlapping (ViT geometry: reshape path)
    ],
)
def test_patchproj_impls_match(rng, hw, stride):
    p = 16
    x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
    conv = PatchProj(8, p, stride, impl="conv")
    params = conv.init(jax.random.PRNGKey(0), x)["params"]
    ref = conv.apply({"params": params}, x)
    got = PatchProj(8, p, stride, impl="slices").apply({"params": params}, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss(impl):
        def f(pp):
            return jnp.sum(
                PatchProj(8, p, stride, impl=impl).apply({"params": pp}, x) ** 2
            )
        return jax.grad(f)(params)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4),
        loss("conv"), loss("slices"),
    )


def test_vit_bf16_stream_close_to_f32(rng):
    """ViT stream_dtype=bf16 mirrors AST's knob: rounding-level perturbation
    only, and the default stays the bitwise f32 path the HF parity pins."""
    from eav_tpu.models.vit import vit_tiny

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base = vit_tiny()
    params = base.init(jax.random.PRNGKey(0), x, train=False)["params"]
    ref = base.apply({"params": params}, x, train=False)
    bf = base.clone(stream_dtype=jnp.bfloat16).apply({"params": params}, x, train=False)
    assert ref.dtype == bf.dtype
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), rtol=0.1, atol=0.15)
    assert not np.array_equal(np.asarray(bf), np.asarray(ref))
