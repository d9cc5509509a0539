"""PointTransformer alternate module set: shapes + jit + grads."""

import numpy as np
import jax
import jax.numpy as jnp

from hotrack_tpu.nn import (
    PointTransformerDownBlock,
    PointTransformerResBlock,
    PointTransformerUpBlock,
)


def test_point_transformer_stack():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 64, 3) * 0.05, jnp.float32)

    down = PointTransformerDownBlock(npoint=32, nsample=8, out_channel=32)
    v_down = down.init(jax.random.PRNGKey(0), xyz)
    (xyz2, feats2), _ = down.apply(v_down, xyz, mutable=["batch_stats"])
    assert xyz2.shape == (2, 32, 3) and feats2.shape == (2, 32, 32)

    res = PointTransformerResBlock(dim=32, num_neighbors=8)
    v_res = res.init(jax.random.PRNGKey(1), xyz2, feats2)
    out = res.apply(v_res, xyz2, feats2)
    assert out.shape == (2, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))

    feats1 = jnp.asarray(rng.randn(2, 64, 32), jnp.float32)
    up = PointTransformerUpBlock(nsample=8, high_channel=32)
    v_up = up.init(jax.random.PRNGKey(2), xyz2, xyz, feats2, feats1)
    out_up, _ = up.apply(v_up, xyz2, xyz, feats2, feats1,
                         mutable=["batch_stats"])
    assert out_up.shape == (2, 64, 32)

    def loss(params):
        o = res.apply({"params": params,
                       "batch_stats": v_res.get("batch_stats", {})},
                      xyz2, feats2)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(v_res["params"])
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))
