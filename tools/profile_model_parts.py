"""Per-component timing of the SSI model compute at exact flagship shapes.

Complements tools/profile_ssi.py (geometry stages): times a real `Block`
(and its constituents: xCPE conv, permutation gathers, attention, MLP) at
every (level size, channels, heads) the flagship instantiates, so the
~200 ms of "model compute" gets an itemized bill. Run on TPU:

    python tools/profile_model_parts.py [num_points]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import cdsegnet_tpu  # noqa: F401
from __graft_entry__ import _synthetic_point_batch
from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.ptv3 import Block
from cdsegnet_tpu.ops.subm_conv import subm_conv_apply

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")
PATCH = 1024


def _sync(out):
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    float(total)


def timed(label, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104448
    point = _synthetic_point_batch(n, 1, depth=10, seed=0)
    caps = [pyr.round_up(max(n // d, PATCH), PATCH) for d in (2, 4, 16, 64)]
    levels, stem = jax.jit(
        lambda p: pyr.build_pyramid(
            p, strides=(2, 2, 2, 2), capacities=caps, orders=ORDERS,
            shuffle_key=None,
        )
    )(point)
    _sync([l.point.neighbor_idx for l in levels])

    # (level, channels, heads, n_blocks_at_this_shape) across the flagship
    shapes = [
        (0, 32, 2, 4),    # n_enc0 x2 + c_enc0 x2
        (0, 64, 4, 4),    # n_dec0 x2 + c_dec0 x2
        (1, 64, 4, 4),    # n_enc1 x2 + n_dec1 x2
        (2, 128, 8, 4),   # n_enc2 x2 + n_dec2 x2
        (2, 64, 4, 4),    # c_enc1 x2 + c_dec1 x2
        (3, 256, 16, 8),  # n_enc3 x6 + n_dec3 x2
        (4, 512, 32, 6),  # n_enc4 x6
        (4, 128, 8, 2),   # c_enc2 x2
    ]
    total_blocks = 0.0
    rng = np.random.RandomState(0)
    for lvl, c, h, count in shapes:
        pt = levels[lvl].point
        m = pt.num_points
        feat = jnp.asarray(rng.randn(m, c).astype(np.float32), jnp.bfloat16)
        pt = pt.replace(feat=feat)
        blk = Block(channels=c, num_heads=h, patch_size=PATCH,
                    dtype=jnp.bfloat16)
        vars_ = jax.jit(lambda p: blk.init(jax.random.PRNGKey(0), p))(pt)
        blk_j = jax.jit(lambda v, p: blk.apply(v, p).feat)
        dt = timed(f"Block L{lvl} N={m} C={c} H={h} (x{count})",
                   blk_j, vars_, pt)
        total_blocks += dt * count

        # constituents at the same shape (once per distinct shape)
        w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.01,
                        jnp.bfloat16)
        timed(f"  xcpe gather+matmul (27, C{c})",
              jax.jit(lambda f, nb, w: subm_conv_apply(f, nb, w)),
              feat, pt.neighbor_idx, w)
        timed(f"  permute gather (N, C{c})",
              jax.jit(lambda f, o: jnp.take(f, o, axis=0)),
              feat, pt.orders[0])
        from cdsegnet_tpu.ops.pallas.flash_attention import attention_impl
        attn = attention_impl(None)
        d = c // h
        q = jnp.asarray(rng.randn(m, h, d).astype(np.float32), jnp.bfloat16)
        timed(f"  flash attention (N={m}, H{h}, D{d})",
              jax.jit(lambda q: attn(q, q, q, pt.batch, pt.mask,
                                     min(PATCH, m), d ** -0.5)), q)
        timed(f"  mlp 4x (N, C{c})",
              jax.jit(lambda f, w1, w2: jnp.dot(
                  jax.nn.gelu(jnp.dot(f, w1)), w2)),
              feat,
              jnp.asarray(rng.randn(c, 4 * c).astype(np.float32) * .01,
                          jnp.bfloat16),
              jnp.asarray(rng.randn(4 * c, c).astype(np.float32) * .01,
                          jnp.bfloat16))

    print(f"\nsum over all {sum(s[3] for s in shapes)} blocks: "
          f"{total_blocks:.1f} ms")


if __name__ == "__main__":
    main()
