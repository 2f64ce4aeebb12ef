"""xCPE conv formulations on REAL neighbor tables (z-order locality).

Random-index microbenchmarks overstate gather cost ~100x (z-order sorted
tables are cache-friendly); this times candidate formulations at exact
flagship shapes on the real pyramid:

  plain    — take (N*27) C-rows + one matmul (current subm_conv_apply)
  padded   — zero-pad C<64 features to 64 channels before the gather
             (wider rows amortize per-row latency; exact: padded weight
             rows are zero)
  blocked  — parity-blocked: scatter feat into (M+1, 8C) block rows,
             gather each block's 27 child-neighbors ONCE (8C-wide rows),
             resolve all 8 parities with ONE (216C, 8C) matmul against a
             statically scattered weight, gather back per point. Exact
             when no pooling overflow (same precondition as the parity
             tables).

Usage: python tools/bench_xcpe_variants.py [num_points]
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

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")
PATCH = 1024


def timed(label, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return out


def blocked_weight(w, parity_of_d=3):
    """(27, C, C) -> (216*C, 8*C): W''[(o, s), :, g, :] = W[d] where
    d = 2*e(o) + s - g per axis (k3 only; out-of-range slots stay zero)."""
    k, cin, cout = w.shape
    offs = [(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1)
            for z in (-1, 0, 1)]
    idx3 = {o: i for i, o in enumerate(offs)}
    rows, gs, ds = [], [], []
    for oi, e in enumerate(offs):
        for s in range(8):
            sb = ((s >> 2) & 1, (s >> 1) & 1, s & 1)
            for g in range(8):
                gb = ((g >> 2) & 1, (g >> 1) & 1, g & 1)
                d = tuple(2 * e[a] + sb[a] - gb[a] for a in range(3))
                if d in idx3:
                    rows.append(oi * 8 + s)
                    gs.append(g)
                    ds.append(idx3[d])
    big = jnp.zeros((216, cin, 8, cout), w.dtype)
    big = big.at[jnp.asarray(rows), :, jnp.asarray(gs), :].set(
        w[jnp.asarray(ds)]
    )
    return big.reshape(216 * cin, 8 * cout)


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
    drops = [int(np.asarray(l.dropped)) for l in levels[1:]]
    print("drops:", drops)
    rng = np.random.RandomState(0)

    for lvl, c in ((0, 32), (0, 64), (1, 64)):
        pt = levels[lvl].point
        child = levels[lvl + 1]
        m = child.point.num_points
        nn_ = pt.num_points
        feat = jnp.asarray(rng.randn(nn_, c), jnp.bfloat16)
        nbr = pt.neighbor_idx
        w = jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.bfloat16)

        def plain(feat, nbr, w):
            g = jnp.take(feat, nbr.reshape(-1), axis=0, mode="fill",
                         fill_value=0)
            return jnp.dot(g.reshape(nn_, 27 * c), w.reshape(27 * c, c),
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        out_p = timed(f"L{lvl} C{c} plain", plain, feat, nbr, w)

        if c < 64:
            wp = jnp.zeros((27, 64, c), jnp.bfloat16).at[:, :c, :].set(w)

            def padded(feat, nbr, wp):
                fp = jnp.zeros((nn_, 64), jnp.bfloat16).at[:, :c].set(feat)
                g = jnp.take(fp, nbr.reshape(-1), axis=0, mode="fill",
                             fill_value=0)
                return jnp.dot(g.reshape(nn_, 27 * 64),
                               wp.reshape(27 * 64, c),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

            out_pad = timed(f"L{lvl} C{c} padded->64", padded, feat, nbr, wp)
            err = float(jnp.abs(out_p.astype(jnp.float32)
                                - out_pad.astype(jnp.float32)).max())
            print(f"  padded err: {err:.2e}")

        # blocked one-matmul
        pi = (
            ((pt.grid_coord[:, 0] & 1) << 2)
            | ((pt.grid_coord[:, 1] & 1) << 1)
            | (pt.grid_coord[:, 2] & 1)
        )
        own = child.parent_inverse
        bpos = jnp.where(pt.mask, own * 8 + pi, 8 * m)
        cn = child.point.neighbor_idx  # (m, 27), values in [0..m]
        wb = blocked_weight(w.astype(jnp.float32)).astype(jnp.bfloat16)

        def blocked(feat, bpos, cn, wb):
            f8 = jnp.zeros((m * 8 + 8, c), jnp.bfloat16).at[bpos].set(
                feat, mode="drop"
            ).reshape(m + 1, 8 * c)
            f8 = f8.at[m].set(0.0)  # sentinel row stays zero
            g = jnp.take(f8, cn.reshape(-1), axis=0, mode="fill",
                         fill_value=0).reshape(m, 27 * 8 * c)
            out8 = jnp.dot(g, wb, preferred_element_type=jnp.float32)
            out8 = out8.reshape(m * 8, c).astype(jnp.bfloat16)
            return jnp.take(out8, bpos, axis=0, mode="fill", fill_value=0)

        out_b = timed(f"L{lvl} C{c} blocked 1-matmul", blocked,
                      feat, bpos, cn, wb)
        valid = np.asarray(pt.mask)[:, None]
        err = float((np.abs(np.asarray(out_p, np.float32)
                            - np.asarray(out_b, np.float32)) * valid).max())
        print(f"  blocked err (valid rows): {err:.2e}")


if __name__ == "__main__":
    main()
