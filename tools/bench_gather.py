"""Microbenchmark: TPU gather cost vs row width / index order / formulation.

The xCPE conv's (N*27) gather of C-wide bf16 rows measured 20 ms at
(104448, C=32) — ~45x above the HBM roofline. This tool measures the
levers: row width, sorted vs random indices, 1:1 permutations vs
expansion gathers, one-hot-matmul contraction, and blocked (8C-row)
variants, to pick the fastest exact formulation.

Usage: python tools/bench_gather.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N = 104448
K = 27


def timed(label, fn, *args, iters=20):
    out = jax.jit(fn)(*args)
    jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready()
    f = jax.jit(fn)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    for c in (32, 64, 128):
        feat = jnp.asarray(rng.randn(N + 1, c), jnp.bfloat16)
        idx = jnp.asarray(rng.randint(0, N, size=(N, K)), jnp.int32)
        w = jnp.asarray(rng.randn(K * c, c) * 0.02, jnp.bfloat16)

        def conv_take(feat, idx, w):
            g = jnp.take(feat, idx.reshape(-1), axis=0,
                         mode="fill", fill_value=0)
            return jnp.dot(g.reshape(N, K * c), w,
                           preferred_element_type=jnp.float32)

        timed(f"take (N*27) rows C={c} + matmul", conv_take, feat, idx, w)

        # sorted-index variant: pre-sorted flat indices + unsort of result
        flat = np.asarray(idx).reshape(-1)
        order = np.argsort(flat, kind="stable").astype(np.int32)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order), dtype=np.int32)
        sidx = jnp.asarray(flat[order])
        jinv = jnp.asarray(inv)

        def conv_sorted(feat, sidx, jinv, w):
            g = jax.lax.gather(
                feat, sidx[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                (1, c), indices_are_sorted=True, mode="fill",
            )
            g = jnp.take(g, jinv, axis=0)
            return jnp.dot(g.reshape(N, K * c), w,
                           preferred_element_type=jnp.float32)

        timed(f"sorted gather + unsort C={c} + matmul",
              conv_sorted, feat, sidx, jinv, w)

        # 1:1 permutation gather (the blocked-layout building block)
        perm = jnp.asarray(rng.permutation(N).astype(np.int32))
        timed(f"1:1 permutation gather (N, C={c})",
              lambda f, p: jnp.take(f, p, axis=0), feat[:N], perm)

        # blocked: (N, 8) gather of 8C-wide rows + 8 masked matmuls
        m = N // 2
        f8 = jnp.asarray(rng.randn(m + 1, 8 * c), jnp.bfloat16)
        bidx = jnp.asarray(rng.randint(0, m, size=(N, 8)), jnp.int32)
        pi = jnp.asarray(rng.randint(0, 8, size=(N,)), jnp.int32)
        w8 = jnp.asarray(rng.randn(8, 8 * 8 * c, c) * 0.02, jnp.bfloat16)

        def conv_blocked(f8, bidx, pi, w8):
            g = jnp.take(f8, bidx.reshape(-1), axis=0,
                         mode="fill", fill_value=0).reshape(N, 64 * c)
            out = jnp.zeros((N, c), jnp.float32)
            for gg in range(8):
                out = jnp.where(
                    (pi == gg)[:, None],
                    jnp.dot(g, w8[gg], preferred_element_type=jnp.float32),
                    out,
                )
            return out

        timed(f"blocked (N,8)x{8*c}ch + 8 masked matmuls",
              conv_blocked, f8, bidx, pi, w8)

        # blocked with ONE matmul (weights pre-selected per point is not
        # possible; instead select gathered rows into parity-canonical
        # order via 8 masked selects, then one matmul)
        def conv_blocked_canon(f8, bidx, pi, w8):
            g = jnp.take(f8, bidx.reshape(-1), axis=0,
                         mode="fill", fill_value=0).reshape(N, 64 * c)
            sel = jnp.zeros_like(g)
            for gg in range(8):
                roll = jnp.roll(g, gg * c, axis=1)  # stand-in permutation
                sel = jnp.where((pi == gg)[:, None], roll, sel)
            return jnp.dot(sel, w8[0], preferred_element_type=jnp.float32)

        timed(f"blocked canon-select + 1 matmul C={c}",
              conv_blocked_canon, f8, bidx, pi, w8)
    print("done")


if __name__ == "__main__":
    main()
