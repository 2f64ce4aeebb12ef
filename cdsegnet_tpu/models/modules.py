"""Flax building blocks: masked norm layers, MLP, DropPath, SubMConv module.

Norm semantics follow the reference: BatchNorm1d(eps=1e-3, momentum=0.01)
after embeddings/poolings/unpoolings and LayerNorm inside transformer blocks
(`point_transformer_v3m1_base.py:1434-1445`). Both are masked so padding
slots never contaminate statistics.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.ops.subm_conv import subm_conv_apply


class PDMaskedBatchNorm(nn.Module):
    """Prompt-Driven masked BatchNorm (reference ``PDBatchNorm``,
    `point_transformer_v2m3_pdnorm.py:27-78` / `spconv_unet_v1m3_pdnorm.py`).

    Per-condition (dataset) BN parameters and running statistics, stored as
    stacked ``[num_conditions, C]`` arrays and selected by a *static* Python
    condition index — one jit specialization per dataset, which matches the
    one-dataset-per-batch contract of multi-dataset training (the reference's
    ``decouple=True``; ``num_conditions=1`` is its ``decouple=False``).
    ``adaptive=True`` adds the FiLM modulation from the data-driven context
    vector (SiLU + Dense -> shift/scale).
    """

    features: int
    num_conditions: int = 1
    adaptive: bool = False
    affine: bool = True
    eps: float = 1e-3
    momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False,
                 condition: int = 0, context=None):
        k, c = self.num_conditions, self.features
        assert 0 <= condition < k, f"condition {condition} out of range {k}"
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((k, c), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((k, c), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value[condition], ra_var.value[condition]
        else:
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=0) / cnt
            var = jnp.sum(jnp.square(xf - mean) * m, axis=0) / cnt
            if not self.is_initializing():
                # only the active condition's running stats advance
                ra_mean.value = ra_mean.value.at[condition].set(
                    (1 - self.momentum) * ra_mean.value[condition]
                    + self.momentum * mean
                )
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = ra_var.value.at[condition].set(
                    (1 - self.momentum) * ra_var.value[condition]
                    + self.momentum * unbiased
                )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (k, c), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (k, c), jnp.float32
            )
            y = y * scale[condition] + bias[condition]
        if self.adaptive:
            assert context is not None, "adaptive PDNorm needs a context vector"
            mod = nn.Dense(2 * c, dtype=jnp.float32, name="modulation")(
                nn.silu(context.astype(jnp.float32))
            )
            shift, scale2 = jnp.split(mod, 2, axis=-1)
            y = y * (1.0 + scale2) + shift
        return y.astype(self.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid points only, with running statistics.

    Matches torch ``BatchNorm1d(eps=1e-3, momentum=0.01)`` semantics:
    ``running = (1 - momentum) * running + momentum * batch_stat``.
    """

    features: int
    eps: float = 1e-3
    momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=0) / cnt
            var = jnp.sum(jnp.square(xf - mean) * m, axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                # torch tracks the unbiased batch variance in running stats
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer FFN (reference `MLP`, fc1 -> GELU -> fc2)."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def drop_path(
    x: jnp.ndarray,
    rate,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """Per-point stochastic depth (timm-style, batch dim = points).

    ``rate`` may be a traced scalar (the scanned block stack feeds per-depth
    rates as data); a static 0.0 short-circuits."""
    if deterministic or rng is None:
        return x
    if isinstance(rate, (int, float)) and float(rate) == 0.0:
        return x
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1))
    return jnp.where(mask, x / keep.astype(x.dtype), 0.0).astype(x.dtype)


class SubMConv(nn.Module):
    """Parameterized submanifold conv over a precomputed neighbor table."""

    in_channels: int
    out_channels: int
    kernel_volume: int  # 27 for k3, 125 for k5
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # recompute the neighbor gather in backward (False when an outer
    # nn.remat already rematerializes the enclosing block)
    remat_gather: bool = True
    # zero-pad narrow channels to this row width before the neighbor gather
    # (exact; gathers are row-latency bound — see ops.subm_conv). 0 = off.
    pad_gather_to: int = 0

    @nn.compact
    def __call__(self, feat, neighbor_idx, blocked_geom=None,
                 no_overflow=None, stem_mode="gather"):
        """``blocked_geom``/``no_overflow``/``stem_mode``: optional k125
        parity-blocked formulation (see `ops.subm_conv.
        blocked_subm_conv_apply`); params are identical across modes, so
        checkpoints load into any."""
        fan_in = self.in_channels * self.kernel_volume
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.kernel_volume, self.in_channels, self.out_channels),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if self.use_bias
            else None
        )
        del fan_in
        f16 = feat.astype(self.dtype)
        mode = stem_mode if (
            blocked_geom is not None and self.kernel_volume in (27, 125)
        ) else "gather"

        def gather_conv(f):
            return subm_conv_apply(
                f, neighbor_idx, weight, bias,
                remat_gather=self.remat_gather, pad_to=self.pad_gather_to,
            )

        if mode == "gather":
            return gather_conv(f16)
        from cdsegnet_tpu.ops.subm_conv import (
            blocked_k3_conv_apply,
            blocked_subm_conv_apply,
        )

        grid_coord, pmask, parent_inverse, child_nbr = blocked_geom

        def blocked(f):
            if self.kernel_volume == 27:
                return blocked_k3_conv_apply(
                    f, weight.astype(f.dtype), grid_coord=grid_coord,
                    mask=pmask, parent_inverse=parent_inverse,
                    child_nbr=child_nbr, bias=bias,
                    remat_gather=self.remat_gather,
                )
            out = blocked_subm_conv_apply(
                f, weight.astype(f.dtype), grid_coord=grid_coord, mask=pmask,
                parent_inverse=parent_inverse, child_nbr=child_nbr,
                remat_gather=self.remat_gather,
            )
            return out + bias.astype(out.dtype) if bias is not None else out

        if mode == "blocked":
            return blocked(f16)
        assert mode == "cond", mode
        return jax.lax.cond(no_overflow, blocked, gather_conv, f16)


def swish(x):
    return x * jax.nn.sigmoid(x)
