"""Swin3D: sparse window attention with contextual relative signal encoding.

TPU-native counterpart of `pointcept/models/swin3d/` (~1.3k LoC over
MinkowskiEngine + the Swin3D CUDA `SelfAttnAIOFunction`): a UNet whose
encoder stages run window multi-head attention where the attention logits
and values are modulated by cRSE — learned per-head lookup tables indexed
by the *quantized relative* position / color / normal between every
query-key pair (`swin3d_layers.py:384-577`).

TPU redesign (static shapes, shared pyramid):

- windows = fixed-size serialized patches (contiguous runs of the
  space-filling order), like this repo's PTv3/Stratified; the reference's
  shifted windows (coordinate shift by half a window,
  `BasicLayer.get_shifted_sp`, `:826-840`) become alternating curve orders
  per block — same neighborhood-decorrelation role, no re-hashing;
- cRSE keeps the reference's exact table math (`WindowAttention.forward`):
  ``logit(i,j) += q_i . Tq[axis, idx(d)] + k_j . Tk[axis, idx(d)]`` and
  ``out_i += sum_j a_ij Tv[axis, idx(d)]`` with per-axis separate tables
  (PosEmb.SEPARATE), where ``d`` is the pairwise signal delta quantized at
  ``quant_size`` (positions, in voxel units incl. the sub-voxel fraction)
  or ``2*quant_size`` (colors/normals in [-1, 1]); deltas beyond the table
  clamp (the reference guarantees in-window ranges; serialized patches can
  straddle, so clamping = the RPE convention);
- the q/k logit terms contract the head dim against the table *first*
  (``[P,K,H,L]`` then a take-along-axis) so no ``[P,K,K,H,D]`` tensor is
  materialized on the logit path; the value path gathers table rows
  per-pair (the reference's CUDA kernel streams this — a Pallas port is
  the natural next optimization);
- Minkowski stem conv -> submanifold k3 conv; GridKNNDownsample -> pyramid
  max-pool + linear (`swin3d_layers.py:274-318`); "linear" Upsample ->
  broadcast unpool + linear + skip (`:320-383`); classifier head kept
  (`swin3d_v1m1_base.py:108-113`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.builder import MODELS
from cdsegnet_tpu.models.modules import (
    LayerNorm,
    MaskedBatchNorm,
    Mlp,
    SubMConv,
    drop_path,
)
from cdsegnet_tpu.models.structure import PointBatch


class SwinWindowAttention(nn.Module):
    """Patch attention with cRSE tables (reference `WindowAttention`,
    `swin3d_layers.py:384-577`)."""

    dim: int
    num_heads: int
    patch_size: int
    window_size: int
    quant_size: int
    order_index: int = 0
    cRSE: str = "XYZ_RGB"
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def _signal_groups(self):
        """(name, slice into the signal array, table length L, delta scale).
        Table index range is [0, 2L) for deltas in [-L, L) scaled units."""
        groups = []
        col = 0
        if "XYZ" in self.cRSE:
            L = self.window_size * self.quant_size
            groups.append(("xyz", (col, col + 3), L, float(self.quant_size)))
            col += 3
        if "RGB" in self.cRSE:
            # color in [-1,1], color_windowsize=2, quant = 2*quant_size
            L = 2 * (2 * self.quant_size)
            groups.append(("rgb", (col, col + 3), L, float(2 * self.quant_size)))
            col += 3
        if "NORM" in self.cRSE:
            L = 2 * (2 * self.quant_size)
            groups.append(("norm", (col, col + 3), L, float(2 * self.quant_size)))
            col += 3
        return groups, col

    @nn.compact
    def __call__(self, feat, level: pyr.Level, signals, deterministic=True):
        c, h, k = self.dim, self.num_heads, self.patch_size
        d = c // h
        pp = level.point
        n = pp.num_points
        p = n // k
        o = self.order_index % pp.orders.shape[0]
        order = pp.orders[o]

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(jnp.take(feat, order, axis=0))
        qkv = qkv.reshape(p, k, 3, h, d)
        q, kk, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = d ** -0.5
        logits = jnp.einsum(
            "pihd,pjhd->pijh", q.astype(jnp.float32), kk.astype(jnp.float32)
        ) * scale

        bs = jnp.take(pp.batch, order).reshape(p, k)
        ms = jnp.take(pp.mask, order).reshape(p, k)
        groups, _ = self._signal_groups()
        sig = jnp.take(signals, order, axis=0).reshape(p, k, -1)

        attn_extra = jnp.zeros((p, k, k, h), jnp.float32)
        value_terms = []  # (tv, idx) per signal group, applied post-softmax
        for name, (c0, c1), L, sc in groups:
            s = sig[:, :, c0:c1].astype(jnp.float32) * sc  # [P,K,3]
            delta = s[:, :, None, :] - s[:, None, :, :]  # [P,K,K,3]
            idx = jnp.clip(
                jnp.floor(delta).astype(jnp.int32) + L, 0, 2 * L - 1
            )
            tq = self.param(f"query_{name}_table",
                            nn.initializers.truncated_normal(0.02),
                            (3, 2 * L, h, d), jnp.float32)
            tk = self.param(f"key_{name}_table",
                            nn.initializers.truncated_normal(0.02),
                            (3, 2 * L, h, d), jnp.float32)
            tv = self.param(f"value_{name}_table",
                            nn.initializers.truncated_normal(0.02),
                            (3, 2 * L, h, d), jnp.float32)
            value_terms.append((tv, idx))
            for a in range(3):
                ia = idx[..., a]  # [P,K,K]
                # logit terms: contract d first -> [P,K,H,L], gather on L;
                # no [P,K,K,H,D] tensor on the logit path
                qdot = jnp.einsum(
                    "pihd,lhd->pihl", q.astype(jnp.float32) * scale, tq[a]
                )
                kdot = jnp.einsum(
                    "pjhd,lhd->pjhl", kk.astype(jnp.float32), tk[a]
                )
                # qdot[p,i,h,ia[p,i,j]]: vmap the L-gather over heads
                attn_extra = attn_extra + jnp.take_along_axis(
                    qdot[:, :, None, :, :],  # [P,K,1,H,L]
                    ia[:, :, :, None, None], axis=4,
                )[..., 0]
                attn_extra = attn_extra + jnp.take_along_axis(
                    kdot[:, None, :, :, :],  # [P,1,K,H,L]
                    ia[:, :, :, None, None], axis=4,
                )[..., 0]

        logits = logits + attn_extra
        valid = (
            ms[:, :, None] & ms[:, None, :]
            & (bs[:, :, None] == bs[:, None, :])
        )
        logits = jnp.where(valid[..., None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=2)
        out = jnp.einsum("pijh,pjhd->pihd", attn, v.astype(jnp.float32))
        # value-table contribution: out_i += sum_j a_ij * Tv[idx(i,j)]
        for tv, idx in value_terms:
            for a in range(3):
                out = out + jnp.einsum(
                    "pijh,pijhd->pihd", attn, tv[a][idx[..., a]]
                )
        out = out.reshape(p * k, c)
        out = jnp.where(
            jnp.take(pp.mask, order)[:, None], out, 0.0
        )
        # scatter back to canonical slot order
        inv = pp.inverses[o]
        out = jnp.take(out, inv, axis=0)
        return nn.Dense(c, dtype=self.dtype, name="proj")(
            out.astype(self.dtype)
        )


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    patch_size: int
    window_size: int
    quant_size: int
    order_index: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    cRSE: str = "XYZ_RGB"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level, signals, deterministic=True):
        f = LayerNorm(self.dim, dtype=self.dtype, name="norm1")(feat)
        f = SwinWindowAttention(
            self.dim, self.num_heads, self.patch_size, self.window_size,
            self.quant_size, self.order_index, self.cRSE, dtype=self.dtype,
            name="attn",
        )(f, level, signals, deterministic)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0.0) else None
        )
        feat = feat + drop_path(f, self.drop_path_rate, rng, deterministic)
        g = LayerNorm(self.dim, dtype=self.dtype, name="norm2")(feat)
        g = Mlp(hidden=int(self.dim * self.mlp_ratio), out=self.dim,
                dtype=self.dtype, name="mlp")(g, deterministic)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0.0) else None
        )
        return feat + drop_path(g, self.drop_path_rate, rng, deterministic)


@MODELS.register_module("Swin3D-v1m1")
class Swin3DUNet(nn.Module):
    """Swin3D UNet segmentor (reference `swin3d_v1m1_base.py:13-190`)."""

    in_channels: int = 9
    num_classes: int = 20
    base_grid_size: float = 0.02
    depths: Tuple[int, ...] = (2, 4, 9, 4, 4)
    channels: Tuple[int, ...] = (48, 96, 192, 384, 384)
    num_heads: Tuple[int, ...] = (6, 6, 12, 24, 24)
    window_sizes: Tuple[int, ...] = (5, 7, 7, 7, 7)
    quant_size: int = 4
    drop_path_rate: float = 0.2
    stem_transformer: bool = True
    # power-of-two so the framework's default bucket sizes (multiples of
    # 1024) divide evenly; the reference's W=5..7 cubic windows average a
    # similar occupancy
    patch_size: int = 64
    capacity_div: Tuple[int, ...] = (1, 2, 4, 16, 64)
    cRSE: str = "XYZ_RGB"
    # feat column slices carrying the cRSE signals (ScanNet layout:
    # color[0:3] then normal[3:6]; both expected in [-1, 1])
    color_slice: Tuple[int, int] = (0, 3)
    normal_slice: Tuple[int, int] = (3, 6)
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    def _signals(self, lvl_point: PointBatch, level_idx: int,
                 feat_sig) -> jnp.ndarray:
        """Per-level cRSE signal array: voxel-unit position (incl. the
        sub-voxel fraction, reference `local_xyz`), then color/normal."""
        cols = []
        if "XYZ" in self.cRSE:
            vsize = self.base_grid_size * (2 ** level_idx)
            cols.append(lvl_point.coord.astype(jnp.float32) / vsize)
        if "RGB" in self.cRSE:
            cols.append(feat_sig[:, self.color_slice[0]:self.color_slice[1]])
        if "NORM" in self.cRSE:
            cols.append(feat_sig[:, self.normal_slice[0]:self.normal_slice[1]])
        return jnp.concatenate(cols, axis=-1).astype(jnp.float32)

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        nl = len(self.depths)
        n0 = point.num_points
        caps = [
            pyr.round_up(max(n0 // dv, self.patch_size), self.patch_size)
            for dv in self.capacity_div[1:nl]
        ]
        levels, _ = pyr.build_pyramid(
            point, strides=(2,) * (nl - 1), capacities=caps,
            orders=("z", "z-trans"), shuffle_key=None, stem_kernel=3,
        )
        assert n0 % self.patch_size == 0, (
            "bucket size must be a multiple of patch_size"
        )
        # stem (MinkConvBNRelu k3; the stem_transformer=False extra ResBlock
        # collapses onto the same submanifold machinery)
        f = SubMConv(self.in_channels, self.channels[0], 27, use_bias=False,
                     dtype=self.dtype, name="stem_conv")(
            point.feat, levels[0].point.neighbor_idx
        )
        f = MaskedBatchNorm(self.channels[0], dtype=self.dtype,
                            name="stem_bn")(
            f, point.mask, use_running_average=not train
        )
        f = nn.relu(f)
        if not self.stem_transformer:
            from cdsegnet_tpu.models.spunet import BasicBlock

            f = BasicBlock(self.channels[0], dtype=self.dtype,
                           name="stem_res")(
                f, levels[0].point.neighbor_idx, point.mask, train
            )

        # per-level cRSE signals: mean-pool the raw signal columns
        feat_sig = point.feat.astype(jnp.float32)
        sig_levels = [feat_sig]
        for li in range(1, nl):
            sig_levels.append(
                pyr.pool_features(sig_levels[-1], levels[li], reduce="mean")
            )

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        skips = []
        for li in range(nl):
            lvl = levels[li]
            sigs = self._signals(lvl.point, li, sig_levels[li])
            base = sum(self.depths[:li])
            for b in range(self.depths[li]):
                f = SwinBlock(
                    self.channels[li], self.num_heads[li], self.patch_size,
                    self.window_sizes[li], self.quant_size,
                    order_index=b % 2, mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[base + b]), cRSE=self.cRSE,
                    dtype=self.dtype, name=f"layer{li}_block{b}",
                )(f, lvl, sigs, deterministic=not train)
            skips.append(f)
            if li < nl - 1:
                nxt = levels[li + 1]
                f = pyr.pool_features(f, nxt, reduce="max")
                f = nn.Dense(self.channels[li + 1], dtype=self.dtype,
                             name=f"down{li}")(f)
                f = MaskedBatchNorm(self.channels[li + 1], dtype=self.dtype,
                                    name=f"down{li}_bn")(
                    f, nxt.point.mask, use_running_average=not train
                )
                f = nn.relu(f)

        # decoder ("linear" Upsample: unpool + proj + skip)
        f = skips[-1]
        for li in range(nl - 2, -1, -1):
            f = nn.Dense(self.channels[li], dtype=self.dtype,
                         name=f"up{li}")(f)
            f = pyr.unpool_features(f, levels[li + 1])
            f = f + skips[li]

        f = nn.Dense(self.channels[0], dtype=jnp.float32,
                     name="cls_fc1")(f.astype(jnp.float32))
        f = MaskedBatchNorm(self.channels[0], name="cls_bn")(
            f, point.mask, use_running_average=not train
        )
        f = nn.relu(f)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          name="cls_fc2")(f)
        return point.replace(feat=logits)
