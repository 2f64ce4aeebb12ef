"""OctFormer: octree attention with dilated z-order windows (TPU-native).

Counterpart of `pointcept/models/octformer/octformer_v1m1_base.py` (629 LoC
over ocnn). The octree machinery maps onto the shared geometry pyramid: an
octree level IS a z-order-serialized voxel level, octree windows are
contiguous runs of the sorted order, and dilation-D attention regroups the
sorted sequence as ``(G, K, D) -> transpose`` so every window takes each
D-th point (`octformer_v1m1_base.py:224-264`). Octree convs become
submanifold convs over the level's k3 neighbor table; OctreeDWConvBn is the
depthwise special case; the FPN decoder upsamples by parent broadcast.

Capacities are rounded to ``patch_size * dilation`` so the regrouping is a
static reshape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.builder import MODELS
from cdsegnet_tpu.models.modules import LayerNorm, MaskedBatchNorm, Mlp, SubMConv, drop_path
from cdsegnet_tpu.models.ptv3 import RPE
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.ops.attention import patch_attention


class OctreeAttention(nn.Module):
    """Window attention over the z-order with optional dilation + RPE
    (reference `:196-268`)."""

    dim: int
    patch_size: int
    num_heads: int
    dilation: int = 1
    qkv_bias: bool = True
    use_rpe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: pyr.Level, deterministic=True):
        c, h, k, dil = self.dim, self.num_heads, self.patch_size, self.dilation
        pp = level.point
        n = pp.num_points
        order = pp.orders[0]
        inverse = pp.inverses[0]

        def regroup(x):
            x = jnp.take(x, order, axis=0)
            if dil > 1:
                # (G, K, D, ...) -> (G, D, K, ...) -> window w = (g, d)
                x = x.reshape((n // (k * dil), k, dil) + x.shape[1:])
                x = jnp.swapaxes(x, 1, 2)
                x = x.reshape((n,) + x.shape[3:])
            return x

        def ungroup(x):
            if dil > 1:
                x = x.reshape((n // (k * dil), dil, k) + x.shape[1:])
                x = jnp.swapaxes(x, 1, 2)
                x = x.reshape((n,) + x.shape[3:])
            return jnp.take(x, inverse, axis=0)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(regroup(feat)).reshape(n, 3, h, c // h)
        q, kk, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        bs = regroup(pp.batch)
        ms = regroup(pp.mask)
        bias = None
        if self.use_rpe:
            gc = regroup(pp.grid_coord).reshape(n // k, k, 3)
            rel = gc[:, :, None, :] - gc[:, None, :, :]
            if dil > 1:
                rel = rel // dil
            bias = RPE(k, h, name="rpe")(rel)
        out = patch_attention(
            q, kk, v, bs, ms, k, (c // h) ** -0.5, bias=bias,
        )
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out.reshape(n, c))
        return ungroup(out)


class OctFormerBlock(nn.Module):
    """cpe(dwconv) + prenorm window attention + MLP (reference `:275-316`)."""

    dim: int
    num_heads: int
    patch_size: int
    dilation: int = 1
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    use_rpe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: pyr.Level, deterministic=True, train=False):
        c = self.dim
        pp = level.point
        # OctreeDWConvBn: depthwise k3 conv + BN (reference `:143-160`)
        w = self.param(
            "dw_weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (27, c), jnp.float32,
        )
        g = jnp.take(
            feat, pp.neighbor_idx.reshape(-1), axis=0, mode="fill", fill_value=0
        ).reshape(feat.shape[0], 27, c)
        dw = jnp.sum(g * w.astype(feat.dtype)[None], axis=1)
        dw = MaskedBatchNorm(c, dtype=self.dtype, name="dw_bn")(
            dw, pp.mask, use_running_average=not train
        )
        feat = feat + dw

        f = LayerNorm(c, dtype=self.dtype, name="norm1")(feat)
        f = OctreeAttention(
            dim=c, patch_size=self.patch_size, num_heads=self.num_heads,
            dilation=self.dilation, use_rpe=self.use_rpe, dtype=self.dtype,
            name="attention",
        )(f, level, deterministic)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0.0)
            else None
        )
        feat = feat + drop_path(f, self.drop_path_rate, rng, deterministic)
        f = LayerNorm(c, dtype=self.dtype, name="norm2")(feat)
        f = Mlp(hidden=int(c * self.mlp_ratio), out=c, dtype=self.dtype,
                name="mlp")(f, deterministic)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.drop_path_rate > 0.0)
            else None
        )
        return feat + drop_path(f, self.drop_path_rate, rng, deterministic)


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    """Reference `OctFormer` (`:508-629`): PatchEmbed (stem_down strided
    convs), 4 attention stages with alternating dilation, FPN decoder."""

    in_channels: int = 6
    num_classes: int = 20
    fpn_channels: int = 168
    channels: Tuple[int, ...] = (96, 192, 384, 384)
    num_blocks: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 24)
    patch_size: int = 32
    stem_down: int = 2
    head_up: int = 2
    dilation: int = 4
    drop_path: float = 0.5
    use_rpe: bool = True
    orders: Tuple[str, ...] = ("z",)
    capacity_div: Tuple[int, ...] = (1, 4, 8, 16, 32, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        n_stages = len(self.channels)
        n_levels = self.stem_down + n_stages - 1
        n0 = point.num_points
        unit = self.patch_size * self.dilation
        caps = [
            pyr.round_up(max(n0 // d, unit), unit)
            for d in self.capacity_div[1: n_levels + 1]
        ]
        levels, _ = pyr.build_pyramid(
            point, strides=(2,) * n_levels, capacities=caps, orders=self.orders,
            shuffle_key=None, stem_kernel=3,
        )

        # ---- PatchEmbed: conv k3 + strided down per stem level ----
        f = point.feat
        c_in = self.in_channels
        stem_cs = [
            int(self.channels[0] * 2 ** i)
            for i in range(-self.stem_down, 1)
        ]
        for i in range(self.stem_down):
            lvl = levels[i]
            f = SubMConv(c_in, stem_cs[i], 27, use_bias=False, dtype=self.dtype,
                         name=f"embed_conv{i}")(f, lvl.point.neighbor_idx)
            f = MaskedBatchNorm(stem_cs[i], dtype=self.dtype,
                                name=f"embed_bn{i}")(
                f, lvl.point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            nxt = levels[i + 1]
            f = nn.Dense(stem_cs[i + 1], use_bias=False, dtype=self.dtype,
                         name=f"embed_down{i}")(f)
            f = pyr.pool_features(f, nxt, reduce="max")
            f = MaskedBatchNorm(stem_cs[i + 1], dtype=self.dtype,
                                name=f"embed_down{i}_bn")(
                f, nxt.point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            c_in = stem_cs[i + 1]
        lvl = levels[self.stem_down]
        f = SubMConv(stem_cs[-1], self.channels[0], 27, use_bias=False,
                     dtype=self.dtype, name="embed_proj")(
            f, lvl.point.neighbor_idx
        )
        f = MaskedBatchNorm(self.channels[0], dtype=self.dtype,
                            name="embed_proj_bn")(
            f, lvl.point.mask, use_running_average=not train
        )
        f = nn.relu(f)

        # ---- stages ----
        dp = list(np.linspace(0, self.drop_path, sum(self.num_blocks)))
        stage_feats = {}
        for s in range(n_stages):
            li = self.stem_down + s
            lvl = levels[li]
            if s > 0:
                f = nn.Dense(self.channels[s], dtype=self.dtype,
                             name=f"down{s}_proj")(f)
                f = pyr.pool_features(f, lvl, reduce="max")
                f = MaskedBatchNorm(self.channels[s], dtype=self.dtype,
                                    name=f"down{s}_bn")(
                    f, lvl.point.mask, use_running_average=not train
                )
            for b in range(self.num_blocks[s]):
                f = OctFormerBlock(
                    dim=self.channels[s], num_heads=self.num_heads[s],
                    patch_size=self.patch_size,
                    dilation=1 if b % 2 == 0 else self.dilation,
                    drop_path_rate=float(dp[sum(self.num_blocks[:s]) + b]),
                    use_rpe=self.use_rpe, dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(f, lvl, deterministic, train)
            stage_feats[s] = f

        # ---- FPN decoder (reference `:380-428`): accumulate upsampled
        # conv3x3 outputs from the coarsest stage to the finest ----
        top = n_stages - 1
        feature = nn.Dense(self.fpn_channels, dtype=self.dtype,
                           name="fpn_1x1_0")(stage_feats[top])
        li = self.stem_down + top
        conv_out = SubMConv(self.fpn_channels, self.fpn_channels, 27,
                            use_bias=False, dtype=self.dtype, name="fpn_3x3_0")(
            feature, levels[li].point.neighbor_idx
        )
        conv_out = nn.relu(MaskedBatchNorm(
            self.fpn_channels, dtype=self.dtype, name="fpn_3x3_0_bn"
        )(conv_out, levels[li].point.mask, use_running_average=not train))

        def lift(x, from_l, to_l):
            for l in range(from_l, to_l, -1):
                x = pyr.unpool_features(x, levels[l])
            return x

        out = lift(conv_out, li, self.stem_down)
        for i in range(1, n_stages):
            s = top - i
            li = self.stem_down + s
            feature = pyr.unpool_features(feature, levels[li + 1])
            feature = nn.Dense(self.fpn_channels, dtype=self.dtype,
                               name=f"fpn_1x1_{i}")(stage_feats[s]) + feature
            conv_out = SubMConv(
                self.fpn_channels, self.fpn_channels, 27, use_bias=False,
                dtype=self.dtype, name=f"fpn_3x3_{i}",
            )(feature, levels[li].point.neighbor_idx)
            conv_out = nn.relu(MaskedBatchNorm(
                self.fpn_channels, dtype=self.dtype, name=f"fpn_3x3_{i}_bn"
            )(conv_out, levels[li].point.mask, use_running_average=not train))
            out = out + lift(conv_out, li, self.stem_down)

        # head_up deconvs back to full resolution
        for i in range(self.head_up):
            li = self.stem_down - i
            out = pyr.unpool_features(out, levels[li])
            out = nn.Dense(self.fpn_channels, dtype=self.dtype,
                           name=f"head_up{i}")(out)
            out = nn.relu(MaskedBatchNorm(
                self.fpn_channels, dtype=self.dtype, name=f"head_up{i}_bn"
            )(out, levels[li - 1].point.mask, use_running_average=not train))

        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            out.astype(jnp.float32)
        )
        return point.replace(feat=logits)
