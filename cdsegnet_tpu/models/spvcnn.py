"""SPVCNN: sparse-voxel UNet + high-resolution point branch (TPU-native).

Counterpart of the reference `pointcept/models/spvcnn/ts_spvcnn.py` (438 LoC
over torchsparse). The torchsparse primitives map onto the shared geometry
pyramid:

- `initial_voxelize` / `point_to_voxel` (`ts_spvcnn.py:25-74`): mean-reduce
  point features into voxel clusters -> chained `pyr.pool_features(mean)`;
- `voxel_to_point` (`ts_spvcnn.py:79-123`): devoxelization -> chained
  `pyr.unpool_features` (the reference's ``nearest`` variant; its default
  trilinear weighting is a conscious simplification here — the containing
  voxel IS the nearest site on a submanifold grid);
- strided sparse convs/deconvs -> cluster pool / parent broadcast with
  linear projections, residual submanifold blocks like SpUNet.

The point branch (`point_transforms`, `ts_spvcnn.py:357-375`) carries
full-resolution features past every voxel stage.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.builder import MODELS
from cdsegnet_tpu.models.modules import MaskedBatchNorm, SubMConv
from cdsegnet_tpu.models.spunet import BasicBlock
from cdsegnet_tpu.models.structure import PointBatch


def _pool_chain(feat, levels, lo, hi):
    for l in range(lo + 1, hi + 1):
        feat = pyr.pool_features(feat, levels[l], reduce="mean")
    return feat


def _unpool_chain(feat, levels, hi, lo):
    for l in range(hi, lo, -1):
        feat = pyr.unpool_features(feat, levels[l])
    return feat


class _ConvBNReLU(nn.Module):
    in_c: int
    out_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, nbr, mask, train=False):
        f = SubMConv(self.in_c, self.out_c, 27, use_bias=False,
                     dtype=self.dtype, name="conv")(feat, nbr)
        f = MaskedBatchNorm(self.out_c, dtype=self.dtype, name="bn")(
            f, mask, use_running_average=not train
        )
        return nn.relu(f)


class _ResBlock(nn.Module):
    """Residual block with a possible channel change (reference
    `ResidualBlock`, `ts_spvcnn.py:152-175`)."""

    in_c: int
    out_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, nbr, mask, train=False):
        f = SubMConv(self.in_c, self.out_c, 27, use_bias=False,
                     dtype=self.dtype, name="conv1")(feat, nbr)
        f = MaskedBatchNorm(self.out_c, dtype=self.dtype, name="bn1")(
            f, mask, use_running_average=not train
        )
        f = nn.relu(f)
        f = SubMConv(self.out_c, self.out_c, 27, use_bias=False,
                     dtype=self.dtype, name="conv2")(f, nbr)
        f = MaskedBatchNorm(self.out_c, dtype=self.dtype, name="bn2")(
            f, mask, use_running_average=not train
        )
        if self.in_c != self.out_c:
            s = nn.Dense(self.out_c, use_bias=False, dtype=self.dtype,
                         name="down_proj")(feat)
            s = MaskedBatchNorm(self.out_c, dtype=self.dtype, name="down_bn")(
                s, mask, use_running_average=not train
            )
        else:
            s = feat
        return nn.relu(f + s)


class _PointTransform(nn.Module):
    out_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, mask, train=False):
        f = nn.Dense(self.out_c, dtype=self.dtype, name="fc")(feat)
        f = MaskedBatchNorm(self.out_c, dtype=self.dtype, name="bn")(
            f, mask, use_running_average=not train
        )
        return nn.relu(f)


@MODELS.register_module("SPVCNN")
class SPVCNN(nn.Module):
    """4-stage sparse UNet + point branch (reference `SPVCNN`,
    `ts_spvcnn.py:179-438`)."""

    in_channels: int = 4
    num_classes: int = 19
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    orders: Tuple[str, ...] = ("z",)
    capacity_div: Tuple[int, ...] = (1, 2, 4, 16, 64)
    drop_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        ch, ly = self.channels, self.layers
        n0 = point.num_points
        caps = [
            pyr.round_up(max(n0 // d, 8), 8) for d in self.capacity_div[1:5]
        ]
        levels, _ = pyr.build_pyramid(
            point, strides=(2, 2, 2, 2), capacities=caps, orders=self.orders,
            shuffle_key=None, stem_kernel=3,
        )
        m0 = levels[0].point.mask
        nbr0 = levels[0].point.neighbor_idx

        # stem: two k3 submanifold convs (`ts_spvcnn.py:202-209`)
        f = _ConvBNReLU(self.in_channels, self.base_channels,
                        dtype=self.dtype, name="stem1")(point.feat, nbr0, m0, train)
        x0 = _ConvBNReLU(self.base_channels, self.base_channels,
                         dtype=self.dtype, name="stem2")(f, nbr0, m0, train)
        z0 = x0  # voxel_to_point at stride 1 is the identity

        # encoder stages: strided down + residual blocks
        def stage(s, feat, in_c, out_c):
            lvl = levels[s + 1]
            f = nn.Dense(in_c, dtype=self.dtype, name=f"down{s}_proj")(feat)
            f = _pool_chain(f, levels, s, s + 1)
            f = MaskedBatchNorm(in_c, dtype=self.dtype, name=f"down{s}_bn")(
                f, lvl.point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            f = _ResBlock(in_c, out_c, dtype=self.dtype,
                          name=f"enc{s}_block0")(
                f, lvl.point.neighbor_idx, lvl.point.mask, train
            )
            for i in range(1, ly[s]):
                f = _ResBlock(out_c, out_c, dtype=self.dtype,
                              name=f"enc{s}_block{i}")(
                    f, lvl.point.neighbor_idx, lvl.point.mask, train
                )
            return f

        x1 = stage(0, x0, self.base_channels, ch[0])
        x2 = stage(1, x1, ch[0], ch[1])
        x3 = stage(2, x2, ch[1], ch[2])
        x4 = stage(3, x3, ch[2], ch[3])

        # point branch join 1 (`ts_spvcnn.py:409-411`)
        z1 = _unpool_chain(x4, levels, 4, 0) + _PointTransform(
            ch[3], dtype=self.dtype, name="pt0"
        )(z0, m0, train)

        def up(s, feat, in_c, out_c, skip, skip_c, lvl_hi, lvl_lo, name):
            lvl = levels[lvl_lo]
            f = nn.Dense(out_c, dtype=self.dtype, name=f"{name}_proj")(feat)
            f = _unpool_chain(f, levels, lvl_hi, lvl_lo)
            f = MaskedBatchNorm(out_c, dtype=self.dtype, name=f"{name}_bn")(
                f, lvl.point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            f = jnp.concatenate([f, skip.astype(f.dtype)], axis=-1)
            f = _ResBlock(out_c + skip_c, out_c, dtype=self.dtype,
                          name=f"{name}_block0")(
                f, lvl.point.neighbor_idx, lvl.point.mask, train
            )
            for i in range(1, ly[4 + s]):
                f = _ResBlock(out_c, out_c, dtype=self.dtype,
                              name=f"{name}_block{i}")(
                    f, lvl.point.neighbor_idx, lvl.point.mask, train
                )
            return f

        y1_in = _pool_chain(z1, levels, 0, 4)
        y1_in = nn.Dropout(self.drop_rate)(y1_in, deterministic=not train)
        y1 = up(0, y1_in, ch[3], ch[4], x3, ch[2], 4, 3, "up1")
        y2 = up(1, y1, ch[4], ch[5], x2, ch[1], 3, 2, "up2")

        # point branch join 2
        z2 = _unpool_chain(y2, levels, 2, 0) + _PointTransform(
            ch[5], dtype=self.dtype, name="pt1"
        )(z1, m0, train)

        y3_in = _pool_chain(z2, levels, 0, 2)
        y3_in = nn.Dropout(self.drop_rate)(y3_in, deterministic=not train)
        y3 = up(2, y3_in, ch[5], ch[6], x1, ch[0], 2, 1, "up3")
        y4 = up(3, y3, ch[6], ch[7], x0, self.base_channels, 1, 0, "up4")

        z3 = y4 + _PointTransform(ch[7], dtype=self.dtype, name="pt2")(
            z2, m0, train
        )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(
            z3.astype(jnp.float32)
        )
        return point.replace(feat=logits)


MODELS.register_module("SPVCNN-v1m1", SPVCNN)
