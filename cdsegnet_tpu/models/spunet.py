"""SpUNet: sparse-conv UNet on the shared geometry pyramid.

TPU-native counterpart of the reference's `SpUNetBase` family
(`pointcept/models/sparse_unet/spconv_unet_v1m1_base.py`, ~1.6k LoC over
spconv): a UNet of submanifold ResNet blocks with strided down/up
transitions. Here:

- submanifold 3x3x3 convs run over per-level neighbor tables
  (`ops/subm_conv.py`);
- the strided `SparseConv3d` downsample becomes cluster max-pool over the
  pyramid + linear projection, and the inverse `SparseInverseConv3d`
  becomes the parent-broadcast gather — both exact submanifold-site
  preserving;
- BatchNorm is masked (`MaskedBatchNorm`).

Registered as `SpUNet-v1m1` with the reference's channel plan
(32, 64, 128, 256, 256, 128, 96, 96).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.modules import MaskedBatchNorm, SubMConv
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.models.builder import MODELS


class BasicBlock(nn.Module):
    """Submanifold ResNet basic block (conv-bn-relu x2 + residual)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool = False):
        c = self.channels
        f = SubMConv(c, c, 27, use_bias=False, dtype=self.dtype, name="conv1")(
            feat, nbr
        )
        f = MaskedBatchNorm(c, dtype=self.dtype, name="bn1")(
            f, mask, use_running_average=not train
        )
        f = nn.relu(f)
        f = SubMConv(c, c, 27, use_bias=False, dtype=self.dtype, name="conv2")(
            f, nbr
        )
        f = MaskedBatchNorm(c, dtype=self.dtype, name="bn2")(
            f, mask, use_running_average=not train
        )
        return nn.relu(feat + f)


@MODELS.register_module("SpUNet-v1m1")
class SpUNet(nn.Module):
    in_channels: int = 6
    num_classes: int = 20
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)
    orders: Tuple[str, ...] = ("z",)
    capacity_div: Tuple[int, ...] = (1, 2, 4, 16, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        num_stages = len(self.channels) // 2
        n0 = point.num_points
        caps = [
            pyr.round_up(max(n0 // d, 8), 8) for d in self.capacity_div[1:num_stages + 1]
        ]
        levels, stem_nbr = pyr.build_pyramid(
            point,
            strides=(2,) * num_stages,
            capacities=caps,
            orders=self.orders,
            shuffle_key=None,
            stem_kernel=5,
        )
        # stem
        feat = SubMConv(
            self.in_channels, self.base_channels, 125, use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(point.feat, stem_nbr)
        feat = MaskedBatchNorm(self.base_channels, dtype=self.dtype, name="stem_bn")(
            feat, levels[0].point.mask, use_running_average=not train
        )
        feat = nn.relu(feat)

        skips = [feat]
        # encoder
        for s in range(num_stages):
            lvl = levels[s + 1]
            f = nn.Dense(self.channels[s], dtype=self.dtype, name=f"down{s}_proj")(
                skips[-1]
            )
            f = pyr.pool_features(f, lvl, reduce="max")
            f = MaskedBatchNorm(self.channels[s], dtype=self.dtype, name=f"down{s}_bn")(
                f, lvl.point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            for i in range(self.layers[s]):
                f = BasicBlock(self.channels[s], dtype=self.dtype,
                               name=f"enc{s}_block{i}")(
                    f, lvl.point.neighbor_idx, lvl.point.mask, train
                )
            skips.append(f)

        # decoder
        f = skips[-1]
        for s in reversed(range(num_stages)):
            dec_c = self.channels[num_stages + (num_stages - 1 - s)]
            lvl = levels[s + 1]
            f = nn.Dense(dec_c, dtype=self.dtype, name=f"up{s}_proj")(f)
            f = pyr.unpool_features(f, lvl)
            skip = skips[s]
            f = jnp.concatenate([f, skip.astype(f.dtype)], axis=-1)
            f = nn.Dense(dec_c, dtype=self.dtype, name=f"up{s}_fuse")(f)
            f = MaskedBatchNorm(dec_c, dtype=self.dtype, name=f"up{s}_bn")(
                f, levels[s].point.mask, use_running_average=not train
            )
            f = nn.relu(f)
            for i in range(self.layers[num_stages + (num_stages - 1 - s)]):
                f = BasicBlock(dec_c, dtype=self.dtype, name=f"dec{s}_block{i}")(
                    f, levels[s].point.neighbor_idx, levels[s].point.mask, train
                )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="final")(
            f.astype(jnp.float32)
        )
        return point.replace(feat=logits)


@MODELS.register_module("MinkUNet")
class MinkUNet(SpUNet):
    """Alias family: the reference's MinkUNet shares the SpUNet topology."""
