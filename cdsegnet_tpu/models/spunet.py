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
from cdsegnet_tpu.models.modules import (
    MaskedBatchNorm,
    PDMaskedBatchNorm,
    SubMConv,
)
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.models.builder import MODELS


def make_norm(c, name, *, num_conditions=0, adaptive=False, dtype=jnp.float32):
    """Plain masked BN, or prompt-driven BN when ``num_conditions > 0``
    (the v1m3/PDNorm variants)."""
    if num_conditions > 0:
        return PDMaskedBatchNorm(
            c, num_conditions=num_conditions, adaptive=adaptive, dtype=dtype,
            name=name,
        )
    return MaskedBatchNorm(c, dtype=dtype, name=name)


def apply_norm(mod, f, mask, train, condition=0, context=None):
    if isinstance(mod, PDMaskedBatchNorm):
        return mod(f, mask, use_running_average=not train,
                   condition=condition, context=context)
    return mod(f, mask, use_running_average=not train)


class BasicBlock(nn.Module):
    """Submanifold ResNet basic block (conv-bn-relu x2 + residual)."""

    channels: int
    num_conditions: int = 0
    pdnorm_adaptive: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, nbr, mask, train: bool = False,
                 condition: int = 0, context=None):
        c = self.channels
        pd = dict(num_conditions=self.num_conditions,
                  adaptive=self.pdnorm_adaptive, dtype=self.dtype)
        f = SubMConv(c, c, 27, use_bias=False, dtype=self.dtype, name="conv1")(
            feat, nbr
        )
        f = apply_norm(make_norm(c, "bn1", **pd), f, mask, train,
                       condition, context)
        f = nn.relu(f)
        f = SubMConv(c, c, 27, use_bias=False, dtype=self.dtype, name="conv2")(
            f, nbr
        )
        f = apply_norm(make_norm(c, "bn2", **pd), f, mask, train,
                       condition, context)
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
    # PDNorm (SpUNet-v1m3): >0 enables per-condition BN; see PDMaskedBatchNorm
    num_conditions: int = 0
    pdnorm_adaptive: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition: int = 0, context=None):
        num_stages = len(self.channels) // 2
        pd = dict(num_conditions=self.num_conditions,
                  adaptive=self.pdnorm_adaptive, dtype=self.dtype)
        blk = dict(num_conditions=self.num_conditions,
                   pdnorm_adaptive=self.pdnorm_adaptive, dtype=self.dtype)
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
        feat = apply_norm(
            make_norm(self.base_channels, "stem_bn", **pd),
            feat, levels[0].point.mask, train, condition, context,
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
            f = apply_norm(
                make_norm(self.channels[s], f"down{s}_bn", **pd),
                f, lvl.point.mask, train, condition, context,
            )
            f = nn.relu(f)
            for i in range(self.layers[s]):
                f = BasicBlock(self.channels[s], name=f"enc{s}_block{i}", **blk)(
                    f, lvl.point.neighbor_idx, lvl.point.mask, train,
                    condition, context,
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
            f = apply_norm(
                make_norm(dec_c, f"up{s}_bn", **pd),
                f, levels[s].point.mask, train, condition, context,
            )
            f = nn.relu(f)
            for i in range(self.layers[num_stages + (num_stages - 1 - s)]):
                f = BasicBlock(dec_c, name=f"dec{s}_block{i}", **blk)(
                    f, levels[s].point.neighbor_idx, levels[s].point.mask,
                    train, condition, context,
                )
        if self.num_classes > 0:
            # reference gates the head the same way (`spconv_unet_v1m1_base.py`
            # `final = ... if num_classes > 0 else Identity()`), so wrappers
            # like CAC/MSC can read backbone features directly
            f = nn.Dense(self.num_classes, dtype=jnp.float32, name="final")(
                f.astype(jnp.float32)
            )
        return point.replace(feat=f)


@MODELS.register_module("MinkUNet")
class MinkUNet(SpUNet):
    """Alias family: the reference's MinkUNet shares the SpUNet topology."""


@MODELS.register_module("SpUNet-v1m3")
class SpUNetPDNorm(SpUNet):
    """SpUNet with Prompt-Driven Normalization (reference
    `spconv_unet_v1m3_pdnorm.py`): per-condition BN everywhere, selected by
    the dataset condition, with optional context FiLM. Configure via
    ``num_conditions=len(conditions)`` and ``pdnorm_adaptive=True`` and pass
    ``condition=<index>, context=<embedding>`` at call time (PPT does)."""
