"""Point Transformer V1 / V2: (grouped) vector attention over kNN graphs.

TPU-native counterparts of the reference zoo families
(`pointcept/models/point_transformer/*` ~963 LoC and
`pointcept/models/point_transformer_v2/*` ~1.8k LoC, both built on the
`pointops` CUDA kernels). Here the neighborhood ops are the XLA programs in
`cdsegnet_tpu/ops/pointops.py` (chunked MXU distance tiles + top_k) and the
grid pooling reuses the shared geometry pyramid.

- `GroupedVectorAttention`: channel groups share attention weights, with
  positional encoding added to both relation and values (reference
  `point_transformer_v2m2_base.py`).

kNN indices are computed ONCE per level with scene separation (batch-id
penalty in `ops.pointops.knn`) and shared by every block at that level —
the reference recomputes identical indices inside each GVA layer.
Registered: `PT-v2m1`, `PT-v2m2`, `PT-v2m3`. (PTv1 lives in `ptv1.py`.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.builder import MODELS
from cdsegnet_tpu.models.modules import MaskedBatchNorm
from cdsegnet_tpu.models.structure import PointBatch
from cdsegnet_tpu.ops.pointops import grouping, knn


class GroupedVectorAttention(nn.Module):
    channels: int
    groups: int
    k_neighbors: int = 16
    pe_multiplier: bool = False
    pe_bias: bool = True
    # "linear" (m2) or "grouped" (m1's GroupedLinear: per-channel weights
    # summed within each group, `point_transformer_v2m1_origin.py:24-63`)
    weight_encoding: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, coord, mask, idx, train: bool = False):
        c, g = self.channels, self.groups
        n = feat.shape[0]
        q = nn.Dense(c, use_bias=True, dtype=self.dtype, name="linear_q")(feat)
        k = nn.Dense(c, use_bias=True, dtype=self.dtype, name="linear_k")(feat)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="linear_v")(feat)
        k_n = grouping(k, idx)  # (N, K, C)
        v_n = grouping(v, idx)
        pos = grouping(coord, idx) - coord[:, None, :]  # (N, K, 3)
        pos = pos.astype(self.dtype)
        relation = q[:, None, :] - k_n
        if self.pe_multiplier:
            pem = nn.Sequential([
                nn.Dense(3, dtype=self.dtype), nn.gelu,
                nn.Dense(c, dtype=self.dtype),
            ])(pos)
            relation = relation * pem
        if self.pe_bias:
            peb = nn.Dense(c, dtype=self.dtype, name="pe_bias2")(
                nn.gelu(nn.Dense(3, dtype=self.dtype, name="pe_bias1")(pos))
            )
            relation = relation + peb
            v_n = v_n + peb
        w = nn.gelu(nn.Dense(c, dtype=self.dtype, name="weight_fc1")(relation))
        if self.weight_encoding == "grouped":
            gw = self.param(
                "grouped_weight",
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (1, c), jnp.float32,
            ).astype(self.dtype)
            w = jnp.sum(
                (w * gw).reshape(n, self.k_neighbors, g, c // g), axis=-1
            )
        else:
            w = nn.Dense(g, dtype=self.dtype, name="weight_fc2")(w)  # (N,K,G)
        valid = (idx < n)[..., None]
        w = jnp.where(valid, w.astype(jnp.float32), -1e9)
        w = jax.nn.softmax(w, axis=1).astype(v_n.dtype)
        v_g = v_n.reshape(n, self.k_neighbors, g, c // g)
        out = jnp.sum(v_g * w[..., None], axis=1).reshape(n, c)
        return out


class BlockV2(nn.Module):
    channels: int
    groups: int
    k_neighbors: int = 16
    weight_encoding: str = "linear"
    # PDNorm (m3): >0 enables per-condition BN (`point_transformer_v2m3_pdnorm.py`)
    num_conditions: int = 0
    pdnorm_adaptive: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, coord, mask, idx, train: bool = False,
                 condition: int = 0, context=None):
        from cdsegnet_tpu.models.spunet import apply_norm, make_norm

        c = self.channels
        pd = dict(num_conditions=self.num_conditions,
                  adaptive=self.pdnorm_adaptive, dtype=self.dtype)
        f = GroupedVectorAttention(
            channels=c, groups=self.groups, k_neighbors=self.k_neighbors,
            weight_encoding=self.weight_encoding, dtype=self.dtype, name="attn",
        )(feat, coord, mask, idx, train)
        f = apply_norm(make_norm(c, "bn", **pd), f, mask, train,
                       condition, context)
        f = nn.relu(f)
        f = nn.Dense(c, dtype=self.dtype, name="fc")(f)
        f = apply_norm(make_norm(c, "bn2", **pd), f, mask, train,
                       condition, context)
        return nn.relu(feat + f)


@MODELS.register_module("PT-v2m2")
class PointTransformerV2(nn.Module):
    """PTv2 segmentor: GVA blocks + grid pooling UNet."""

    in_channels: int = 6
    num_classes: int = 20
    patch_embed_channels: int = 48
    patch_embed_groups: int = 6
    enc_channels: Tuple[int, ...] = (96, 192, 384, 512)
    enc_depths: Tuple[int, ...] = (2, 2, 6, 2)
    enc_groups: Tuple[int, ...] = (12, 24, 48, 64)
    dec_channels: Tuple[int, ...] = (48, 96, 192, 384)
    dec_depths: Tuple[int, ...] = (1, 1, 1, 1)
    dec_groups: Tuple[int, ...] = (6, 12, 24, 48)
    k_neighbors: int = 16
    capacity_div: Tuple[int, ...] = (1, 2, 8, 32, 128)
    # metric GridPool sizes (reference `point_transformer_v2m2_base.py:465`);
    # None falls back to the power-of-two serialization pyramid
    grid_sizes: Optional[Tuple[float, ...]] = (0.06, 0.12, 0.24, 0.48)
    weight_encoding: str = "linear"
    num_conditions: int = 0
    pdnorm_adaptive: bool = False
    dtype: jnp.dtype = jnp.float32

    def _norm_act(self, f, c, mask, train, condition, context, name):
        from cdsegnet_tpu.models.spunet import apply_norm, make_norm

        pd = dict(num_conditions=self.num_conditions,
                  adaptive=self.pdnorm_adaptive, dtype=self.dtype)
        f = apply_norm(make_norm(c, name, **pd), f, mask, train,
                       condition, context)
        return nn.relu(f)

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition: int = 0, context=None):
        num_stages = len(self.enc_channels)
        blk = dict(k_neighbors=self.k_neighbors,
                   weight_encoding=self.weight_encoding,
                   num_conditions=self.num_conditions,
                   pdnorm_adaptive=self.pdnorm_adaptive, dtype=self.dtype)
        n0 = point.num_points
        caps = [
            pyr.round_up(max(n0 // d, 8), 8)
            for d in self.capacity_div[1:num_stages + 1]
        ]
        if self.grid_sizes is not None:
            levels = pyr.build_metric_pyramid(
                point, self.grid_sizes[:num_stages], caps
            )
        else:
            levels, _ = pyr.build_pyramid(
                point, strides=(2,) * num_stages, capacities=caps,
                orders=("z",), shuffle_key=None, stem_kernel=3,
            )
        # one kNN table per level, scene-separated, shared by all blocks there
        knn_idx = [
            knn(lv.point.coord, lv.point.coord, self.k_neighbors,
                lv.point.mask, lv.point.mask,
                query_batch=lv.point.batch, ref_batch=lv.point.batch)[0]
            for lv in levels[:num_stages + 1]
        ]
        feat = nn.Dense(self.patch_embed_channels, dtype=self.dtype,
                        name="patch_embed")(point.feat)
        feat = BlockV2(self.patch_embed_channels, self.patch_embed_groups,
                       name="embed_block", **blk)(
            feat, point.coord, point.mask, knn_idx[0], train,
            condition, context
        )
        skips = [feat]
        for s in range(num_stages):
            lvl = levels[s + 1]
            # GridPool: fc -> norm -> relu -> segment max (reference `:247`)
            f = nn.Dense(self.enc_channels[s], use_bias=False,
                         dtype=self.dtype, name=f"down{s}")(skips[-1])
            f = self._norm_act(f, self.enc_channels[s], levels[s].point.mask,
                               train, condition, context, f"down{s}_bn")
            f = pyr.pool_features(f, lvl, reduce="max")
            for i in range(self.enc_depths[s]):
                f = BlockV2(self.enc_channels[s], self.enc_groups[s],
                            name=f"enc{s}_block{i}", **blk)(
                    f, lvl.point.coord, lvl.point.mask, knn_idx[s + 1],
                    train, condition, context
                )
            skips.append(f)
        f = skips[-1]
        for s in reversed(range(num_stages)):
            lvl = levels[s + 1]
            # UnpoolWithSkip, map backend: proj -> norm -> relu -> broadcast,
            # plus proj_skip -> norm -> relu (reference `:294-313`)
            f = nn.Dense(self.dec_channels[s], dtype=self.dtype,
                         name=f"up{s}")(f)
            f = self._norm_act(f, self.dec_channels[s], lvl.point.mask,
                               train, condition, context, f"up{s}_bn")
            f = pyr.unpool_features(f, lvl)
            skip = nn.Dense(self.dec_channels[s], dtype=self.dtype,
                            name=f"skip{s}")(skips[s])
            skip = self._norm_act(skip, self.dec_channels[s],
                                  levels[s].point.mask, train, condition,
                                  context, f"skip{s}_bn")
            f = f + skip
            lo = levels[s]
            for i in range(self.dec_depths[s]):
                f = BlockV2(self.dec_channels[s], self.dec_groups[s],
                            name=f"dec{s}_block{i}", **blk)(
                    f, lo.point.coord, lo.point.mask, knn_idx[s], train,
                    condition, context
                )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            f.astype(jnp.float32)
        )
        return point.replace(feat=logits)


@MODELS.register_module("PT-v2m1")
class PointTransformerV2M1(PointTransformerV2):
    """PTv2 mode 1 (reference `point_transformer_v2m1_origin.py`): identical
    to m2 except the weight encoding's second linear is the per-channel
    GroupedLinear."""

    weight_encoding: str = "grouped"


@MODELS.register_module("PT-v2m3")
class PointTransformerV2M3(PointTransformerV2):
    """PTv2 mode 3 (reference `point_transformer_v2m3_pdnorm.py`): m2 with
    Prompt-Driven Normalization for Point Prompt Training. Configure
    ``num_conditions``/``pdnorm_adaptive`` and pass ``condition``/``context``
    at call time."""
