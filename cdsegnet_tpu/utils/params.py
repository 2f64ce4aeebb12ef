"""Parameter-layout conversion between unrolled and scanned block stacks.

`PointTransformerV3` (and the zoo models that reuse `_run_blocks`) supports
two layouts for equal-width block runs:

- ``scan_blocks=False``: per-block submodules ``<stage>_block{i}`` — the
  layout that trains fastest (no `lax.scan` residual stacks; the unrolled
  no-remat train step fits v5e HBM at the 104k bucket where the scanned one
  does not — measured round 4, tools/profile_train_mem.py);
- ``scan_blocks=True``: one ``<stage>_blocks/block`` submodule whose params
  carry a leading depth axis — ~10x faster fresh compile for inference
  drivers (DESIGN.md §11).

A checkpoint from one layout is mechanically convertible to the other:
stack (resp. unstack) along the leading axis, in block order. Train with
``scan_blocks=False``, convert, and serve with ``scan_blocks=True``.

Reference counterpart: none — torch modules have a single layout; this is
the price/benefit of `nn.scan` (SURVEY §2.2 backbone).
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Any, Dict

import jax
import jax.numpy as jnp

_BLOCK_RE = re.compile(r"(.+_block)(\d+)$")


def _convert(tree: Mapping, to_scanned: bool, counter: list) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    groups: Dict[str, list] = {}
    for k in sorted(tree):
        v = tree[k]
        m = _BLOCK_RE.fullmatch(k)
        if to_scanned and m and (m.group(1) + "1") in tree:
            groups.setdefault(m.group(1), []).append(k)
            continue
        if (
            not to_scanned
            and k.endswith("_blocks")
            and isinstance(v, Mapping)
            and set(v) == {"block"}
        ):
            counter[0] += 1
            depth = jax.tree_util.tree_leaves(v["block"])[0].shape[0]
            for i in range(depth):
                out[f"{k[:-1]}{i}"] = jax.tree_util.tree_map(
                    lambda x, i=i: x[i], v["block"]
                )
            continue
        out[k] = (
            _convert(v, to_scanned, counter)
            if isinstance(v, Mapping) and not m
            else v
        )
    for prefix, keys in groups.items():
        counter[0] += 1
        keys.sort(key=lambda k: int(k[len(prefix):]))
        out[prefix + "s"] = {
            "block": jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[tree[k] for k in keys]
            )
        }
    return out


def _convert_checked(params: Mapping, to_scanned: bool,
                     allow_noop: bool) -> Dict[str, Any]:
    counter = [0]
    out = _convert(params, to_scanned, counter)
    if counter[0] == 0 and not allow_noop:
        raise ValueError(
            "no block groups found to convert — the checkpoint is already "
            f"in the {'scanned' if to_scanned else 'unrolled'} layout (or "
            "not a PTv3-family param tree); pass allow_noop=True to accept"
        )
    return out


def restack_block_params(params: Mapping, allow_noop: bool = False
                         ) -> Dict[str, Any]:
    """Unrolled (``<stage>_block{i}``) -> scanned (``<stage>_blocks/block``
    with a leading depth axis). Single-block stages (no ``_block1`` sibling)
    are left as-is — `_run_blocks` unrolls depth-1 runs in both modes.

    Accepts any Mapping (plain dict or flax FrozenDict); raises if nothing
    was converted unless ``allow_noop`` (a silent no-op used to hide
    already-scanned checkpoints; round-4 advisor finding)."""
    return _convert_checked(params, True, allow_noop)


def unstack_block_params(params: Mapping, allow_noop: bool = False
                         ) -> Dict[str, Any]:
    """Scanned -> unrolled (inverse of :func:`restack_block_params`)."""
    return _convert_checked(params, False, allow_noop)


def detect_block_layout(params: Mapping) -> str:
    """``"unrolled"`` if the tree holds ``<stage>_block{0,1,...}`` groups,
    ``"scanned"`` if it holds ``<stage>_blocks/block`` stacks, ``"none"`` if
    neither (single-block stages only / not a block-stack model)."""
    found = {"unrolled": False, "scanned": False}

    def walk(tree):
        for k, v in tree.items():
            m = _BLOCK_RE.fullmatch(k)
            if m and (m.group(1) + "1") in tree:
                found["unrolled"] = True
            elif (
                k.endswith("_blocks")
                and isinstance(v, Mapping)
                and set(v) == {"block"}
            ):
                found["scanned"] = True
            elif isinstance(v, Mapping) and not m:
                walk(v)

    walk(params)
    if found["unrolled"] and found["scanned"]:
        raise ValueError("mixed block layouts in one param tree")
    if found["unrolled"]:
        return "unrolled"
    if found["scanned"]:
        return "scanned"
    return "none"


def dual_block_groups(backbone) -> list:
    """Pairing structure of `PointTransformerV3._forward_fused` — which
    n/c stages share a pyramid level, their fused-group prefix, and the
    paired depth — derived from the module's static fields."""
    from cdsegnet_tpu.models.ptv3 import _cumshift

    n_shifts = _cumshift(backbone.n_stride)
    c_shifts = _cumshift(backbone.c_stride)
    cs_of = {sh: i for i, sh in enumerate(c_shifts)}
    groups = []
    for s in range(len(backbone.n_enc_depths)):
        cs = cs_of.get(n_shifts[s])
        if cs is None:
            continue
        nd, cd = backbone.n_enc_depths[s], backbone.c_enc_depths[cs]
        groups.append(dict(
            dual=f"enc_dual{n_shifts[s]}_block", n=f"n_enc{s}_block",
            c=f"c_enc{cs}_block", paired=min(nd, cd), nd=nd, cd=cd,
        ))
    for s in range(len(backbone.n_enc_depths) - 1):
        cs = cs_of.get(n_shifts[s])
        if cs is None or cs >= len(backbone.c_enc_depths) - 1:
            continue
        nd, cd = backbone.n_dec_depths[s], backbone.c_dec_depths[cs]
        groups.append(dict(
            dual=f"dec_dual{n_shifts[s]}_block", n=f"n_dec{s}_block",
            c=f"c_dec{cs}_block", paired=min(nd, cd), nd=nd, cd=cd,
        ))
    return groups


def _unfuse_renames(bb: Mapping, groups) -> Dict[str, Any]:
    """Fused (DualBlock) -> unfused param renaming on an UNROLLED tree."""
    bb = dict(bb)
    for g in groups:
        paired = g["paired"]
        for i in reversed(range(g["nd"] - paired)):  # tail renumbers up
            if f"{g['n']}{i}" in bb:
                bb[f"{g['n']}{i + paired}"] = bb.pop(f"{g['n']}{i}")
        for i in reversed(range(g["cd"] - paired)):
            if f"{g['c']}{i}" in bb:
                bb[f"{g['c']}{i + paired}"] = bb.pop(f"{g['c']}{i}")
        for i in range(paired):
            d = dict(bb.pop(f"{g['dual']}{i}"))
            bb[f"{g['n']}{i}"] = {
                k[2:]: v for k, v in d.items() if k.startswith("n_")
            }
            bb[f"{g['c']}{i}"] = {
                k[2:]: v for k, v in d.items() if k.startswith("c_")
            }
    return bb


def _fuse_renames(bb: Mapping, groups) -> Dict[str, Any]:
    """Unfused -> fused (DualBlock) param renaming on an UNROLLED tree."""
    bb = dict(bb)
    for g in groups:
        paired = g["paired"]
        for i in range(paired):
            nb = dict(bb.pop(f"{g['n']}{i}"))
            cb = dict(bb.pop(f"{g['c']}{i}"))
            d = {f"n_{k}": v for k, v in nb.items()}
            d.update({f"c_{k}": v for k, v in cb.items()})
            bb[f"{g['dual']}{i}"] = d
        for i in range(paired, g["nd"]):  # tail renumbers down
            if f"{g['n']}{i}" in bb:
                bb[f"{g['n']}{i - paired}"] = bb.pop(f"{g['n']}{i}")
        for i in range(paired, g["cd"]):
            if f"{g['c']}{i}" in bb:
                bb[f"{g['c']}{i - paired}"] = bb.pop(f"{g['c']}{i}")
    return bb


def adapt_backbone_params(bb_params: Mapping, backbone, scan: bool,
                          fused: bool) -> Dict[str, Any]:
    """Convert a PTv3-family BACKBONE param subtree to any (scan, fused)
    layout, from any layout: unstack -> fuse/unfuse renames -> restack.

    The production path trains fused+unrolled (fastest step, round-5
    measurements) and serves unfused (fused serving measured slower) —
    one checkpoint, four loadable layouts."""
    if detect_block_layout(bb_params) == "scanned":
        bb_params = unstack_block_params(bb_params, allow_noop=True)
    cur_fused = any(
        k.startswith(("enc_dual", "dec_dual")) for k in bb_params
    )
    if cur_fused != fused:
        groups = dual_block_groups(backbone)
        bb_params = (
            _unfuse_renames(bb_params, groups)
            if cur_fused
            else _fuse_renames(bb_params, groups)
        )
    if scan:
        bb_params = restack_block_params(bb_params, allow_noop=True)
    return bb_params


def convert_to_layout(params: Mapping, target: str) -> Dict[str, Any]:
    """Convert a param tree to ``target`` layout ("scanned"/"unrolled"),
    no-op when already there (or when no block stacks exist)."""
    assert target in ("scanned", "unrolled"), target
    current = detect_block_layout(params)
    if current in (target, "none"):
        return params if isinstance(params, dict) else dict(params)
    return (
        restack_block_params(params)
        if target == "scanned"
        else unstack_block_params(params)
    )
