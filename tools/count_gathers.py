"""Count gather ops in the lowered SSI model executable, fused vs unfused.

Evidence for the DESIGN §13/§14 gather attack (round-4 verdict #2): the SSI
step is gather-efficiency bound, so the metric to minimize is the NUMBER of
data-dependent gathers (and to widen their rows), not bytes. This lowers the
model executable (geometry excluded — its sorts/gathers are shared) at a
small shape (gather count is shape-independent) and counts `gather` ops in
the StableHLO text.

Usage: CDSEG_PLATFORM=cpu python tools/count_gathers.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from __graft_entry__ import _flagship_cfg, _synthetic_point_batch
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.segmentor import CNFSegmentor


def count_gathers(fuse: bool, num_points: int = 8192, scale: int = 4):
    cfg = _flagship_cfg(num_points, 1024, scale=scale)
    cfg["backbone"]["fuse_dual_gathers"] = fuse
    cfg["backbone"]["use_pallas"] = False
    # unrolled: every block appears in the text, so the static count IS the
    # executed count (scanned stacks would hide depth behind one while body)
    cfg["backbone"]["scan_blocks"] = False
    model = build_model(cfg)
    point = _synthetic_point_batch(num_points, 1, depth=10, seed=0)
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    noise = jax.random.normal(jax.random.PRNGKey(7), (num_points, 6))
    geometry = jax.jit(model.backbone.precompute_geometry)(point)

    def ssi(variables, point, noise, geometry):
        return model.apply(
            variables, point, noise, geometry, method=CNFSegmentor.inference,
        )["seg_logits"]

    # count in the OPTIMIZED module: pre-optimization StableHLO dedupes the
    # `jax.checkpoint` conv bodies into shared functions (one textual gather
    # for 34 call sites), hiding the real executed count; after optimization
    # everything is inlined into fusions
    compiled = jax.jit(ssi).lower(variables, point, noise, geometry).compile()
    txt = compiled.as_text()
    return len(re.findall(r"\bgather\(", txt)), len(
        re.findall(r"\bscatter\(", txt)
    )


def main():
    g_f, s_f = count_gathers(True)
    g_u, s_u = count_gathers(False)
    print("model-executable ops in optimized HLO (unrolled, inference):")
    print(f"  unfused: {g_u} gathers, {s_u} scatters")
    print(f"  fused:   {g_f} gathers, {s_f} scatters  "
          f"({100.0 * (1 - g_f / max(g_u, 1)):.1f}% fewer gathers)")


if __name__ == "__main__":
    main()
