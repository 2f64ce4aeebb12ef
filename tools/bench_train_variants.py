"""Train-step throughput for (scan_blocks, remat) variants at a bucket size.

Round-4 verdict item #4: pick the fastest train configuration that fits
v5e HBM at the 104k and 204.8k (recipe) buckets, with measured evidence.

Usage: python tools/bench_train_variants.py [num_points] [variant ...]
Variants: noscan_noremat, noscan_remat, scan_remat, scan_noremat, scan_dots
"""

import sys

sys.path.insert(0, ".")

import bench
from __graft_entry__ import _flagship_cfg

VARIANTS = dict(
    noscan_noremat=dict(scan=False, remat=False),
    noscan_remat=dict(scan=False, remat=True),
    scan_remat=dict(scan=True, remat=True),
    scan_noremat=dict(scan=True, remat=False),
    scan_dots=dict(scan=True, remat=True, policy="dots_saveable"),
    noscan_dots=dict(scan=False, remat=True, policy="dots_saveable"),
)


def main():
    args = sys.argv[1:]
    num_points = int(args[0]) if args and args[0].isdigit() else 104448
    names = [a for a in args if a in VARIANTS] or [
        "noscan_noremat", "scan_remat"
    ]
    for name in names:
        v = VARIANTS[name]
        cfg = _flagship_cfg(num_points, 1024, scale=1)
        try:
            # scan/policy must go through bench_train's kwargs — it rebuilds
            # the backbone cfg from them (a cfg-only mutation is overwritten
            # by the CDSEG_TRAIN_SCAN default; round-4 advisor finding)
            pps, ms, compile_s = bench.bench_train(
                cfg, num_points, remat=v["remat"], iters=5,
                scan=v["scan"], policy=v.get("policy"),
            )
            print(
                f"{name}: {pps:.0f} pts/s  {ms:.1f} ms/step  "
                f"compile {compile_s:.1f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
