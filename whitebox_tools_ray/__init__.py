"""whitebox_tools_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the data-processing capabilities of the
WhiteboxTools reference (read-only at /root/reference) on top of
``ray.data.Dataset`` pipelines: vectorized Arrow batch kernels, actor pools
for stateful stages (broadcast polygon indexes, interpolation state), and
``groupby``-on-cell shuffles for the wide steps.

Layout:
    grid.py       grid/tile/hex codecs (reference floor-arithmetic parity)
    geometry.py   vectorized winding-number point-in-polygon + polygon packing
    cells.py      fixed-radius-search cell encoding + k-ring expansion
    sources/      table readers, deterministic coordinate derivation,
                  synthetic pages fixture generator
    stages/       spatial join, gridding, kNN, dedup, text, ANN stages
    pipelines/    end-to-end flagship pipelines with lineage
    state/        lineage records, partition manifests, resume
"""

__version__ = "0.1.0"

import os as _os

# Transparent-hugepage madvise is pathological on this VM class: a 2 MB THP
# fault stalls in host-side provisioning/compaction, making numpy's default
# MADV_HUGEPAGE first-touch ~20-45x slower than plain 4 KB faults (measured:
# np.empty(256 MB) first-touch 2.7-6.5 s with THP vs 0.14 s without; raw mmap
# and every pyarrow pool are unaffected).  This was the round-1..4
# "environment variance" on compute-bound entries.  Disable it everywhere the
# package is imported — the driver AND every Ray worker deserializing one of
# our closures runs this hook, so no env plumbing is needed.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
if _os.environ["NUMPY_MADVISE_HUGEPAGE"] == "0":
    try:  # numpy already imported -> flip the runtime switch too
        import numpy.core.multiarray as _ma

        if hasattr(_ma, "_set_madvise_hugepage"):
            _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - numpy >=2 moved the hook
        pass
