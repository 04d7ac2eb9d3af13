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
