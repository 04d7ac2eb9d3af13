"""Shared deterministic-polyline fixture constants (leaf module: imported
by queries_data3 AND queries_vector3, and shipped inside worker closures —
must never import pipelines.*; a cross-pipelines from-import breaks worker
deserialization through the pipelines.queries import cycle)."""

_L2P_N, _L2P_K, _L2P_SEED = 200, 8, 5150
