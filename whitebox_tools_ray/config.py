"""Engine configuration (the settings.json analog,
whitebox-common/src/configs/mod.rs:10-16: verbose_mode, working_directory,
compress_rasters, max_procs — re-expressed for a Ray cluster)."""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class EngineConfig:
    # parallelism: None = whatever the Ray cluster provides (max_procs analog)
    num_cpus: int | None = None
    # bytes per Dataset block at the read (drives shuffle partition counts)
    target_block_bytes: int = 64 * 1024 * 1024
    # default map_batches batch size for row kernels
    batch_size: int = 65536
    # output compression for checkpoint parquet (compress_rasters analog)
    parquet_compression: str = "snappy"
    # working directory for checkpoints / outputs
    working_dir: str = "/tmp/wbt_ray"
    verbose: bool = False
    # hot-cell salting fan-out for skewed groupbys
    n_salts: int = 8
    extra: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str | None = None) -> "EngineConfig":
        path = path or os.environ.get("WBT_RAY_CONFIG", "")
        if path and os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            known = {k: v for k, v in data.items() if k in cls.__dataclass_fields__}
            cfg = cls(**known)
            cfg.extra = {k: v for k, v in data.items() if k not in cls.__dataclass_fields__}
            return cfg
        return cls()

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=1, sort_keys=True)


def actor_pool(min_size: int = 1, frac: float = 1.0) -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the CLUSTER, not a constant.

    A fixed ``concurrency=(1, 4)`` caps a stage at 4 workers while a 32-CPU
    node (or a 256-node cluster) idles; this scales the upper bound with the
    CPUs Ray actually has. ``frac`` reserves headroom for downstream stages
    sharing the CPUs (e.g. 0.5 when two actor pools run concurrently)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return (min_size, max(min_size, int(cpus * frac)))
