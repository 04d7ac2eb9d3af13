"""Two-node deployment check: emulate a 2-node Ray cluster on one host
(`ray start --head` + a second `ray start --address=...` raylet, 8 CPUs
each) and drive the engine's multi-node assumptions for real — Dataset
blocks and broadcast ObjectRefs across nodes, SPREAD-placed named Pregel
shard actors addressed from tasks on the other node, and bit-exact parity
with a single-node run. The actual work lives in two_node_driver.py.

Usage: python scripts/two_node_check.py   (starts/stops its own cluster)
"""
import os
import subprocess
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
HERE = os.path.dirname(os.path.abspath(__file__))


def sh(cmd):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, capture_output=True, text=True)


def main() -> int:
    sh(["ray", "stop", "--force"])
    sh(["ray", "start", "--head", "--num-cpus=8", "--port=6379",
        "--include-dashboard=false", "--disable-usage-stats"])
    try:
        sh(["ray", "start", "--address=127.0.0.1:6379", "--num-cpus=8",
            "--disable-usage-stats"])
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "two_node_driver.py")])
        print("driver exit:", r.returncode,
              "wall:", round(time.time() - t0, 1), flush=True)
        return r.returncode
    finally:
        sh(["ray", "stop", "--force"])


if __name__ == "__main__":
    sys.exit(main())
