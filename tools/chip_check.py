"""One-off: re-measure one bench config's chip timing in isolation
(pipelined-dispatch mode — run before any fetch, one TPU user at a time).

Usage: python tools/chip_check.py c4_fullgraph [reps]
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from termdaw_tpu.utils.jaxcache import (  # noqa: E402
    enable_persistent_compile_cache,
)


def main() -> None:
    # bench enables the cache in its measurement child only; this tool
    # IS the measurement process
    enable_persistent_compile_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "c4_fullgraph"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tmp = Path(tempfile.mkdtemp(prefix="termdaw_chipcheck_"))
    st = bench.BUILDERS[name](tmp / name, 40.0, 48000, 1024)
    extra: dict = {}
    bench.measure_chip(st, 40.0, reps, name, extra, spread_guard=True)
    print(json.dumps(extra))


if __name__ == "__main__":
    main()
