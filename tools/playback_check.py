"""One-off: re-measure bench's playback pacing section after a player
change, without rerunning the whole bench. Prints the playback_* extras.

Usage: python tools/playback_check.py [seconds]
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
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    tmp = Path(tempfile.mkdtemp(prefix="termdaw_pbcheck_"))
    st = bench.build_c1_sample_project(tmp / "c1", 40.0, 48000, 1024)
    extra: dict = {}
    bench.measure_playback(st, extra, seconds=seconds)
    print(json.dumps({k: v for k, v in extra.items()
                      if k.startswith("playback")}))


if __name__ == "__main__":
    main()
