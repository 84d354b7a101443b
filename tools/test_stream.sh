#!/bin/sh
# Live-stream smoke: generator | DAW (the reference's test_stream.sh analog,
# hermetic: builds its own project + fixtures first).
#
#   tools/test_stream.sh [duration_seconds]
set -e
DUR="${1:-12}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DIR="$(mktemp -d)"
trap 'rm -rf "$DIR"' EXIT

python - "$DIR" "$REPO" <<'EOF'
import sys
import pathlib
import numpy as np
sys.path.insert(0, sys.argv[2])  # the repo root, works from any cwd
from termdaw_tpu.fileio.wav import write_wav
d = pathlib.Path(sys.argv[1])
sr = 16000
t = np.arange(int(sr*0.1))/sr
for name, freq, decay in [("kick", 60, 30), ("snare", 200, 40), ("hat", 5000, 90)]:
    x = (np.exp(-t*decay)*np.sin(2*np.pi*freq*t)).astype(np.float32)
    write_wav(d/f"{name}.wav", np.stack([x,x],1), sr, bits=16)
(d/"project.lua").write_text(f'''
load_sample("kick", "{d}/kick.wav", "");
load_sample("snare", "{d}/snare.wav", "");
load_sample("hat", "{d}/hat.wav", "");
declare_stream("kick");
declare_stream("snare");
declare_stream("hat");
add_sample_multi("k", 1.0, 0.0, "kick", "kick", -1);
add_sample_multi("s", 0.8, 10.0, "snare", "snare", -1);
add_sample_multi("h", 0.4, -20.0, "hat", "hat", -1);
add_normalize("sum", 1.0, 0.0);
connect("k", "sum"); connect("s", "sum"); connect("h", "sum");
set_output("sum");
''')
(d/"project.toml").write_text('[settings]\nmain="project.lua"\nbuffer_length=256\nproject_samplerate=16000\nworkflow="stream"\n')
EOF

echo "streaming $DUR s of generated beats through the DAW..."
# scrubbed CPU backend: this smoke tests workflow pacing/logic, and the
# dev harness's remote-TPU first-fetch tax (100-400 s) would starve the
# idle timer before any audio lands. PYTHONPATH carries ONLY the repo so
# the axon sitecustomize does not register the TPU plugin.
python "$REPO/tools/stream_gen.py" --duration "$DUR" --streams kick,snare,hat \
  | TERMDAW_SINK="file:$DIR/capture.wav" TERMDAW_STREAM_IDLE=3 \
    PYTHONPATH="$REPO" JAX_PLATFORMS=cpu python -m termdaw_tpu "$DIR"

python - "$DIR" "$REPO" <<'EOF'
import sys, pathlib
sys.path.insert(0, sys.argv[2])  # the repo root, works from any cwd
import numpy as np
from termdaw_tpu.fileio.wav import read_wav
d = pathlib.Path(sys.argv[1])
a, spec = read_wav(d/"capture.wav", scale=True)
secs = len(a)/16000
peak = float(np.max(np.abs(a)))
nz = float(np.mean(np.any(a != 0, axis=1)))
print(f"captured {secs:.1f}s, peak {peak:.3f}, nonzero-frame ratio {nz:.2f}")
# measured healthy density is 0.32-0.36 (decaying drum hits leave zero
# frames between onsets); 0.25 keeps margin without passing starvation
assert secs > 3 and peak > 0.2 and nz > 0.25, "stream smoke failed"
print("STREAM SMOKE OK")
EOF
