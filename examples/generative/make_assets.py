"""Build-on-first-run hook: generate the shared example assets
(idempotent; the CLI runs this automatically when opening the project)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import _gen

_gen.ensure()
