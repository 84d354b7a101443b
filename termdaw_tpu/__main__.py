import sys

from .cli import main
from .utils.backend import apply_platform_override

# process-replacing TERMDAW_PLATFORM re-exec happens ONLY at the real CLI
# entrypoints; cli.main itself must stay safe to call in-process
apply_platform_override(sys.argv[1:])
raise SystemExit(main())
