"""CLI entrypoint: python -m termdaw_tpu [workdir]

Mirrors the reference binary (main.rs:38-135): one optional positional
argument = working directory; reads <wdir>/project.toml, prints the banner,
builds the State, runs the initial refresh, opens the audio sink, and
dispatches to the configured workflow.
"""

from __future__ import annotations

import sys
from pathlib import Path

from .config import Config, WorkFlow
from .engine.sink import make_sink
from .engine.state import State
from .utils.backend import (
    BackendUnavailable,
    apply_platform_override,
    ensure_backend,
)
from .utils.jaxcache import enable_persistent_compile_cache
from .utils.term import DEFAULT, BLUE, RED
from .workflows.stream import run_stream_workflow
from .workflows.ui import run_ui_workflow


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    wdir = argv[0] if argv else "./"
    enable_persistent_compile_cache()
    try:
        config = Config.read(Path(wdir) / "project.toml")
    except (OSError, KeyError, ValueError) as e:
        print(f"{RED}Error: could not read project.toml: {e}{DEFAULT}")
        return 1

    print(
        f'{DEFAULT}TermDaw: loading {BLUE}"{config.project.name}"{DEFAULT} '
        f"with \n\tbuffer_length = {BLUE}{config.settings.buffer_length}"
        f"{DEFAULT} \n\tproject_samplerate = "
        f"{BLUE}{config.settings.project_samplerate}{DEFAULT} \n\tworkflow = "
        f"{BLUE}{config.settings.workflow}{DEFAULT} \n\tworkdir = "
        f"{BLUE}{wdir}{DEFAULT} \n\tmain = "
        f'{BLUE}"{config.settings.main}"{DEFAULT}'
    )

    # build-on-first-run assets: a project dir may ship a make_assets.py
    # that synthesizes its WAV/MIDI/wavetable fixtures (the reference's
    # examples point at files on the author's machine; ours regenerate).
    # Idempotent by contract — it runs on every launch and skips fast.
    gen = Path(wdir) / "make_assets.py"
    if gen.exists():
        import runpy

        runpy.run_path(str(gen), run_name="__main__")

    main_path = Path(wdir) / config.settings.main
    if not main_path.exists():
        print(
            f'{RED}Error: could not open main lua file: {BLUE}"{main_path}"'
            f"{RED}.{DEFAULT}"
        )
        return 1

    proj_sr = config.settings.project_samplerate
    buffer_len = config.settings.buffer_length

    # bounded backend init BEFORE the first device contact: a hung or
    # dead accelerator must become an actionable message within
    # TERMDAW_INIT_TIMEOUT_S, never a silent 25-minute hang (the init
    # thread stays parked in the PJRT call, so exit hard - a normal
    # return would wait on interpreter teardown)
    try:
        devs = ensure_backend()
    except BackendUnavailable:
        sys.stderr.flush()
        sys.stdout.flush()
        import os

        os._exit(1)
    if devs:
        print(
            f"{DEFAULT}TermDaw: accelerator backend ready: "
            f"{BLUE}{devs[0].platform}{DEFAULT} "
            f"({len(devs)} device(s)).{DEFAULT}"
        )

    state = State(config, wdir)
    state.refresh()

    sink = make_sink(proj_sr)

    if config.settings.workflow == WorkFlow.MANUAL:
        run_ui_workflow(proj_sr, buffer_len, state, sink)
    else:
        import os

        idle = os.environ.get("TERMDAW_STREAM_IDLE")
        run_stream_workflow(
            proj_sr, buffer_len, state, sink,
            max_idle_s=float(idle) if idle else None,
        )
    return 0


if __name__ == "__main__":
    # the TERMDAW_PLATFORM re-exec replaces the PROCESS, so it only
    # belongs at a real CLI entrypoint — never inside main(), which
    # tests and embedders call in-process
    apply_platform_override(sys.argv[1:])
    raise SystemExit(main())
