"""Mesh helpers + the sharded render entry point."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    """1-D mesh over the first n devices (sequence-parallel axis)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set --xla_force_host_platform_device_count for CPU tests)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def sharded_render(state, nb_total: int, mesh: Mesh | None = None):
    """Render nb_total blocks of `state`'s compiled graph across a mesh,
    starting at the current time. Returns device audio [nb_total*bl, 2]."""
    mesh = mesh if mesh is not None else make_mesh()
    cg = state.compiled
    state.fb.set_time(cg.get_time())
    # sharded windows always live-bake: skip the chain-storing pass
    cg.seed_caps(state.fb, max(state.cs, nb_total), nb_total,
                 prebake=False)
    audio = cg.render_window_sharded(state.fb, nb_total, mesh)
    state.fb.advance_blocks(nb_total)
    return audio
