"""PluginHost: the named effect-plugin registry behind the load_lv2 API.

Mirrors the reference's Lv2Host surface (add_plugin/remove_plugin/
set_value/reset_value/get_index — state.rs:254-323) but binds URIs to the
first-party native effect suite (ops/fx.py) instead of dlopening LV2
binaries. Parameter values are traced into the compiled graph, so tweaking
them never recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..ops.fx import EffectDef, resolve_uri, resolve_param
from ..utils.term import RED, BLUE, YELLOW, DEFAULT


class AddPluginError(ValueError):
    """Reference lv2hm::AddPluginError analog — here: unresolvable URI or
    duplicate name."""


@dataclass
class Plugin:
    name: str
    uri: str
    effect: EffectDef
    params: dict = field(default_factory=dict)  # overrides over defaults


class PluginHost:
    def __init__(self) -> None:
        self.plugins: list[Plugin | None] = []
        self.names: dict[str, int] = {}
        # bumped on every mutation that can change param_values() output;
        # CompiledGraph._pack_fx memoizes its packed vector against it
        self.version = 0

    def add_plugin(self, uri: str, name: str) -> None:
        if name in self.names:
            raise AddPluginError(
                f'PluginHost: plugin named "{name}" already present.'
            )
        effect = resolve_uri(uri)
        if effect is None:
            raise AddPluginError(
                f'PluginHost: no native effect matches uri "{uri}". '
                f"Known: reverb, chorus, compressor, tape, delay, bitcrush "
                f'(use e.g. "native:reverb").'
            )
        self.plugins.append(Plugin(name=name, uri=uri, effect=effect))
        self.names[name] = len(self.plugins) - 1
        self.version += 1

    def remove_plugin(self, name: str) -> None:
        idx = self.names.pop(name, None)
        if idx is not None:
            self.plugins[idx] = None
            self.version += 1

    def get_index(self, name: str) -> int | None:
        return self.names.get(name)

    def get(self, index: int) -> Plugin:
        p = self.plugins[index]
        assert p is not None
        return p

    def set_value(self, plugin: str, param: str, value: float) -> None:
        idx = self.names.get(plugin)
        if idx is None:
            print(f'{RED}PluginHost: unknown plugin "{plugin}".{DEFAULT}')
            return
        key = resolve_param(param)
        p = self.plugins[idx]
        if key is None or key not in p.effect.defaults:
            print(
                f'{YELLOW}PluginHost: plugin {BLUE}"{plugin}"{YELLOW} has no '
                f'parameter {BLUE}"{param}"{YELLOW}; known: '
                f"{sorted(p.effect.defaults)}{DEFAULT}"
            )
            return
        p.params[key] = float(value)
        self.version += 1

    def reset_value(self, plugin: str, param: str) -> None:
        idx = self.names.get(plugin)
        if idx is None:
            return
        key = resolve_param(param)
        if key is not None and \
                self.plugins[idx].params.pop(key, None) is not None:
            self.version += 1

    def param_values(self, index: int) -> dict[str, float]:
        p = self.get(index)
        vals = dict(p.effect.defaults)
        vals.update(p.params)
        return vals
