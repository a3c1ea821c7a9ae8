"""Runtime performance/feature switches — flag-registered, env-overridable.

Round 4 left five production-relevant switches living only in scattered
``os.environ`` lookups (``CITLAB_SWT_EXTRACT``, ``CITLAB_SWT_BARRIER``,
``CITLAB_SEP_POST``, ``CITLAB_PREFETCH``, ``CITLAB_HOLD_DEVICE_BUFFERS``),
invisible to ``--help`` and undocumented. The reference routes every knob
through its flag registry (python_util/basic/flags.py:104-333 is the
pattern); this module is the rebuild's equivalent for runtime switches.

Every switch is declared HERE, registered on the global :data:`FLAGS`
registry (so any FLAGS-driven entry point lists it under ``--help``), and
resolved with one precedence order:

    programmatic ``set()``  >  CITLAB_* environment variable
        >  parsed ``--citlab_<name>`` flag  >  declared default

The environment variable stays first-class (not legacy): the workflow fans
out over spawned worker processes (utils/workers.py) where argv does not
propagate but the environment does, and the bench/soak scripts A/B switches
per process. ``active()`` returns the fully resolved switch set so
``bench.py`` can record it in the BENCH JSON — a number without its switch
set is not reproducible.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

_TRUE = ("1", "true", "t", "yes", "y", "on")
_FALSE = ("0", "false", "f", "no", "n", "off", "")


class Switch:
    def __init__(self, name: str, env: str, default: Any, kind: str,
                 doc: str, choices: Optional[Tuple[str, ...]] = None):
        self.name = name
        self.env = env
        self.default = default
        self.kind = kind            # "bool" | "choice" | "tristate"
        self.doc = doc
        self.choices = choices

    def parse_env(self, raw: str) -> Any:
        if self.kind == "bool":
            return raw.lower() in _TRUE
        if self.kind == "int":
            return int(raw)
        if self.kind == "tristate":
            if raw.lower() == "auto":
                return "auto"
            return raw.lower() in _TRUE
        if self.choices and raw not in self.choices:
            raise ValueError(
                f"{self.env}={raw!r}: not one of {self.choices}")
        return raw


_SWITCHES: Dict[str, Switch] = {}
_OVERRIDES: Dict[str, Any] = {}


def _declare(name, env, default, kind, doc, choices=None):
    _SWITCHES[name] = Switch(name, env, default, kind, doc, choices)


# --- the switch set (measured trades documented in README "Runtime
# --- switches" + ROUND4_NOTES optimization ladder) -----------------------

_declare(
    "swt_extract", "CITLAB_SWT_EXTRACT", "gather2", "choice",
    "Per-line SWT stats extraction for the heading stage: 'gather2' "
    "(one-hot MXU column extraction, fastest measured on v5e: 377 vs 534 "
    "ms/group for 'gather'), 'gather' (per-pixel device gather), 'map' "
    "(lax.map fallback, fully barriered), 'native' (host C++ gk_line_stats, "
    "~1.5 ms/page but pays an ~11 MB/wave distance-transform readback — "
    "A/B NEGATIVE on the axon tunnel, wins on PCIe-class links).",
    choices=("gather", "gather2", "map", "native"))
_declare(
    "swt_stride", "CITLAB_SWT_STRIDE", 16, "int",
    "Doubling-distance cap for the per-line SWT component fixpoint "
    "(ops/swt_device.py): each propagation sweep then reaches ~2*stride-1 "
    "px along a run instead of the full crop width. Glyph runs are short, "
    "so a 16-32 cap cuts the fixpoint's HBM traffic without extra outer "
    "iterations (exactness is kept by the convergence check either way; "
    "on-chip A/B r5: bit-exact at 0/16/32/64). Default 16: on realistic "
    "text pages timings are within noise of uncapped (41 vs 41 ms/group), "
    "on noise-percolated worst-case pages it wins ~1.2x (325 -> 263 "
    "ms/group). 0 = uncapped full-width doubling.")
_declare(
    "swt_barrier", "CITLAB_SWT_BARRIER", False, "bool",
    "Insert a 4-byte scalar device read before the SWT bulk readback (the "
    "round-2 readback-race workaround). Default OFF since the round-4 "
    "3x56-page soak passed without it; =1 restores the workaround.")
_declare(
    "sep_post", "CITLAB_SEP_POST", "native", "choice",
    "Separator post-processing placement: 'native' (host C++ "
    "gk_separator_post run-space union-find + exact 1-D openings, keeps "
    "the device program forward-only; bit-identical, golden-tested) or "
    "'device' (fully fused device chain incl. the CC fixpoint — the "
    "round-4 device floor's biggest slab at ~180 ms/group).",
    choices=("native", "device"))
_declare(
    "prefetch", "CITLAB_PREFETCH", True, "bool",
    "Start async device->host copies (copy_to_host_async) for buffers a "
    "later wave will materialize, so the transfer rides the wire during "
    "host work instead of blocking at the barrier.")
_declare(
    "hold_device_buffers", "CITLAB_HOLD_DEVICE_BUFFERS", "auto", "tristate",
    "Pin per-group device buffers until the pipeline drains (relay-poison "
    "guard). 'auto' = on for accelerator backends, off for CPU; costs "
    "~20 MB per in-flight page group.")
_declare(
    "native_geometry", "CITLAB_AS_TPU_NATIVE", True, "bool",
    "Load the C++ geometry kernel (native/geometry_kernel.cpp) via ctypes; "
    "=0 forces the pure-numpy fallbacks everywhere (parity testing). "
    "FIRST-USE LATCHED: the .so load attempt happens once per process, so "
    "set()/env changes after any geometry call have no effect (a shared "
    "library cannot be unloaded).")
_declare(
    "bench_driver", "CITLAB_BENCH_DRIVER", "pipelined", "choice",
    "Workflow driver used by bench.py: 'pipelined' (4-deep wave pipeline, "
    "production shape) or 'sequential' (stage-by-stage reference shape).",
    choices=("pipelined", "sequential"))


def _flags_value(name: str) -> Optional[Any]:
    """Parsed --citlab_<name> value, or None if FLAGS was never parsed /
    doesn't carry the key (library code must not trigger an argv parse)."""
    try:
        from citlab_as_tpu.config.flags import FLAGS
        if not FLAGS.__dict__.get("_parsed"):
            return None
        key = "citlab_" + name
        if not FLAGS.has_key(key):
            return None
        return FLAGS.__dict__["_values"][key]
    except Exception:
        return None


def get(name: str) -> Any:
    """Resolve a switch: set() > env > parsed flag > default."""
    sw = _SWITCHES[name]
    if name in _OVERRIDES:
        return _OVERRIDES[name]
    raw = os.environ.get(sw.env)
    if raw is not None:
        return sw.parse_env(raw)
    fv = _flags_value(name)
    if fv is not None:
        # tristate switches register as string flags, so the parsed value
        # needs the same normalization as an env string —
        # `--citlab_hold_device_buffers false` must not come back as the
        # truthy str 'false'
        return sw.parse_env(fv) if isinstance(fv, str) else fv
    return sw.default


def set(name: str, value: Any) -> None:  # noqa: A001 - registry setter
    if name not in _SWITCHES:
        raise KeyError(name)
    _OVERRIDES[name] = value


def clear(name: Optional[str] = None) -> None:
    if name is None:
        _OVERRIDES.clear()
    else:
        _OVERRIDES.pop(name, None)


def source(name: str) -> str:
    """Where the current value comes from: override|env|flag|default."""
    sw = _SWITCHES[name]
    if name in _OVERRIDES:
        return "override"
    if os.environ.get(sw.env) is not None:
        return "env"
    if _flags_value(name) is not None:
        return "flag"
    return "default"


def active() -> Dict[str, Any]:
    """The fully resolved switch set (for the BENCH JSON / logs)."""
    return {name: get(name) for name in _SWITCHES}


def validate() -> None:
    """Resolve every switch once, so a bad CITLAB_* value (e.g. a typo in a
    choice switch) fails FAST at startup instead of erroring per page inside
    the drivers' fault-tolerant loops — where it would be recorded as a
    per-page skip and turn a config typo into a silently empty run."""
    errors = []
    for name, sw in _SWITCHES.items():
        try:
            get(name)
        except Exception as e:  # noqa: BLE001 - collected and re-raised
            errors.append(f"{sw.env}={os.environ.get(sw.env)!r}: {e}")
    if errors:
        raise ValueError("invalid runtime switch value(s): "
                         + "; ".join(errors))


def register_flags(flags=None) -> None:
    """Register every switch as a --citlab_<name> flag on a registry
    (default: the global FLAGS) so entry points list them under --help."""
    if flags is None:
        from citlab_as_tpu.config.flags import FLAGS as flags  # type: ignore
    for sw in _SWITCHES.values():
        doc = sw.doc + f" [env override: {sw.env}]"
        if sw.kind == "bool":
            flags.define_boolean("citlab_" + sw.name, None, doc)
        elif sw.kind == "int":
            flags.define_integer("citlab_" + sw.name, None, doc)
        elif sw.kind == "tristate":
            flags.define_string("citlab_" + sw.name, None, doc,
                                metavar="auto|true|false")
        else:
            flags.define_choices("citlab_" + sw.name, list(sw.choices),
                                 None, str, doc)


register_flags()
