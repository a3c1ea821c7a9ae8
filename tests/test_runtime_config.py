"""Runtime switch registry tests (citlab_as_tpu/config/runtime.py).

Round-4 verdict weak #3: five production switches lived only as scattered
``os.environ`` lookups. The registry gives them one declaration point, one
precedence order (set() > env > parsed flag > default), flag registration
for --help, and an ``active()`` dump for the BENCH JSON.
"""
import pytest

from citlab_as_tpu.config import runtime
from citlab_as_tpu.config.flags import Flags


@pytest.fixture(autouse=True)
def _clean_overrides():
    runtime.clear()
    yield
    runtime.clear()


def test_defaults(monkeypatch):
    for sw in runtime._SWITCHES.values():
        monkeypatch.delenv(sw.env, raising=False)
    assert runtime.get("swt_extract") == "gather2"
    assert runtime.get("swt_barrier") is False
    assert runtime.get("sep_post") == "native"
    assert runtime.get("prefetch") is True
    assert runtime.get("hold_device_buffers") == "auto"
    assert runtime.get("native_geometry") is True
    assert runtime.get("bench_driver") == "pipelined"
    for name in runtime._SWITCHES:
        assert runtime.source(name) == "default", name


def test_env_override_bool_forms(monkeypatch):
    for raw, expect in [("1", True), ("true", True), ("YES", True),
                        ("0", False), ("false", False), ("", False),
                        ("off", False)]:
        monkeypatch.setenv("CITLAB_PREFETCH", raw)
        assert runtime.get("prefetch") is expect, raw
    assert runtime.source("prefetch") == "env"


def test_env_override_choice_validates(monkeypatch):
    monkeypatch.setenv("CITLAB_SWT_EXTRACT", "native")
    assert runtime.get("swt_extract") == "native"
    monkeypatch.setenv("CITLAB_SWT_EXTRACT", "bogus")
    with pytest.raises(ValueError, match="CITLAB_SWT_EXTRACT"):
        runtime.get("swt_extract")


def test_tristate(monkeypatch):
    monkeypatch.setenv("CITLAB_HOLD_DEVICE_BUFFERS", "auto")
    assert runtime.get("hold_device_buffers") == "auto"
    monkeypatch.setenv("CITLAB_HOLD_DEVICE_BUFFERS", "1")
    assert runtime.get("hold_device_buffers") is True
    monkeypatch.setenv("CITLAB_HOLD_DEVICE_BUFFERS", "0")
    assert runtime.get("hold_device_buffers") is False


def test_set_beats_env(monkeypatch):
    monkeypatch.setenv("CITLAB_SEP_POST", "device")
    runtime.set("sep_post", "native")
    assert runtime.get("sep_post") == "native"
    assert runtime.source("sep_post") == "override"
    runtime.clear("sep_post")
    assert runtime.get("sep_post") == "device"


def test_set_unknown_switch_raises():
    with pytest.raises(KeyError):
        runtime.set("no_such_switch", 1)


def test_active_lists_every_switch(monkeypatch):
    for sw in runtime._SWITCHES.values():
        monkeypatch.delenv(sw.env, raising=False)
    act = runtime.active()
    assert set(act) == set(runtime._SWITCHES)
    # JSON-serializable (bench.py embeds it in the BENCH JSON)
    import json
    json.dumps(act)


def test_register_flags_exposes_help():
    f = Flags()
    runtime.register_flags(f)
    helptext = f.parser.format_help()
    for name, sw in runtime._SWITCHES.items():
        assert "--citlab_" + name in helptext
        assert sw.env in helptext  # env override documented in --help


def test_parsed_flag_used_when_no_env(monkeypatch):
    """Precedence: env > parsed flag > default — via the GLOBAL registry,
    which runtime._flags_value reads."""
    from citlab_as_tpu.config.flags import FLAGS
    monkeypatch.delenv("CITLAB_SWT_EXTRACT", raising=False)
    saved = (dict(FLAGS.__dict__["_values"]), FLAGS.__dict__["_parsed"])
    try:
        FLAGS.__dict__["_values"]["citlab_swt_extract"] = "map"
        FLAGS.__dict__["_parsed"] = True
        assert runtime.get("swt_extract") == "map"
        assert runtime.source("swt_extract") == "flag"
        monkeypatch.setenv("CITLAB_SWT_EXTRACT", "gather")
        assert runtime.get("swt_extract") == "gather"  # env wins over flag
    finally:
        FLAGS.__dict__["_values"].clear()
        FLAGS.__dict__["_values"].update(saved[0])
        FLAGS.__dict__["_parsed"] = saved[1]


def test_consumers_follow_registry(monkeypatch):
    """The former env-lookup sites now resolve through the registry: a
    programmatic set() must steer them without touching the environment."""
    monkeypatch.delenv("CITLAB_PREFETCH", raising=False)
    from citlab_as_tpu.utils import async_copy

    class Probe:
        called = False

        def copy_to_host_async(self):
            Probe.called = True

    runtime.set("prefetch", False)
    async_copy.prefetch(Probe())
    assert not Probe.called
    runtime.set("prefetch", True)
    async_copy.prefetch(Probe())
    assert Probe.called


def test_no_stray_citlab_env_lookups_outside_config():
    """Verdict item 3 'done' criterion: no os.environ.get("CITLAB...")
    outside the config layer (scripts/ A/B harnesses excepted — they SET
    the env for child processes, which stays first-class)."""
    import os
    import re
    pkg = os.path.join(os.path.dirname(runtime.__file__), "..")
    bad = []
    for root, _dirs, files in os.walk(os.path.abspath(pkg)):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            if os.path.basename(os.path.dirname(path)) == "config":
                continue
            with open(path) as f:
                src = f.read()
            if re.search(r"environ(\.get)?\(\s*['\"]CITLAB", src):
                bad.append(path)
    assert not bad, bad


def test_flag_value_normalized_like_env(monkeypatch):
    """Tristate switches register as string flags; the parsed value must go
    through the same normalization as env strings — '--citlab_hold_device_
    buffers false' must not come back as the truthy str 'false'."""
    from citlab_as_tpu.config.flags import FLAGS
    monkeypatch.delenv("CITLAB_HOLD_DEVICE_BUFFERS", raising=False)
    saved = (dict(FLAGS.__dict__["_values"]), FLAGS.__dict__["_parsed"])
    try:
        FLAGS.__dict__["_values"]["citlab_hold_device_buffers"] = "false"
        FLAGS.__dict__["_parsed"] = True
        assert runtime.get("hold_device_buffers") is False
        FLAGS.__dict__["_values"]["citlab_hold_device_buffers"] = "auto"
        assert runtime.get("hold_device_buffers") == "auto"
    finally:
        FLAGS.__dict__["_values"].clear()
        FLAGS.__dict__["_values"].update(saved[0])
        FLAGS.__dict__["_parsed"] = saved[1]


def test_device_hold_follows_runtime_set(monkeypatch):
    """device_hold must re-resolve the switch on every call (no first-use
    latch): a set() AFTER a prior use must take effect."""
    monkeypatch.delenv("CITLAB_HOLD_DEVICE_BUFFERS", raising=False)
    from citlab_as_tpu.ops import device_hold
    device_hold.release()
    runtime.set("hold_device_buffers", True)
    device_hold.hold(object())
    assert device_hold.held_count() == 1
    runtime.set("hold_device_buffers", False)
    device_hold.hold(object())
    assert device_hold.held_count() == 1      # second hold was a no-op
    device_hold.release()


def test_validate_fails_fast_on_bad_env(monkeypatch):
    monkeypatch.setenv("CITLAB_SEP_POST", "natve")     # typo
    with pytest.raises(ValueError, match="CITLAB_SEP_POST"):
        runtime.validate()
    monkeypatch.setenv("CITLAB_SEP_POST", "native")
    runtime.validate()                                 # clean passes
