"""No module of the package may initialize a JAX backend at import time.

A module-level device constant (e.g. ``jnp.int32(...)``) initializes the
DEFAULT backend of whatever process imports it. Under the axon tunnel that
means every spawned worker / library consumer claims the TPU client just by
importing — and hangs forever when the relay is down (this bit the worker
pool; ROUND3_NOTES.md session 3). Importing must be side-effect-free;
backends initialize on first USE.
"""
import os
import subprocess
import sys


def test_importing_every_module_initializes_no_backend():
    code = r"""
import pkgutil, importlib, sys
import citlab_as_tpu

skipped = []
for m in pkgutil.walk_packages(citlab_as_tpu.__path__,
                               prefix="citlab_as_tpu."):
    try:
        importlib.import_module(m.name)
    except ImportError as e:      # optional deps (none expected)
        skipped.append((m.name, str(e)))

import jax._src.xla_bridge as xb
backends = getattr(xb, "_backends", {})
assert not backends, f"backend(s) initialized at import: {list(backends)}"
assert not skipped, f"import failures: {skipped}"
print("OK", len(list(pkgutil.walk_packages(citlab_as_tpu.__path__))))
"""
    env = dict(os.environ)
    # CPU platform: if a module DOES initialize a backend the test must
    # fail fast rather than hang on a dead axon relay
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {repo!r}); "
         "import jax; jax.config.update('jax_platforms', 'cpu')\n" + code],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.startswith("OK")
