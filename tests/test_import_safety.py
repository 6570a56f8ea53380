"""Importing the package must never initialize a device backend.

A module-level device array (e.g. a constant built with jnp.array at
import time) makes every `import probav_tpu.*` block until a backend is
reachable — on a TPU host with a flaky device grant that turns plain
CPU work (preprocessing, tests, tooling) into a hang.  The reference has
no equivalent hazard (TF defers device init), so this is a contract the
TPU build must enforce on itself.  Regression test for the Sobel kernel
bank, probav_tpu/ops/sobel.py.
"""

import subprocess
import sys


SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import importlib, pkgutil
import jax._src.xla_bridge as xb

# Snapshot BEFORE the root package import — an eager device array in
# probav_tpu/__init__.py must fail this test too, not hide before the
# baseline is taken.
before = set(getattr(xb, "_backends", {}))
import probav_tpu

def _fail(name):
    raise ImportError(f"could not import {name}")

for m in pkgutil.walk_packages(probav_tpu.__path__, "probav_tpu.",
                               onerror=_fail):
    importlib.import_module(m.name)
new = set(getattr(xb, "_backends", {})) - before
assert not new, f"imports initialized backends: {sorted(new)}"
print("IMPORT_SAFE")
"""


def test_package_imports_do_not_initialize_backends():
    # Subprocess: the test session itself has long-initialized backends,
    # so the property is only observable in a fresh interpreter.
    r = subprocess.run([sys.executable, "-c", SCRIPT],
                       capture_output=True, timeout=300, text=True)
    assert r.returncode == 0, r.stderr
    assert "IMPORT_SAFE" in r.stdout
