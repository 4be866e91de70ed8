"""Hermeticity contract of the driver entry points (__graft_entry__.py).

MULTICHIP_r03 failed because importing the module initialized the TPU
backend (via a module-scope persistent-cache probe) before
``dryrun_multichip`` could pin the CPU platform, and a stale cached TPU
AOT executable then died on a libtpu version skew. These tests freeze the
fix: import must initialize NO backend, and the dryrun must run entirely
on a forced-device-count CPU mesh even in a hostile environment
(``JAX_PLATFORMS=axon`` + a poisoned compilation-cache dir).

Both run in subprocesses: backend initialization is process-global state.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(**extra):
    """The session environment the driver calls us with (axon platform)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest's CPU pin must not leak in
    env["JAX_PLATFORMS"] = "axon"
    pp = env.get("PYTHONPATH", "")
    if "/root/.axon_site" not in pp and os.path.isdir("/root/.axon_site"):
        env["PYTHONPATH"] = f"/root/.axon_site:{pp}" if pp else "/root/.axon_site"
    env.update(extra)
    return env


def test_import_initializes_no_backend():
    code = (
        "import jax._src.xla_bridge as xb\n"
        "import __graft_entry__\n"
        "assert not xb._backends, f'backends initialized: {list(xb._backends)}'\n"
        "print('HERMETIC')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "HERMETIC" in out.stdout


def test_dryrun_multichip_hermetic(tmp_path):
    # poison the persistent cache location: a stale TPU AOT blob from a
    # different libtpu build is a hard runtime error if it is ever read
    bogus_cache = tmp_path / "bogus_cache"
    bogus_cache.mkdir()
    (bogus_cache / "junk").write_bytes(b"\x00not-an-executable")
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(4)\n"
        "import jax\n"
        "plats = {d.platform for d in jax.devices()}\n"
        "assert plats == {'cpu'}, plats\n"
        "assert len(jax.devices()) == 4\n"
        "print('DRYRUN-CPU-OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO,
        env=_driver_env(JAX_COMPILATION_CACHE_DIR=str(bogus_cache)),
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "DRYRUN-CPU-OK" in out.stdout
