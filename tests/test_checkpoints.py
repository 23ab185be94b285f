"""Unit tests for training/checkpoints.py — the synchronous, watchdogged
save path added after a live 224px run deadlocked forever inside orbax's
async finalize thread (tmp dir fully written, commit-future wait never
returned)."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from semiuhpe_tpu.training.checkpoints import (load_checkpoint,
                                               save_checkpoint)


def _state():
    return {"step": jnp.asarray(7), "params": {"w": jnp.arange(12.0)}}


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "latest", _state())
    out = load_checkpoint(d, "latest", _state())
    assert int(out["step"]) == 7
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), np.arange(12.0))


def test_save_cleans_stale_tmp_and_overwrites(tmp_path):
    """A killed/hung save leaves `<name>.orbax-checkpoint-tmp*`; the next
    save must clear it and still finalize (orbax refuses a dirty tmp)."""
    d = str(tmp_path)
    stale = os.path.join(d, "latest.orbax-checkpoint-tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("partial")
    save_checkpoint(d, "latest", _state())
    assert not os.path.exists(stale)
    # force=True semantics: a second save over the finalized dir succeeds
    st = _state()
    st["step"] = jnp.asarray(8)
    save_checkpoint(d, "latest", st)
    assert int(load_checkpoint(d, "latest", _state())["step"]) == 8


def test_save_watchdog_exits_75(tmp_path):
    """If a save wedges past the timeout the process must exit 75
    (EX_TEMPFAIL) so train_auto_resume.sh relaunches it, instead of
    hanging the run forever."""
    prog = """
import threading, sys
import jax.numpy as jnp
import orbax.checkpoint as ocp
import semiuhpe_tpu.training.checkpoints as ck

ocp.Checkpointer.save = lambda self, *a, **kw: threading.Event().wait()
ck.save_checkpoint(sys.argv[1], "latest", {"x": jnp.zeros(3)}, timeout_s=2.0)
print("unreachable")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", prog, str(tmp_path)],
                       capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 75, (r.returncode, r.stdout, r.stderr)
    assert "wedged" in r.stderr


def test_wedge_watchdog_passthrough():
    """A block that finishes in time runs unharmed and the timer dies."""
    import threading

    from semiuhpe_tpu.training.checkpoints import wedge_watchdog

    before = threading.active_count()
    with wedge_watchdog("fast block", timeout_s=30.0):
        x = 1 + 1
    assert x == 2
    assert threading.active_count() <= before + 1  # timer cancelled


def test_wedge_watchdog_exits_75():
    """A wedged device-value fetch (the live round-4 failure: an eval
    `Array.__array__` stuck forever through the relay) must hard-exit 75
    so train_auto_resume.sh relaunches from `latest` instead of hanging."""
    prog = """
import threading
from semiuhpe_tpu.training.checkpoints import wedge_watchdog

with wedge_watchdog("stuck eval fetch", timeout_s=2.0):
    threading.Event().wait()
print("unreachable")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", prog],
                       capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 75, (r.returncode, r.stdout, r.stderr)
    assert "stuck eval fetch wedged" in r.stderr
