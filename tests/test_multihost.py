"""REAL two-process multi-host execution smoke.

``parallel.mesh.init_multihost`` is exercised elsewhere only through a
monkeypatched ``jax.distributed.initialize`` (test_sharding.py); this test
runs the real thing: two OS processes, a localhost coordinator, a global
4-device mesh spanning both, and jitted cross-process collectives whose
results are verified numerically (see tests/_multihost_worker.py).

The reference has no distributed counterpart at all (SURVEY.md §2.9; its
only device logic is the single-device select at Config/config.py:31-34).
"""

import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_collective_trainer_eval():
    """Collective smoke + a REAL train_upper epoch + a REAL infer.evaluate
    across two OS processes, each verified numerically equivalent to the
    single-process run (see tests/_multihost_worker.py)."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Fresh processes must not inherit the parent's forced 8-device flag
    # (the worker sets its own 2-device count) nor write machine-feature-
    # pinned AOT entries into the shared compile cache.
    env.pop("XLA_FLAGS", None)
    env.pop("MMEGO_DP", None)       # the worker drives this itself
    env["MMEGO_COMPILE_CACHE"] = "0"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), coordinator, "trainer"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "MULTIHOST_OK 84.0" in out, out
        assert "MULTIHOST_TRAIN_OK" in out, out
        assert "MULTIHOST_EVAL_OK" in out, out
