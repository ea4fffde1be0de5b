"""CPU-reference child process for ``selfcheck.cpu_crosscheck``.

Under the deployment env's ``JAX_PLATFORMS=axon`` the parent process
cannot register the host CPU backend at all (the axon PJRT shim hangs
backend init for any other platform list -- measured round 4), so the
cross-backend miscompile gate runs its CPU side out-of-process: the parent
serialises params/state/probe-inputs into one ``store``-format ``.npz``,
this child recomputes the cascade on the CPU backend with Pallas kernels
off, and writes the three output stacks back as a second ``.npz``.

Usage: ``python -m mmego_tpu.utils.selfcheck_child IN OUT LOWER_PC IMU_USED``
(the parent sets ``JAX_PLATFORMS=cpu`` in the child env; the config pin
below is the belt-and-braces against the pre-registered axon plugin).
The reference has no analogue (single local CUDA backend).
"""

from __future__ import annotations

import sys


def main(in_path: str, out_path: str, lower_pc_no: int,
         imu_used: bool) -> int:
    from mmego_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()          # pin cpu BEFORE any backend init
    import numpy as np
    import jax

    from mmego_tpu.checkpoint import store
    from mmego_tpu.models import cascade
    from mmego_tpu.ops import pallas_ctl

    flat = store.load_flat(in_path)
    tp, ts = cascade.cascade_init(jax.random.PRNGKey(0))
    tree = store.load(in_path, {
        "params": tp, "state": ts, "cloud": flat["cloud"],
        "imu": flat["imu"], "bones": flat["bones"]})
    fn = jax.jit(cascade.cascade_apply, static_argnums=(5, 6))
    with pallas_ctl.override(False):   # Mosaic kernels cannot lower for CPU
        out = fn(tree["params"], tree["state"], tree["cloud"], tree["imu"],
                 tree["bones"], lower_pc_no, imu_used)
    np.savez(out_path, **{k: np.asarray(v) for k, v in out.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
                  sys.argv[4] == "1"))
