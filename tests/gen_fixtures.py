"""Generate activation-parity fixtures by EXECUTING the reference
implementation (read-only, at /root/reference) with its shipped checkpoints.

This script stores only arrays (inputs + reference outputs); no reference
code enters this repository.  Run once on a machine with the reference tree
mounted:

    python tests/gen_fixtures.py

Fixtures written to tests/fixtures/*.npz and committed, so the parity tests
run anywhere.
"""

import os
import sys
import types

import numpy as np

REF = os.environ.get("MMEGO_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def main():
    sys.path.insert(0, REF)
    # The reference's Utils module imports seaborn at top level, which this
    # image does not ship; stub it (only plotting helpers use it).
    if "seaborn" not in sys.modules:
        try:
            import seaborn  # noqa: F401
        except ImportError:
            sys.modules["seaborn"] = types.ModuleType("seaborn")
            sys.modules["seaborn"].set = lambda *a, **k: None
            sys.modules["seaborn"].set_style = lambda *a, **k: None
    import matplotlib
    matplotlib.use("Agg")

    import torch
    from Net.IMU_Net import IMUNet
    from Net.Upper_Net import UpperNet
    from Net.Lower_Net import LowerNet
    from Config.config import Config

    torch.manual_seed(0)
    rng = np.random.RandomState(42)
    os.makedirs(OUT, exist_ok=True)

    b, l, n = 2, 20, 128

    # Plausible inputs: cloud with zero-padded rows, small head motion.
    cloud = rng.randn(b, l, n, 6).astype(np.float32)
    # zero out a trailing block of points per frame to mimic padding
    for bi in range(b):
        for li in range(l):
            k = rng.randint(20, 80)
            idx = rng.choice(n, size=k, replace=False)
            cloud[bi, li, idx] = 0.0
    # Bone vectors identical across the batch, as in the released data (the
    # calibration runs once globally).  The reference's FK tiles bones with
    # ``.repeat(L, ...)`` which mis-pairs batch elements when bone sets
    # differ; with shared bones both the reference's and our (correct)
    # pairing coincide, which is the real-data regime.
    bones = np.tile((rng.randn(1, 20, 3) * 0.2).astype(np.float32), (b, 1, 1))
    # random rotations via the reference's own rot6d
    from Net.IMU_Net import compute_rotation_matrix_from_ortho6d
    r6 = torch.from_numpy(rng.randn(b * l, 6).astype(np.float32))
    r = compute_rotation_matrix_from_ortho6d(r6).view(b, l, 3, 3)
    t = torch.from_numpy((rng.randn(b, l, 3) * 0.1).astype(np.float32))
    imu = rng.randn(b, l, 20, 15).astype(np.float32)

    h0 = torch.zeros((6, b, 64))
    c0 = torch.zeros((6, b, 64))

    # ---- Upper_Net with shipped checkpoint --------------------------------
    upper = UpperNet()
    upper.load_state_dict(torch.load(Config.model_upper_path, map_location="cpu"))
    upper.eval()
    cloud_t = torch.from_numpy(cloud.copy())
    with torch.no_grad():
        up_l, up_q, _, _, _ = upper(cloud_t, h0, c0, torch.from_numpy(bones), r, t)
    cloud_after_upper = cloud_t.numpy().copy()  # mutated in place by Transform2H

    # ---- Lower_Net with shipped checkpoint --------------------------------
    lower = LowerNet(hidden_dim=64)
    lower.load_state_dict(torch.load(Config.model_lower_path, map_location="cpu"))
    lower.eval()
    cloud_t2 = torch.from_numpy(cloud_after_upper.copy())
    with torch.no_grad():
        low_l, low_q = lower(up_l.clone(), cloud_t2, h0, c0, h0, c0,
                             torch.from_numpy(bones), r, t)

    np.savez_compressed(
        os.path.join(OUT, "cascade_parity.npz"),
        cloud=cloud, bones=bones, r=r.numpy(), t=t.numpy(), imu=imu,
        cloud_after_upper=cloud_after_upper,
        upper_l=up_l.numpy(), upper_q=up_q.numpy(),
        lower_l=low_l.numpy(), lower_q=low_q.numpy(),
    )

    # ---- IMU_Net with random-but-recorded weights -------------------------
    # No shipped checkpoint exists; parity is still checked against the torch
    # module with freshly initialised weights, which we export alongside.
    # hidden=32 keeps the fixture small; the wiring is identical to the
    # production hidden=512 configuration (sizes are constructor args).
    imu_net = IMUNet(15, 9, 32, 2, True, 0.1)
    imu_net.eval()
    imu_t = torch.from_numpy(imu)
    with torch.no_grad():
        r_imu, t_imu = imu_net(imu_t)
    sd = {k: v.numpy() for k, v in imu_net.state_dict().items()}
    np.savez_compressed(
        os.path.join(OUT, "imu_parity.npz"),
        imu=imu, r=r_imu.numpy(), t=t_imu.numpy(),
        **{f"sd__{k}": v for k, v in sd.items()},
    )
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
