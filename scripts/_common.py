"""Shared helpers for the run-recipe scripts.

One home for the two conventions every ladder/eval script needs, so the
artifact layout and the BN-state sidecar naming (``<ckpt stem>.state.npz``,
matching ``checkpoint/store`` writers and ``infer.load_cascade_params``)
cannot drift between copies.
"""

import os
import shutil

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = os.path.join(REPO_ROOT, "artifacts")


def stack_paths(name: str) -> dict:
    """Config overrides selecting the three stage checkpoints of
    ``artifacts/<name>/`` (``'headline'`` = the artifacts/ root defaults)."""
    if name == "headline":
        return {}
    d = os.path.join(ARTIFACTS, name)
    return dict(model_imu_path=os.path.join(d, "imu_net.ckpt.npz"),
                model_upper_path=os.path.join(d, "upper_net.ckpt.npz"),
                model_lower_path=os.path.join(d, "lower_net.ckpt.npz"))


def adopt(ckpt: str, dest: str, with_state: bool = True) -> None:
    """Install a trainer stop-checkpoint at ``dest`` (plus its ``.state.npz``
    BatchNorm sidecar when the stage has one)."""
    shutil.copy(ckpt, dest)
    if with_state:
        shutil.copy(os.path.splitext(ckpt)[0] + ".state.npz",
                    os.path.splitext(dest)[0] + ".state.npz")
