"""Command-line interface -- reproduces the reference ``main.py:7-23`` surface.

    python main.py --train --network {IMU_Net,Upper_Net,Lower_Net} [...]
    python main.py --infer [--vis] [--colab] [...]

Precedence is CLI > config profile > defaults (reference README.md:207-208),
implemented by functional dataclass replacement rather than class mutation.
``--device`` is accepted for surface compatibility; device selection on this
framework follows JAX platform configuration (e.g. JAX_PLATFORMS).
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from mmego_tpu.config import Config, demo_config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="mmEgo-TPU: train / evaluate the three-stage pose cascade")
    parser.add_argument("--network", type=str,
                        choices=["IMU_Net", "Upper_Net", "Lower_Net"],
                        help="which stage to train")
    parser.add_argument("--train", action="store_true",
                        help="run the selected stage's training loop")
    parser.add_argument("--infer", action="store_true",
                        help="evaluate the full cascade on the demo split")
    parser.add_argument("--vis", action="store_true",
                        help="render per-action skeleton animations")
    parser.add_argument("--colab", action="store_true",
                        help="notebook mode (inline-friendly output paths)")
    parser.add_argument("--epochs", type=int, help="max training epochs")
    parser.add_argument("--lr", type=float, help="Adam learning rate")
    parser.add_argument("--device", type=str,
                        help="accepted for compatibility; use JAX_PLATFORMS")
    parser.add_argument("--batch_size", type=int, help="training batch size")
    parser.add_argument("--log_dir", type=int,
                        help="run index naming the runs/<idx>/ output tree")
    parser.add_argument("--load_IMU_path", type=str,
                        help="IMU_Net checkpoint (.npz native or torch .pth)")
    parser.add_argument("--load_Upper_path", type=str,
                        help="Upper_Net checkpoint (.npz native or torch .pth)")
    parser.add_argument("--load_Lower_path", type=str,
                        help="Lower_Net checkpoint (.npz native or torch .pth)")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the run")
    parser.add_argument("--upper_local", action="store_true",
                        help="use the anchor-voxel UpperNetwlocal variant "
                             "for --train --network Upper_Net")
    parser.add_argument("--ensemble", type=str,
                        help="comma-separated checkpoint-stack directories "
                             "(or 'headline') for --infer: prediction-level "
                             "ensemble metric block")
    parser.add_argument("--augment_overlap", action="store_true",
                        help="train-time phase-shifted window augmentation "
                             "(leakage-free; train/augment.py)")
    parser.add_argument("--augment_cloud_sigma", type=float,
                        help="train-time Gaussian xyz jitter (metres) on "
                             "real cloud points")
    return parser


def config_from_args(args, demo: bool = False) -> Config:
    cfg = demo_config() if demo else Config()
    over = {}
    if args.colab:
        over["colab"] = True
    if args.epochs is not None:
        over["epochs"] = args.epochs
    if args.lr is not None:
        over["lr"] = args.lr
    if args.batch_size is not None:
        over["batch_size"] = args.batch_size
    if args.log_dir is not None:
        over["idx"] = args.log_dir
    if args.load_IMU_path is not None:
        over["model_imu_path"] = args.load_IMU_path
    if args.load_Upper_path is not None:
        over["model_upper_path"] = args.load_Upper_path
    if args.load_Lower_path is not None:
        over["model_lower_path"] = args.load_Lower_path
    if args.upper_local:
        over["upper_local"] = True
    if args.augment_overlap:
        over["augment_overlap"] = True
    if args.augment_cloud_sigma is not None:
        over["augment_cloud_sigma"] = args.augment_cloud_sigma
    return cfg.replace(**over)


def main(argv: Optional[Sequence[str]] = None) -> int:
    from mmego_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    args = build_parser().parse_args(argv)

    if args.train:
        from mmego_tpu.train import loop
        cfg = config_from_args(args)
        if args.profile:
            import jax
            jax.profiler.start_trace(f"{cfg.report_root}/profile")
        try:
            if args.network == "IMU_Net":
                loop.train_imu(cfg)
            elif args.network == "Upper_Net":
                loop.train_upper(cfg)
            elif args.network == "Lower_Net":
                loop.train_lower(cfg)
            else:
                raise SystemExit("--train requires --network")
        finally:
            if args.profile:
                import jax
                jax.profiler.stop_trace()
        return 0

    if args.infer:
        cfg = config_from_args(args, demo=True)
        if args.profile:
            import jax
            jax.profiler.start_trace(f"{cfg.report_root}/profile")
        if args.vis:
            from mmego_tpu.viz import demo
            demo.render_actions(cfg)
        elif args.ensemble:
            from mmego_tpu import infer
            infer.evaluate_ensemble(cfg, args.ensemble.split(","))
        else:
            from mmego_tpu import infer
            from mmego_tpu.viz import curves
            m = infer.evaluate(cfg, return_preds=False)
            curves.draw_joint_bar(m["per_joint_cm"].tolist(), cfg)
        if args.profile:
            import jax
            jax.profiler.stop_trace()
        return 0

    build_parser().print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
