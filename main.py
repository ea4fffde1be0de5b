#!/usr/bin/env python
"""CLI entry point -- same surface as the reference ``main.py``:

    python main.py --train --network {IMU_Net,Upper_Net,Lower_Net}
    python main.py --infer [--vis] [--colab]
"""

from mmego_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
