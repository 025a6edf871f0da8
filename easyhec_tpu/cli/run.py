"""Main CLI — offline / iterative calibration.

The replacement for the reference's tools/run_easyhec.py (argparse + yacs +
DDP bootstrapping, tools/run_easyhec.py:25-110). Usage:

    python -m easyhec_tpu.cli.run -c configs/franka_offline.yaml \
        [solver.max_lr=0.01 ...] [--iterative]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="easyhec_tpu calibration")
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("opts", nargs="*", help="dotted config overrides key=value")
    ap.add_argument("--iterative", action="store_true", help="run the online explore loop")
    args = ap.parse_args(argv)

    from ..config import load_config

    cfg = load_config(args.config_file, args.opts)

    # Multi-process rendezvous from env (the reference's WORLD_SIZE/
    # LOCAL_RANK + NCCL bootstrap, tools/run_easyhec.py:41-50).
    from ..parallel import maybe_init_from_env

    maybe_init_from_env()

    if args.iterative:
        from ..trainer import run_iterative

        result = run_iterative(cfg)
    else:
        from ..trainer import run_offline_calibration

        result = run_offline_calibration(cfg)
    print("solved Tc_c2b:")
    print(result.Tc_c2b)
    if result.metrics:
        print("metrics:", json.dumps(result.metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
