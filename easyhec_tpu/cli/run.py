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

        # No hardware adapters from the CLI: if the dataset dir carries a
        # synthetic GT (K.txt + Tc_c2b.txt from cli.simulate), run the
        # fully simulated closed loop against it — the reference's
        # simulator-as-oracle pattern, runnable end-to-end from the shell.
        import pathlib

        import numpy as np

        ddir = pathlib.Path(cfg.dataset.data_dir or "")
        kw = {}
        if (ddir / "K.txt").exists() and (ddir / "Tc_c2b.txt").exists():
            kw = {
                "K": np.loadtxt(ddir / "K.txt"),
                "Tc_c2b_gt": np.loadtxt(ddir / "Tc_c2b.txt"),
            }
            # captures go under the run dir — never clobber the GT dataset
            cfg.dataset.data_dir = ""
            print(f"simulated closed loop against GT from {ddir}")
            if cfg.model.init_Tc_c2b is None and cfg.model.init_method == "auto":
                # standard sim-smoke bootstrap: GT perturbed in se(3)
                # (set model.init_Tc_c2b or init_method to override)
                import jax.numpy as jnp

                from ..geometry import se3

                xi = np.asarray(
                    se3.log(jnp.asarray(kw["Tc_c2b_gt"], jnp.float32))
                )
                rng = np.random.default_rng(cfg.solver.seed)
                xi = (xi + rng.normal(0, 0.02, 6)).astype(np.float32)
                cfg.model.init_Tc_c2b = np.asarray(
                    se3.exp(jnp.asarray(xi))
                ).tolist()
                print("sim init: GT perturbed by sigma=0.02")
        result = run_iterative(cfg, **kw)
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
