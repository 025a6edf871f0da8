"""Live run monitor CLI — `python -m easyhec_tpu.cli.watch runs/<run>`.

Covers the reference's TensorBoard-during-training workflow
(easyhec/trainer/rbsolver.py:58-65: loss scalars every step + image grids
every 100-200 steps, watched live during a session) with a zero-dependency
dashboard: drops `live.html` in the run dir and serves it with the stdlib
HTTP server. Open http://localhost:<port>/live.html while a calibration
(offline or online) is writing metrics.jsonl + images/.
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="live run monitor")
    ap.add_argument("run_dir", help="run directory (output_dir of a run)")
    ap.add_argument("--port", type=int, default=8008)
    args = ap.parse_args(argv)

    from ..utils.live import DASHBOARD_NAME, serve, write_dashboard

    write_dashboard(args.run_dir)
    print(
        f"serving {args.run_dir} — open "
        f"http://localhost:{args.port}/{DASHBOARD_NAME}"
    )
    serve(args.run_dir, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
