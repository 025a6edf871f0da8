"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware (the reference has no multi-device tests at all; see
SURVEY.md §4).

Note: this machine pre-imports jax via sitecustomize (axon TPU tunnel), so
setting env vars here is too late for jax itself — we must go through
jax.config before any backend is initialized.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Default test tier: virtual 8-device CPU mesh. EASYHEC_TEST_TPU=1 keeps
# the hardware backend for the TPU-gated rehearsals (test_online_scale.py)
# — without this carve-out the unconditional cpu override made those tests
# unreachable (they skipped in every recorded run). NOTE: this machine
# exports JAX_PLATFORMS=axon globally, so the env var JAX_PLATFORMS cannot
# be used to tell "user wants TPU" from "machine default" — hence the
# dedicated opt-in.
if not os.environ.get("EASYHEC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def pytest_collection_modifyitems(config, items):
    """Two test tiers (round-3 verdict: the 16-minute default run meant the
    full suite was skipped before commits). Default `pytest tests/ -q` runs
    the FAST tier (slow-marked interpret-mode kernel suites skipped, ~2-3
    min); the full tier runs everything:

        EASYHEC_FULL_TESTS=1 pytest tests/ -q        # full tier
        pytest tests/ -q -m slow                     # slow tests only

    An explicit -m expression naming "slow" disables the auto-skip."""
    if os.environ.get("EASYHEC_FULL_TESTS"):
        return
    markexpr = config.getoption("-m") or ""
    if "slow" in markexpr:
        return
    skip = pytest.mark.skip(
        reason="slow tier (EASYHEC_FULL_TESTS=1 or -m slow to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def mini_rig():
    """Tiny 2-DoF procedural arm rig shared across tests: (chain, renderer,
    link_idx). Session-scoped so the mesh packing happens once."""
    import tempfile

    import jax.numpy as jnp

    from __graft_entry__ import MINI_URDF
    from easyhec_tpu.render import RobotRenderer, TileConfig
    from easyhec_tpu.robot import build_chain, load_link_meshes, parse_urdf

    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(MINI_URDF)
        path = f.name
    model = parse_urdf(path)
    chain = build_chain(model)
    links = ["base", "upper", "fore"]
    meshes = load_link_meshes(model, link_names=links)
    renderer = RobotRenderer(
        [meshes[n] for n in links], 48, 64, tile=TileConfig(16, 32, 64)
    )
    link_idx = jnp.asarray([chain.link_index(n) for n in links])
    return chain, renderer, link_idx
