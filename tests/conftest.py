"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), the standard JAX substitute for
real multi-chip hardware (SURVEY.md §4).
"""

import os

# Force CPU with 8 virtual devices. A sitecustomize may have registered a
# TPU plugin and pinned jax_platforms before this file runs, so override the
# jax config directly (env vars alone are too late for that path); XLA_FLAGS
# still works because backends initialize lazily on first use.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ASSETS = REPO / "assets"


@pytest.fixture(scope="session")
def assets_dir() -> pathlib.Path:
    if not (ASSETS / "cornell_box.obj").exists():
        subprocess.run([sys.executable, str(REPO / "tools" / "make_assets.py")],
                       check=True)
    return ASSETS


@pytest.fixture(scope="session")
def cornell_scene(assets_dir):
    import tpu_pt
    return tpu_pt.load_scene(str(assets_dir / "cornell_box.obj"))


@pytest.fixture(scope="session")
def mixed_scene(assets_dir):
    import tpu_pt
    return tpu_pt.load_scene(str(assets_dir / "cornell_box_mixed.obj"))
