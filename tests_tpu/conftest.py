"""Real-TPU contract tier.

`tests/` forces a virtual 8-device CPU mesh (tests/conftest.py), so the exact
numeric contracts are normally only proven off-hardware. This tier re-runs the
key exact-count contracts on the real chip — run it separately:

    python -m pytest tests_tpu/ -q

It is NOT collected by `python -m pytest tests/` (different directory, so the
CPU-forcing conftest never runs here and the axon TPU backend registered by
sitecustomize stays active). Every test is auto-marked `tpu` and skipped when
no TPU platform is available (e.g. plain CI hosts).
"""
import jax
import pytest

from gpu_voxels_tpu.utils.jitcache import enable_persistent_cache

# warm persistent compile cache: repeat hardware-tier runs skip the remote
# compiler entirely (cold compiles are 0.5 s - 4.5 min each through the relay)
enable_persistent_cache()


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


def pytest_runtest_setup(item):
    if jax.devices()[0].platform != "tpu":
        pytest.skip("real TPU chip required for the hardware contract tier")
