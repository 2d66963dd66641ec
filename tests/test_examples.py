"""Every example program runs headlessly and produces sane output."""
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


def _run(name):
    import importlib

    mod = importlib.import_module(name)
    return mod.main()


def test_collisions():
    assert _run("collisions") > 0


def test_swept_volume_vs_environment():
    assert _run("swept_volume_vs_environment") >= 1


def test_robot_vs_environment():
    _run("robot_vs_environment")


def test_distance_voxel_test():
    assert _run("distance_voxel_test") == 0  # all algorithms agree


def test_counting_voxel_list():
    assert _run("counting_voxel_list") >= 1


def test_shift_vs_transform():
    assert _run("shift_vs_transform") > 0


def test_urdf_loader():
    _run("urdf_loader")


def test_maps_demo():
    assert _run("maps_demo") > 0


def test_heightmap_demo():
    assert _run("heightmap_demo") > 0


def test_primitive_array():
    assert _run("primitive_array_test") == 10


def test_ompl_planning_demo():
    assert _run("ompl_planning_demo")


def test_distance_kinect_demo():
    c = _run("distance_kinect_demo")
    assert c is not None and c >= 0.0


def test_octree_bench():
    assert _run("octree_bench") >= 0


def test_full_pipeline_demo():
    assert _run("full_pipeline_demo")


def test_batch_worlds_demo():
    assert _run("batch_worlds_demo") >= 1


def test_swept_fitter():
    """The UR10-pair fitter finds exactly the two valid orderings and a
    nonzero conflict-free start delay (96^3 here; the example defaults to
    the reference-scale 256^3)."""
    import importlib

    mod = importlib.import_module("swept_fitter")
    n_solutions, delay = mod.main(dims=(96, 96, 96), side=0.04, verbose=False)
    assert n_solutions == 2
    assert delay > 0
