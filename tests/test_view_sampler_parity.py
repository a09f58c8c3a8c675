"""Regression guard: hinter sampling + view R,t BIT-IDENTICAL vs the
reference module (auto_pose/ae/pysixd_stuff/view_sampler.py:19-188).

The hinter ordering IS the codebook index semantics — row i of every
embedding maps to viewsphere_for_embedding[i] — so any ordering drift
silently corrupts pose lookups for imported reference checkpoints.
Skipped when the reference checkout isn't mounted.
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
REF_PYSIXD = os.path.join(REF, "auto_pose", "ae", "pysixd_stuff")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PYSIXD), reason="reference checkout not available"
)


def _load_reference_view_sampler():
    """Import the reference view_sampler as a package submodule (it does
    `from . import transform`) without triggering auto_pose's TF imports."""
    pkg_name = "_ref_pysixd_stuff"
    if pkg_name + ".view_sampler" in sys.modules:
        return sys.modules[pkg_name + ".view_sampler"]
    spec = importlib.util.spec_from_file_location(
        pkg_name,
        os.path.join(REF_PYSIXD, "__init__.py"),
        submodule_search_locations=[REF_PYSIXD],
    )
    pkg = importlib.util.module_from_spec(spec)
    sys.modules[pkg_name] = pkg
    spec.loader.exec_module(pkg)
    import importlib as _il

    return _il.import_module(pkg_name + ".view_sampler")


@pytest.fixture(scope="module")
def ref_vs():
    return _load_reference_view_sampler()


@pytest.mark.parametrize("min_n", [12, 42, 162, 642, 2562])
def test_hinter_sampling_points_and_levels_identical(ref_vs, min_n):
    from augmentedautoencoder_tpu.geometry import view_sampler

    pts_ref, lev_ref = ref_vs.hinter_sampling(min_n, radius=700.0)
    pts_ours, lev_ours = view_sampler.hinter_sampling(min_n, radius=700.0)
    assert len(pts_ours) == len(pts_ref)
    np.testing.assert_array_equal(np.asarray(lev_ours), np.asarray(lev_ref))
    # ordering is load-bearing: exact array equality, not set equality
    np.testing.assert_allclose(
        np.asarray(pts_ours), np.asarray(pts_ref), rtol=0, atol=1e-9
    )


@pytest.mark.parametrize("min_n", [12, 162, 642])
def test_sample_views_R_t_identical(ref_vs, min_n):
    from augmentedautoencoder_tpu.geometry import view_sampler

    views_ref, lev_ref = ref_vs.sample_views(min_n, radius=700.0)
    views_ours, lev_ours = view_sampler.sample_views(min_n, radius=700.0)
    assert len(views_ours) == len(views_ref)
    np.testing.assert_array_equal(np.asarray(lev_ours), np.asarray(lev_ref))
    for v_ours, v_ref in zip(views_ours, views_ref):
        np.testing.assert_allclose(v_ours["R"], v_ref["R"], rtol=0, atol=1e-9)
        np.testing.assert_allclose(v_ours["t"], v_ref["t"], rtol=0, atol=1e-9)


def test_sample_views_elev_range_filter_identical(ref_vs):
    """The upright/table-top cfg path restricts elevation (train cfgs use
    e.g. (-0.5*pi, 0.5*pi) or upper hemisphere only)."""
    from augmentedautoencoder_tpu.geometry import view_sampler

    rng = (0.0, 0.5 * math.pi)
    views_ref, _ = ref_vs.sample_views(162, radius=700.0, elev_range=rng)
    views_ours, _ = view_sampler.sample_views(162, radius=700.0, elev_range=rng)
    assert len(views_ours) == len(views_ref)
    for v_ours, v_ref in zip(views_ours, views_ref):
        np.testing.assert_allclose(v_ours["R"], v_ref["R"], rtol=0, atol=1e-9)
        np.testing.assert_allclose(v_ours["t"], v_ref["t"], rtol=0, atol=1e-9)
