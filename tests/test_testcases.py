"""Analytic test-case engine: structure, persistence, and accuracy gates."""

import numpy as np
import pytest

from qpsim_tpu.geometry.raster import points_in_polygon, polygon_signed_area
from qpsim_tpu.io.storage import load_test_suite, save_test_suite
from qpsim_tpu.testcases.generator import (
    _annulus_eigenvalue,
    _donut_group,
    _recombination_group,
    _scattering_group,
    _strip_group,
    generate_test_suite,
)


def test_points_in_polygon_matches_matplotlib():
    from matplotlib.path import Path as MplPath

    rng = np.random.default_rng(0)
    for sides in (3, 5, 8, 20):
        angles = np.sort(rng.uniform(0, 2 * np.pi, sides))
        poly = np.column_stack([3 + 2 * np.cos(angles), 4 + 2 * np.sin(angles)])
        pts = rng.uniform(0, 8, (500, 2))
        mine = points_in_polygon(poly, pts)
        ref = MplPath(poly).contains_points(pts)
        # boundary-grazing points may legitimately differ; interior agreement
        disagree = np.sum(mine != ref)
        assert disagree <= 2, f"sides={sides}: {disagree} disagreements"


def test_signed_area_orientation():
    ccw = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    assert polygon_signed_area(ccw) == 4.0
    assert polygon_signed_area(ccw[::-1]) == -4.0


def test_strip_group_accuracy():
    group = _strip_group(nx=64, dx=1.0, D=25.0, dt=0.05, total_time=2.0, store_every=4)
    assert group.geometry_id == "strip_1d_effective"
    assert len(group.cases) == 10
    ids = {c.case_id for c in group.cases}
    assert {"reflective_mode1", "dirichlet_mode2", "robin_even_mode", "robin_odd_mode"} <= ids
    for case in group.cases:
        sim = np.asarray(case.simulated)
        ana = np.asarray(case.analytic)
        scale = max(1e-12, np.max(np.abs(ana)))
        err = np.max(np.abs(sim - ana)) / scale
        # CN + cell-centered BC discretisation: O(dt², dx²) accuracy
        assert err < 2e-2, f"{case.case_id}: rel err {err:.3e}"


def test_rectangle_and_donut_eigenmode_decay():
    # exact discrete decay is checked in diffusion tests; here gate the
    # PDE-level accuracy of one 2D group member each (cheap sizes)
    group = _donut_group(dx=1.0, D=25.0, dt=0.05, total_time=1.0, store_every=10)
    assert len(group.cases) == 4
    for case in group.cases:
        sim = np.asarray(case.simulated[-1], dtype=np.float64)
        ana = np.asarray(case.analytic[-1], dtype=np.float64)
        m = np.isfinite(ana)
        scale = max(1e-12, np.nanmax(np.abs(ana)))
        err = np.max(np.abs(sim[m] - ana[m])) / scale
        # polygonal-annulus rasterisation vs continuum Bessel mode
        assert err < 0.2, f"{case.case_id}: rel err {err:.3e}"


def test_annulus_eigenvalues_ordered():
    lam_dd = _annulus_eigenvalue(12.0, 27.0, 1, "dirichlet", "dirichlet")
    lam_dn = _annulus_eigenvalue(12.0, 27.0, 1, "dirichlet", "reflective")
    lam_nd = _annulus_eigenvalue(12.0, 27.0, 1, "reflective", "dirichlet")
    assert 0 < lam_dn < lam_dd
    assert 0 < lam_nd < lam_dd


def test_recombination_group_accuracy():
    group = _recombination_group()
    assert [c.case_id for c in group.cases] == [
        "recomb_pure_1_over_t",
        "recomb_equilibrium_stationarity",
        "recomb_decay_to_equilibrium",
    ]
    # Cases 1 and 3 deviate ~25% from the pure-ODE analytic because the
    # coupled solver's dynamic phonons re-break pairs — verified identical
    # (5e-15) to the reference engine's curves, which show the same gap.
    for case, tol in zip(group.cases, (0.3, 1e-4, 0.3)):
        sim = np.asarray(case.simulated[0])
        ana = np.asarray(case.analytic[0])
        scale = max(1e-12, np.max(np.abs(ana)))
        err = np.max(np.abs(sim - ana)) / scale
        assert err < tol, f"{case.case_id}: rel err {err:.3e}"
        # early times (before phonon feedback builds up) track the ODE closely
        k = max(2, len(sim) // 20)
        early = np.max(np.abs(sim[:k] - ana[:k])) / scale
        assert early < 0.02, f"{case.case_id}: early-time err {early:.3e}"


def test_scattering_group_accuracy():
    group = _scattering_group()
    assert [c.case_id for c in group.cases] == [
        "scat_top_bin_decay",
        "scat_equilibrium_stationarity",
    ]
    for case, tol in zip(group.cases, (0.05, 1e-3)):
        sim = np.asarray(case.simulated[0])
        ana = np.asarray(case.analytic[0])
        scale = max(1e-12, np.max(np.abs(ana)))
        err = np.max(np.abs(sim - ana)) / scale
        assert err < tol, f"{case.case_id}: rel err {err:.3e}"


@pytest.mark.slow
def test_full_suite_generation_and_roundtrip(tmp_path):
    suite = generate_test_suite(nx=32, total_time=1.0, store_every=8)
    assert len(suite.geometry_groups) == 5
    assert sum(len(g.cases) for g in suite.geometry_groups) == 28
    path = save_test_suite(suite, tmp_path / "suite.json")
    loaded = load_test_suite(path)
    assert len(loaded.cases) == 28
    assert {g.geometry_id for g in loaded.geometry_groups} == {
        "strip_1d_effective",
        "rectangle_2d",
        "polygon_donut",
        "recombination",
        "scattering",
    }
