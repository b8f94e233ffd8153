"""File-format contract tests against GENUINE reference-produced artifacts.

Two kinds of evidence, both mount-gated on /root/reference (skip cleanly
elsewhere), neither importing reference code into the package:

1. The reference repository ships two real ``.precompute.npz`` sidecars
   (``/root/reference/data/setups/``).  We load them through
   ``qpsim_tpu.io.storage.load_precomputed`` and regenerate every physics
   array from the 13-float fingerprint with qpsim_tpu's own kernels — the
   stored numbers must match ours to near machine precision.

2. Bidirectional round-trips: artifacts written by qpsim_tpu are read back
   with the reference's own ``qpsim.storage`` functions (and vice versa),
   and precompute payloads produced by either implementation validate in
   the other (reference ``storage.py:197-272``, ``precompute.py:79-148``).
"""

from __future__ import annotations

import shutil
import sys
from dataclasses import asdict
from pathlib import Path

import numpy as np
import pytest

_REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (_REFERENCE / "qpsim" / "storage.py").exists(),
    reason="reference implementation not mounted",
)

if (_REFERENCE / "qpsim").exists() and str(_REFERENCE) not in sys.path:
    sys.path.append(str(_REFERENCE))

_REAL_SIDECARS = sorted((_REFERENCE / "data" / "setups").glob("*.precompute.npz"))

# Fingerprint layout shared by both implementations (13 floats with kernels).
_FP = {
    "energy_gap": 0,
    "energy_min_factor": 1,
    "energy_max_factor": 2,
    "num_energy_bins": 3,
    "dynes_gamma": 4,
    "diffusion_coefficient": 5,
    "n_spatial": 6,
    "mask_hash": 7,
    "gap_expression": 8,
    "tau_s": 9,
    "tau_r": 10,
    "T_c": 11,
    "bath_temperature": 12,
}

# The two sidecars shipped in the reference repo predate its current
# fingerprint layout: the collision block sits BEFORE the spatial block
# (observed [gap, fmin, fmax, NE, gamma, D0, tau_s, tau_r, T_c, bath,
# n_spatial, mask_hash, gap_hash] — they would fail the reference's own
# current validator).  The physics arrays are layout-independent, so the
# regeneration test below detects the layout and proceeds either way.
_FP_LEGACY = dict(
    _FP,
    tau_s=6,
    tau_r=7,
    T_c=8,
    bath_temperature=9,
    n_spatial=10,
    mask_hash=11,
    gap_expression=12,
)


@pytest.mark.parametrize("npz_path", _REAL_SIDECARS, ids=lambda p: p.name.split(".")[0])
def test_real_reference_sidecar_regenerates_bitclose(npz_path, tmp_path):
    """Load a REAL reference-produced sidecar and regenerate it from scratch."""
    from qpsim_tpu.io import storage
    from qpsim_tpu.io.precompute import gap_expression_hash
    from qpsim_tpu.ops.dos import (
        diffusion_coefficient_of_energy,
        dynes_density_of_states,
        thermal_qp_weights,
    )
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import (
        recombination_kernel,
        scattering_kernel,
        thermal_generation_rate,
    )

    # Exercise the io path: sidecars are addressed by their setup JSON path.
    setup_path = tmp_path / npz_path.name.replace(".precompute.npz", ".json")
    shutil.copyfile(npz_path, storage.precompute_npz_path(setup_path))
    pre = storage.load_precomputed(setup_path)

    fp = np.asarray(pre["fingerprint"], dtype=np.float64).reshape(-1)
    assert fp.size == 13, "expected a with-kernels fingerprint"
    gap_values = np.asarray(pre["gap_values"], dtype=np.float64)
    layout = _FP if int(fp[_FP["n_spatial"]]) == gap_values.size else _FP_LEGACY
    gap = float(fp[layout["energy_gap"]])
    ne = int(fp[layout["num_energy_bins"]])
    n_spatial = int(fp[layout["n_spatial"]])

    E_stored = np.asarray(pre["E_bins"], dtype=np.float64)
    assert E_stored.size == ne
    assert gap_values.size == n_spatial
    assert np.asarray(pre["D_array"]).shape == (ne, n_spatial)

    # Uniform-gap sidecar: the gap expression hashes as the empty string and
    # every pixel's gap equals the scalar parameter.
    assert fp[layout["gap_expression"]] == gap_expression_hash("")
    assert bool(np.asarray(pre["is_uniform"]).reshape(-1)[0])
    np.testing.assert_allclose(gap_values, gap, rtol=1e-13)

    # Regenerate every physics array with qpsim_tpu's own implementations.
    E, dE = build_energy_grid(
        gap, float(fp[layout["energy_min_factor"]]), float(fp[layout["energy_max_factor"]]), ne
    )
    np.testing.assert_allclose(E, E_stored, rtol=1e-13)

    d0 = float(fp[layout["diffusion_coefficient"]])
    D = diffusion_coefficient_of_energy(d0, E[:, None], gap_values[None, :])
    np.testing.assert_allclose(D, pre["D_array"], rtol=1e-12)

    tau_s, tau_r = float(fp[layout["tau_s"]]), float(fp[layout["tau_r"]])
    t_c, bath = float(fp[layout["T_c"]]), float(fp[layout["bath_temperature"]])
    gamma = float(fp[layout["dynes_gamma"]])
    np.testing.assert_allclose(
        recombination_kernel(E, gap, tau_r, t_c, bath), pre["K_r"], rtol=1e-12
    )
    np.testing.assert_allclose(
        scattering_kernel(E, gap, tau_s, t_c, bath), pre["K_s"], rtol=1e-12, atol=1e-300
    )
    rho = dynes_density_of_states(E, gap, gamma)
    np.testing.assert_allclose(rho, pre["rho_bins"], rtol=1e-12)
    n_eq = thermal_qp_weights(E, gap, bath, gamma)
    np.testing.assert_allclose(
        thermal_generation_rate(n_eq, np.asarray(pre["K_r"]), dE),
        pre["G_therm"],
        rtol=1e-12,
        atol=1e-300,
    )


def _example_setup(make_params, make_geo, make_bc, make_ic, make_gen, make_setup):
    """Build one structurally rich setup out of the given constructors.

    The same builder is driven with qpsim_tpu's and the reference's
    dataclasses so the two sides are field-for-field comparable.
    """
    mask = [[1, 1, 1], [1, 1, 1]]
    geo = make_geo(
        name="compat-strip",
        source_path="",
        layer=1,
        mesh_size=0.5,
        mask=mask,
        edges=[],
        bounds=[0.0, 1.5, 0.0, 1.0],
    )
    bcs = {
        "e0": make_bc(kind="reflective"),
        "e1": make_bc(kind="dirichlet", value=0.25),
        "e2": make_bc(kind="robin", value=1.5, aux_value=0.75),
    }
    params = make_params(
        diffusion_coefficient=60.0,
        dt=0.05,
        total_time=1.0,
        mesh_size=0.5,
        store_every=2,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=8,
        dynes_gamma=0.18,
        enable_recombination=True,
        enable_scattering=True,
        tau_s=420.0,
        tau_r=460.0,
        T_c=1.2,
        bath_temperature=0.15,
        external_generation=make_gen(
            mode="pulse", pulse_start=0.1, pulse_duration=0.2, pulse_rate=3.0
        ),
    )
    ic = make_ic(
        spatial_kind="gaussian",
        spatial_params={"x0": 0.4, "y0": 0.6, "sigma": 0.1, "amplitude": 2.0},
        energy_kind="dos",
    )
    return make_setup(
        setup_id="cafecafecafe",
        name="compat strip",
        created_at="2026-08-19T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=params,
        initial_condition=ic,
    )


def _setup_payload(setup) -> dict:
    """Field-for-field dict with the IC canonicalized.

    Both loaders canonicalize the initial condition at deserialize time
    (empty phonon kinds become explicit defaults), so the written-then-read
    setup is compared against a canonicalized original — which also checks
    the two canonicalizers agree.
    """
    payload = asdict(setup)
    if type(setup).__module__.startswith("qpsim_tpu"):
        from qpsim_tpu.fields import canonicalize_initial_condition
    else:
        from qpsim.initial_conditions import canonicalize_initial_condition  # type: ignore
    payload["initial_condition"] = asdict(
        canonicalize_initial_condition(setup.initial_condition)
    )
    # framework-only extension field: a disabled photon drive writes no
    # JSON key (storage.serialize_setup), and the reference dataclasses
    # have no counterpart — excluded from the cross-implementation diff
    payload.get("parameters", {}).pop("photon_drive", None)
    return payload


def test_setup_json_roundtrip_ours_to_reference(tmp_path):
    import qpsim.models as ref_models  # type: ignore
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.models import params as tpu_models

    ours = _example_setup(
        tpu_models.SimulationParameters,
        tpu_models.GeometryData,
        tpu_models.BoundaryCondition,
        tpu_models.InitialConditionSpec,
        tpu_models.ExternalGenerationSpec,
        tpu_models.SetupData,
    )
    path = tmp_path / "ours.json"
    tpu_storage.save_setup(ours, path)

    theirs = ref_storage.load_setup(path)
    assert isinstance(theirs, ref_models.SetupData)
    assert _setup_payload(theirs) == _setup_payload(ours)


def test_setup_json_roundtrip_reference_to_ours(tmp_path):
    import qpsim.models as ref_models  # type: ignore
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.models import params as tpu_models

    theirs = _example_setup(
        ref_models.SimulationParameters,
        ref_models.GeometryData,
        ref_models.BoundaryCondition,
        ref_models.InitialConditionSpec,
        ref_models.ExternalGenerationSpec,
        ref_models.SetupData,
    )
    path = tmp_path / "theirs.json"
    ref_storage.save_setup(theirs, path)

    ours = tpu_storage.load_setup(path)
    assert isinstance(ours, tpu_models.SetupData)
    assert _setup_payload(ours) == _setup_payload(theirs)


def test_simulation_json_roundtrip_bidirectional(tmp_path):
    import qpsim.models as ref_models  # type: ignore
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.models import params as tpu_models

    frame = np.array([[1.0, np.nan], [0.25, 3.5]])
    kwargs = dict(
        simulation_id="beefbeefbeef",
        setup_id="cafecafecafe",
        setup_name="compat strip",
        created_at="2026-08-19T00:00:00+00:00",
        times=[0.0, 0.5],
        mass_over_time=[1.0, 0.875],
        color_limits=[0.0, 3.5],
        metadata={"note": "round-trip"},
        energy_bins=[181.0, 250.0],
    )

    ours = tpu_models.SimulationResultData(
        frames=[tpu_storage.frame_to_jsonable(frame)] * 2, **kwargs
    )
    path = tmp_path / "sim_ours.json"
    tpu_storage.save_simulation(ours, path)
    theirs = ref_storage.load_simulation(path)
    assert isinstance(theirs, ref_models.SimulationResultData)
    assert asdict(theirs) == asdict(ours)
    np.testing.assert_array_equal(
        ref_storage.frame_from_jsonable(theirs.frames[0]), frame
    )

    back_path = tmp_path / "sim_theirs.json"
    ref_storage.save_simulation(theirs, back_path)
    ours_again = tpu_storage.load_simulation(back_path)
    assert asdict(ours_again) == asdict(ours)
    np.testing.assert_array_equal(
        tpu_storage.frame_from_jsonable(ours_again.frames[0]), frame
    )


def _compat_mask_params():
    mask = np.ones((2, 3), dtype=bool)
    mask[0, 0] = False
    return mask


def test_precompute_payload_validates_in_reference(tmp_path):
    """qpsim_tpu-precomputed arrays pass the REFERENCE's staleness validator."""
    import qpsim.models as ref_models  # type: ignore
    import qpsim.precompute as ref_precompute  # type: ignore
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.io.precompute import precompute_arrays
    from qpsim_tpu.models.params import SimulationParameters

    mask = _compat_mask_params()
    p_kwargs = dict(
        diffusion_coefficient=60.0,
        dt=0.05,
        total_time=1.0,
        mesh_size=0.5,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=6,
        dynes_gamma=0.18,
        gap_expression="180 + 5*x",
        enable_recombination=True,
        enable_scattering=True,
        tau_s=420.0,
        tau_r=460.0,
        T_c=1.2,
        bath_temperature=0.15,
    )
    ours_params = SimulationParameters(**p_kwargs)
    payload = precompute_arrays(mask, [], {}, ours_params, include_collision_kernels=True)

    setup_path = tmp_path / "compat.json"
    tpu_storage.save_precomputed(setup_path, payload)
    loaded = ref_storage.load_precomputed(setup_path)

    ref_params = ref_models.SimulationParameters(**p_kwargs)
    assert ref_precompute.validate_precomputed(loaded, ref_params, mask) is None


def test_reference_precompute_validates_in_ours(tmp_path):
    """Reference-precomputed arrays pass qpsim_tpu's staleness validator
    AND match qpsim_tpu's own regenerated arrays."""
    import qpsim.models as ref_models  # type: ignore
    import qpsim.precompute as ref_precompute  # type: ignore
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.io.precompute import precompute_arrays, validate_precomputed
    from qpsim_tpu.models.params import SimulationParameters

    mask = _compat_mask_params()
    p_kwargs = dict(
        diffusion_coefficient=60.0,
        dt=0.05,
        total_time=1.0,
        mesh_size=0.5,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=6,
        dynes_gamma=0.18,
        gap_expression="180 + 5*x",
        enable_recombination=True,
        enable_scattering=True,
        tau_s=420.0,
        tau_r=460.0,
        T_c=1.2,
        bath_temperature=0.15,
    )
    ref_params = ref_models.SimulationParameters(**p_kwargs)
    ref_payload = ref_precompute.precompute_arrays(
        mask, [], {}, ref_params, include_collision_kernels=True
    )

    setup_path = tmp_path / "compat_ref.json"
    ref_storage.save_precomputed(setup_path, ref_payload)
    loaded = tpu_storage.load_precomputed(setup_path)

    ours_params = SimulationParameters(**p_kwargs)
    assert validate_precomputed(loaded, ours_params, mask) is None

    ours_payload = precompute_arrays(mask, [], {}, ours_params, include_collision_kernels=True)
    for key, mine in ours_payload.items():
        if key == "include_collision_kernels":
            continue  # qpsim_tpu extra; reference infers it from key presence
        assert key in loaded, f"reference payload missing {key}"
        np.testing.assert_allclose(
            np.asarray(mine, dtype=np.float64),
            np.asarray(loaded[key], dtype=np.float64),
            rtol=1e-12,
            atol=1e-300,
            err_msg=key,
        )


def test_test_suite_manifest_roundtrip_ours_to_reference(tmp_path):
    import qpsim.storage as ref_storage  # type: ignore

    from qpsim_tpu.io import storage as tpu_storage
    from qpsim_tpu.models import params as tpu_models

    case = tpu_models.TestCaseResultData(
        case_id="case-1",
        title="decay mode",
        boundary_label="dirichlet",
        formula_latex=r"e^{-t}",
        initial_condition_latex=r"\sin(\pi x)",
        description="first eigenmode",
        x=[0.0, 0.5, 1.0],
        times=[0.0, 1.0],
        simulated=[[0.0, 1.0, 0.0], [0.0, 0.5, 0.0]],
        analytic=[[0.0, 1.0, 0.0], [0.0, 0.5, 0.0]],
        metadata={"tolerance": 1e-3},
    )
    group = tpu_models.TestGeometryGroupData(
        geometry_id="strip",
        title="1D strip",
        description="effective 1D",
        view_mode="line1d",
        preview_mask=[[1, 1, 1]],
        cases=[case],
        case_count=1,
    )
    suite = tpu_models.TestSuiteData(
        suite_id="feedfeedfeed",
        created_at="2026-08-19T00:00:00+00:00",
        geometry_groups=[group],
        metadata={"source": "compat-test"},
    )
    manifest = tmp_path / "suite.json"
    tpu_storage.save_test_suite(suite, manifest)

    theirs = ref_storage.load_test_suite(manifest, load_group_cases=True)
    assert theirs.suite_id == suite.suite_id
    assert len(theirs.geometry_groups) == 1
    ref_group = theirs.geometry_groups[0]
    assert ref_group.geometry_id == "strip"
    assert ref_group.case_count == 1
    assert asdict(ref_group.cases[0]) == asdict(case)

    lazy = ref_storage.load_test_suite(manifest, load_group_cases=False)
    lazy_group = ref_storage.load_test_geometry_group(manifest, "strip")
    assert lazy.geometry_groups[0].cases == []
    assert asdict(lazy_group.cases[0]) == asdict(case)
