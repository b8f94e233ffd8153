"""Persistence round-trips, NaN encoding, suite manifest v3, cache staleness."""

import json

import numpy as np
import pytest

from qpsim_tpu.fields import default_initial_condition
from qpsim_tpu.geometry.mask import create_intrinsic_geometry
from qpsim_tpu.io import storage
from qpsim_tpu.io.precompute import precompute_arrays, validate_precomputed
from qpsim_tpu.models.params import (
    BoundaryCondition,
    SetupData,
    SimulationParameters,
    SimulationResultData,
    TestCaseResultData,
    TestGeometryGroupData,
    TestSuiteData,
)


def _params(**over):
    base = dict(
        diffusion_coefficient=6.0,
        dt=0.1,
        total_time=1.0,
        mesh_size=1.0,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=4.0,
        num_energy_bins=8,
    )
    base.update(over)
    return SimulationParameters(**base)


def _setup():
    geo = create_intrinsic_geometry(width=16, height=12)
    bcs = {e.edge_id: BoundaryCondition(kind="dirichlet", value=0.5) for e in geo.edges}
    return SetupData(
        setup_id="abc123def456",
        name="My Setup #1",
        created_at="2026-08-16T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=_params(),
        initial_condition=default_initial_condition(),
    )


def test_frame_nan_roundtrip():
    frame = np.array([[1.0, np.nan], [np.nan, -2.5]])
    encoded = storage.frame_to_jsonable(frame)
    assert encoded == [[1.0, None], [None, -2.5]]
    back = storage.frame_from_jsonable(encoded)
    assert np.isnan(back[0, 1]) and np.isnan(back[1, 0])
    assert back[0, 0] == 1.0 and back[1, 1] == -2.5


def test_setup_roundtrip(tmp_path):
    setup = _setup()
    path = storage.save_setup(setup, tmp_path / "setup.json")
    loaded = storage.load_setup(path)
    assert loaded.setup_id == setup.setup_id
    assert loaded.name == setup.name
    assert loaded.parameters.energy_gap == 180.0
    assert loaded.parameters.tau_s == 440.0  # tau_0 default applied
    assert np.array_equal(np.asarray(loaded.geometry.mask), np.asarray(setup.geometry.mask))
    assert len(loaded.geometry.edges) == len(setup.geometry.edges)
    assert loaded.boundary_conditions[setup.geometry.edges[0].edge_id].kind == "dirichlet"
    # initial condition canonicalised on load
    assert loaded.initial_condition.spatial_kind == "gaussian"


def test_setup_deserialize_tolerates_missing_fields():
    payload = {
        "setup_id": "x",
        "name": "n",
        "geometry": {
            "name": "g",
            "source_path": "p",
            "layer": 0,
            "mesh_size": 1.0,
            "mask": [[1]],
            "edges": [],
        },
        "parameters": {
            "diffusion_coefficient": 1.0,
            "dt": 0.1,
            "total_time": 1.0,
            "mesh_size": 1.0,
        },
    }
    setup = storage.deserialize_setup(payload)
    assert setup.parameters.num_energy_bins == 50
    assert setup.parameters.external_generation.mode == "none"


def test_simulation_roundtrip(tmp_path):
    frame = [[1.0, None], [None, 0.5]]
    result = SimulationResultData(
        simulation_id="sim123",
        setup_id="s1",
        setup_name="demo run",
        created_at="2026-08-16T00:00:00+00:00",
        times=[0.0, 0.1],
        frames=[frame, frame],
        mass_over_time=[1.0, 0.9],
        color_limits=[0.0, 1.0],
        metadata={"note": "x"},
        phonon_frames=[frame, frame],
        phonon_metadata={"mode": "fixed_temperature"},
    )
    path = storage.save_simulation(result, tmp_path / "sim.json")
    loaded = storage.load_simulation(path)
    assert loaded.simulation_id == "sim123"
    assert loaded.frames == [frame, frame]
    assert loaded.phonon_metadata == {"mode": "fixed_temperature"}
    assert loaded.energy_bins is None


def test_precompute_sidecar_roundtrip_and_staleness(tmp_path):
    geo = create_intrinsic_geometry(width=12, height=10)
    mask = np.asarray(geo.mask, dtype=bool)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    params = _params(gap_expression="return 180.0 + 20.0*x")
    pre = precompute_arrays(mask, geo.edges, bcs, params, include_collision_kernels=True)
    assert not bool(pre["is_uniform"])
    assert "K_r_all" in pre and pre["K_r_all"].shape[0] == int(mask.sum())

    setup_path = tmp_path / "s.json"
    storage.save_precomputed(setup_path, pre)
    assert storage.precomputed_exists(setup_path)
    loaded = storage.load_precomputed(setup_path)
    assert validate_precomputed(loaded, params, mask) is None
    # staleness: parameter changed
    msg = validate_precomputed(loaded, _params(dynes_gamma=0.3), mask)
    assert msg is not None and "dynes_gamma" in msg
    # staleness: mask changed
    other = np.asarray(create_intrinsic_geometry(width=12, height=11).mask, dtype=bool)
    msg = validate_precomputed(loaded, params, other)
    assert msg is not None and ("mismatch" in msg)
    # missing key
    broken = dict(loaded)
    del broken["D_array"]
    assert "D_array" in validate_precomputed(broken, params, mask)


def _suite():
    case = TestCaseResultData(
        case_id="c1",
        title="t",
        boundary_label="b",
        formula_latex="f",
        initial_condition_latex="i",
        description="d",
        x=[0.0, 1.0],
        times=[0.0],
        simulated=[[1.0, None]],
        analytic=[[1.0, 0.0]],
    )
    group = TestGeometryGroupData(
        geometry_id="strip_1d",
        title="Strip",
        description="",
        view_mode="line1d",
        preview_mask=[[1, 1]],
        cases=[case],
    )
    return TestSuiteData(suite_id="suite1", created_at="now", geometry_groups=[group])


def test_suite_manifest_v3_roundtrip(tmp_path):
    path = storage.save_test_suite(_suite(), tmp_path / "suite.json")
    manifest = json.loads(path.read_text())
    assert manifest["metadata"]["format_version"] >= 3
    assert manifest["geometry_groups"][0]["cases"] == []  # sidecar-only
    assert (tmp_path / "suite" / "strip_1d.json").exists()

    # lazy load: no cases until group requested
    lazy = storage.load_test_suite(path, load_group_cases=False)
    assert lazy.geometry_groups[0].cases == []
    group = storage.load_test_geometry_group(path, "strip_1d")
    assert len(group.cases) == 1 and group.cases[0].case_id == "c1"

    eager = storage.load_test_suite(path)
    assert len(eager.cases) == 1


def test_suite_sidecar_path_escape_rejected(tmp_path):
    path = storage.save_test_suite(_suite(), tmp_path / "suite.json")
    manifest = json.loads(path.read_text())
    manifest["geometry_groups"][0]["group_file"] = "../evil.json"
    path.write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="escapes suite directory"):
        storage.load_test_geometry_group(path, "strip_1d")


def test_legacy_flat_suite_rejected():
    with pytest.raises(ValueError, match="Legacy flat-case"):
        storage.deserialize_test_suite({"suite_id": "x", "cases": [{}]})


def test_missing_sidecar_fails_cleanly(tmp_path):
    path = storage.save_test_suite(_suite(), tmp_path / "suite.json")
    (tmp_path / "suite" / "strip_1d.json").unlink()
    with pytest.raises(ValueError, match="Failed to load geometry group"):
        storage.load_test_suite(path)
    # but lazy load (manifest only) still works
    lazy = storage.load_test_suite(path, load_group_cases=False)
    assert lazy.geometry_groups[0].case_count == 1


def test_estimate_precompute_memory_accounting():
    from qpsim_tpu.io.precompute import estimate_precompute_memory

    base = estimate_precompute_memory(100, 8, True)
    assert base == 8 * (8 * 100 + 8 + 100)
    uni = estimate_precompute_memory(100, 8, True, include_collision_kernels=True)
    assert uni == base + 8 * (2 * 64 + 16)
    nonuni = estimate_precompute_memory(100, 8, False, include_collision_kernels=True)
    # per-pixel kernels dominate: 2·P·NE² + 2·P·NE floats
    assert nonuni == base + 8 * (2 * 100 * 64 + 2 * 100 * 8)
    assert nonuni > uni


def test_corrupt_setup_json_raises_value_error(tmp_path):
    """Structural damage (missing keys, wrong types) surfaces as ValueError
    — the CLI's clean-error contract — not KeyError/TypeError (mutation
    fuzz found those leaking through the raw deserializers)."""
    import copy
    import json
    import random

    setup = _setup()
    path = storage.save_setup(setup, tmp_path / "s.json")
    payload = json.loads(path.read_text())
    rng = random.Random(7)

    def mutate(obj):
        o = copy.deepcopy(obj)
        paths = []

        def rec(y, p):
            if isinstance(y, dict):
                for k, v in y.items():
                    paths.append(p + [k])
                    rec(v, p + [k])
            elif isinstance(y, list) and y:
                paths.append(p + [0])
                rec(y[0], p + [0])

        rec(o, [])
        sel = rng.choice(paths)
        target = o
        for k in sel[:-1]:
            target = target[k]
        action = rng.randrange(3)
        if action == 0 and isinstance(target, dict):
            del target[sel[-1]]
        elif action == 1:
            target[sel[-1]] = rng.choice([None, "xyz", [1, 2], {"a": 1}])
        else:
            target[sel[-1]] = "X"
        return o

    failures = 0
    for _ in range(150):
        (tmp_path / "m.json").write_text(json.dumps(mutate(payload)))
        try:
            storage.load_setup(tmp_path / "m.json")
        except ValueError:
            failures += 1
        # any other exception type propagates and fails the test
    assert failures > 20


def test_corrupt_precompute_sidecar_raises_value_error(tmp_path):
    import numpy as np

    sp = tmp_path / "x.json"
    sp.write_text("{}")
    storage.save_precomputed(sp, {"a": np.ones(3)})
    npz = tmp_path / "x.precompute.npz"
    npz.write_bytes(npz.read_bytes()[:17])  # truncated zip
    with pytest.raises(ValueError, match="Corrupt precompute sidecar"):
        storage.load_precomputed(sp)
