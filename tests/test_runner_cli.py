"""High-level runner and CLI workflows."""

import json

import numpy as np
import pytest

from qpsim_tpu.cli import main as cli_main
from qpsim_tpu.fields import default_initial_condition
from qpsim_tpu.geometry.mask import create_intrinsic_geometry
from qpsim_tpu.io.storage import load_simulation, save_setup
from qpsim_tpu.models.params import (
    BoundaryCondition,
    ExternalGenerationSpec,
    SetupData,
    SimulationParameters,
)
from qpsim_tpu.runner import run_setup


def _setup(export_phonons=False, collisions=True, gen_mode="none"):
    geo = create_intrinsic_geometry(width=16, height=10)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    params = SimulationParameters(
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.3,
        mesh_size=1.0,
        store_every=2,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=3.0,
        num_energy_bins=6,
        enable_recombination=collisions,
        enable_scattering=collisions,
        bath_temperature=0.2,
        export_phonon_history=export_phonons,
        external_generation=ExternalGenerationSpec(
            mode=gen_mode, pulse_start=0.0, pulse_duration=0.1, pulse_rate=1e-5
        ),
    )
    ic = default_initial_condition()
    ic.spatial_kind = "uniform"
    ic.spatial_params = {"value": 1e-4}
    return SetupData(
        setup_id="deadbeef0001",
        name="runner test",
        created_at="2026-08-16T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=params,
        initial_condition=ic,
    )


def test_run_setup_closed_system_diagnostics(tmp_path):
    result, path = run_setup(_setup(), save=True, save_path=tmp_path / "out.json")
    assert path is not None
    meta = result.metadata
    assert meta["diagnostics_mode"] == "conservation_residual"
    res = np.asarray(meta["energy_exchange_residual"])
    totals = np.asarray(meta["energy_qp_total"]) + np.asarray(meta["energy_phonon_total"])
    assert res[0] == 0.0
    # collisions conserve E_qp + E_ph up to integrator splitting error
    assert np.max(np.abs(res)) / max(1e-30, totals[0]) < 1e-3
    # round-trips through storage
    loaded = load_simulation(path)
    assert loaded.metadata["diagnostics_mode"] == "conservation_residual"
    assert loaded.energy_bins is not None
    assert loaded.phonon_frames is None  # export_phonon_history off


def test_run_setup_exports_phonons_when_requested(tmp_path):
    result, _ = run_setup(
        _setup(export_phonons=True), save=True, save_path=tmp_path / "out.json"
    )
    assert result.phonon_frames is not None
    assert result.phonon_energy_frames is not None
    assert result.phonon_metadata["mode"] == "dynamic_local_coupled"


def test_run_setup_open_system_mode(tmp_path):
    result, _ = run_setup(_setup(gen_mode="pulse"), save=False)
    assert result.metadata["diagnostics_mode"] == "open_system"
    # pulse injects energy: residual grows positive
    assert result.metadata["energy_exchange_residual"][-1] > 0


def test_cli_run_and_validate(tmp_path, capsys):
    setup = _setup()
    setup_path = save_setup(setup, tmp_path / "s.json")
    rc = cli_main(["run", str(setup_path), "--output", str(tmp_path / "sim.json")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "stored frames" in out
    assert (tmp_path / "sim.json").exists()

    rc = cli_main(["info"])
    assert rc == 0
    assert "qpsim_tpu" in capsys.readouterr().out


def test_cli_precompute_and_gds_info(tmp_path, capsys):
    setup = _setup()
    setup.parameters.gap_expression = "return 180.0 + 10.0 * x"
    setup_path = save_setup(setup, tmp_path / "s.json")
    rc = cli_main(["precompute", str(setup_path), "--kernels"])
    assert rc == 0
    assert (tmp_path / "s.precompute.npz").exists()
    # and the runner picks the sidecar up (no stale reason recorded)
    from qpsim_tpu.io.storage import load_setup

    result, _ = run_setup(load_setup(setup_path), setup_path=setup_path, save=False)
    assert "precompute_stale_reason" not in result.metadata

    from qpsim_tpu.geometry.gds import write_gds

    gds = write_gds(
        tmp_path / "c.gds",
        {"TOP": [(1, np.array([[0, 0], [10, 0], [10, 5], [0, 5]], dtype=float))]},
    )
    rc = cli_main(["gds-info", str(gds)])
    out = capsys.readouterr().out
    assert rc == 0 and "layer 1: 1 flattened polygons" in out


def test_cli_export_gds_round_trip(tmp_path, capsys):
    setup = _setup()
    setup_path = save_setup(setup, tmp_path / "s.json")
    out_path = tmp_path / "mask.gds"
    rc = cli_main(["export-gds", str(setup_path), str(out_path)])
    assert rc == 0 and out_path.exists()

    from qpsim_tpu.geometry.gds import read_gds_polygons
    from qpsim_tpu.geometry.mask import mask_from_lists
    from qpsim_tpu.geometry.raster import rasterize_polygons

    mask = mask_from_lists(setup.geometry.mask)
    dx = float(setup.geometry.mesh_size)
    polys = [p.points for p in read_gds_polygons(out_path)]
    back = rasterize_polygons(
        polys,
        (np.arange(mask.shape[1]) + 0.5) * dx,
        (np.arange(mask.shape[0]) + 0.5) * dx,
    )
    np.testing.assert_array_equal(back, mask)


def test_select_frame_indices_specs():
    from qpsim_tpu.ui.playback import select_frame_indices

    assert select_frame_indices(5, "all") == [0, 1, 2, 3, 4]
    assert select_frame_indices(5, "last") == [4]
    assert select_frame_indices(5, "first") == [0]
    assert select_frame_indices(5, "0,2,-1") == [0, 2, 4]
    assert select_frame_indices(5, "1:4") == [1, 2, 3]
    assert select_frame_indices(5, "::2") == [0, 2, 4]
    assert select_frame_indices(0, "all") == []
    with pytest.raises(ValueError):
        select_frame_indices(5, "7")
    with pytest.raises(ValueError):
        select_frame_indices(5, "1:2:3:4")


def test_cli_view_renders_pngs(tmp_path, capsys):
    setup = _setup(export_phonons=True)
    setup_path = save_setup(setup, tmp_path / "s.json")
    sim_path = tmp_path / "sim.json"
    rc = cli_main(["run", str(setup_path), "--output", str(sim_path)])
    assert rc == 0
    capsys.readouterr()

    out_dir = tmp_path / "imgs"
    rc = cli_main([
        "view", str(sim_path), "--out", str(out_dir),
        "--frames", "0,-1", "--phonons", "--bin", "0",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "wrote" in out
    result = load_simulation(sim_path)
    last = len(result.frames) - 1
    expected = {
        f"frame_{0:04d}.png", f"frame_{last:04d}.png",
        f"phonon_{0:04d}.png", f"phonon_{last:04d}.png",
        f"bin0_{0:04d}.png", f"bin0_{last:04d}.png",
        "mass.png",
    }
    assert {p.name for p in out_dir.iterdir()} == expected
    for p in out_dir.iterdir():
        assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n", p

    # default output dir + frame subset, no phonons/mass
    rc = cli_main(["view", str(sim_path), "--frames", "last", "--no-mass"])
    assert rc == 0
    default_dir = sim_path.parent / "sim_frames"
    assert sorted(p.name for p in default_dir.iterdir()) == [f"frame_{last:04d}.png"]


def test_cli_view_errors(tmp_path, capsys):
    setup = _setup(export_phonons=False)
    setup_path = save_setup(setup, tmp_path / "s.json")
    sim_path = tmp_path / "sim.json"
    assert cli_main(["run", str(setup_path), "--output", str(sim_path)]) == 0
    capsys.readouterr()
    # no phonon frames stored -> clean CLI error, not a traceback
    rc = cli_main(["view", str(sim_path), "--out", str(tmp_path / "o"), "--phonons"])
    assert rc == 2
    assert "phonon" in capsys.readouterr().err
    rc = cli_main(["view", str(sim_path), "--out", str(tmp_path / "o2"), "--bin", "99"])
    assert rc == 2
    assert "bin" in capsys.readouterr().err


def _tiny_suite():
    from qpsim_tpu.models.params import (
        TestCaseResultData,
        TestGeometryGroupData,
        TestSuiteData,
    )

    def case(cid, mode, simulated, analytic, x, times):
        return TestCaseResultData(
            case_id=cid, title=f"case {cid}", boundary_label="reflective",
            formula_latex="n(x,t)", initial_condition_latex="n_0",
            description="tiny", x=x, times=times,
            simulated=simulated, analytic=analytic,
            metadata={"view_mode": mode},
        )

    line = case(
        "line_a", "line1d",
        [[1.0, 2.0, 1.0], [0.5, 1.0, 0.5]], [[1.0, 2.0, 1.0], [0.5, 1.0, 0.5]],
        [0.0, 1.0, 2.0], [0.0, 1.0],
    )
    heat = case(
        "heat_a", "heatmap2d",
        [[[1.0, None], [2.0, 3.0]], [[0.5, None], [1.0, 1.5]]],
        [[[1.0, None], [2.0, 3.0]], [[0.5, None], [1.0, 1.5]]],
        [0.0, 1.0], [0.0, 1.0],
    )
    ts = case(
        "ts_a", "timeseries",
        [[3.0, 2.0, 1.5, 1.2]], [[3.0, 2.0, 1.5, 1.2]],
        [0.0, 0.5, 1.0, 1.5], [1.5],
    )
    groups = [
        TestGeometryGroupData(
            geometry_id="strip", title="strip", description="", view_mode="line1d",
            preview_mask=[[1]], cases=[line], case_count=1,
        ),
        TestGeometryGroupData(
            geometry_id="rect", title="rect", description="", view_mode="heatmap2d",
            preview_mask=[[1]], cases=[heat], case_count=1,
        ),
        TestGeometryGroupData(
            geometry_id="ode", title="ode", description="", view_mode="timeseries",
            preview_mask=[[1]], cases=[ts], case_count=1,
        ),
    ]
    return TestSuiteData(
        suite_id="abc123def456", created_at="2026-08-18T00:00:00+00:00",
        cases=[line, heat, ts], geometry_groups=groups,
    )


def test_cli_view_tests_renders_all_modes(tmp_path, capsys):
    from qpsim_tpu.io.storage import save_test_suite

    manifest = save_test_suite(_tiny_suite(), tmp_path / "suite.json")
    out = tmp_path / "imgs"
    rc = cli_main(["view-tests", str(manifest), "--out", str(out), "--frames", "all"])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    names = {str(p.relative_to(out)) for p in out.rglob("*.png")}
    assert names == {
        "strip/line_a/frame_0000.png", "strip/line_a/frame_0001.png",
        "rect/heat_a/frame_0000.png", "rect/heat_a/frame_0001.png",
        "ode/ts_a/timeseries.png",
    }
    for p in out.rglob("*.png"):
        assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"

    # group + case filters; lazy group loading path (load_group_cases=False)
    out2 = tmp_path / "imgs2"
    rc = cli_main([
        "view-tests", str(manifest), "--out", str(out2),
        "--group", "rect", "--case", "heat_a",
    ])
    capsys.readouterr()
    assert rc == 0
    assert {str(p.relative_to(out2)) for p in out2.rglob("*.png")} == {
        "rect/heat_a/frame_0001.png"  # default --frames last
    }

    # non-matching filter -> clean CLI error
    rc = cli_main(["view-tests", str(manifest), "--out", str(tmp_path / "x"),
                   "--group", "nope"])
    assert rc == 2
    assert "no cases matched" in capsys.readouterr().err


def test_cli_view_gif(tmp_path, capsys):
    setup = _setup()
    setup_path = save_setup(setup, tmp_path / "s.json")
    sim_path = tmp_path / "sim.json"
    assert cli_main(["run", str(setup_path), "--output", str(sim_path)]) == 0
    out = tmp_path / "imgs"
    rc = cli_main(["view", str(sim_path), "--out", str(out), "--gif", "--no-mass"])
    capsys.readouterr()
    assert rc == 0
    gif = out / "movie.gif"
    assert gif.exists() and gif.read_bytes()[:6] in (b"GIF87a", b"GIF89a")
    from PIL import Image

    with Image.open(gif) as im:
        assert getattr(im, "n_frames", 1) == len(load_simulation(sim_path).frames)


def test_cli_profile(tmp_path, capsys):
    setup_path = save_setup(_setup(), tmp_path / "s.json")
    rc = cli_main([
        "profile", str(setup_path), "--steps", "4",
        "--trace-dir", str(tmp_path / "trace"),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "ms/step" in out and "compile" in out
    assert any((tmp_path / "trace").rglob("*"))  # trace events landed
    # bad --steps -> clean CLI error
    assert cli_main(["profile", str(setup_path), "--steps", "0"]) == 2


def test_cli_compare(tmp_path, capsys):
    setup = _setup(export_phonons=True)
    setup_path = save_setup(setup, tmp_path / "s.json")
    a_path, b_path = tmp_path / "a.json", tmp_path / "b.json"
    assert cli_main(["run", str(setup_path), "--output", str(a_path)]) == 0
    assert cli_main(["run", str(setup_path), "--output", str(b_path)]) == 0
    capsys.readouterr()

    rc = cli_main(["compare", str(a_path), str(b_path)])
    out = capsys.readouterr().out
    assert rc == 0 and "MATCH" in out and "energy_frames" in out

    # perturb one stored frame -> mismatch reported, nonzero exit
    import json as _json
    payload = _json.loads(b_path.read_text())
    for row in payload["frames"][-1]:
        for i, v in enumerate(row):
            if v is not None:
                row[i] = v * 1.5
    b_path.write_text(_json.dumps(payload))
    rc = cli_main(["compare", str(a_path), str(b_path)])
    out = capsys.readouterr().out
    assert rc == 1 and "DIFFER" in out and "frames" in out


def test_run_setup_freeze_phonons_passthrough(tmp_path):
    # frozen bath: recombination loses energy to the substrate silently, so
    # the diagnostics must NOT claim a conservation residual, and the flag
    # must actually reach the engine (trajectories differ)
    dynamic, _ = run_setup(_setup(), save=False)
    frozen, _ = run_setup(_setup(), save=False, freeze_phonon_dynamics=True)
    assert dynamic.metadata["diagnostics_mode"] == "conservation_residual"
    assert frozen.metadata["diagnostics_mode"] == "open_system"
    assert frozen.mass_over_time[-1] != dynamic.mass_over_time[-1]
    # an exported phonon history under a frozen bath is static over time
    frozen_exp, _ = run_setup(
        _setup(export_phonons=True), save=False, freeze_phonon_dynamics=True
    )
    ph = np.asarray(frozen_exp.phonon_energy_frames, dtype=float)
    assert np.array_equal(ph[0], ph[-1], equal_nan=True)
    dyn_exp, _ = run_setup(_setup(export_phonons=True), save=False)
    ph_dyn = np.asarray(dyn_exp.phonon_energy_frames, dtype=float)
    assert not np.array_equal(ph_dyn[0], ph_dyn[-1], equal_nan=True)


def test_cli_run_freeze_phonons(tmp_path, capsys):
    setup_path = save_setup(_setup(), tmp_path / "s.json")
    rc = cli_main(
        ["run", str(setup_path), "--output", str(tmp_path / "sim.json"),
         "--freeze-phonons"]
    )
    assert rc == 0
    sim = load_simulation(tmp_path / "sim.json")
    assert sim.metadata["diagnostics_mode"] == "open_system"


def test_run_setup_mesh_matches_plain(tmp_path):
    import jax

    from qpsim_tpu.parallel.mesh import make_mesh

    # mesh= needs a grid divisible by the space axis in both dimensions
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry

    setup = _setup()
    geo = create_intrinsic_geometry(width=16, height=16)
    setup.geometry = geo
    setup.boundary_conditions = {
        e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges
    }
    plain, _ = run_setup(setup, save=False)
    mesh = make_mesh(n_space=len(jax.devices()))
    sharded, _ = run_setup(setup, save=False, mesh=mesh)
    # both resolve strang auto identically; Wang reordering -> 1e-12
    np.testing.assert_allclose(
        sharded.mass_over_time, plain.mass_over_time, rtol=1e-11
    )
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(sharded.frames, dtype=float)),
        np.nan_to_num(np.asarray(plain.frames, dtype=float)),
        atol=1e-12,
    )


def test_cli_run_space_shards(tmp_path, capsys):
    import jax

    from qpsim_tpu.geometry.mask import create_intrinsic_geometry

    setup = _setup()
    geo = create_intrinsic_geometry(width=16, height=16)
    setup.geometry = geo
    setup.boundary_conditions = {
        e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges
    }
    setup_path = save_setup(setup, tmp_path / "s.json")
    n = len(jax.devices())
    rc = cli_main(
        ["run", str(setup_path), "--output", str(tmp_path / "sim.json"),
         "--space-shards", str(n)]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert f"space-sharded over {n} device(s)" in out
    assert (tmp_path / "sim.json").exists()

    # asking for more shards than devices fails cleanly
    rc = cli_main(
        ["run", str(setup_path), "--no-save", "--space-shards", str(n + 99)]
    )
    assert rc == 2
    assert "exceeds" in capsys.readouterr().err
    # zero / negative shard counts fail cleanly too (0 must not silently
    # run single-chip)
    for bad in ("0", "-2"):
        rc = cli_main(["run", str(setup_path), "--no-save", "--space-shards", bad])
        assert rc == 2
        assert ">= 1" in capsys.readouterr().err


def test_cli_qubit_sweep(capsys):
    """qubit-sweep: the Marchegiani-2025 regime sweep from the shell."""
    import json as _json

    rc = cli_main([
        "qubit-sweep", "--temps", "0.05", "0.25", "3", "--json",
    ])
    assert rc == 0
    rows = _json.loads(capsys.readouterr().out)
    assert len(rows) == 3
    assert rows[-1]["regime"] == "full_equilibrium"
    assert rows[0]["regime"] != "full_equilibrium"
    assert rows[0]["parity_hz"] >= 300.0  # photon floor
    # photons off: high-T point equilibrated, low-T exponentially empty
    rc = cli_main([
        "qubit-sweep", "--temps", "0.05", "0.25", "2", "--photons-off", "--json",
    ])
    assert rc == 0
    rows_off = _json.loads(capsys.readouterr().out)
    assert rows_off[-1]["regime"] == "full_equilibrium"
    assert rows_off[0]["x_L"] < rows[0]["x_L"]
