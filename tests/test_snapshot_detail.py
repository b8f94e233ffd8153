"""Light ("integrated") snapshots: on-device reductions instead of full-state pulls."""

import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.energy_grid import integration_widths_from_centers
from qpsim_tpu.solver.engine import run_2d_crank_nicolson


def _problem(total_time=0.5, store_every=3):
    mask = np.ones((3, 8), dtype=bool)
    mask[0, 0] = False  # non-trivial mask: junk outside must not leak into sums
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = 1e-4
    return dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=total_time,
        dx=1.0,
        store_every=store_every,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=3.0,
        num_energy_bins=5,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )


def test_integrated_matches_full_reduction():
    kw = _problem()
    ph_full: dict = {}
    t_f, f_f, m_f, c_f, ef_f, eb_f = run_2d_crank_nicolson(**kw, phonon_history_out=ph_full)
    ph_l: dict = {}
    t_l, f_l, m_l, c_l, ef_l, eb_l = run_2d_crank_nicolson(
        **kw, phonon_history_out=ph_l, snapshot_detail="integrated"
    )
    assert t_l == t_f
    assert ef_l is None  # per-bin histories are not recorded in light mode
    np.testing.assert_allclose(m_l, m_f, rtol=1e-12)
    np.testing.assert_allclose(c_l, c_f, rtol=1e-12)
    for a, b in zip(f_l, f_f):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), rtol=1e-12, atol=1e-30)
    # phonon history carries the integrated frames only
    assert ph_l["phonon_metadata"]["detail"] == "integrated"
    assert ph_l["phonon_energy_frames"] == []
    for a, b in zip(ph_l["phonon_frames"], ph_full["phonon_frames"]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), rtol=1e-12, atol=1e-30)


def test_integrated_stream_carries_bin_sums():
    from qpsim_tpu.io.stream import FrameStreamWriter, load_frame_stream
    import tempfile

    kw = _problem()
    ph_full: dict = {}
    _, _, _, _, ef_f, eb = run_2d_crank_nicolson(**kw, phonon_history_out=ph_full)
    mask = kw["mask"]

    d = tempfile.mkdtemp()
    ph_l: dict = {}
    with FrameStreamWriter(d, energy_bins=eb) as w:
        run_2d_crank_nicolson(
            **kw, phonon_history_out=ph_l, snapshot_detail="integrated", frame_sink=w
        )
    r = load_frame_stream(d)
    assert r.energy_frames(0) is None  # light shards carry vectors, not stacks
    for i in range(len(r)):
        # bin sums == per-bin pixel sums of the full run's energy frames
        expect = np.array([np.nansum(np.asarray(f)[mask]) for f in ef_f[i]])
        np.testing.assert_allclose(r.energy_bin_sums(i), expect, rtol=1e-12)
        ph_expect = np.array(
            [np.nansum(np.asarray(f)[mask]) for f in ph_full["phonon_energy_frames"][i]]
        )
        np.testing.assert_allclose(r.phonon_bin_sums(i), ph_expect, rtol=1e-12)
    # energy bookkeeping reconstructs exactly from the vectors
    widths = integration_widths_from_centers(np.asarray(eb), fallback_width=1.0)
    total_from_sums = float(np.sum(r.energy_bin_sums(0) * np.asarray(eb) * widths))
    total_from_frames = float(
        sum(
            np.nansum(np.asarray(ef_f[0][b])[mask]) * eb[b] * widths[b]
            for b in range(len(eb))
        )
    )
    np.testing.assert_allclose(total_from_sums, total_from_frames, rtol=1e-12)


def test_integrated_composes_with_checkpoint_resume(tmp_path):
    from qpsim_tpu.io.checkpoint import SimulationCheckpointer

    kw = _problem(total_time=0.6)
    baseline = run_2d_crank_nicolson(**kw, snapshot_detail="integrated")
    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(
        **{**kw, "total_time": 0.3}, checkpointer=ck, snapshot_detail="integrated"
    )
    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2, snapshot_detail="integrated")
    assert resumed[0] == baseline[0]
    np.testing.assert_allclose(resumed[2], baseline[2], rtol=1e-12)
    for a, b in zip(resumed[1], baseline[1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), rtol=1e-12, atol=1e-30)


def test_integrated_composes_with_mesh_path():
    import jax

    from qpsim_tpu.parallel.mesh import make_mesh

    kw = _problem()
    mask = np.ones((8, 8), dtype=bool)
    edges = extract_edge_segments(mask)
    kw.update(
        mask=mask,
        edges=edges,
        edge_conditions={e.edge_id: BoundaryCondition(kind="reflective") for e in edges},
        initial_field=np.where(mask, 1e-4, 0.0),
        num_energy_bins=4,
    )
    full = run_2d_crank_nicolson(
        **kw, diffusion_backend="adi", collision_backend="xla", strang_mode="exact"
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    # exact tier on both sides (mesh auto resolves to merged since r3)
    light = run_2d_crank_nicolson(
        **kw, mesh=mesh, snapshot_detail="integrated", strang_mode="exact"
    )
    assert light[0] == full[0]
    np.testing.assert_allclose(light[2], full[2], rtol=1e-12)
    for a, b in zip(light[1], full[1]):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)


def test_runner_integrated_stream_totals_match_full(tmp_path):
    from qpsim_tpu.fields import default_initial_condition
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry
    from qpsim_tpu.models.params import SetupData, SimulationParameters
    from qpsim_tpu.runner import run_setup

    geo = create_intrinsic_geometry(width=12, height=8)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    ic = default_initial_condition()
    ic.spatial_kind = "uniform"
    ic.spatial_params = {"value": 1e-4}
    setup = SetupData(
        setup_id="deadbeef0005",
        name="light stream",
        created_at="2026-08-18T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=SimulationParameters(
            diffusion_coefficient=6.0,
            dt=0.05,
            total_time=0.3,
            mesh_size=1.0,
            store_every=2,
            energy_gap=180.0,
            energy_max_factor=3.0,
            num_energy_bins=6,
            enable_recombination=True,
            enable_scattering=True,
            bath_temperature=0.2,
        ),
        initial_condition=ic,
    )
    plain, _ = run_setup(setup, save=False)
    light, _ = run_setup(
        setup,
        save=False,
        stream_dir=tmp_path / "frames",
        snapshot_detail="integrated",
    )
    np.testing.assert_allclose(
        light.metadata["energy_qp_total"], plain.metadata["energy_qp_total"], rtol=1e-12
    )
    np.testing.assert_allclose(
        light.metadata["energy_phonon_total"],
        plain.metadata["energy_phonon_total"],
        rtol=1e-12,
    )
    assert light.metadata["diagnostics_mode"] == plain.metadata["diagnostics_mode"]
    np.testing.assert_allclose(light.mass_over_time, plain.mass_over_time, rtol=1e-12)

    # without a stream there is nowhere to reconstruct the bookkeeping from
    with pytest.raises(ValueError, match="requires stream_dir"):
        run_setup(setup, save=False, snapshot_detail="integrated")


def test_snapshot_detail_validation():
    kw = _problem()
    with pytest.raises(ValueError, match="snapshot_detail"):
        run_2d_crank_nicolson(**kw, snapshot_detail="tiny")
    # scalar mode accepts the flag (integrated == full there)
    kw.update(energy_gap=0.0, total_time=0.2)
    times, *_ = run_2d_crank_nicolson(**kw, snapshot_detail="integrated")
    assert times[0] == 0.0
