"""Checkpoint/resume: interrupted runs finish with identical results."""

import numpy as np

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.io.checkpoint import SimulationCheckpointer
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.solver.engine import run_2d_crank_nicolson


def _problem():
    mask = np.ones((2, 10), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = 1e-4
    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.6,
        dx=1.0,
        store_every=3,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=3.0,
        num_energy_bins=5,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    return kw


def _compare(a, b):
    times_a, frames_a, mass_a, clim_a, ef_a, _ = a
    times_b, frames_b, mass_b, clim_b, ef_b, _ = b
    np.testing.assert_allclose(times_a, times_b, atol=0)
    assert mass_a == mass_b
    for fa, fb in zip(frames_a, frames_b):
        np.testing.assert_array_equal(np.nan_to_num(fa), np.nan_to_num(fb))
    for ta, tb in zip(ef_a, ef_b):
        for ba, bb in zip(ta, tb):
            np.testing.assert_array_equal(np.nan_to_num(ba), np.nan_to_num(bb))


def test_resume_reproduces_uninterrupted_run(tmp_path):
    kw = _problem()
    baseline = run_2d_crank_nicolson(**kw)

    # "interrupted" run: stop after 0.3 ns (half the steps)
    ck = SimulationCheckpointer(tmp_path / "ck")
    partial = run_2d_crank_nicolson(**{**kw, "total_time": 0.3}, checkpointer=ck)
    assert ck.all_steps() == [0, 1, 2]  # t=0 plus two stored segments

    # resumed run with the full horizon picks up from the checkpoints
    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    _compare(baseline, resumed)
    # all snapshots now present
    assert ck2.all_steps() == [0, 1, 2, 3, 4]


def test_fresh_checkpointer_records_everything(tmp_path):
    kw = _problem()
    ck = SimulationCheckpointer(tmp_path / "ck")
    out = run_2d_crank_nicolson(**kw, checkpointer=ck)
    # stored: t=0 + steps 3, 6, 9, 12 -> 5 snapshots
    assert len(ck.all_steps()) == len(out[0])
    latest = ck.latest()
    assert latest["step"] == 12
    np.testing.assert_allclose(latest["time_ns"], 0.6, atol=1e-12)
    # checkpointed state matches the final energy frame
    final_energy = np.asarray(out[4][-1])
    np.testing.assert_allclose(
        np.nan_to_num(final_energy), np.asarray(latest["q"]) * (final_energy == final_energy),
        atol=1e-12,
    )


def test_resume_from_unaligned_interruption(tmp_path):
    # A run interrupted at a horizon that is NOT a store_every multiple wrote
    # a forced final-step checkpoint (step 5 here, boundaries are 0/3/6/...).
    # The resume must ignore that unaligned snapshot — replaying it used to
    # desynchronize the segment skip logic (stored times drifted past
    # total_time and part of a segment integrated twice).
    kw = _problem()
    baseline = run_2d_crank_nicolson(**kw)

    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(**{**kw, "total_time": 0.25}, checkpointer=ck)
    assert [ck.restore(i)["step"] for i in ck.all_steps()] == [0, 3, 5]

    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    _compare(baseline, resumed)
    # the stale step-5 checkpoint was replaced by this run's aligned stores
    assert [ck2.restore(i)["step"] for i in ck2.all_steps()] == [0, 3, 6, 9, 12]


def test_resume_with_longer_history_replays_only_this_horizon(tmp_path):
    # Checkpoints from a LONGER previous run: a shorter-horizon resume
    # replays only the prefix its own plan stores and runs nothing new.
    kw = _problem()
    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(**kw, checkpointer=ck)  # full 0.6 horizon
    short = {**kw, "total_time": 0.3}
    baseline = run_2d_crank_nicolson(**short)
    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**short, checkpointer=ck2)
    _compare(baseline, resumed)


def test_resume_from_complete_run_is_noop(tmp_path):
    kw = _problem()
    ck = SimulationCheckpointer(tmp_path / "ck")
    first = run_2d_crank_nicolson(**kw, checkpointer=ck)
    ck2 = SimulationCheckpointer(tmp_path / "ck")
    second = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    _compare(first, second)


def test_scalar_mode_resume_reproduces_uninterrupted_run(tmp_path):
    kw = _problem()
    # scalar (energy-integrated legacy) branch: no energy grid, no collisions
    for key in (
        "energy_gap",
        "energy_min_factor",
        "energy_max_factor",
        "num_energy_bins",
        "enable_recombination",
        "enable_scattering",
    ):
        kw.pop(key)
    baseline = run_2d_crank_nicolson(**kw)

    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(**{**kw, "total_time": 0.3}, checkpointer=ck)
    assert ck.all_steps() == [0, 1, 2]

    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    times_a, frames_a, mass_a, *_ = baseline
    times_b, frames_b, mass_b, *_ = resumed
    np.testing.assert_allclose(times_a, times_b, atol=0)
    assert mass_a == mass_b
    for fa, fb in zip(frames_a, frames_b):
        np.testing.assert_array_equal(np.nan_to_num(fa), np.nan_to_num(fb))
    assert ck2.all_steps() == [0, 1, 2, 3, 4]


def test_phase_timer_and_trace(tmp_path):
    import jax.numpy as jnp

    from qpsim_tpu.utils.profiling import PhaseTimer, trace

    timer = PhaseTimer()
    x = jnp.ones((64, 64))
    with timer.phase("matmul", block_on=None):
        y = x @ x
    with timer.phase("matmul", block_on=y):
        y = y @ x
    report = timer.report()
    assert "matmul" in report and "x2" in report
    assert timer.as_dict()["matmul"]["calls"] == 2

    with trace(str(tmp_path / "trace")):
        (x @ x).block_until_ready()
    # a trace directory with at least one event file appears
    assert any((tmp_path / "trace").rglob("*"))


def test_mesh_path_resume_reproduces_uninterrupted_run(tmp_path):
    """Checkpoint/resume composes with the multi-chip mesh= hot loop: a
    preempted sharded run must resume to the same results (production
    preemption-recovery story for multi-chip runs)."""
    import jax

    from qpsim_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_space=2, devices=jax.devices()[:2])
    kw = {**_problem(), "strang_mode": "exact", "mesh": mesh}
    baseline = run_2d_crank_nicolson(**kw)
    # the mesh route matches the single-chip engine at the established
    # equivalence tier (reduction order differs at the last ulp)
    single = run_2d_crank_nicolson(**{k: v for k, v in kw.items() if k != "mesh"})
    np.testing.assert_allclose(baseline[2], single[2], rtol=1e-12)

    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(**{**kw, "total_time": 0.3}, checkpointer=ck)
    assert ck.all_steps() == [0, 1, 2]

    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    _compare(baseline, resumed)
    assert ck2.all_steps() == [0, 1, 2, 3, 4]


def test_resume_with_fused_generation_pallas_backend(tmp_path):
    """Resume identity holds on the fused-generation collision path
    (collision_backend='pallas' + pulse): interrupted and uninterrupted
    runs match bit-for-bit."""
    from qpsim_tpu.models.params import ExternalGenerationSpec

    kw = _problem()
    kw.update(
        collision_backend="pallas",
        external_generation=ExternalGenerationSpec(
            mode="pulse", pulse_start=0.1, pulse_duration=0.2, pulse_rate=2e-5
        ),
    )
    baseline = run_2d_crank_nicolson(**kw)

    ck = SimulationCheckpointer(tmp_path / "ck")
    run_2d_crank_nicolson(**{**kw, "total_time": 0.3}, checkpointer=ck)
    ck2 = SimulationCheckpointer(tmp_path / "ck")
    resumed = run_2d_crank_nicolson(**kw, checkpointer=ck2)
    _compare(baseline, resumed)
