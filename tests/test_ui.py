"""UI layer: Tk-independent logic headlessly; Tk widgets only with a display."""

import os
import queue
import time

import numpy as np
import pytest

from qpsim_tpu.fields import default_initial_condition
from qpsim_tpu.geometry.mask import create_intrinsic_geometry
from qpsim_tpu.models.params import (
    BoundaryCondition,
    SetupData,
    SimulationParameters,
    TestCaseResultData,
)
from qpsim_tpu.ui.playback import (
    PlaybackState,
    render_heatmap,
    render_line1d,
    render_timeseries,
)
from qpsim_tpu.ui.run_worker import SimulationWorker


def test_playback_state_loop_and_seek():
    st = PlaybackState(num_frames=5)
    assert st.step() == 1
    st.seek(4)
    assert st.step() == 0  # loops
    st.loop = False
    st.playing = True
    st.seek(3)
    st.step()
    assert st.index == 4 and not st.playing  # stops at the end
    assert st.seek(99) == 4
    assert st.toggle() is True


def test_render_functions_on_agg_backend(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib.figure import Figure

    fig = Figure()
    ax = fig.add_subplot(111)
    frame = np.full((4, 6), np.nan)
    frame[1:3, 1:5] = 1.0
    img = render_heatmap(ax, frame, clim=(0, 1), title="t")
    assert img.get_clim() == (0, 1)

    case = TestCaseResultData(
        case_id="c", title="T", boundary_label="b", formula_latex="f",
        initial_condition_latex="i", description="d",
        x=[0.5, 1.5, 2.5], times=[0.0, 0.1],
        simulated=[[1.0, 0.5, 0.2], [0.9, 0.45, 0.18]],
        analytic=[[1.0, 0.5, 0.2], [0.9, 0.45, 0.18]],
        metadata={"view_mode": "line1d"},
    )
    render_line1d(ax, case, 1)
    ts_case = TestCaseResultData(
        case_id="c2", title="T2", boundary_label="b", formula_latex="f",
        initial_condition_latex="i", description="d",
        x=[0.0, 1.0, 2.0], times=[0.0],
        simulated=[[0.5, 0.4, 0.3]], analytic=[[0.5, 0.4, 0.31]],
        metadata={"view_mode": "timeseries"},
    )
    render_timeseries(ax, ts_case)
    fig.savefig(tmp_path / "render.png")
    assert (tmp_path / "render.png").stat().st_size > 0


def test_simulation_worker_streams_and_completes():
    geo = create_intrinsic_geometry(width=14, height=10)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    ic = default_initial_condition()
    ic.spatial_kind = "uniform"
    ic.spatial_params = {"value": 1e-4}
    setup = SetupData(
        setup_id="ui0000000001", name="worker test", created_at="now",
        geometry=geo, boundary_conditions=bcs,
        parameters=SimulationParameters(
            diffusion_coefficient=6.0, dt=0.1, total_time=0.4, mesh_size=1.0,
            energy_gap=180.0, energy_max_factor=3.0, num_energy_bins=4,
            enable_recombination=True, enable_scattering=True, bath_temperature=0.2,
        ),
        initial_condition=ic,
    )
    worker = SimulationWorker(setup=setup, save=False)
    worker.start()
    deadline = time.time() + 120
    outcome = None
    frames = []
    while time.time() < deadline:
        frames.extend(worker.drain_live())
        outcome = worker.poll_result()
        if outcome is not None:
            break
        time.sleep(0.05)
    frames.extend(worker.drain_live())
    assert outcome is not None, "worker did not finish"
    kind, payload = outcome
    assert kind == "ok", payload
    result, path = payload
    assert path is None
    assert len(result.times) == 5
    assert len(frames) == 5  # t=0 plus 4 stored steps
    assert frames[0].time_ns == 0.0
    assert frames[-1].frame.shape == (10, 14)
    # double-start protection
    with pytest.raises(RuntimeError):
        worker.start()


def test_worker_surfaces_errors():
    geo = create_intrinsic_geometry(width=10, height=8)
    setup = SetupData(
        setup_id="ui0000000002", name="bad", created_at="now",
        geometry=geo, boundary_conditions={},  # missing BCs -> engine error
        parameters=SimulationParameters(
            diffusion_coefficient=6.0, dt=0.1, total_time=0.2, mesh_size=1.0,
        ),
        initial_condition=default_initial_condition(),
    )
    worker = SimulationWorker(setup=setup, save=False)
    worker.start()
    worker.join(60)
    kind, payload = worker.result.get_nowait()
    assert kind == "error"
    assert "boundary" in str(payload).lower()


@pytest.mark.skipif(not os.environ.get("DISPLAY"), reason="no display for Tk")
def test_tk_app_instantiates():
    from qpsim_tpu.ui.main_app import QuasiparticleMainApp

    app = QuasiparticleMainApp()
    app.update_idletasks()
    app.destroy()
