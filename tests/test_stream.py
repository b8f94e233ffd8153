"""Bounded-memory frame streaming: engine sink, writer/reader, runner, CLI."""

import json

import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.io.stream import FrameStreamReader, FrameStreamWriter, load_frame_stream
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.solver.engine import run_2d_crank_nicolson


def _coupled_kwargs():
    mask = np.ones((3, 8), dtype=bool)
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
        total_time=0.5,
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


def test_energy_resolved_stream_matches_in_memory(tmp_path):
    kw = _coupled_kwargs()
    ph_mem: dict = {}
    times, frames, mass, clim, ef, eb = run_2d_crank_nicolson(**kw, phonon_history_out=ph_mem)

    ph_str: dict = {}
    writer = FrameStreamWriter(tmp_path / "stream", energy_bins=eb)
    t2, f2, m2, clim2, ef2, eb2 = run_2d_crank_nicolson(
        **kw, phonon_history_out=ph_str, frame_sink=writer
    )
    writer.finalize(phonon_energy_bins=ph_str["phonon_energy_bins"])

    # streamed run returns no in-memory histories, everything else identical
    assert f2 == [] and ef2 is None
    assert t2 == times and m2 == mass
    np.testing.assert_allclose(clim2, clim)
    np.testing.assert_array_equal(eb2, eb)
    assert ph_str["phonon_frames"] == []
    assert ph_str["phonon_energy_frames"] == []
    assert ph_str["phonon_metadata"]["streamed"] is True

    # every streamed shard is bit-identical to the in-memory history
    reader = load_frame_stream(tmp_path / "stream")
    assert len(reader) == len(times)
    assert reader.times == times
    assert reader.mass_over_time == mass
    np.testing.assert_allclose(reader.color_limits, clim)
    for i in range(len(reader)):
        np.testing.assert_array_equal(reader.frame(i), frames[i])
        np.testing.assert_array_equal(reader.energy_frames(i), np.stack(ef[i]))
        np.testing.assert_array_equal(reader.phonon_frame(i), ph_mem["phonon_frames"][i])
        np.testing.assert_array_equal(
            reader.phonon_energy_frames(i), np.stack(ph_mem["phonon_energy_frames"][i])
        )
    np.testing.assert_array_equal(
        reader.phonon_energy_bins, np.asarray(ph_mem["phonon_energy_bins"])
    )


def test_scalar_stream_matches_in_memory(tmp_path):
    kw = _coupled_kwargs()
    kw.update(energy_gap=0.0, total_time=0.3, store_every=2)
    times, frames, mass, clim, *_ = run_2d_crank_nicolson(**kw)
    with FrameStreamWriter(tmp_path / "s") as writer:
        t2, f2, m2, clim2, *_ = run_2d_crank_nicolson(**kw, frame_sink=writer)
    assert f2 == [] and t2 == times and m2 == mass
    np.testing.assert_allclose(clim2, clim)
    reader = load_frame_stream(tmp_path / "s")
    for i in range(len(reader)):
        np.testing.assert_array_equal(reader.frame(i), frames[i])
    assert reader.energy_frames(0) is None  # scalar mode records no per-bin data


def test_stream_composes_with_checkpoint_resume(tmp_path):
    from qpsim_tpu.io.checkpoint import SimulationCheckpointer

    kw = _coupled_kwargs()
    baseline = run_2d_crank_nicolson(**kw)

    # interrupted streamed run: half the horizon, then a fresh process resumes
    ck = SimulationCheckpointer(tmp_path / "ck")
    w1 = FrameStreamWriter(tmp_path / "stream")
    run_2d_crank_nicolson(**{**kw, "total_time": 0.25}, checkpointer=ck, frame_sink=w1)
    # interrupted: never finalized -> reader refuses
    with pytest.raises(ValueError, match="not a finalized frame stream"):
        load_frame_stream(tmp_path / "stream")

    ck2 = SimulationCheckpointer(tmp_path / "ck")
    w2 = FrameStreamWriter(tmp_path / "stream")
    run_2d_crank_nicolson(**kw, checkpointer=ck2, frame_sink=w2)
    w2.finalize()

    reader = load_frame_stream(tmp_path / "stream")
    times, frames, mass, _, ef, _ = baseline
    assert reader.times == times and reader.mass_over_time == mass
    for i in range(len(reader)):
        np.testing.assert_array_equal(reader.frame(i), frames[i])
        np.testing.assert_array_equal(reader.energy_frames(i), np.stack(ef[i]))


def test_stream_composes_with_mesh_path(tmp_path):
    """A streamed mesh= run shards snapshots off-device identically."""
    import jax

    from qpsim_tpu.parallel.mesh import make_mesh

    kw = _coupled_kwargs()
    # mesh= needs a grid divisible by the space axis in both dimensions
    mask = np.ones((8, 8), dtype=bool)
    edges = extract_edge_segments(mask)
    kw.update(
        mask=mask,
        edges=edges,
        edge_conditions={e.edge_id: BoundaryCondition(kind="reflective") for e in edges},
        initial_field=np.where(mask, 1e-4, 0.0),
        num_energy_bins=4,
    )
    baseline = run_2d_crank_nicolson(
        **kw, diffusion_backend="adi", collision_backend="xla", strang_mode="exact"
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    with FrameStreamWriter(tmp_path / "m") as w:
        # exact tier on both sides (mesh auto resolves to merged since r3)
        t2, f2, m2, clim2, *_ = run_2d_crank_nicolson(
            **kw, mesh=mesh, frame_sink=w, strang_mode="exact"
        )
    times, frames, mass, clim, ef, _ = baseline
    assert t2 == times and f2 == []
    np.testing.assert_allclose(m2, mass, rtol=1e-12)
    reader = load_frame_stream(tmp_path / "m")
    for i in range(len(reader)):
        np.testing.assert_allclose(
            np.nan_to_num(reader.frame(i)), np.nan_to_num(frames[i]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.nan_to_num(reader.energy_frames(i)),
            np.nan_to_num(np.stack(ef[i])),
            atol=1e-12,
        )


def test_writer_validation(tmp_path):
    w = FrameStreamWriter(tmp_path / "v")
    with pytest.raises(ValueError, match="empty frame stream"):
        w.finalize()
    frame = np.ones((2, 2))
    w.write(0, 0.0, frame=frame, mass=1.0)
    w.write(2, 2.0, frame=frame, mass=1.0)  # gap at index 1
    with pytest.raises(ValueError, match="non-contiguous"):
        w.finalize()
    w.write(1, 1.0, frame=frame, mass=1.0)
    w.finalize()
    with pytest.raises(ValueError, match="finalized"):
        w.write(3, 3.0, frame=frame, mass=1.0)
    # exiting a writer context on an exception must NOT seal the stream
    with pytest.raises(RuntimeError):
        with FrameStreamWriter(tmp_path / "crash") as w2:
            w2.write(0, 0.0, frame=frame, mass=1.0)
            raise RuntimeError("simulated crash")
    assert not (tmp_path / "crash" / "manifest.json").exists()


def test_reader_validation(tmp_path):
    with pytest.raises(ValueError, match="not a finalized frame stream"):
        FrameStreamReader(tmp_path / "nothing")

    with FrameStreamWriter(tmp_path / "ok") as w:
        w.write(0, 0.0, frame=np.ones((2, 2)), mass=1.0)
        w.write(1, 1.0, frame=np.ones((2, 2)), mass=1.0)
    reader = load_frame_stream(tmp_path / "ok")
    with pytest.raises(IndexError):
        reader.frame(2)

    # a deleted shard surfaces as ValueError naming the shard
    (tmp_path / "ok" / "frame_000001.npz").unlink()
    with pytest.raises(ValueError, match="missing shard"):
        reader.frame(1)

    # a damaged shard surfaces as ValueError, not a zipfile traceback
    (tmp_path / "ok" / "frame_000000.npz").write_bytes(b"not an npz")
    with pytest.raises(ValueError, match="damaged"):
        reader.frame(0)

    # a damaged manifest surfaces as ValueError
    (tmp_path / "ok" / "manifest.json").write_text("{broken")
    with pytest.raises(ValueError, match="damaged"):
        FrameStreamReader(tmp_path / "ok")


def test_run_setup_stream_dir_matches_in_memory(tmp_path):
    from qpsim_tpu.fields import default_initial_condition
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry
    from qpsim_tpu.models.params import SetupData, SimulationParameters

    geo = create_intrinsic_geometry(width=12, height=8)
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
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    ic = default_initial_condition()
    ic.spatial_kind = "uniform"
    ic.spatial_params = {"value": 1e-4}
    setup = SetupData(
        setup_id="deadbeef0002",
        name="stream test",
        created_at="2026-08-18T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=params,
        initial_condition=ic,
    )

    from qpsim_tpu.runner import run_setup

    plain, _ = run_setup(setup, save=False)
    streamed, saved = run_setup(
        setup, save=True, save_path=tmp_path / "sim.json", stream_dir=tmp_path / "frames"
    )

    # energy bookkeeping computed on the fly matches the in-memory pass
    np.testing.assert_allclose(
        streamed.metadata["energy_qp_total"], plain.metadata["energy_qp_total"], rtol=1e-12
    )
    np.testing.assert_allclose(
        streamed.metadata["energy_phonon_total"],
        plain.metadata["energy_phonon_total"],
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        streamed.metadata["energy_exchange_residual"],
        plain.metadata["energy_exchange_residual"],
        atol=1e-18,
    )
    assert streamed.metadata["diagnostics_mode"] == plain.metadata["diagnostics_mode"]
    assert streamed.frames == [] and streamed.energy_frames is None
    assert streamed.metadata["streamed_frames_dir"] == str(tmp_path / "frames")

    # the saved JSON is frame-free (tiny) and the stream holds the frames
    payload = json.loads((tmp_path / "sim.json").read_text())
    assert payload["frames"] == []
    reader = load_frame_stream(tmp_path / "frames")
    assert len(reader) == len(plain.times)
    assert reader.metadata["simulation_id"] == streamed.simulation_id
    assert reader.metadata["energy_qp_total"] == streamed.metadata["energy_qp_total"]
    from qpsim_tpu.io.storage import frame_from_jsonable

    for i in range(len(reader)):
        np.testing.assert_array_equal(
            np.nan_to_num(reader.frame(i)),
            np.nan_to_num(frame_from_jsonable(plain.frames[i])),
        )


def test_estimate_history_memory():
    from qpsim_tpu.io.stream import estimate_history_memory

    # scalar: 5 steps / store_every 2 -> 2 stored + t=0 + forced final = 4
    est = estimate_history_memory(
        grid_shape=(10, 10), dt=0.1, total_time=0.5, store_every=2
    )
    assert est == 4 * 10 * 10 * 8
    # energy-resolved with phonons: frame + NE bins + (3NE-1) omega + 1
    est = estimate_history_memory(
        grid_shape=(10, 10),
        dt=0.1,
        total_time=0.5,
        store_every=2,
        num_energy_bins=8,
        record_phonons=True,
    )
    assert est == 4 * 10 * 10 * 8 * (1 + 8 + (3 * 8 - 1) + 1)
    # the flagship production case the warning exists for: ~128 GB+
    big = estimate_history_memory(
        grid_shape=(1024, 1024),
        dt=0.01,
        total_time=100.0,
        store_every=10,
        num_energy_bins=16,
    )
    assert big > 100 * 2**30


def test_cli_run_warns_when_history_exceeds_ram(tmp_path, capsys, monkeypatch):
    from qpsim_tpu.cli import main as cli_main
    from qpsim_tpu.fields import default_initial_condition
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry
    from qpsim_tpu.io.storage import save_setup
    from qpsim_tpu.models.params import SetupData, SimulationParameters

    geo = create_intrinsic_geometry(width=10, height=8)
    setup = SetupData(
        setup_id="deadbeef0004",
        name="warn test",
        created_at="2026-08-18T00:00:00+00:00",
        geometry=geo,
        boundary_conditions={
            e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges
        },
        parameters=SimulationParameters(
            diffusion_coefficient=6.0,
            dt=0.05,
            total_time=0.2,
            mesh_size=1.0,
            store_every=1,
            energy_gap=180.0,
            energy_max_factor=3.0,
            num_energy_bins=4,
            enable_recombination=True,
            enable_scattering=True,
            bath_temperature=0.2,
        ),
        initial_condition=default_initial_condition(),
    )
    setup_path = save_setup(setup, tmp_path / "s.json")
    # force the threshold below this tiny run's footprint -> warning fires
    monkeypatch.setenv("QPSIM_STREAM_WARN_GB", "1e-9")
    rc = cli_main(["run", str(setup_path), "--no-save"])
    captured = capsys.readouterr()
    assert rc == 0
    assert "consider --stream-dir" in captured.err
    # with --stream-dir the warning is moot and absent
    rc = cli_main(
        ["run", str(setup_path), "--no-save", "--stream-dir", str(tmp_path / "f")]
    )
    captured = capsys.readouterr()
    assert rc == 0
    assert "consider --stream-dir" not in captured.err


def test_cli_stream_run_and_view(tmp_path, capsys):
    from qpsim_tpu.cli import main as cli_main
    from qpsim_tpu.fields import default_initial_condition
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry
    from qpsim_tpu.io.storage import save_setup
    from qpsim_tpu.models.params import SetupData, SimulationParameters

    geo = create_intrinsic_geometry(width=10, height=8)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    setup = SetupData(
        setup_id="deadbeef0003",
        name="cli stream",
        created_at="2026-08-18T00:00:00+00:00",
        geometry=geo,
        boundary_conditions=bcs,
        parameters=SimulationParameters(
            diffusion_coefficient=6.0,
            dt=0.05,
            total_time=0.2,
            mesh_size=1.0,
            store_every=2,
            energy_gap=180.0,
            energy_max_factor=3.0,
            num_energy_bins=4,
            enable_recombination=True,
            enable_scattering=True,
            bath_temperature=0.2,
        ),
        initial_condition=default_initial_condition(),
    )
    setup_path = save_setup(setup, tmp_path / "s.json")
    stream = tmp_path / "frames"
    rc = cli_main(
        [
            "run",
            str(setup_path),
            "--output",
            str(tmp_path / "sim.json"),
            "--stream-dir",
            str(stream),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "frames streamed to" in out
    assert (stream / "manifest.json").exists()

    rc = cli_main(["view", str(stream), "--out", str(tmp_path / "imgs")])
    out = capsys.readouterr().out
    assert rc == 0 and "wrote" in out
    assert any((tmp_path / "imgs").glob("frame_*.png"))


def test_directory_reuse_invalidates_previous_manifest(tmp_path):
    """Rewriting into a finalized stream directory makes it visibly
    unfinalized until the new run's finalize — a crash mid-rerun can never
    be mistaken for the earlier run's complete stream."""
    d = tmp_path / "reuse"
    with FrameStreamWriter(d) as w:
        w.write(0, 0.0, frame=np.full((2, 2), 1.0), mass=1.0)
        w.write(1, 1.0, frame=np.full((2, 2), 1.0), mass=1.0)
    assert load_frame_stream(d).count == 2

    w2 = FrameStreamWriter(d)  # reuse: run B starts
    with pytest.raises(ValueError, match="not a finalized frame stream"):
        load_frame_stream(d)  # mid-run (or crashed) B must refuse to read
    w2.write(0, 0.0, frame=np.full((2, 2), 3.0), mass=3.0)
    w2.finalize()
    reader = load_frame_stream(d)
    assert reader.count == 1
    np.testing.assert_array_equal(reader.frame(0), np.full((2, 2), 3.0))


def test_finalize_removes_stale_higher_index_shards(tmp_path):
    """A shorter rerun into the same directory deletes the longer earlier
    run's leftover shards: the sealed directory is exactly [0, count)."""
    d = tmp_path / "stale"
    with FrameStreamWriter(d) as w:
        for i in range(4):
            w.write(i, float(i), frame=np.ones((2, 2)), mass=1.0)
    assert (d / "frame_000003.npz").exists()

    with FrameStreamWriter(d) as w2:
        w2.write(0, 0.0, frame=np.zeros((2, 2)), mass=0.0)
        w2.write(1, 1.0, frame=np.zeros((2, 2)), mass=0.0)
    assert not (d / "frame_000002.npz").exists()
    assert not (d / "frame_000003.npz").exists()
    assert load_frame_stream(d).count == 2


def test_lazy_shard_loads_fetch_only_requested_members(tmp_path):
    """Accessors decompress only the member they return (frame() never
    touches the per-bin stacks) and full loads still see every key."""
    d = tmp_path / "lazy"
    with FrameStreamWriter(d) as w:
        w.write(
            0, 0.0, frame=np.ones((2, 2)), mass=1.0,
            energy_frames=[np.ones((2, 2))] * 3,
            phonon_frame=np.ones((2, 2)),
        )
    reader = load_frame_stream(d)
    assert set(reader._load(0, ("frame",))) == {"frame"}
    assert set(reader._load(0, ("frame", "absent"))) == {"frame"}
    assert {"frame", "energy_frames", "phonon_frame"} <= set(reader._load(0))
    assert reader.energy_frames(0).shape == (3, 2, 2)
