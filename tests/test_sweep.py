"""Parameter-sweep layer: spec parsing, variant expansion, CLI workflow."""

import json

import numpy as np
import pytest

from qpsim_tpu.cli import main as cli_main
from qpsim_tpu.io.storage import load_simulation, save_setup
from qpsim_tpu.sweep import apply_overrides, build_variants, parse_vary, run_sweep

from test_runner_cli import _setup


def test_parse_vary_comma_list():
    field, values = parse_vary("tau_0=300,440,500")
    assert field == "tau_0"
    assert values == [300.0, 440.0, 500.0]


def test_parse_vary_linspace_inclusive():
    field, values = parse_vary("bath_temperature=0.1:0.3:3")
    assert field == "bath_temperature"
    assert values == pytest.approx([0.1, 0.2, 0.3])
    # single-point range collapses to the start
    assert parse_vary("dt=0.05:0.1:1")[1] == [0.05]


def test_parse_vary_typed_fields():
    assert parse_vary("store_every=2,4")[1] == [2, 4]
    assert parse_vary("enable_scattering=true,false")[1] == [True, False]
    field, values = parse_vary("external_generation.rate=1e-6,2e-6")
    assert field == "external_generation.rate"
    assert values == [1e-6, 2e-6]


@pytest.mark.parametrize(
    "bad",
    [
        "nonexistent_field=1,2",
        "external_generation.nope=1",
        "tau_0",  # no values
        "tau_0=",  # empty values
        "tau_0=abc",  # non-numeric
        "num_energy_bins=2.5",  # int field, fractional value
        "enable_diffusion=maybe",  # bool field, junk token
        "dt=0.1:0.2:0",  # zero-count range
        "dt=0.1:0.2",  # malformed range
    ],
)
def test_parse_vary_rejects(bad):
    with pytest.raises(ValueError):
        parse_vary(bad)


def test_apply_overrides_tau0_realiases():
    setup = _setup()
    # loaded setups carry concrete tau_s/tau_r; a tau_0 sweep must win
    assert setup.parameters.tau_s == setup.parameters.tau_0
    variant = apply_overrides(setup, {"tau_0": 300.0})
    assert variant.parameters.tau_s == 300.0
    assert variant.parameters.tau_r == 300.0
    assert variant.parameters.tau_0 == 300.0
    # the original is untouched
    assert setup.parameters.tau_0 != 300.0


def test_apply_overrides_generation_field():
    setup = _setup(gen_mode="constant")
    variant = apply_overrides(setup, {"external_generation.rate": 3e-6})
    assert variant.parameters.external_generation.rate == 3e-6
    assert setup.parameters.external_generation.rate != 3e-6


def test_parse_and_apply_photon_drive_axis():
    """photon_drive.<field> sweeps — the Fischer-2024 Q-vs-n̄ calibration
    curve as a one-line --vary axis."""
    import dataclasses

    import pytest

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.sweep import parse_vary

    field, values = parse_vary("photon_drive.occupancy=0:4:5")
    assert field == "photon_drive.occupancy"
    assert values == [0.0, 1.0, 2.0, 3.0, 4.0]
    with pytest.raises(ValueError, match="photon-drive"):
        parse_vary("photon_drive.nonsense=1,2")

    setup = _setup()
    setup = dataclasses.replace(
        setup,
        parameters=dataclasses.replace(
            setup.parameters,
            photon_drive=PhotonDriveSpec(
                mode="photon", photon_energy=450.0, coupling=1e-4
            ),
        ),
    )
    variant = apply_overrides(setup, {"photon_drive.occupancy": 2.5})
    assert variant.parameters.photon_drive.occupancy == 2.5
    assert setup.parameters.photon_drive.occupancy == 0.0


def test_build_variants_product_and_zip():
    setup = _setup()
    axes = [("tau_0", [300.0, 440.0]), ("bath_temperature", [0.1, 0.2, 0.3])]
    product = build_variants(setup, axes, "product")
    assert len(product) == 6
    assert product[0][0] == {"tau_0": 300.0, "bath_temperature": 0.1}
    assert product[-1][0] == {"tau_0": 440.0, "bath_temperature": 0.3}

    zipped = build_variants(
        setup, [("tau_0", [300.0, 440.0]), ("bath_temperature", [0.1, 0.2])], "zip"
    )
    assert len(zipped) == 2
    assert zipped[1][0] == {"tau_0": 440.0, "bath_temperature": 0.2}

    with pytest.raises(ValueError, match="equal-length"):
        build_variants(setup, axes, "zip")
    with pytest.raises(ValueError, match="mode"):
        build_variants(setup, axes, "diagonal")
    with pytest.raises(ValueError, match="at least one"):
        build_variants(setup, [], "product")


def test_build_variants_validates_corners():
    # an invalid corner (dt <= 0) fails at expansion time, before any run
    with pytest.raises(ValueError, match="dt"):
        build_variants(_setup(), [("dt", [0.05, -0.1])], "product")


def test_run_sweep_summary_and_results(tmp_path):
    setup = _setup()
    summary = run_sweep(
        setup,
        [("tau_0", [200.0, 800.0])],
        out_dir=tmp_path / "sweep",
        strang_mode="exact",
    )
    assert summary["n_variants"] == 2
    assert summary["n_failed"] == 0
    recs = summary["variants"]
    # faster Kaplan times relax harder: the swept physics must actually differ
    assert recs[0]["mass_final"] != recs[1]["mass_final"]
    for rec in recs:
        assert rec["mass_initial"] == pytest.approx(recs[0]["mass_initial"])
        loaded = load_simulation(rec["result_path"])
        assert loaded.times[-1] == pytest.approx(rec["final_time"])
    on_disk = json.loads((tmp_path / "sweep" / "sweep_summary.json").read_text())
    assert on_disk["axes"] == [{"field": "tau_0", "values": [200.0, 800.0]}]
    assert len(on_disk["variants"]) == 2


def test_run_sweep_isolates_failures(tmp_path):
    # variant 0 runs; variant 1 fails inside run_setup (negative bath temp
    # passes dataclass validation only via direct construction, so use a
    # generation mode the engine rejects instead: custom body that errors)
    setup = _setup(gen_mode="custom")
    setup.parameters.external_generation.custom_body = "return unknown_symbol"
    summary = run_sweep(
        setup,
        [("tau_0", [440.0])],
        out_dir=tmp_path / "sweep",
    )
    assert summary["n_failed"] == 1
    assert "error" in summary["variants"][0]
    # the summary is still written
    assert (tmp_path / "sweep" / "sweep_summary.json").exists()


def test_cli_sweep_end_to_end(tmp_path, capsys):
    setup_path = save_setup(_setup(), tmp_path / "s.json")
    out_dir = tmp_path / "out"
    rc = cli_main(
        [
            "sweep",
            str(setup_path),
            "--vary",
            "tau_0=200,800",
            "--out-dir",
            str(out_dir),
            "--strang-mode",
            "exact",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "2 variant(s)" in out
    assert "summary:" in out
    summary = json.loads((out_dir / "sweep_summary.json").read_text())
    assert summary["n_variants"] == 2
    result_files = sorted(out_dir.glob("0*_tau_0=*.json"))
    assert len(result_files) == 2


def test_cli_sweep_dry_run_and_errors(tmp_path, capsys):
    setup_path = save_setup(_setup(), tmp_path / "s.json")
    rc = cli_main(
        [
            "sweep",
            str(setup_path),
            "--vary",
            "tau_0=300:500:3",
            "--vary",
            "bath_temperature=0.1,0.2",
            "--dry-run",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "6 variant(s)" in out
    assert "005:" in out

    rc = cli_main(["sweep", str(setup_path), "--vary", "bogus=1", "--dry-run"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "Unknown parameter" in err


def test_run_sweep_resume_reuses_existing(tmp_path, monkeypatch):
    setup = _setup()
    out = tmp_path / "sweep"
    first = run_sweep(
        setup, [("tau_0", [200.0, 800.0])], out_dir=out, strang_mode="exact"
    )
    assert first["n_failed"] == 0

    # a resumed sweep must not re-run completed variants
    calls = []
    import qpsim_tpu.runner as runner_mod

    real_run = runner_mod.run_setup

    def counting_run(*args, **kwargs):
        calls.append(1)
        return real_run(*args, **kwargs)

    monkeypatch.setattr(runner_mod, "run_setup", counting_run)
    second = run_sweep(
        setup,
        [("tau_0", [200.0, 800.0])],
        out_dir=out,
        resume=True,
        strang_mode="exact",
    )
    assert calls == []
    assert all(r.get("resumed") for r in second["variants"])
    for a, b in zip(first["variants"], second["variants"]):
        assert b["mass_final"] == pytest.approx(a["mass_final"])

    # a damaged result file is re-run, not reused
    victim = sorted(out.glob("000_*.json"))[0]
    victim.write_text("{ not json")
    third = run_sweep(
        setup,
        [("tau_0", [200.0, 800.0])],
        out_dir=out,
        resume=True,
        strang_mode="exact",
    )
    assert len(calls) == 1
    assert third["n_failed"] == 0
    assert not third["variants"][0].get("resumed")
    assert third["variants"][1].get("resumed")


def test_run_sweep_resume_rejects_changed_settings(tmp_path):
    setup = _setup()
    out = tmp_path / "sweep"
    run_sweep(setup, [("tau_0", [440.0])], out_dir=out, strang_mode="exact")
    # same settings resume: fine
    run_sweep(setup, [("tau_0", [440.0])], out_dir=out, resume=True,
              strang_mode="exact")
    # changed run settings must refuse rather than splice mixed physics
    with pytest.raises(ValueError, match="settings differ"):
        run_sweep(setup, [("tau_0", [440.0])], out_dir=out, resume=True,
                  strang_mode="merged")
    with pytest.raises(ValueError, match="settings differ"):
        run_sweep(setup, [("tau_0", [440.0])], out_dir=out, resume=True,
                  strang_mode="exact", freeze_phonon_dynamics=True)
    # changed axes refuse too
    with pytest.raises(ValueError, match="settings differ"):
        run_sweep(setup, [("tau_0", [440.0, 500.0])], out_dir=out,
                  resume=True, strang_mode="exact")


def test_run_sweep_resume_schema_broken_file_reruns(tmp_path):
    setup = _setup()
    out = tmp_path / "sweep"
    first = run_sweep(setup, [("tau_0", [440.0])], out_dir=out,
                      strang_mode="exact")
    victim = sorted(out.glob("000_*.json"))[0]
    # valid JSON, broken schema (missing keys): must re-run, not crash
    victim.write_text(json.dumps({"times": []}))
    second = run_sweep(setup, [("tau_0", [440.0])], out_dir=out, resume=True,
                       strang_mode="exact")
    assert second["n_failed"] == 0
    assert not second["variants"][0].get("resumed")
    assert second["variants"][0]["mass_final"] == pytest.approx(
        first["variants"][0]["mass_final"]
    )


def test_run_sweep_resume_rejects_edited_setup(tmp_path):
    """Editing the setup between runs (same setup_id) must refuse resume:
    reused variants would carry the OLD physics."""
    setup = _setup()
    out = tmp_path / "sweep"
    run_sweep(setup, [("tau_0", [440.0])], out_dir=out, strang_mode="exact")
    edited = _setup()
    edited.parameters.bath_temperature = 0.35  # same setup_id, new physics
    with pytest.raises(ValueError, match="settings differ"):
        run_sweep(edited, [("tau_0", [440.0])], out_dir=out, resume=True,
                  strang_mode="exact")


def test_run_sweep_resume_tolerates_callable_kwargs(tmp_path):
    """Objects whose repr embeds a memory address (callbacks) must not make
    resume refuse across processes — addresses are normalized away."""
    setup = _setup()
    out = tmp_path / "sweep"
    run_sweep(setup, [("tau_0", [440.0])], out_dir=out, strang_mode="exact",
              progress_callback=lambda t, f: None)
    # a NEW callable object (different address, same meaning)
    second = run_sweep(setup, [("tau_0", [440.0])], out_dir=out, resume=True,
                       strang_mode="exact", progress_callback=lambda t, f: None)
    assert second["variants"][0].get("resumed")


def test_cli_view_sweep_curves(tmp_path, capsys):
    """`view` renders calibration curves from a sweep summary (file or dir)."""
    setup_path = save_setup(_setup(), tmp_path / "s.json")
    out_dir = tmp_path / "out"
    rc = cli_main(
        ["sweep", str(setup_path), "--vary", "tau_0=200,500,800",
         "--vary", "bath_temperature=0.1,0.3",
         "--out-dir", str(out_dir), "--strang-mode", "exact"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = cli_main(["view", str(out_dir / "sweep_summary.json")])
    out = capsys.readouterr().out
    assert rc == 0 and "curve images" in out
    curves = sorted((out_dir / "curves").glob("sweep_*.png"))
    names = {p.name for p in curves}
    assert {"sweep_mass_final.png", "sweep_mass_peak.png",
            "sweep_decay_ratio.png"} <= names
    for p in curves:
        assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"

    # directory form dispatches to the same path
    rc = cli_main(["view", str(out_dir), "--out", str(tmp_path / "c2")])
    assert rc == 0
    assert sorted((tmp_path / "c2").glob("sweep_*.png"))


def test_export_sweep_curves_edge_cases(tmp_path):
    from qpsim_tpu.ui.playback import export_sweep_curves

    with pytest.raises(ValueError, match="axes"):
        export_sweep_curves({"variants": []}, tmp_path)
    with pytest.raises(ValueError, match="successful"):
        export_sweep_curves(
            {"axes": [{"field": "tau_0", "values": [1.0]}],
             "variants": [{"overrides": {"tau_0": 1.0}, "error": "boom"}]},
            tmp_path,
        )
    # failed variants are skipped, not plotted
    written = export_sweep_curves(
        {"axes": [{"field": "tau_0", "values": [1.0, 2.0]}],
         "setup_name": "t",
         "variants": [
             {"overrides": {"tau_0": 1.0}, "mass_final": 0.5, "mass_peak": 1.0},
             {"overrides": {"tau_0": 2.0}, "error": "boom"},
         ]},
        tmp_path / "c",
    )
    assert (tmp_path / "c" / "sweep_mass_final.png").exists()
    assert written
