"""End-to-end driver tests: production run -> files -> analysis."""

import numpy as np
import pytest

from swraytracing_tpu import drivers
from swraytracing_tpu.analysis import spectra
from swraytracing_tpu.io import binio, runmeta


def test_qgsw_raytrace_end_to_end(tmp_path):
    out = tmp_path / "run-0"
    carry, rd = drivers.qgsw_raytrace(
        nx=32, Npackets=8, T_Fr_days=30.0, packet_delay_days=0.1,
        out_dir=out, max_steps=100, checkpoint_every=1, verbose=False)
    # analysis loads what the driver wrote
    x, k, t, params = spectra.load_packets(out)
    assert params["nx"] == 32 and params["n_packets"] == 8
    assert x.shape[1:] == (8, 2) and x.shape[0] == len(t)
    assert np.isfinite(x).all() and np.isfinite(k).all()
    om = spectra.omega_of_k(k, params["f"], params["Cg"])
    c, e = spectra.energy_vs_omega(om[-1])
    assert e.sum() > 0
    # PV frames exist, reference layout
    q = binio.read_field(str(out / "pv"), 32, 32, frames=[1, 2])
    assert q.shape == (32, 32, 2) and np.isfinite(q).all()
    # reference-format run.log parses
    log = runmeta.parse_run_log(out / "run.log")
    assert log["nx"] == 32 and "wall_seconds" in log
    # metrics present
    m = rd.read_metrics()
    assert m and m[-1]["packet_steps_per_sec"] > 0


def test_qgsw_resume_continues(tmp_path):
    out = tmp_path / "run-r"
    drivers.qgsw_raytrace(nx=32, Npackets=4, T_Fr_days=30.0,
                          packet_delay_days=0.1, out_dir=out,
                          max_steps=100, checkpoint_every=1, verbose=False)
    n1 = binio.frame_count(str(out / "packet_x"), 4, 2)
    # resume should pick up at the checkpoint without rewriting history
    drivers.qgsw_raytrace(nx=32, Npackets=4, T_Fr_days=30.0,
                          packet_delay_days=0.1, out_dir=out,
                          max_steps=150, checkpoint_every=1, resume=True,
                          verbose=False)
    n2 = binio.frame_count(str(out / "packet_x"), 4, 2)
    assert n2 >= n1


def test_qg2layersw_raytrace_end_to_end(tmp_path):
    out = tmp_path / "run2"
    carry, rd = drivers.qg2layersw_raytrace(
        nx=32, Npackets=4, T_Fr_days=10.0, packet_delay_days=0.05,
        out_dir=out, max_steps=60, verbose=False)
    x, k, t, params = spectra.load_packets(out)
    assert np.isfinite(x).all()
    q = binio.read_field(str(out / "pv"), 32, 32, 2, frames=1)
    assert q.shape == (32, 32, 2)  # two layers


def test_plots_render(tmp_path):
    from swraytracing_tpu.analysis import plots
    from swraytracing_tpu.ops.grid import SpectralGrid

    rng = np.random.default_rng(0)
    omega = 3.0 + np.abs(rng.standard_normal((40, 32)))
    p = tmp_path / "eomega.png"
    plots.plot_energy_spectra(omega, [5, 35], f=3.0, offset=3, bins=40,
                              path=p)
    assert p.exists() and p.stat().st_size > 1000
    grid = SpectralGrid.square(32)
    q = rng.standard_normal(grid.shape)
    px = rng.uniform(0, grid.Lx, (8, 2))
    p2 = tmp_path / "pv.png"
    plots.render_pv_frame(q, grid, packet_x=px, path=p2)
    assert p2.exists()
    p3 = tmp_path / "pdf.png"
    plots.plot_omega_pdf_check(omega, rng.standard_normal((50, 2)) * 0.3,
                               k0=5.0, f=3.0, Cg=1.0, path=p3)
    assert p3.exists()
