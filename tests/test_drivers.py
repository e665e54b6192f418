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


def test_omega_hist_mode_matches_frames(tmp_path):
    """Diagnostic mode (on-device omega histogram per save) must equal
    histogramming the frames a normal run writes: same seed + dt =>
    identical trajectories, and counts are additive over frames."""
    kw = dict(nx=32, Npackets=16, T_Fr_days=30.0, packet_delay_days=0.1,
              verbose=False, max_steps=100)
    drivers.qgsw_raytrace(out_dir=tmp_path / "frames", **kw)
    drivers.qgsw_raytrace(out_dir=tmp_path / "hist", omega_hist_bins=64,
                          omega_hist_max=12.0, snapshot_every=1, **kw)

    x, k, t, params = spectra.load_packets(tmp_path / "frames")
    counts, edges, th, ph = spectra.load_omega_hist(tmp_path / "hist")
    assert counts.shape == (len(t), 65)
    assert np.allclose(th, t)
    om = spectra.omega_of_k(k, params["f"], params["Cg"])
    for j in range(len(t)):
        ref = np.histogram(om[j], np.append(edges, np.inf))[0]
        assert (counts[j] == ref).all(), f"frame {j}"
    # pooled-window energy equals the sample path's on the same edges
    pooled = spectra.hist_windows(counts, [len(t) - 1], offset=len(t))[0]
    c, e = spectra.energy_vs_omega_hist(pooled, edges)
    ref_counts = np.histogram(om.ravel(), edges)[0]
    assert np.allclose(e, c * ref_counts)
    mean, std = spectra.hist_moments(pooled, edges)
    assert abs(mean - om.ravel().mean()) < (edges[1] - edges[0])
    # sparse snapshots: reference (Np, 2) record layout, final state
    # equals the frames run's last frame
    ns = binio.frame_count(str(tmp_path / "hist" / "packet_snap_k"), 16, 2)
    assert ns >= 2
    ksnap = binio.read_field(str(tmp_path / "hist" / "packet_snap_k"),
                             16, 2, frames=ns)
    assert np.allclose(ksnap, k[-1])


def test_run_sweep_ensemble_writes_member_dirs(tmp_path):
    """run_sweep(ensemble=True): one vmapped program, per-member run
    dirs with omega-hist frames; members freeze at their own T and stop
    producing frames."""
    base = tmp_path / "sweep"
    sweep = [(2.0, 0.3), (4.0, 0.6)]
    carry_b, rds = drivers.run_sweep(
        sweep, base_dir=str(base), ensemble=True, nx=32, Npackets=16,
        T_Fr_days=30.0, packet_delay_days=0.1, omega_hist_bins=48,
        window_min_np=1, max_steps=100, verbose=False,
        T_member=lambda w0, ug: 0.15 if w0 == 4.0 else 1e9)
    for i, (w0, ug) in enumerate(sweep):
        counts, edges, t, params = spectra.load_omega_hist(
            base / f"run-{i}")
        assert params["near_inertial_factor"] == w0
        assert params["U_g"] == ug
        assert float(params["omega_hist_max"]) == 2.0 * w0 * 3.0
        assert (counts.sum(axis=1) == 16).all()
        # run.log parses as a reference log
        log = runmeta.parse_run_log(base / f"run-{i}" / "run.log")
        assert log["nx"] == 32
        k = binio.read_field(str(base / f"run-{i}" / "packet_snap_k"),
                             16, 2, frames=1)
        assert np.isfinite(k).all()
    # member 1 froze at T=0.15: fewer frames than member 0, and its
    # last time does not exceed T by more than a chunk
    t0 = binio.read_field(str(base / "run-0" / "packet_time"))
    t1 = binio.read_field(str(base / "run-1" / "packet_time"))
    assert len(t1) < len(t0)
    assert t1[-1] >= 0.15 and t1[-1] < 0.4


def test_omega_hist_log_bins_match_numpy(tmp_path):
    """Log-binned diagnostic mode (round-5 fix for the strong-flow
    truncation): counts must equal numpy histogramming the frames of an
    identical plain run on the geomspace edges, and the generous
    [f, 64*w0*f] range must leave the overflow slot empty."""
    kw = dict(nx=32, Npackets=16, T_Fr_days=30.0, packet_delay_days=0.1,
              verbose=False, max_steps=100)
    drivers.qgsw_raytrace(out_dir=tmp_path / "frames", **kw)
    drivers.qgsw_raytrace(out_dir=tmp_path / "log", omega_hist_bins=64,
                          omega_hist_log=True, **kw)
    x, k, t, params = spectra.load_packets(tmp_path / "frames")
    counts, edges, th, ph = spectra.load_omega_hist(tmp_path / "log")
    f, w0 = params["f"], params["near_inertial_factor"]
    assert ph["omega_hist_log"] and ph["omega_hist_min"] == f
    np.testing.assert_allclose(edges[0], f)
    np.testing.assert_allclose(edges[-1], 64.0 * w0 * f)
    # geomspace edges: constant ratio
    np.testing.assert_allclose(np.diff(np.log(edges)),
                               np.log(edges[1] / edges[0]))
    om = spectra.omega_of_k(k, params["f"], params["Cg"])
    for j in range(len(t)):
        ref = np.histogram(om[j], np.append(edges, np.inf))[0]
        assert (counts[j] == ref).all(), f"frame {j}"
    assert counts[:, -1].sum() == 0          # nothing truncated
    # the density-corrected energy curve integrates like the linear one
    pooled = spectra.hist_windows(counts, [len(t) - 1], offset=len(t))[0]
    c, e = spectra.energy_vs_omega_hist(pooled, edges)
    assert np.isfinite(e).all() and e.sum() > 0


def test_run_sweep_ensemble_pv_series_and_init_from(tmp_path):
    """Ensemble sweep round-5 additions: (a) pv_every writes a
    per-member PV frame series (qgsw_raytrace.m:165-172 cadence at chunk
    granularity) with strictly increasing times; (b) init_from seeds a
    continuation from another sweep's checkpoint — members pick up at
    their checkpointed t and advance toward an extended T, with the
    initial frames stamped at the seeded time."""
    sweep = [(2.0, 0.3), (4.0, 0.6)]
    kw = dict(ensemble=True, nx=32, Npackets=16, T_Fr_days=30.0,
              packet_delay_days=0.1, omega_hist_bins=48,
              window_min_np=1, verbose=False)
    base1 = tmp_path / "first"
    # 150 steps -> 3 chunks of 50; checkpoints land at chunk 2 only
    drivers.run_sweep(sweep, base_dir=str(base1), max_steps=150,
                      checkpoint_every=2, pv_every=2, **kw)
    # (a) PV series
    for i in range(2):
        tpv = binio.read_field(str(base1 / f"run-{i}" / "pv_time"))
        assert len(tpv) >= 3                  # initial + >=1 + final
        assert (np.diff(tpv) > 0).all()
        q = binio.read_field(str(base1 / f"run-{i}" / "pv"), 32, 32,
                             frames=len(tpv))
        assert q.shape == (32, 32) and np.isfinite(q).all()
    # (b) continuation into a fresh base_dir, log-binned
    from swraytracing_tpu.io.checkpoint import latest_checkpoint
    ck = latest_checkpoint(base1, prefix="ckpt-g0")
    assert ck is not None
    ck_t = np.load(ck)["leaf_3"]
    base2 = tmp_path / "cont"
    drivers.run_sweep(sweep, base_dir=str(base2), max_steps=120,
                      init_from=ck, omega_hist_log=True,
                      omega_hist_max_factor=64.0, pv_every=2, **kw)
    for i in range(2):
        t2 = binio.read_field(str(base2 / f"run-{i}" / "packet_time"))
        np.testing.assert_allclose(t2[0], ck_t[i], atol=1e-5)
        assert t2[-1] > t2[0]
        p2 = runmeta.RunDir(base2 / f"run-{i}").read_params()
        assert p2["omega_hist_log"] and p2["t_seed"] > 0
        c2, e2, tt, _ = spectra.load_omega_hist(base2 / f"run-{i}")
        assert (c2.sum(axis=1) == 16).all()
    # continuation trajectories must equal an uninterrupted run: the
    # seeded run's packets at its end match the first run extended
    # (first run rounded 60 -> 2 full 50-step chunks, so the checkpoint
    # sits at step 100; 100 more steps must land exactly at step 200)
    carry_ref, _ = drivers.run_sweep(
        sweep, base_dir=str(tmp_path / "uninterrupted"), max_steps=200,
        **kw)
    carry2, _ = drivers.run_sweep(
        sweep, base_dir=str(tmp_path / "cont2"), max_steps=100,
        init_from=ck, **kw)
    np.testing.assert_allclose(np.asarray(carry2.packet_x),
                               np.asarray(carry_ref.packet_x),
                               rtol=1e-12, atol=1e-12)


def test_run_sweep_ensemble_sharded_matches_unsharded(tmp_path):
    """The sweep's mesh path (members sharded over the ensemble axis,
    packets over the packet axis) must write identical histogram series
    to the single-device run."""
    import jax

    from swraytracing_tpu.parallel.sharding import make_mesh

    sweep = [(2.0, 0.3), (4.0, 0.6)]
    kw = dict(ensemble=True, nx=32, Npackets=16, T_Fr_days=30.0,
              packet_delay_days=0.1, omega_hist_bins=48,
              window_min_np=1, max_steps=60, verbose=False)
    drivers.run_sweep(sweep, base_dir=tmp_path / "plain", **kw)
    mesh = make_mesh(jax.devices(), ensemble=2)
    drivers.run_sweep(sweep, base_dir=tmp_path / "mesh", mesh=mesh, **kw)
    for i in range(2):
        c1, e1, t1, _ = spectra.load_omega_hist(tmp_path / "plain"
                                                / f"run-{i}")
        c2, e2, t2, _ = spectra.load_omega_hist(tmp_path / "mesh"
                                                / f"run-{i}")
        assert (c1 == c2).all() and np.allclose(t1, t2)


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


def test_animate_pv_time_interpolates(tmp_path):
    """Dense packet cadence: animate_pv renders one frame per PACKET
    save with PV blended between flow frames (qgflow_animation.m:88-101)
    — frame count equals the packet frame count, not the PV count."""
    from swraytracing_tpu.analysis import plots
    from swraytracing_tpu.ops.grid import SpectralGrid

    rng = np.random.default_rng(1)
    grid = SpectralGrid.square(16)
    nq, m = 3, 4                       # 2 PV intervals x 4 packet saves
    q = rng.standard_normal((nq,) + grid.shape)
    npk = (nq - 1) * m
    px = rng.uniform(0, grid.Lx, (npk, 6, 2))
    paths = plots.animate_pv(q, grid, tmp_path / "anim",
                             packet_x_frames=px,
                             times=np.linspace(0, 1, npk))
    assert len(paths) == npk
    import os
    assert all(os.path.exists(p) for p in paths)
    # matched cadence still renders one per PV frame
    paths2 = plots.animate_pv(q, grid, tmp_path / "anim2",
                              packet_x_frames=px[:nq])
    assert len(paths2) == nq


def test_kinetic_energy_spectrum_ring_ic():
    """KE spectrum of the ring IC (scratch/energy_spectrum.m semantics):
    energy concentrates in the seeded ring modes 5..8 and the rings sum
    to the total KE = sum K^2 |psik|^2."""
    import jax
    from swraytracing_tpu.ops.grid import SpectralGrid
    from swraytracing_tpu.ops import spectral as sp
    from swraytracing_tpu.models.qg import initial_q_ring

    grid = SpectralGrid.square(64)
    Kd2 = 3.0
    qk = initial_q_ring(7, grid, 0.4, Kd2)
    ke = spectra.kinetic_energy_spectrum(np.asarray(sp.to_grid(qk, grid)),
                                         grid, Kd2)
    assert ke.shape == (grid.kmax,)
    ring = ke[4:8].sum()          # rings K = 5..8
    assert ring > 0.98 * ke.sum()
    psik = -np.asarray(qk) / (Kd2 + np.asarray(grid.K2))
    KEk = np.asarray(grid.K2) * np.abs(psik) ** 2
    total = float(np.asarray(jax.jit(
        lambda a: sp.isospectrum(a, grid))(KEk)).sum())
    np.testing.assert_allclose(ke.sum(), total, rtol=1e-10)


def test_qg_passive_particles_advect():
    """simulate_qg_particles (pyqgParticleAdvection.ipynb parity):
    particles stay finite, disperse, and with zero flow stay put."""
    import jax
    import jax.numpy as jnp
    from swraytracing_tpu.ops.grid import SpectralGrid
    from swraytracing_tpu.ops import spectral as sp
    from swraytracing_tpu.models.qg import (QGParams, qg_init,
                                            initial_q_ring,
                                            simulate_qg_particles)

    grid = SpectralGrid.square(32)
    p = QGParams(Kd2=3.0, dt=5e-3, r_drag=0.0,
                 filter=jnp.asarray(sp.exp_filter(grid)))
    qk0 = initial_q_ring(3, grid, 0.5, p.Kd2)
    xp0 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 2 * np.pi, (2, 24)))
    st, xp, xs, ts = jax.jit(
        lambda q, x: simulate_qg_particles(qg_init(q), x, grid, p, 40,
                                           save_every=10))(qk0, xp0)
    assert xs.shape == (4, 2, 24) and np.isfinite(np.asarray(xp)).all()
    moved = np.abs(np.asarray(xp) - np.asarray(xp0)).max()
    assert moved > 1e-3
    # zero PV -> zero velocity -> particles stationary
    _, xp_still, _, _ = jax.jit(
        lambda q, x: simulate_qg_particles(qg_init(q), x, grid, p, 10))(
            jnp.zeros_like(qk0), xp0)
    np.testing.assert_allclose(np.asarray(xp_still), np.asarray(xp0),
                               atol=1e-12)


def test_margin_overflow_self_corrects(tmp_path):
    """A deliberately under-margined fused-march run (march_margin=1
    with a group speed that drifts packets several cells per flow step)
    must NOT write silently-clamped frames: the driver discards the
    overflowing chunk, widens the margin, and re-runs it (VERDICT r2
    item 6). The final trajectory must match a run that had a generous
    margin from the start."""
    kw = dict(nx=32, Npackets=8, near_inertial_factor=2.0,
              T_Fr_days=30.0, packet_delay_days=0.0, Cg=30.0,
              max_steps=20, checkpoint_every=0, verbose=False,
              window_min_np=1, fused_march=True)
    out_bad = tmp_path / "undermargined"
    carry_bad, rd_bad = drivers.qgsw_raytrace(
        out_dir=out_bad, march_margin=1, **kw)
    metrics = rd_bad.read_metrics()
    ovs = [m for m in metrics if m.get("march_overflow")]
    assert ovs, "expected at least one overflow event at margin=1"
    assert all(m.get("chunk_discarded") for m in ovs)
    # the re-run chunk must produce the same physics as a generous
    # margin from the start (clamped results never reach the files)
    out_ok = tmp_path / "margined"
    carry_ok, _ = drivers.qgsw_raytrace(out_dir=out_ok, march_margin=8,
                                        **kw)
    np.testing.assert_allclose(np.asarray(carry_bad.packet_x),
                               np.asarray(carry_ok.packet_x),
                               rtol=1e-10, atol=1e-10)
    x_bad = binio.read_field(str(out_bad / "packet_x"), 8, 2, frames=None)
    x_ok = binio.read_field(str(out_ok / "packet_x"), 8, 2, frames=None)
    np.testing.assert_allclose(x_bad, x_ok, rtol=1e-10, atol=1e-10)


def test_margin_overflow_halts_without_retries(tmp_path):
    """With retries disabled an overflow must halt the run loudly (no
    clamped frames written), like the blow-up check."""
    out = tmp_path / "halt"
    carry, rd = drivers.qgsw_raytrace(
        nx=32, Npackets=8, near_inertial_factor=2.0, T_Fr_days=30.0,
        packet_delay_days=0.0, Cg=30.0, out_dir=out, max_steps=20,
        checkpoint_every=0, verbose=False, window_min_np=1,
        fused_march=True, march_margin=1, max_margin_retries=0)
    metrics = rd.read_metrics()
    assert any(m.get("march_overflow") for m in metrics)
    # only the pre-loop initial frame was written
    assert binio.frame_count(str(out / "packet_x"), 8, 2) == 1


def test_checkpoint_nf_reconciles_across_march_configs(tmp_path):
    """A checkpoint written by a uv-window run (prev_fields nf=2) must
    resume under a 6-field configuration and vice versa (ADVICE r2):
    prev_fields is rebuilt from the flow state on shape mismatch."""
    kw = dict(nx=32, Npackets=8, T_Fr_days=30.0, packet_delay_days=0.1,
              verbose=False, window_min_np=1, fused_march=True)
    out = tmp_path / "runnf"
    drivers.qgsw_raytrace(out_dir=out, max_steps=20, checkpoint_every=1,
                          march_uv_windows=True, **kw)
    # resume the nf=2 checkpoint under a config whose carry wants nf=6
    carry, rd = drivers.qgsw_raytrace(
        out_dir=out, max_steps=40, checkpoint_every=1, resume=True,
        march_uv_windows=False, **kw)
    assert carry.prev_fields.shape[0] == 6
    assert np.isfinite(np.asarray(carry.packet_x)).all()


def test_qg2_cfl_recheck_rebuilds_march(tmp_path, capsys):
    """The two-layer CFL recheck must rebuild dt, operators AND the
    march spec (margin sized from the RUNNING max speed), and the next
    chunk must run against the rebuilt spec with the carried windows
    reconciled (VERDICT r2 weak item 8). A strongly-damped run decays
    fast, triggering the dt-too-small branch within a few chunks."""
    out = tmp_path / "recheck"
    carry, rd = drivers.qg2layersw_raytrace(
        nx=32, Npackets=8, T_Fr_days=10.0, packet_delay_days=0.01,
        U_g=0.4, shear=0.0, r=3.0, out_dir=out, max_steps=300,
        checkpoint_every=0, verbose=True, window_min_np=1,
        steps_per_save=10, packet_steps_per_save=5)
    text = capsys.readouterr().out
    assert "CFL recheck" in text, text[-2000:]
    assert np.isfinite(np.asarray(carry.packet_x)).all()
    assert np.isfinite(np.asarray(carry.flow_state.qk)).all()
    m = rd.read_metrics()
    assert m and not any(mm.get("blow_up") for mm in m)


def test_wavefield_reconstruction():
    """The wavefield synthesis the reference sketches but never ran
    (raytrace_sw.m:204-218): single packet -> locally a plane wave of
    its wavenumber under a Gaussian envelope peaking sqrt(a/omega) at
    the packet; superposition is linear; periodic in the domain."""
    import jax.numpy as jnp

    from swraytracing_tpu.analysis.wavefield import reconstruct_wavefield
    from swraytracing_tpu.models.dispersion import Dispersion
    from swraytracing_tpu.ops.grid import SpectralGrid

    grid = SpectralGrid.square(64)
    disp = Dispersion(f=3.0, Cg=1.0)
    L = grid.Lx
    x = jnp.asarray([[L / 2], [L / 2]])
    k = jnp.asarray([[8.0], [0.0]])
    a = jnp.asarray([2.0])
    eta = np.asarray(reconstruct_wavefield(x, k, grid, disp, action=a,
                                           width=1.0))
    om = float(np.sqrt(9.0 + 64.0))
    i0 = 32  # grid index of L/2
    # crest at the packet, amplitude sqrt(a/omega)
    assert abs(eta[i0, i0] - np.sqrt(2.0 / om)) < 1e-6
    # local wavelength along x: the next crest is ~2*pi/8 away and is a
    # local maximum of the row
    row = eta[:, i0]
    lam_cells = int(round(2 * np.pi / 8.0 / grid.dx))
    j = i0 + lam_cells
    assert row[j] == row[j - 3:j + 4].max() and row[j] > 0
    # envelope decays away from the packet
    assert abs(eta[0, 0]) < 1e-3 * eta[i0, i0]
    # superposition is linear
    x2 = jnp.asarray([[L / 4, 3 * L / 4], [L / 2, L / 2]])
    k2 = jnp.asarray([[8.0, 8.0], [0.0, 0.0]])
    both = np.asarray(reconstruct_wavefield(x2, k2, grid, disp))
    one = np.asarray(reconstruct_wavefield(x2[:, :1], k2[:, :1], grid,
                                           disp))
    two = np.asarray(reconstruct_wavefield(x2[:, 1:], k2[:, 1:], grid,
                                           disp))
    # (default narrow envelope for the superposition check)
    np.testing.assert_allclose(both, one + two, atol=1e-12)
