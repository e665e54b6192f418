"""The reference's FULL 20-config parameter sweep
(/root/reference/parameters.txt:1-21: w0 in {2,4,8,16} x U_g in
{0.2..1.0}, f=3, Cg=1) executed as ONE vmapped mesh program on the TPU —
the SLURM-array replacement (runqgsw_raytrace.sbatch:10) at production
scale: 256^2, 2^14 packets per member (328x the reference's 50),
fused Pallas march engaged under vmap, per-member on-device
omega histograms.

Horizons follow the committed reference logs (T=2000 flat — their
"Simulation time: 2000" rows; the T ~ 1/Fr^2 line postdates those runs)
for U_g <= 0.4 — the parameter range of the committed
Energy_versus_omega figure family — and documented reduced horizons for
the stronger-flow members (scattering saturates far earlier at high Fr;
T=800 at U_g=0.6, T=500 at U_g >= 0.8 still gives >= 90 eddy turnover
times past release).

Members freeze bit-identically at their own T inside the shared scan,
so heterogeneous horizons cost nothing extra.

Usage: python runs/run_tpu_sweep.py [max_steps]
Re-running resumes from the latest sweep checkpoint.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from swraytracing_tpu.drivers import run_sweep  # noqa: E402

base = "/root/repo/runs/sweep_full"


def T_member(w0, ug):
    return 2000.0 if ug <= 0.4 else (800.0 if ug <= 0.6 else 500.0)


max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else None
resume = os.path.isdir(base) and any(
    f.startswith("ckpt_") for f in os.listdir(base))

run_sweep(
    ensemble=True, base_dir=base,
    nx=256, Npackets=2**14, f=3.0, Cg=1.0,
    packet_delay_days=1000.0,        # release at t=333.3 (the committed
                                     # reference logs' spin-up)
    T_member=T_member,
    r_drag=0.0, forcing_strength=0.0,  # corrected-physics branch (run B)
    steps_per_save=500, packet_steps_per_save=5,
    omega_hist_bins=300,
    window_min_np=2**13,             # engage the fused march at 2^14
    checkpoint_every=40, resume=resume, max_steps=max_steps,
    max_margin_retries=4)
