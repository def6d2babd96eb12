"""Headline benchmark: batched multilevel M-solve throughput on one chip.

Measures the HIF preconditioner application (the inner loop of every Krylov
solve; BASELINE.json metric "M-solve (trsv+IR) nnz/s/chip") on a 2-D Poisson
system (BASELINE.json config 2): factorize on host (native C++ deferred-Crout
kernels), pack to the TPU as level-scheduled trsv schedules + sliced-ELL, and
apply to a batch of right-hand sides in f32 with an f64-residual correctness
check (the mixed-precision mode mirroring the reference ``lhfsdApply``).

Baseline: the same preconditioner applied by the serial host path (native C++
trsv + SpMV — the reference library's execution model, measured on this
machine).  vs_baseline = TPU per-RHS throughput / host per-RHS throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/hifir_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from hifir_tpu.api import HIF
    from hifir_tpu.models import poisson2d
    from hifir_tpu.options import Options

    NX = 256
    NRHS = 128
    A = poisson2d(NX)
    n = A.nrows
    opts = Options(tau_L=1e-2, tau_U=1e-2, alpha_L=3, alpha_U=3, kappa=5,
                   kappa_d=5, verbose=0)
    # min-of-3: the build host swings up to 2x between machine phases, so a
    # single-shot factorize time is meaningless (round-2 lesson: the shipped
    # number once moved 6.4x on noise alone)
    fact_times = []
    for _ in range(3):
        t0 = time.time()
        M = HIF().factorize(A, opts)
        fact_times.append(time.time() - t0)
    t_fact = min(fact_times)
    nnz_m = M.nnz()
    fact_thr = A.nnz / t_fact  # north-star "factorization nnz/s" (BASELINE.json)
    log(f"n={n} nnz(A)={A.nnz} factorize min-of-3 {t_fact:.2f}s "
        f"(all: {', '.join(f'{t:.2f}' for t in fact_times)}; "
        f"{fact_thr / 1e6:.2f} Mnnz/s) fill {nnz_m / A.nnz:.2f} "
        f"levels {M.levels()}")

    # --- host baseline: serial single-RHS M-solve (native C++ kernels) -----
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    xh = M.solve(b)  # warm
    times = []
    for _ in range(7):
        t0 = time.time()
        xh = M.solve(b)
        times.append(time.time() - t0)
    host_per_rhs = min(times)  # min is robust to scheduler noise
    host_thr = nnz_m / host_per_rhs
    log(f"host M-solve: {host_per_rhs * 1e3:.2f} ms/RHS "
        f"({host_thr / 1e6:.1f} Mnnz/s)")

    # --- TPU batched solve --------------------------------------------------
    dp = M.to_device(dtype=jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, NRHS)), jnp.float32)
    X = dp.solve_mrhs(B)
    float(jnp.sum(X))  # sync (block_until_ready is unreliable on the tunnel)
    times = []
    for _ in range(7):
        t0 = time.time()
        X = dp.solve_mrhs(B)
        float(jnp.sum(X))
        times.append(time.time() - t0)
    tpu_total = min(times)
    tpu_per_rhs = tpu_total / NRHS
    tpu_thr = nnz_m / tpu_per_rhs
    log(f"TPU M-solve mrhs={NRHS} f32: {tpu_total * 1e3:.1f} ms total, "
        f"{tpu_per_rhs * 1e3:.3f} ms/RHS ({tpu_thr / 1e6:.1f} Mnnz/s/RHS)")

    # --- frozen-operator HEADLINE leg ---------------------------------------
    # The fresh-factorize throughput above moves when the *factorization*
    # changes (better AMD -> lower fill -> mechanically lower nnz/s) even if
    # the solve kernels are unchanged — exactly what happened r1->r3
    # (10.53 -> 6.44 Gnnz/s while ms/RHS drifted on operator shape).  The
    # HEADLINE therefore times a checked-in, frozen preconditioner
    # (benchdata/frozen_prec.npz, examples/make_bench_fixture.py): its
    # ms/RHS and nnz/s are comparable across rounds and isolate kernel
    # regressions from operator drift; vs_baseline is the same frozen
    # operator applied by the serial native host path.
    frozen_ms_per_rhs = frozen_thr = frozen_host_thr = None
    import os
    fx = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchdata", "frozen_prec.npz")
    if os.path.exists(fx):
        from hifir_tpu.utils.serialize import load_prec

        Mf = load_prec(fx)
        nf = Mf.precs[0].n
        nnz_f = Mf.nnz()
        bf = rng.standard_normal(nf)
        xfh = Mf.solve(bf)
        times = []
        for _ in range(7):
            t0 = time.time()
            xfh = Mf.solve(bf)
            times.append(time.time() - t0)
        frozen_host_thr = nnz_f / min(times)
        log(f"FROZEN host M-solve: {min(times)*1e3:.2f} ms/RHS "
            f"({frozen_host_thr/1e6:.1f} Mnnz/s)")
        dpf = Mf.to_device(dtype=jnp.float32)
        Bf = jnp.asarray(rng.standard_normal((nf, NRHS)), jnp.float32)
        Xf = dpf.solve_mrhs(Bf)
        float(jnp.sum(Xf))
        times = []
        for _ in range(7):
            t0 = time.time()
            Xf = dpf.solve_mrhs(Bf)
            float(jnp.sum(Xf))
            times.append(time.time() - t0)
        frozen_e2e_ms_per_rhs = min(times) / NRHS * 1e3
        relf = (np.abs(np.asarray(Xf[:, 0], np.float64)
                       - Mf.solve(np.asarray(Bf[:, 0], np.float64))).max()
                / max(np.abs(Mf.solve(np.asarray(Bf[:, 0],
                                                 np.float64))).max(), 1e-300))
        log(f"FROZEN-operator M-solve end-to-end (n={nf}, nnz(M)={nnz_f}, "
            f"mrhs={NRHS}): {frozen_e2e_ms_per_rhs:.4f} ms/RHS, "
            f"device-vs-host rel diff {relf:.2e}")
        # HEADLINE: amortized KERNEL time via a chained solve.  Round-5
        # discovery: a single dispatch through the axon tunnel carries a
        # ~26 ms fixed round-trip (measured on a bare gather — every op,
        # trivial or not, "costs" 26 ms end-to-end), so single-call timings
        # measure the dev-setup tunnel, not the chip.  Chaining K solves in
        # one jitted fori_loop amortizes the fixed cost; the headline is the
        # K=50 per-solve time (still conservative: includes the residual
        # 26/50 ms share).
        import jax.lax as lax
        from hifir_tpu.alg.prec import prec_solve_mrhs_device

        K = 50

        def chain(levels, tail, B):
            return lax.fori_loop(
                0, K, lambda _, X: prec_solve_mrhs_device(levels, tail, X),
                B)

        fchain = jax.jit(chain)
        Xc = fchain(dpf.levels, dpf.tail, Bf)
        float(jnp.sum(Xc))
        times = []
        for _ in range(5):
            t0 = time.time()
            Xc = fchain(dpf.levels, dpf.tail, Bf)
            float(jnp.sum(Xc))
            times.append(time.time() - t0)
        frozen_ms_per_rhs = min(times) / K / NRHS * 1e3
        frozen_thr = nnz_f / (min(times) / K / NRHS)
        log(f"FROZEN-operator M-solve KERNEL (chained K={K}, mrhs={NRHS}): "
            f"{min(times)/K*1e3:.3f} ms/solve, {frozen_ms_per_rhs*1e3:.2f} "
            f"us/RHS ({frozen_thr/1e9:.2f} Gnnz/s/RHS)")
    else:
        log("frozen fixture missing (benchdata/frozen_prec.npz) — skipping")

    # --- correctness 1: device f32 solve vs host f64 solve ------------------
    rel_dev = (np.abs(np.asarray(X[:, 0], dtype=np.float64) - M.solve(
        np.asarray(B[:, 0], dtype=np.float64))).max()
        / max(np.abs(xh).max(), 1e-300))
    log(f"device-vs-host M-solve rel diff (f32 pack): {rel_dev:.2e}")
    if not (rel_dev < 1e-4):
        log("WARNING: device solve deviates from host beyond f32 tolerance")

    # --- correctness 2: mixed f32-M / f64-residual IR must contract ---------
    # BASELINE.json config 3 is a saddle-point system with static deferring
    # and mixed-precision IR (the reference's ``lhfsdApply``): factorize the
    # generated Stokes-type saddle-point operator with robust defaults (its
    # zero pressure diagonals exercise the static deferral) and require a
    # healthy Richardson contraction (< 0.5/step median; measured 0.11).
    # Also time the robust-params factorize of the Poisson system here as
    # the second factorize sample (min-of-2).
    rob_times = []
    for _ in range(2):
        t0 = time.time()
        Mr = HIF().factorize(A, Options(verbose=0))
        rob_times.append(time.time() - t0)
    fact_thr_robust = A.nnz / min(rob_times)
    log(f"robust factorize min-of-2 {min(rob_times):.2f}s "
        f"(all: {', '.join(f'{t:.2f}' for t in rob_times)}; "
        f"{fact_thr_robust / 1e6:.2f} Mnnz/s) fill {Mr.nnz() / A.nnz:.2f}")

    from hifir_tpu.models import saddle_point_stokes

    Asp = saddle_point_stokes(64)
    Msp = HIF().factorize(Asp, Options(verbose=0))
    dpr = Msp.to_device(dtype=jnp.float32)
    nsp = Asp.nrows
    x = np.zeros(nsp)
    bb = rng.standard_normal(nsp)
    rnorms = [np.linalg.norm(bb)]
    for _ in range(10):
        r = bb - Asp.matvec(x)
        dx = np.asarray(dpr.solve_mrhs(jnp.asarray(r, jnp.float32)[:, None]))
        x = x + dx[:, 0].astype(np.float64)
        rnorms.append(np.linalg.norm(bb - Asp.matvec(x)))
    rel = rnorms[-1] / rnorms[0]
    # median per-step contraction over the steps before f32 stagnation
    steps = [rnorms[i + 1] / rnorms[i] for i in range(10) if rnorms[i] > 0]
    contraction = float(np.median(steps[:5]))
    log(f"mixed-precision IR (saddle-point robust M, n={nsp}): residual "
        f"{rel:.2e} after 10 steps, median contraction/step "
        f"{contraction:.3f}")
    if not (contraction < 0.5):
        log("WARNING: IR contraction is weak for this configuration")

    if frozen_thr is not None:
        headline, headline_vs = frozen_thr, frozen_thr / frozen_host_thr
        metric = "hif_msolve_frozen_kernel_throughput_per_chip"
    else:
        headline, headline_vs = tpu_thr, tpu_thr / host_thr
        metric = "hif_msolve_throughput_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(headline, 1),
        "unit": "nnz/s",
        "vs_baseline": round(headline_vs, 3),
        "extras": {
            "frozen_kernel_us_per_rhs": (None if frozen_ms_per_rhs is None
                                         else round(frozen_ms_per_rhs * 1e3,
                                                    3)),
            "frozen_e2e_ms_per_rhs": (
                None if frozen_ms_per_rhs is None
                else round(frozen_e2e_ms_per_rhs, 4)),
            "fresh_ms_per_rhs": round(tpu_per_rhs * 1e3, 4),
            "fresh_nnz_per_s": round(tpu_thr, 1),
            "fresh_vs_host": round(tpu_thr / host_thr, 3),
            "factorize_nnz_per_s": round(fact_thr, 1),
            "factorize_robust_nnz_per_s": round(fact_thr_robust, 1),
            "fill_ratio": round(nnz_m / A.nnz, 3),
            "ir_contraction_per_step": round(contraction, 4),
            "ir_rel_residual_10_steps": float(f"{rel:.3e}"),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
