"""End-to-end active-learning loop wall-clock (BASELINE workload 5 /
VERDICT r4 weak 3) -> ACTIVE_LOOP.json.

Replicates `active_utils.active_learning`'s iteration body phase by phase
on the SimulateIG harness at the reference's run_active_IG sizes
(nconfig=10_000, npart=1_000, reference
examples/gpr_active_learning/run_active_IG.py role):

  sim        — draw the new state's samples (host numpy "simulation")
  build      — DataWrapper.build_state (timeseries -> ExtrapModel)
  assembly   — input_GP_from_state per state (derivatives + bootstrap
               noise covariance; the GP input staging)
  fit        — create model + train_GPR warm-started from the previous
               optimum (host-f64 L-BFGS through the compiled-core cache)
  stop       — StopCriteria metrics (MaxRelGlobalVar + MaxVar + MaxAbsStd)
  acquire    — UpdateALMbrute acquisition over the alpha grid

plus a final `fit_on_device` leg: the same last-iteration fit through
`train(on_device=True)` (f32 log-whitened LML on the accelerator) with
its NLL gap vs the host-f64 optimum — wiring measured in the loop it was
built for.  Phase clocks are wall-clock seconds (the loop is host-
orchestrated by design; nothing here is tunnel-dispatch-noise-limited).

Measured loop structure note: `fit` dominates the warm iterations NOT
because L-BFGS is slow (a same-structure warm refit is ~0.07 s,
`fit_host_warm_s`) but because each iteration ADDS a state — a new
(N, groups) structure — so the compiled LML core recompiles every
iteration; enable `utils.enable_compilation_cache` to amortize those
compiles across runs/restarts.

Run: python benches/bench_active_loop.py [--small] [--cpu]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

SMALL = "--small" in sys.argv
# --cpu: steer the whole process to the host CPU (x64).  The loop IS a
# host-orchestrated workflow (sims, staging, scipy L-BFGS); running its
# eager phases against the remote-TPU tunnel measures tunnel dispatch,
# not the loop (and wedge-hangs when the claim is bad).  The one real
# accelerator leg (train(on_device=True)) gets its own chip row when run
# WITHOUT --cpu.
CPU = "--cpu" in sys.argv
OUT = Path(__file__).parent.parent / "ACTIVE_LOOP.json"

NCONFIG, NPART = (1_000, 100) if SMALL else (10_000, 1_000)
N_GRID = 200 if SMALL else 1_000
MAX_ORDER = 3
N_ITER = 2 if SMALL else 5

# merge across runs: the --cpu run writes the host phases, a later
# chip-healthy run (no flag) adds the real fit_on_device row
results: dict = json.loads(OUT.read_text()) if OUT.exists() else {}
results.update(
    {
        "nconfig": NCONFIG,
        "npart": NPART,
        "n_grid": N_GRID,
        "max_order": MAX_ORDER,
        "iterations": N_ITER,
    }
)


def record(k, v):
    results[k] = v
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v}))


def main() -> None:
    import jax

    if CPU:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active import gp_models as gm
    from thermoextrap_tpu.gpr_active import ig_active

    record("backend", jax.default_backend())
    record("host_phases_backend", "cpu" if CPU else jax.default_backend())

    sim = ig_active.SimulateIG(nconfig=NCONFIG, npart=NPART)
    update = au.UpdateALMbrute(rng=0, n_grid=N_GRID)
    stop = au.StopCriteria(
        [au.MaxRelGlobalVar(tol=1e-12), au.MaxVar(tol=1e-12), au.MaxIter()],
        n_grid=N_GRID,
    )

    data_list = [sim.run_sim("", b) for b in (0.5, 2.5)]
    alpha_list = [d.beta for d in data_list]

    phases = {k: [] for k in ("sim", "build", "assembly", "fit", "stop", "acquire")}
    losses = []
    start_params = None
    gpr = None
    gp_inputs = None

    for i in range(N_ITER):
        t0 = time.perf_counter()
        state_list = [d.build_state(max_order=MAX_ORDER) for d in data_list]
        phases["build"].append(time.perf_counter() - t0)

        # assembly: the input_GP_from_state staging inside create_GPR
        t0 = time.perf_counter()
        from scipy import linalg

        x_d, y_d, c_d = [], [], []
        for s in state_list:
            xd, yd, cd = au.input_GP_from_state(s, log_scale=False)
            x_d.append(xd)
            y_d.append(yd)
            c_d.append(cd)
        x_d = np.vstack(x_d)
        y_d = np.vstack(y_d)
        cov = np.array(
            [
                linalg.block_diag(*[c[k] for c in c_d])
                for k in range(y_d.shape[1])
            ]
        )
        gp_inputs = (x_d, y_d, cov)
        phases["assembly"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        gpr = au.create_base_GP_model(gp_inputs)
        au.train_GPR(gpr, start_params=start_params)
        phases["fit"].append(time.perf_counter() - t0)
        losses.append(-float(gpr.log_marginal_likelihood()))
        start_params = gpr.parameters()

        t0 = time.perf_counter()
        stop_bool, metrics = stop(gpr, alpha_list)
        phases["stop"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        new_alpha, _mu, _std = update(gpr, alpha_list)
        phases["acquire"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        d_new = sim.run_sim("", new_alpha)
        phases["sim"].append(time.perf_counter() - t0)
        if np.any(np.isclose(alpha_list, new_alpha)):
            data_list[int(np.where(np.isclose(alpha_list, new_alpha))[0][0])] = d_new
        else:
            data_list.append(d_new)
            alpha_list.append(new_alpha)

    for k, v in phases.items():
        record(
            f"phase_{k}_s",
            {
                "first": round(v[0], 3),
                "warm_mean": round(float(np.mean(v[1:])), 3) if len(v) > 1 else None,
            },
        )
    record("loop_total_s", round(sum(sum(v) for v in phases.values()), 3))
    record("losses", [round(v, 3) for v in losses])
    record("final_states", len(alpha_list))

    # -- on-device f32 fit of the SAME final-iteration data -----------------
    # (meaningful only when NOT --cpu: then this is the real chip leg)
    gpr_dev = au.create_base_GP_model(gp_inputs)
    t0 = time.perf_counter()
    res_dev = gpr_dev.train(on_device=True)
    t_first = time.perf_counter() - t0
    gpr_dev2 = au.create_base_GP_model(gp_inputs)
    t0 = time.perf_counter()
    gpr_dev2.train(on_device=True)
    t_warm = time.perf_counter() - t0
    # NLL of the device optimum evaluated in host f64
    with gm._compute_ctx():
        nll_dev_at = float(gpr.neg_lml(np.asarray(res_dev.x, np.float64)))
    record(
        "fit_on_device" if not CPU else "fit_on_device_cpu_f32",
        {
            "first_s": round(t_first, 3),
            "warm_s": round(t_warm, 3),
            "nll_host_f64": round(losses[-1], 6),
            "nll_on_device_optimum": round(nll_dev_at, 6),
            "nll_gap": round(nll_dev_at - losses[-1], 6),
        },
    )
    # host warm refit for the same data (the apples-to-apples row)
    gpr_h = au.create_base_GP_model(gp_inputs)
    t0 = time.perf_counter()
    au.train_GPR(gpr_h, start_params=start_params)
    record("fit_host_warm_s", round(time.perf_counter() - t0, 3))


if __name__ == "__main__":
    main()
