"""Derivative-informed GPR active learning on the ideal gas.

Mirrors the reference examples/gpr_active_learning/run_active_IG.py: start
from two state points, iteratively fit a heteroscedastic derivative GPR and
acquire new simulation points where the model is most uncertain.

Run: python examples/gpr_active_learning.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import tempfile

import numpy as np

from thermoextrap_tpu import idealgas
from thermoextrap_tpu.gpr_active import active_utils as au
from thermoextrap_tpu.gpr_active import ig_active


def main() -> None:
    nconfig, npart, grid, iters = (
        (800, 120, 40, 1) if SMOKE else (5_000, 500, 200, 4)
    )
    sim = ig_active.SimulateIG(nconfig=nconfig, npart=npart)
    update = au.UpdateALMbrute(rng=0, n_grid=grid)
    stop = au.StopCriteria([au.MaxRelGlobalVar(tol=0.02), au.MaxIter()], n_grid=grid)

    with tempfile.TemporaryDirectory() as tmp:
        data_list, history = au.active_learning(
            [0.5, 2.5],
            sim,
            update,
            base_dir=tmp,
            stop_criteria=stop,
            max_iter=iters,
            max_order=3,
        )

    print("acquired state points:", sorted(d.beta for d in data_list))
    print("losses:", [round(v, 2) for v in history["loss"]])

    states = [d.build_state(max_order=3) for d in data_list]
    gpr = au.create_GPR(states)
    xt = np.linspace(0.6, 2.4, 7)
    mu, var = gpr.predict_f(np.stack([xt, np.zeros_like(xt)], axis=1))
    print(f"{'beta':>6} {'GP mean':>10} {'GP std':>9} {'exact':>10}")
    for b, m, v in zip(xt, np.asarray(mu)[:, 0], np.asarray(var)[:, 0]):
        print(f"{b:6.2f} {m:10.5f} {np.sqrt(v):9.1e} {float(idealgas.x_ave(b)):10.5f}")

    # serving: the same trained model behind a bucketed compile-once
    # closure — ragged query-grid sizes reuse one cached predict program
    from thermoextrap_tpu.pipeline import make_gpr_pipeline

    _, predict = make_gpr_pipeline(states, bucket=16)
    for grid_n in (3, 5, 11):
        m, _ = predict(np.linspace(0.7, 2.3, grid_n))
        print(f"serving predict n={grid_n:2d}: mean[0]={float(m[0, 0]):.5f}")

    # on-chip serving: freeze the trained model (host-f64 solves fold into
    # constants; prediction = pure matmuls at f32) and compare against the
    # host predict_f path
    from thermoextrap_tpu.gpr_active.serving import freeze_predictor

    frozen = freeze_predictor(gpr)
    fm, fv = frozen(xt)
    err = np.max(np.abs(np.asarray(fm)[:, 0] - np.asarray(mu)[:, 0]))
    print(f"frozen f32 predictor: max |mean - host predict_f| = {err:.1e}")


if __name__ == "__main__":
    main()
