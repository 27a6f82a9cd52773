"""Benchmark: batched horizon-10 MPC solves/s on one chip.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 100000}

The baseline divisor is the driver-set north star (BASELINE.md): >= 100k
batched horizon-10 MPC solves/s per chip. Extra context fields (batch size,
latency, parity error) ride along in the same JSON object.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from go1_qp_mpc_controller_tpu.models import srb
    from go1_qp_mpc_controller_tpu.ops import admm
    from go1_qp_mpc_controller_tpu.parallel import sweep

    dtype = jnp.float32
    settings = admm.ADMMSettings(seg_iters=25, segments=3)

    def solve_one(scn):
        a_c = srb.calculate_A_c(scn.x0[0:3])
        b_c = srb.calculate_B_c(scn.mass, scn.inertia, scn.root_rot,
                                scn.foot_pos)
        a_d, b_d = srb.discretize(a_c, b_c, 0.0025)
        b_d_list = jnp.broadcast_to(b_d, (10,) + b_d.shape)
        qp = srb.condense(a_d, b_d_list, scn.x0, scn.x_ref, scn.q_weights,
                          scn.r_weights, scn.contacts)
        sol = admm.mpc_solve(qp, settings, mu=scn.mu)
        return sol.x[:12]

    step = jax.jit(jax.vmap(solve_one))

    batch = 4096
    scn = sweep.random_scenarios(jax.random.PRNGKey(0), batch, dtype)

    # warmup/compile
    out = step(scn)
    jax.block_until_ready(out)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(scn)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps
    solves_per_s = batch / elapsed

    # single-solve latency (batch 1, persistent jitted program)
    scn1 = jax.tree.map(lambda a: a[:1], scn)
    out1 = step(scn1)
    jax.block_until_ready(out1)
    t0 = time.perf_counter()
    for _ in range(20):
        out1 = step(scn1)
    jax.block_until_ready(out1)
    latency_ms = (time.perf_counter() - t0) / 20 * 1000.0

    result = {
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 100000.0, 4),
        "batch": batch,
        "batch_time_ms": round(elapsed * 1000.0, 3),
        "single_solve_latency_ms": round(latency_ms, 3),
        "latency_budget_ms": 2.5,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
