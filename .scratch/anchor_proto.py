import os, time
import sys; sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.demo import demo_scene
from boundplanner_tpu.mpc.bound_mpc import build_tick_params, mpc_tick
from boundplanner_tpu.mpc import ocp
from boundplanner_tpu.mpc.solver import solve_sqp

cfg = MPCParams()  # default: sqp12/qp25
carry, meas, obs, q0 = demo_scene(cfg, dtype=np.float64)

params_fn = jax.jit(lambda c, m, o: build_tick_params(c, m, o, cfg)[0])
params = params_fn(carry, meas, obs)
x0 = np.zeros(ocp.n_vars(cfg.n))

t0=time.time()
sol = jax.jit(lambda x, p: solve_sqp(x, p, cfg))(jnp.asarray(x0), params)
x_ours = np.asarray(sol.x)
print("ours: success", bool(sol.success), "time", time.time()-t0)

cost_j = jax.jit(lambda x: ocp.cost(x, params, cfg))
grad_j = jax.jit(jax.grad(lambda x: ocp.cost(x, params, cfg)))
con_j = jax.jit(lambda x: -ocp.constraints(x, params, cfg))
from boundplanner_tpu.mpc import ocp_jac
conjac_j = jax.jit(lambda x: -ocp_jac.evaluate_with_jac(x, params, cfg)[3])

from scipy.optimize import minimize
t0=time.time()
res = minimize(lambda x: float(cost_j(x)), x0, jac=lambda x: np.asarray(grad_j(x)),
               constraints=[{"type":"ineq","fun":lambda x: np.asarray(con_j(x)),
                             "jac":lambda x: np.asarray(conjac_j(x))}],
               method="SLSQP", options={"maxiter":300,"ftol":1e-10})
print("slsqp:", res.status, res.message, "nit", res.nit, "time", time.time()-t0)
x_ref = res.x
for name, x in (("ours", x_ours), ("slsqp", x_ref)):
    c = float(cost_j(x)); v = float(np.max(-np.asarray(con_j(x))))
    print(f"{name}: cost {c:.8f} maxviol {v:.2e}")
tr_o = ocp.rollout(jnp.asarray(x_ours), params, cfg)
tr_r = ocp.rollout(jnp.asarray(x_ref), params, cfg)
print("dq max diff q:", float(np.max(np.abs(np.asarray(tr_o["q"])-np.asarray(tr_r["q"])))))
print("max diff p:", float(np.max(np.abs(np.asarray(tr_o["p"])-np.asarray(tr_r["p"])))))
