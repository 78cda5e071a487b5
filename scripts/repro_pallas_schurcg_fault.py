"""REPRO (round-2 item): implicit Schur with the pallas segment reduction
faults the TPU worker when run inside the full nested-while LM program at
105k observations (run with NLLSTPU_SEGMENT_IMPL=pallas).

The kernel itself is sound: 200 repeated in-jit invocations at the same
data scale (both d=128 and the padded d=3 path) complete correctly — the
fault only occurs embedded in the large nested-loop program, suggesting a
Mosaic/runtime interaction (e.g. scratch DMA semaphores inside long-running
while programs).  Default stays on the scatter path.
"""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, '/root/repo')
import numpy as np
import nllstpu as nt
from nllstpu.core.optimize import compile_problem, run_loop
from nllstpu.models.ba import make_pinhole_ba, perturb_ba

float(jnp.zeros(()))
problem, cams, lmks = make_pinhole_ba(128, 8192, 0.1, noise=1e-3, dtype=jnp.float32, batched="cm")
perturb_ba(problem, lmks, 0.05, seed=5)
compiled = compile_problem(problem, solver="schur_cg", schur_family=nt.Euclidean(3))
print('segment impl:', compiled.schur_info.ops().segment_impl, flush=True)
vars0 = problem.stacked_variables()
opts = nt.Options(iterator=nt.LEVENBERG_MARQUARDT, max_iters=10, rel_dcost=0.0, abs_dcost=0.0, dstep=1e-12, max_fails=1<<30)
def run(v):
    f = run_loop(compiled.assemble, compiled.cost, compiled.ctx(), opts, v)
    return jnp.stack([f["iternum"].astype(jnp.float32), f["startcost"].astype(jnp.float32), f["bestcost"].astype(jnp.float32)])
r = jax.jit(run)
t0=time.time(); out = np.asarray(r(vars0)); print('compile+run', time.time()-t0, flush=True)
vars1 = jax.tree.map(lambda x: x*(1+1e-7), vars0)
t0=time.perf_counter(); out = np.asarray(r(vars1)); dt=time.perf_counter()-t0
print(f'implicit schur+pallas: {dt*1000:.0f} ms, {out[0]:.0f} iters -> {out[0]/dt:.2f} it/s, cost {out[1]:.3e}->{out[2]:.3e}', flush=True)
