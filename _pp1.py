import sys, time
import jax, jax.numpy as jnp, numpy as np
from twoforone_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.ops.fused_score import make_fused_force_kernel

tb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
model = GraphTransformer(num_beads=10, hidden_nf=64, n_layers=3,
    use_intrinsic_coords=True, use_abs_coords=False, use_distances=False, conservative=True)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,10,3)), jnp.zeros((1,)),
                    return_energy=True)["params"]
x = jnp.asarray(np.random.default_rng(0).normal(size=(tb,10,3)), jnp.float32)
fused = make_fused_force_kernel(model, params, 0.02, block_chains=tb, packed=True)
t0=time.perf_counter()
out = jax.jit(fused)(x); jax.block_until_ready(out)
print(f"packed TB={tb}: compiled+ran {time.perf_counter()-t0:.1f}s", flush=True)
ref = score_forward(model, params, x, jnp.full((tb,), 0.02))
print("relerr:", float(jnp.abs(out-ref).max())/float(jnp.abs(ref).max()), flush=True)
@jax.jit
def run(x):
    return jax.lax.fori_loop(0, 500, lambda i,y: y + 1e-6*fused(y), x)
jax.block_until_ready(run(x))
best=1e9
for _ in range(3):
    t0=time.perf_counter(); jax.block_until_ready(run(x)); best=min(best,time.perf_counter()-t0)
print(f"packed TB={tb}: {best/500*1e6:.1f} us/step  {tb*500/best:.3e} chainsteps/s", flush=True)
