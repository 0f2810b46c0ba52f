import jax, jax.numpy as jnp, numpy as np, time
from twoforone_tpu.models.graph_transformer import GraphTransformer, score_forward
from twoforone_tpu.ops.fused_score import make_fused_force_kernel

def trial(layers, heads, block, hidden=64):
    model = GraphTransformer(num_beads=10, hidden_nf=hidden, n_layers=layers, heads=heads,
        use_intrinsic_coords=True, use_abs_coords=False, use_distances=False,
        conservative=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,10,3)), jnp.zeros((1,)),
                        return_energy=True)["params"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(block,10,3)), jnp.float32)
    fused = make_fused_force_kernel(model, params, 0.02, block_chains=block)
    t0=time.perf_counter()
    out = jax.jit(fused)(x); jax.block_until_ready(out)
    print(f"L={layers} H={heads} TB={block}: compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    t = jnp.full((block,), 0.02)
    ref = score_forward(model, params, x, t)
    print("   err:", float(jnp.abs(out-ref).max()), "scale", float(jnp.abs(ref).max()), flush=True)

trial(1, 2, 8)
trial(1, 8, 32)
trial(3, 8, 32)
