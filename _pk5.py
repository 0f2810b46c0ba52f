import jax, jax.numpy as jnp, numpy as np, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_kernel(name, fn, *shapes, timeout_note=""):
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=s), jnp.float32) for i, s in enumerate(shapes)]
    def kernel(*refs):
        ins = [r[:] for r in refs[:-1]]
        refs[-1][:] = fn(*ins)
    out_shape = jax.eval_shape(fn, *xs)
    t0=time.perf_counter()
    try:
        r = pl.pallas_call(kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*len(xs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype))(*xs)
        jax.block_until_ready(r)
        err = float(jnp.abs(r - fn(*xs)).max())
        print(f"{name}: OK {time.perf_counter()-t0:.1f}s err={err:.2e}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:90]}", flush=True)

# sanity: trivial
try_kernel("trivial", lambda a: a*2, (8,128))
# grad of matmul-softmax chain (attention-like)
def attnish(x, w):
    q = x @ w
    s = jax.nn.softmax(q @ q.transpose(0,2,1) if q.ndim==3 else q @ q.T, axis=-1)
    return s
def g1(x, w):
    return jax.grad(lambda y: jnp.sum(jax.nn.softmax(y @ w, axis=-1)**2))(x)
try_kernel("grad softmax mm", g1, (32,64),(64,64))
# grad with batched mm
def g2(x, w):
    def f(y):
        q = jax.lax.dot_general(y, w, (((2,),(0,)),((),())), preferred_element_type=jnp.float32)
        s = jax.lax.dot_general(q, jnp.swapaxes(q,1,2), (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32)
        return jnp.sum(jax.nn.softmax(s, axis=-1)**2)
    return jax.grad(f)(x)
try_kernel("grad batched attn", g2, (8,10,3),(3,64))
# concat + grad
def g3(x, w):
    def f(y):
        z = jnp.concatenate([y, y*2, y-1], axis=-1)
        return jnp.sum(jnp.tanh(jax.lax.dot_general(z, w, (((2,),(0,)),((),())), preferred_element_type=jnp.float32)))
    return jax.grad(f)(x)
try_kernel("grad concat dense3", g3, (8,10,64),(192,64))
