"""TPU sort characterization canaries (the measurements behind
core/buckets.py's design — see BASELINE.md "what the hardware taught us").
All timings use lax.scan chains and consume every sort output: the tunnel
backend memoizes identical calls and XLA dead-code-eliminates unused sort
operands, both of which silently fake fast numbers.
"""
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
N = int(sys.argv[1]); R = int(sys.argv[2]) if len(sys.argv) > 2 else 89
k = jax.random.PRNGKey(0)
x0 = jax.random.normal(k, (3, 8, R, N))
def chain(x):
    def step(s, _):
        out = jax.lax.sort([x * (1.0 + s * 1e-30), x * 2.0], dimension=-1,
                           num_keys=1, is_stable=False)
        return s + (jnp.sum(out[0]) + jnp.sum(out[1])) * 1e-30, ()
    s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=5)
    return s
t0 = time.time()
cc = jax.jit(chain).lower(x0).compile()
tc = time.time() - t0
out = cc(x0); jax.block_until_ready(out)
t0 = time.time()
out = cc(x0 * 1.000001); float(out)
print(f"sort (3,8,{R},{N}): compile {tc:.1f}s steady {(time.time()-t0)/5*1e3:.1f} ms", flush=True)
