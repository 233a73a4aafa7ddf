"""TPU sort characterization canaries (the measurements behind
core/buckets.py's design — see BASELINE.md "what the hardware taught us").
All timings use lax.scan chains and consume every sort output: the tunnel
backend memoizes identical calls and XLA dead-code-eliminates unused sort
operands, both of which silently fake fast numbers.
"""
"""DCE-proof sort timings: all sorted operands are consumed via sums."""
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 60000
k = jax.random.PRNGKey(0)
which = sys.argv[1]

def scan_time(tag, make_ops, x0):
    def chain(x):
        def step(s, _):
            ops = make_ops(x * (1.0 + s * 1e-30))
            out = jax.lax.sort(ops, dimension=-1, num_keys=1, is_stable=False)
            tot = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
            return s + tot * 1e-30, ()
        s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=5)
        return s + jnp.ravel(x)[0] * 0
    t0 = time.time()
    cc = jax.jit(chain).lower(x0).compile()
    tc = time.time() - t0
    out = cc(x0); jax.block_until_ready(out)
    t0 = time.time()
    out = cc(x0 * 1.000001); jax.block_until_ready(out)
    print(f"{tag}: compile {tc:.1f}s steady {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

if which == "v32":
    x0 = jax.random.normal(k, (3, 8, N))
    def mk(x):
        return [x] + [x * (i + 2.0) for i in range(31)]
    scan_time("variadic 32-op B_r=24", mk, x0)
elif which == "f744":
    x0 = jax.random.normal(k, (3, 8, 31, N))
    def mk(x):
        return [x, x * 2.0]
    scan_time("folded 2-op B_r=744", mk, x0)
elif which == "f1320":
    x0 = jax.random.normal(k, (3, 8, 55, N))
    def mk(x):
        return [x, x * 2.0]
    scan_time("folded 2-op B_r=1320", mk, x0)
elif which == "b24":
    x0 = jax.random.normal(k, (3, 8, N))
    def mk(x):
        return [x, x * 2.0]
    scan_time("plain 2-op B_r=24", mk, x0)
elif which == "v8":
    x0 = jax.random.normal(k, (3, 8, N))
    def mk(x):
        return [x] + [x * (i + 2.0) for i in range(7)]
    scan_time("variadic 8-op B_r=24", mk, x0)
