r"""r88: production-batch cost model for the flagship — swap the spline
univariate for a trivial affine (hyper width unchanged) and compare with
MAF. Result: spline arithmetic 35%, hyper width 14% vs MAF at b=1M."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from zuko_tpu.flows import NSF, MAF
from zuko_tpu.ops import nsf_fused as nf
from zuko_tpu.core import combine, partition

BATCH, REPS = 1048576, 12
x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))

def measure(label, flow):
    params, static = partition(flow)
    @jax.jit
    def loop(params, x):
        def body(carry, _):
            m = combine(params, static)
            return carry + jnp.sum(nf.fused_nsf_log_prob(m, x + 1e-9 * carry)), None
        out, _ = lax.scan(body, 0.0, None, length=REPS)
        return out
    t0 = time.perf_counter(); loop(params, x).block_until_ready()
    print(f"# {label} compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for r in range(3):
        t0 = time.perf_counter(); loop(params, x).block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, BATCH*REPS/dt/1e6)
        print(f"# {label} run {r}: {1e3*dt:.1f} ms -> {BATCH*REPS/dt/1e6:.1f}M", flush=True)
    print(f"{label}: {best:.1f}M evals/s", flush=True)
    return best

nsf = NSF(6, 0, transforms=3, hidden_features=(64, 64), bins=8, key=jax.random.PRNGKey(0))
full = measure("full NSF", nsf)

# replace the univariate spline tier with a trivial affine that reads two
# h rows per feature — hyper width unchanged, spline arithmetic removed
orig = nf._univ_forward_F
def univ_affine(x, h, F, K, bound, slope, univ):
    a = h[:F, :]
    b = h[F:2*F, :]
    y = x * (1.0 + 0.1 * jnp.tanh(a)) + 0.01 * b
    ladj = jnp.log1p(0.1 * jnp.tanh(a))
    return y, ladj
nf._univ_forward_F = univ_affine
cheap = measure("NSF hyper + affine univariate (spline removed)", nsf)
nf._univ_forward_F = orig

maf = MAF(6, 0, transforms=3, hidden_features=(64, 64), key=jax.random.PRNGKey(0))
mafr = measure("MAF control", maf)
print(f"\nspline-arithmetic share: {100*(1-full/cheap):.0f}% of the cheap-univariate rate")
print(f"hyper-width share vs MAF: cheap {cheap:.0f}M vs MAF {mafr:.0f}M")
